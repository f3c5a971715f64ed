"""flagship_gate.py parsing/verdict rules (ADVICE r4: gate the declared
production row, scope to the last run, require STOI no-regression)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OLD_RUN = """\
=== gate-scope eval old run ===
codec @1.5 kbps                                       -5.34      9.999  0.500
diffusion de-qtz @1.5 kbps (onestep-x0 @t=160, reencode start)      -1.00      0.100  0.999
"""

NEW_RUN = """\
=== gate-scope eval new run ===
codec @1.5 kbps                                       -5.34      1.956  0.781
diffusion de-qtz @1.5 kbps (onestep-x0 @t=160, reencode start)      -1.27      1.544  0.852
diffusion de-qtz @1.5 kbps (onestep-x0 @t=100, reencode start)      -1.10      1.400  0.870
"""


def run_gate(tmp_path, text, extra=()):
    log = tmp_path / "log.txt"
    log.write_text(text)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "flagship_gate.py"),
         str(log), *extra],
        capture_output=True, text=True)
    return p.returncode, p.stdout


def test_pass_on_production_row_and_scope(tmp_path):
    # OLD_RUN's absurdly-good diffusion row must NOT leak into the verdict:
    # only rows after the LAST gate-scope marker count
    rc, out = run_gate(tmp_path, OLD_RUN + NEW_RUN)
    assert rc == 0
    assert "FLAGSHIP PASS" in out
    assert "mel 1.544" in out          # production row, not the sweep best
    assert "sweep best: mel 1.400" in out


def test_fail_on_stoi_regression(tmp_path):
    text = NEW_RUN.replace(
        "-1.27      1.544  0.852", "-1.27      1.544  0.700")
    rc, out = run_gate(tmp_path, text)
    assert rc == 1 and "FLAGSHIP FAIL" in out


def test_fail_on_mel(tmp_path):
    text = NEW_RUN.replace(
        "-1.27      1.544  0.852", "-1.27      2.044  0.852")
    rc, out = run_gate(tmp_path, text)
    assert rc == 1 and "FLAGSHIP FAIL" in out


def test_incomplete_without_production_row(tmp_path):
    rc, out = run_gate(tmp_path, NEW_RUN,
                       extra=["--prod", "no-such-sampler"])
    assert rc == 0 and "INCOMPLETE" in out


def test_legacy_log_without_stoi_column(tmp_path):
    # pre-round-5 logs have no STOI column; the mel gate must still work
    text = """\
=== gate-scope legacy ===
codec @1.5 kbps                                       -5.34      1.956
diffusion de-qtz @1.5 kbps (onestep-x0 @t=160, reencode start)      -1.27      1.544
"""
    rc, out = run_gate(tmp_path, text)
    assert rc == 0 and "FLAGSHIP PASS" in out
