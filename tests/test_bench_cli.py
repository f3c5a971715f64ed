"""CPU guards for the driver-facing bench.py and sample.py CLI glue.

bench.py is the artifact the driver captures BENCH_rNN.json from; its
microbatch path (lax.map'd sub-batches inside one dispatch — the round-5
default, logs/bench_r5.txt) must always trace.  --lower_only traces and
lowers the full decode graph without a backend compile, so this is cheap
on CPU.

sample.py's resolve_chain_start guards the ADVICE-r4 footgun: the
dequantization samplers (onestep / ddim_deq) are trained on the re-encoded
scaled latent, so chain_start must default to 'reencode' unless the user
explicitly forces 'cond'.
"""

import sys
import types

import pytest

sys.path.insert(0, "/root/repo")


def _run_bench(argv):
    import bench

    old = sys.argv
    sys.argv = ["bench.py"] + argv
    try:
        bench.main()
    finally:
        sys.argv = old


@pytest.mark.parametrize("mb", [0, 2])
def test_bench_lower_only_traces(mb, capsys):
    """The bench decode graph lowers with and without microbatching."""
    _run_bench(["--lower_only", "--batch", "4", "--microbatch", str(mb)])
    out = capsys.readouterr().out
    assert '"unit": "ok"' in out


def test_bench_lower_only_onestep(capsys):
    """The onestep production-dequant chain lowers too."""
    _run_bench(["--lower_only", "--mode", "onestep", "--batch", "2",
                "--microbatch", "0"])
    out = capsys.readouterr().out
    assert "lower_only(onestep)" in out


def _args(sampler, chain_start="cond"):
    return types.SimpleNamespace(sampler=sampler, chain_start=chain_start)


def test_chain_start_defaults_to_reencode_for_deq_samplers(capsys):
    from ladiffcodec_tpu.sample import resolve_chain_start

    for sampler in ("onestep", "ddim_deq"):
        a = _args(sampler)
        resolve_chain_start(a, ["--sampler", sampler])
        assert a.chain_start == "reencode"
    assert "defaulted to" in capsys.readouterr().out


def test_chain_start_explicit_cond_is_honored_with_warning(capsys):
    from ladiffcodec_tpu.sample import resolve_chain_start

    a = _args("onestep")
    resolve_chain_start(a, ["--sampler", "onestep", "--chain_start", "cond"])
    assert a.chain_start == "cond"
    assert "WARNING" in capsys.readouterr().out
    # --chain_start=cond (single-token form) is also treated as explicit
    a = _args("ddim_deq")
    resolve_chain_start(a, ["--chain_start=cond"])
    assert a.chain_start == "cond"


def test_chain_start_untouched_for_full_samplers(capsys):
    from ladiffcodec_tpu.sample import resolve_chain_start

    a = _args("halfway")
    resolve_chain_start(a, [])
    assert a.chain_start == "cond"
    assert capsys.readouterr().out == ""
