"""Flagship gate: does the de-quantizer beat its condition codec's own
decode at equal bitrate?  (The capability claim of the reference's
srcs/sample.py:130 + README.md:33-39.)

Parses an eval_quality log and gates on the DECLARED PRODUCTION ROW, not the
best sweep point (ADVICE r4: selecting the best sweep point on the same
32-file set it then claims PASS on is self-serving); the sweep best is
reported separately for information.  Only rows after the last
`=== gate-scope` marker are considered, so appended re-runs into the same
log cannot mix into one verdict.

PASS requires, production diffusion row vs codec @1.5 kbps row:
  - mel distance strictly lower, AND
  - STOI not lower by more than --stoi_eps (perceptual no-regression,
    VERDICT r4 item 2).

Usage:
  python scripts/flagship_gate.py LOG --prod "onestep-x0 @t=160, reencode start"
"""

import argparse
import re
import sys

ROW = re.compile(
    r"^(codec @1\.5 kbps|diffusion de-qtz @1\.5 kbps \((.+?)\))\s+"
    r"(-?[\d.]+)\s+([\d.]+)(?:\s+(-?[\d.]+|nan))?\s*$")


def parse(path):
    lines = open(path).read().splitlines()
    start = 0
    for i, line in enumerate(lines):
        if line.startswith("=== gate-scope"):
            start = i
    codec, diff = None, []
    for line in lines[start:]:
        m = ROW.match(line)
        if not m:
            continue
        snr, mel = float(m.group(3)), float(m.group(4))
        st = float(m.group(5)) if m.group(5) is not None else float("nan")
        if m.group(2) is None:
            codec = (snr, mel, st)
        else:
            diff.append((m.group(2), snr, mel, st))
    return codec, diff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--prod", default="onestep-x0 @t=160, reencode start",
                    help="label of the declared production sampler row")
    ap.add_argument("--stoi_eps", type=float, default=0.01)
    args = ap.parse_args()

    codec, diff = parse(args.log)
    if codec is None or not diff:
        print("FLAGSHIP: INCOMPLETE (missing codec or diffusion rows in log)")
        return
    prod = next((d for d in diff if d[0] == args.prod), None)

    best = min(diff, key=lambda r: r[2])
    print(f"sweep best: mel {best[2]:.3f} STOI {best[3]:.3f} "
          f"SI-SNR {best[1]:.2f} ({best[0]})")

    if prod is None:
        print(f"FLAGSHIP: INCOMPLETE (production row '{args.prod}' not in "
              f"log; rows: {[d[0] for d in diff]})")
        return
    _, snr, mel, st = prod
    mel_ok = mel < codec[1]
    stoi_ok = (st != st) or (codec[2] != codec[2]) \
        or (st >= codec[2] - args.stoi_eps)
    verdict = "PASS" if (mel_ok and stoi_ok) else "FAIL"
    print(f"FLAGSHIP {verdict}: production '{args.prod}' "
          f"mel {mel:.3f} vs codec {codec[1]:.3f} "
          f"| STOI {st:.3f} vs {codec[2]:.3f} (eps {args.stoi_eps}) "
          f"| SI-SNR {snr:.2f} vs {codec[0]:.2f} dB")
    if verdict == "FAIL":
        sys.exit(1)


if __name__ == "__main__":
    main()
