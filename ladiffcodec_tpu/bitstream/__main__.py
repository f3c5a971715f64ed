"""EnCodec compression CLI (reference srcs/encodec/__main__.py):

    python -m ladiffcodec_tpu.bitstream [opts] INPUT [OUTPUT]

wav -> .ecdc compress and .ecdc -> wav decompress, selected by extension.
Differences: no pretrained-checkpoint URL download (zero-egress container) —
pass weights via --weights (an orbax checkpoint of the EncodecModel
variables) or run with random init via --random-init for format testing.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import jax

from .encodec_model import EncodecModel
from .compress import MODELS, compress_to_file, decompress_from_file
from ..data.audio_io import read_wav, write_wav, convert_audio

SUFFIX = ".ecdc"


def fatal(*args):
    print(*args, file=sys.stderr)
    sys.exit(1)


def get_parser():
    parser = argparse.ArgumentParser(
        "ladiffcodec_tpu.bitstream", description="High fidelity neural audio codec."
    )
    parser.add_argument("input", type=Path, help="Input file (.wav or .ecdc)")
    parser.add_argument("output", type=Path, nargs="?", help="Output file")
    parser.add_argument(
        "-b", "--bandwidth", type=float, default=6.0, help="Target bandwidth (kbps)"
    )
    parser.add_argument("--hq", action="store_true", help="48 kHz stereo model")
    parser.add_argument("--lm", action="store_true", help="Entropy coding with the LM")
    parser.add_argument("--lm_device", type=str, default="auto",
                        help="engine for the streaming LM step: auto/numpy "
                             "(host NumPy KV-cache engine, the production "
                             "path), cpu, or default (jitted jax step on "
                             "that backend). Encode and decode must use the "
                             "same engine.")
    parser.add_argument("-f", "--force", action="store_true", help="Overwrite output")
    parser.add_argument(
        "-r", "--rescale", action="store_true", help="Rescale output to avoid clipping"
    )
    parser.add_argument("--weights", type=Path, default=None,
                        help="orbax checkpoint of EncodecModel variables")
    parser.add_argument("--random-init", action="store_true",
                        help="random weights (format/pipeline testing)")
    return parser


def check_output_exists(args):
    if not args.output.parent.exists():
        fatal(f"The parent directory of the output file {args.output} does not exist.")
    if args.output.exists() and not args.force:
        fatal(f"Output file {args.output} exist. Use -f / --force to overwrite.")


def check_clipping(wav, args):
    if args.rescale:
        return
    mx = np.abs(wav).max()
    if mx >= 1:
        print(
            "Clipping!! max scale is larger than 1, audio will be clipped. "
            "Use -r to rescale.",
            file=sys.stderr,
        )


def _load_model_and_vars(args):
    model_name = "encodec_48khz" if args.hq else "encodec_24khz"
    model = MODELS[model_name]()
    if args.weights is not None:
        from ..utils.checkpoint import load_checkpoint_path

        template = model.init_variables(jax.random.PRNGKey(0))
        variables = load_checkpoint_path(template, args.weights)
    elif args.random_init:
        variables = model.init_variables(jax.random.PRNGKey(0))
    else:
        fatal("No pretrained download in this environment: pass --weights or --random-init.")
    return model, variables


def main(argv=None):
    from .compress import ensure_host_cpu_backend

    # before any backend use: make the host CPU addressable so the per-frame
    # LM step can run off-tunnel (compress.resolve_lm_device "auto")
    ensure_host_cpu_backend()
    args = get_parser().parse_args(argv)
    if not args.input.exists():
        fatal(f"Input file {args.input} does not exist.")

    if args.input.suffix.lower() == SUFFIX:
        # decompress
        if args.output is None:
            args.output = args.input.with_suffix(".wav")
        elif args.output.suffix.lower() != ".wav":
            fatal("Output extension must be .wav")
        check_output_exists(args)
        model, variables = _load_model_and_vars(args)
        lm = lm_vars = None
        if args.lm:
            lm, lm_vars = _make_lm(model)
        with open(args.input, "rb") as fo:
            out, sr = decompress_from_file(
                fo, variables=variables, model=model, lm=lm, lm_vars=lm_vars,
                lm_device=args.lm_device,
            )
        check_clipping(out, args)
        if args.rescale:
            out = out * min(0.99 / (np.abs(out).max() + 1e-12), 1.0)
        write_wav(args.output, out, sr)
    else:
        # compress
        if args.output is None:
            args.output = args.input.with_suffix(SUFFIX)
        elif args.output.suffix.lower() != SUFFIX:
            fatal(f"Output extension must be {SUFFIX}")
        check_output_exists(args)
        model, variables = _load_model_and_vars(args)
        model.set_target_bandwidth(args.bandwidth)
        lm = lm_vars = None
        if args.lm:
            lm, lm_vars = _make_lm(model)
        audio, sr = read_wav(args.input)
        audio = convert_audio(audio, sr, model.sample_rate, model.channels)
        with open(args.output, "wb") as fo:
            compress_to_file(
                model, variables, audio, fo, use_lm=args.lm, lm=lm, lm_vars=lm_vars,
                lm_device=args.lm_device,
            )
    print(f"{args.input} -> {args.output}")


def _make_lm(model):
    """Random-init LM (no pretrained download); reference model.py:163-183."""
    from ..models.streaming_transformer import LMModel

    lm = LMModel(
        n_q=model.quantizer.n_q,
        card=model.quantizer.bins,
        num_layers=5,
        dim=200,
        past_context=int(3.5 * model.frame_rate),
    )
    ex = np.zeros((1, model.quantizer.n_q, 1), np.int32)
    lm_vars = lm.init(jax.random.PRNGKey(1234), ex)
    return lm, lm_vars


if __name__ == "__main__":
    main()
