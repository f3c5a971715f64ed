"""End-to-end wav -> .ecdc -> wav benchmark over the trained LaDiffCodec
codec, fixed-width vs LM arithmetic coding (VERDICT r1 item 7; the
reference's self-benchmark is srcs/encodec/compress.py:188-207).

  python scripts/bench_lm_compress.py \
      --codec saved_models/stage1_codec_nodisc/model_best \
      --lm saved_models/lm/model_best
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ladiffcodec_tpu.bitstream.compress import ensure_host_cpu_backend

ensure_host_cpu_backend()  # LM step off-tunnel (resolve_lm_device "auto")

import jax.numpy as jnp

from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
from ladiffcodec_tpu.models.streaming_transformer import LMModel
from ladiffcodec_tpu.bitstream.ladiff_adapter import LaDiffBitstreamModel
from ladiffcodec_tpu.bitstream.compress import compress, decompress
from ladiffcodec_tpu.data.librispeech import DatasetLibri
from ladiffcodec_tpu.utils.checkpoint import load_checkpoint_path
from ladiffcodec_tpu.quantization.core import RVQState


def load_codec_vars(path):
    raw = load_checkpoint_path(None, path)
    state = raw["quantizer"]["state"]
    if isinstance(state, dict):
        state = RVQState(**{k: jnp.asarray(v) for k, v in state.items()})
    return {"params": raw["params"], "quantizer": {"state": state}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", required=True)
    ap.add_argument("--lm", default="")
    ap.add_argument("--data", default="data_synth")
    ap.add_argument("--n_files", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--lm_dim", type=int, default=200)
    ap.add_argument("--lm_layers", type=int, default=5)
    args = ap.parse_args()

    cvars = load_codec_vars(args.codec)
    ds = DatasetLibri("eval", args.seconds, args.data, 16000)
    wavs = [ds[i] for i in range(args.n_files)]

    for bw in (1.5, 3.0):
        codec = DiffAudioRep(
            rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
            quantization=True, bandwidth=bw,
        )
        model = LaDiffBitstreamModel(codec)
        K = codec._bw_n_q()
        lm = lm_vars = None
        if args.lm:
            lm = LMModel(n_q=K, card=codec.bins, dim=args.lm_dim,
                         num_layers=args.lm_layers)
            lm_vars = load_checkpoint_path(None, args.lm)
            lm_vars = {"params": lm_vars["params"]}

        rows = {}
        for use_lm in ([False, True] if args.lm else [False]):
            nbytes, t_comp, t_dec, n_samples = 0, 0.0, 0.0, 0
            for w in wavs:
                x = jnp.asarray(w).reshape(1, -1)
                t0 = time.perf_counter()
                data = compress(model, cvars, x, use_lm=use_lm, lm=lm, lm_vars=lm_vars)
                t1 = time.perf_counter()
                out, sr = decompress(data, variables=cvars, model=model,
                                     lm=lm, lm_vars=lm_vars)
                t2 = time.perf_counter()
                assert out.shape[-1] == len(w)
                nbytes += len(data)
                t_comp += t1 - t0
                t_dec += t2 - t1
                n_samples += len(w)
            secs = n_samples / 16000.0
            kbps = nbytes * 8 / secs / 1000.0
            rows["lm" if use_lm else "fixed"] = (kbps, secs / t_comp, secs / t_dec)

        print(f"\n== target {bw} kbps ({K} books) ==")
        for name, (kbps, rt_c, rt_d) in rows.items():
            print(f"{name:>6}: {kbps:6.3f} kbps | comp {rt_c:7.1f}x RT | "
                  f"decomp {rt_d:7.1f}x RT")
        if "lm" in rows:
            gain = 100 * (1 - rows["lm"][0] / rows["fixed"][0])
            print(f"LM compression gain: {gain:.1f}%")


if __name__ == "__main__":
    main()
