"""Train the entropy-coding LM on RVQ codes from a trained codec.

The reference ships an LMModel class (only in a notebook checkpoint,
model-checkpoint.py:32) and pretrained weights, but no training code.  This
trains ours: teacher-forced next-step cross-entropy over code sequences
produced by the stage-1 codec, one jitted full-sequence forward per step
(training may use the full-seq graph — only the *coder* needs the
streaming graph, see bitstream/compress.py).

  python scripts/train_lm.py --codec saved_models/stage1_codec_nodisc/model_best \
      --out saved_models/lm --steps 1500
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
from ladiffcodec_tpu.models.streaming_transformer import LMModel
from ladiffcodec_tpu.data.librispeech import DatasetLibri
from ladiffcodec_tpu.utils.checkpoint import save_checkpoint, load_checkpoint_path
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
    ap.add_argument("--out", default="saved_models/lm")
    ap.add_argument("--data", default="data_synth")
    ap.add_argument("--bandwidth", type=float, default=3.0)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx_frames", type=int, default=150)  # 3 s at 50 Hz
    ap.add_argument("--dim", type=int, default=200)
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--n_utts", type=int, default=100000)
    ap.add_argument("--passes", type=int, default=2,
                    help="corpus crop passes over the file list (fresh "
                         "random windows each pass)")
    ap.add_argument("--dev_utts", type=int, default=64)
    args = ap.parse_args()

    codec = DiffAudioRep(
        rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
        quantization=True, bandwidth=args.bandwidth,
    )
    cvars = load_codec_vars(args.codec)
    encode = jax.jit(lambda v, x: codec.apply(v, x, method="encode_codes"))

    # ---- corpus of code sequences ----
    # DatasetLibri random-crops per access, so each pass over the file list
    # yields NEW windows: --passes multiplies crop coverage (the round-3
    # single-pass 512-utt corpus memorized: train-window NLL 2.75 bits/code
    # vs 7.0 on fresh crops of the same split)
    def build_codes(split: str, n: int, passes: int = 1) -> np.ndarray:
        ds = DatasetLibri(split, 4.0, args.data, 16000)
        B_ENC = 32
        utts = []
        for _ in range(passes):
            for i in range(0, min(n, len(ds)), B_ENC):
                xs = np.stack([ds[j] for j in range(i, min(i + B_ENC, len(ds)))])[..., None]
                codes = np.asarray(encode(cvars, jnp.asarray(xs)))  # (K, B, T)
                utts.append(codes.transpose(1, 0, 2))  # (B, K, T)
        return np.concatenate(utts)

    corpus = build_codes("train", args.n_utts, args.passes)
    N, K, T = corpus.shape
    dev = jnp.asarray(build_codes("eval", args.dev_utts), jnp.int32)
    print(f"corpus: {N} utts x {K} books x {T} frames (+{dev.shape[0]} dev)",
          flush=True)

    lm = LMModel(n_q=K, card=codec.bins, dim=args.dim, num_layers=args.layers)
    lmv = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, K, 8), jnp.int32))
    opt = optax.adam(args.lr)
    opt_state = opt.init(lmv["params"])

    C = args.ctx_frames

    def loss_fn(params, codes):
        # input at step t: 1 + codes[t-1] (0 at t=0); target: codes[t]
        inp = jnp.concatenate(
            [jnp.zeros((codes.shape[0], K, 1), jnp.int32), 1 + codes[:, :, :-1]], axis=-1
        )
        probas, _, _ = lm.apply({"params": params}, inp)  # (B, card, K, T)
        logp = jnp.log(jnp.transpose(probas, (0, 2, 3, 1)) + 1e-9)  # (B,K,T,card)
        nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)
        return jnp.mean(nll)

    @jax.jit
    def step(params, opt_state, codes):
        loss, grads = jax.value_and_grad(loss_fn)(params, codes)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_nll = jax.jit(loss_fn)

    params = lmv["params"]
    rng = np.random.default_rng(0)
    t0 = time.time()
    best_dev, best_params = float("inf"), params
    for i in range(args.steps):
        rows = rng.integers(0, N, args.batch)
        starts = rng.integers(0, T - C + 1, args.batch)
        batch = np.stack([corpus[r, :, s : s + C] for r, s in zip(rows, starts)])
        params, opt_state, loss = step(params, opt_state, jnp.asarray(batch, jnp.int32))
        if i % 100 == 0:
            dev_nll = float(eval_nll(params, dev))
            if dev_nll < best_dev:
                best_dev, best_params = dev_nll, params
            bits = float(loss) / np.log(2.0)
            print(f"step {i}: nll {float(loss):.3f} = {bits:.2f} bits/code | "
                  f"dev {dev_nll / np.log(2.0):.2f} (best "
                  f"{best_dev / np.log(2.0):.2f}) | "
                  f"(fixed-width {np.log2(codec.bins):.0f}) {time.time()-t0:.0f}s",
                  flush=True)

    path = save_checkpoint({"params": best_params}, os.path.dirname(args.out) or ".",
                           os.path.basename(args.out), note="best")
    bits = best_dev / np.log(2.0)
    print(f"saved {path} (best dev); dev {bits:.2f} bits/code vs 10 fixed "
          f"-> ideal gain {100 * (1 - bits / 10):.1f}%", flush=True)


if __name__ == "__main__":
    main()
