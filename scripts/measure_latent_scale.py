"""Measure the trained stage-2 encoder's latent scale on dev speech.

The reference hardcodes `global_scale=18.0` (srcs/model.py:166,236) assuming
its encoder emits ~18 max-abs latents; diffusion then sees rep/18 at O(1).
Our stage-2 encoder has its own natural scale — this prints the statistics
needed to pick `--global_scale` for stage-3 training (VERDICT r2 item 1).

Runs on CPU in-process (hop-8 encoder forward only).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
from ladiffcodec_tpu.data.librispeech import DatasetLibri
from ladiffcodec_tpu.utils.checkpoint import load_checkpoint_path


def main():
    ae_path = sys.argv[1] if len(sys.argv) > 1 else "saved_models/stage2_ae/model_best"
    raw = load_checkpoint_path(None, ae_path)
    variables = {"params": raw["params"]}
    model = DiffAudioRep(rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8,))

    ds = DatasetLibri("eval", 1.2, "data_synth", 16000)
    xs = np.stack([ds[i] for i in range(min(32, len(ds)))])[..., None]

    enc = jax.jit(lambda v, x: model.apply(v, x, method="encode"))
    rep = np.asarray(enc(variables, jnp.asarray(xs)))  # (B, T, C)

    B = rep.shape[0]
    per_ex_max = np.max(np.abs(rep.reshape(B, -1)), axis=1)
    print(f"latents: shape {rep.shape}")
    print(f"per-example max-abs: mean {per_ex_max.mean():.4f}  "
          f"min {per_ex_max.min():.4f}  max {per_ex_max.max():.4f}")
    print(f"global std: {rep.std():.4f}   mean-abs: {np.abs(rep).mean():.4f}")
    print(f"p99 abs: {np.percentile(np.abs(rep), 99):.4f}")
    print(f"suggested --global_scale (mean per-example max-abs, like the "
          f"reference's intent): {per_ex_max.mean():.2f}")


if __name__ == "__main__":
    main()
