"""Compact durable checkpoint export/import (disaster insurance).

The round-3 VM restart wiped every untracked orbax checkpoint dir
(saved_models/*/model_* is gitignored per ADVICE r2 — full TrainStates are
~376 MB).  This tool converts a TrainState checkpoint to a ~70 MB f16
params-only .npz that CAN be committed at training milestones, and back:

    python scripts/ckpt_npz.py export saved_models/EXP/model_best out.npz
    python scripts/ckpt_npz.py import out.npz saved_models/EXP/model_import

`import` writes an orbax variables checkpoint ({"params": ..., "quantizer":
...}) that utils.checkpoint.load_model_variables already understands, so
sample/eval/quality CLIs and --finetune_model (partial merge_matching
restore; optimizer state restarts) work unchanged after a restore.

Runs fully on host CPU (no TPU tunnel compile).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif hasattr(tree, "shape"):
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root


def export(ckpt_dir: str, out_npz: str) -> None:
    from ladiffcodec_tpu.utils.checkpoint import load_checkpoint_path

    raw = load_checkpoint_path(None, ckpt_dir)
    keep = {}
    if "params" in raw:  # full TrainState
        keep["params"] = raw["params"]
        if raw.get("quantizer"):
            keep["quantizer"] = raw["quantizer"]
        if "step" in raw:
            keep["step"] = raw["step"]
    else:  # raw variables checkpoint
        keep = raw
    flat = _flatten(keep)
    compact = {
        k: v.astype(np.float16) if v.dtype == np.float32 else v
        for k, v in flat.items()
    }
    Path(out_npz).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_npz, **compact)
    mb = Path(out_npz).stat().st_size / 1e6
    print(f"exported {len(compact)} arrays ({mb:.1f} MB) -> {out_npz}")


def import_(npz_path: str, out_dir: str) -> None:
    import orbax.checkpoint as ocp

    with np.load(npz_path) as z:
        flat = {k: z[k] for k in z.files}
    tree = _unflatten(
        {
            k: v.astype(np.float32) if v.dtype == np.float16 else v
            for k, v in flat.items()
        }
    )
    tree.pop("step", None)
    out = Path(out_dir).resolve()
    if out.exists():
        import shutil

        shutil.rmtree(out)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(out, tree)
    print(f"imported {npz_path} -> {out}")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "export":
        export(sys.argv[2], sys.argv[3])
    elif cmd == "import":
        import_(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown command {cmd!r} (export|import)")
