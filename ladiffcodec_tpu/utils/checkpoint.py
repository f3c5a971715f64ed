"""Checkpointing via orbax: params + optimizer state + quantizer state + EMA
+ step — strictly more than the reference saves (state_dict only, no
optimizer — srcs/utils.py:85-95, so its "resume" restarts optimization).

Layout mirrors the reference filenames: `{output_dir}/{exp_name}/model_{note}`
(reference `.amlt` files become orbax directories).
"""

from __future__ import annotations


import shutil
import typing as tp
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(output_dir: str, exp_name: str, note: str) -> Path:
    return Path(output_dir).resolve() / exp_name / f"model_{note}"


def save_run_config(args_dict: dict, output_dir: str, exp_name: str) -> str:
    """Persist the run's flags next to its checkpoints (`config.json` in the
    experiment dir).  Load-bearing model hyperparameters — `global_scale`
    above all — otherwise live only in the command line, and decoding a model
    trained with a non-default value silently produces off-distribution
    latents unless every downstream CLI repeats the flag (ADVICE r2)."""
    import json

    path = Path(output_dir).resolve() / exp_name / "config.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(args_dict, indent=2, default=str))
    return str(path)


def load_run_config(ckpt_path: tp.Union[str, Path]) -> dict:
    """Find the `config.json` for a checkpoint: look in the checkpoint dir
    itself, then in its experiment dir (parent).  Returns {} when absent
    (e.g. converted reference checkpoints)."""
    import json

    p = Path(ckpt_path).resolve()
    for cand in (p, p.parent):
        f = cand / "config.json"
        if f.is_file():
            return json.loads(f.read_text())
    return {}


def save_checkpoint(state, output_dir: str, exp_name: str, note: str = "best") -> str:
    """Atomic overwrite: orbax's force=True deletes the destination before the
    multi-second write, so a preemption (or a concurrent reader — eval scripts
    run against model_best while training) mid-write would see a missing or
    half-written checkpoint.  Write to a sibling tmp dir, then swap via rename
    (same filesystem, so both renames are atomic syscalls)."""
    path = _ckpt_dir(output_dir, exp_name, note)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.parent / (path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp.resolve(), state, force=True)
    ckptr.wait_until_finished()
    old = path.parent / (path.name + ".old")
    if old.exists():
        shutil.rmtree(old)
    if path.exists():
        path.rename(old)
    tmp.rename(path)
    if old.exists():
        shutil.rmtree(old)
    return str(path)


def load_checkpoint(state_template, output_dir: str, exp_name: str, note: str = "best"):
    path = _ckpt_dir(output_dir, exp_name, note)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, state_template)


def _npz_fallback(path: Path):
    """Durable-snapshot fallback (ADVICE r4): orbax array data under
    saved_models/*/model_*/d is gitignored (hundreds of MB per TrainState),
    so a fresh clone holds manifest-only skeletons orbax cannot restore.
    Training milestones export a committed f16 `params_f16.npz` next to the
    checkpoint dir (scripts/ckpt_npz.py); load that instead when present."""
    npz = path.parent / "params_f16.npz"
    if not npz.is_file():
        return None
    with np.load(npz) as z:
        flat = {k: (z[k].astype(np.float32) if z[k].dtype == np.float16
                    else z[k]) for k in z.files}
    root: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    print(f"[checkpoint] orbax restore of {path} failed; loaded committed "
          f"f16 snapshot {npz} (params-only, not bit-identical)")
    return root


def load_checkpoint_path(state_template, path: tp.Union[str, Path]):
    path = Path(path).resolve()
    if state_template is not None:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, state_template)
    # Template-free: restore every leaf as host numpy.  The default restore
    # replays the saved shardings, so a checkpoint written on TPU would
    # demand TPU devices when loaded under CPU (tests, converters, eval on
    # another host).  numpy leaves are device-free and get placed on first
    # use.
    try:
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta.tree
        )
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    except Exception:
        fallback = _npz_fallback(path)
        if fallback is None:
            raise
        return fallback


def load_model_variables(variables_template, path: tp.Union[str, Path]):
    """Restore model variables from either a raw variables checkpoint or a
    full TrainState checkpoint written by the trainer (which nests them under
    params/quantizer next to optimizer state)."""
    try:
        return load_checkpoint_path(variables_template, path)
    except Exception:
        raw = load_checkpoint_path(None, path)
        if "params" not in raw:
            raise
        variables = {"params": raw["params"]}
        if raw.get("quantizer"):
            variables["quantizer"] = _rebuild_quantizer(raw["quantizer"])
        return variables


def merge_matching(dst, src):
    """Recursively copy leaves of `src` into the structure of `dst` where the
    path exists and the shape matches.  Returns (merged, n_loaded).

    Supports the reference's stage-2 -> stage-3 workflow
    (srcs/train.py README.md:41-63: `--finetune_model <continuous AE>
    --freeze_ed`): the stage-3 TrainState has extra diff_model params that a
    strict orbax restore rejects, so the encoder/decoder subtrees are merged
    leaf-by-leaf instead."""
    n = 0

    def rec(d, s):
        nonlocal n
        if isinstance(d, dict) and isinstance(s, dict):
            return {k: rec(v, s[k]) if k in s else v for k, v in d.items()}
        if hasattr(d, "shape") and hasattr(s, "shape"):
            if tuple(d.shape) == tuple(s.shape):
                n += 1
                import jax.numpy as jnp

                return jnp.asarray(s, dtype=d.dtype)
        return d

    return rec(dst, src), n


def _rebuild_quantizer(q):
    """Template-free orbax restore flattens RVQState into a plain dict;
    rebuild the struct the model expects."""
    state = q.get("state", q)
    if isinstance(state, dict):
        from ..quantization.core import RVQState
        import jax.numpy as jnp

        state = RVQState(
            embed=jnp.asarray(state["embed"]),
            embed_avg=jnp.asarray(state["embed_avg"]),
            cluster_size=jnp.asarray(state["cluster_size"]),
            inited=jnp.asarray(state["inited"]),
        )
    return {"state": state}
