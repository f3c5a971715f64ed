"""Append-only text logs, format-compatible with the reference
(srcs/utils.py:112-134): hyperparams at start, per-step train/val loss dicts
+ duration + running best."""

from __future__ import annotations

import os
import time
import typing as tp


def log_params(params: tp.Mapping[str, tp.Any], exp_name: str, log_dir: str = "logs") -> None:
    lines = ["\n===== Experiment parameters =====\n"]
    lines += [f"{k}: {v}\n" for k, v in params.items()]
    lines.append("=================================\n")
    if not exp_name:  # no experiment name -> stdout only, never logs/.txt
        print("".join(lines), end="")
        return
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{exp_name}.txt"), "a") as f:
        f.writelines(lines)


def logging_step(
    step: int,
    tr_losses: tp.Mapping[str, float],
    val_losses: tp.Mapping[str, float],
    duration: float,
    exp_name: str,
    best_loss: float,
    log_dir: str = "logs",
) -> None:
    tr = " ".join(f"{k}:{float(v):.4f}" for k, v in tr_losses.items())
    va = " ".join(f"{k}:{float(v):.4f}" for k, v in val_losses.items())
    line = (
        f"step {step} | train {tr} | val {va} | best {float(best_loss):.4f} "
        f"| {duration:.1f}s\n"
    )
    if not exp_name:  # no experiment name -> stdout only, never logs/.txt
        print(line, end="")
        return
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{exp_name}.txt"), "a") as f:
        f.write(line)


class StepTimer:
    """Wall-clock + per-phase timing (the tracing the reference lacks,
    SURVEY.md §5.1); optionally emits jax.profiler traces."""

    def __init__(self, trace_dir: tp.Optional[str] = None):
        self.trace_dir = trace_dir
        self._t0 = time.time()
        self.phases: tp.Dict[str, float] = {}

    def mark(self, phase: str) -> None:
        now = time.time()
        self.phases[phase] = self.phases.get(phase, 0.0) + (now - self._t0)
        self._t0 = now

    def start_trace(self) -> None:
        if self.trace_dir:
            import jax

            jax.profiler.start_trace(self.trace_dir)

    def stop_trace(self) -> None:
        if self.trace_dir:
            import jax

            jax.profiler.stop_trace()
