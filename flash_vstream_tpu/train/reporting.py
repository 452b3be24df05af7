"""Training observability: scalars file + device profiler window.

The reference reports training scalars to TensorBoard (--report_to
tensorboard, Flash-VStream-LLaVA/scripts/train_and_eval.sh:59) via HF
Trainer. Here every train entry writes an append-mode JSONL scalars stream
(step, loss, lr, step_time_s, ...) — trivially plottable, greppable, and
resume-safe — and can capture a TensorBoard-loadable device trace over a
step window via jax.profiler (SURVEY.md §5.1).
"""
from __future__ import annotations

import json
import math
import os
import time
from typing import Optional


def lr_at(cfg, step: int, lr: Optional[float] = None) -> float:
    """Host-side mirror of trainer.make_optimizer's warmup+cosine schedule
    (linear 0->lr over warmup steps, then cosine decay to 0)."""
    lr = lr if lr is not None else cfg.learning_rate
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 1)
    if step < warmup:
        return lr * step / warmup
    decay = max(cfg.total_steps - warmup, 1)
    t = min(step - warmup, decay)
    return lr * 0.5 * (1.0 + math.cos(math.pi * t / decay))


class ScalarsWriter:
    """Append-mode JSONL scalars stream; one line per step."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, step: int, **scalars):
        rec = {"step": step, "time": round(time.time(), 3)}
        rec.update({k: (round(v, 6) if isinstance(v, float) else v)
                    for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class StepProfiler:
    """jax.profiler trace over steps [first, first + n_steps).

    Skips the first post-resume step by default (it pays compilation), so
    the trace shows steady-state device work."""

    def __init__(self, trace_dir: Optional[str], start_step: int,
                 n_steps: int = 3):
        self.trace_dir = trace_dir
        self.first = start_step + 1
        self.last = self.first + max(n_steps, 1) - 1
        self._on = False

    def before_step(self, step: int):
        if self.trace_dir and not self._on and step == self.first:
            import jax
            jax.profiler.start_trace(self.trace_dir)
            self._on = True

    def after_step(self, step: int):
        if self._on and step >= self.last:
            import jax
            jax.profiler.stop_trace()
            self._on = False

    def close(self):
        if self._on:
            import jax
            jax.profiler.stop_trace()
            self._on = False
