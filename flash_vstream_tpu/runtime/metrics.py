"""Latency metering.

Keeps the reference's MetricMeter API
(Flash-VStream-LLaVA/flash_vstream/serve/cli_video_stream.py:33-99,
cli_server_2gpu.py:39-105): val/avg/max/sum over named series, plus the
streaming latency breakdown names used by the CLIs
(memory_latency_{encoder,readwrite,cluster,retrieve}, llm_latency, ...).
"""
from __future__ import annotations

import threading
import time
from typing import Dict, Optional

# v5e per-chip roofline, for sanity-checking published numbers in the benches
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def force_completion(tree) -> float:
    """Reliable device-completion fence for timing.

    Through remote-dispatch runtimes (this host's axon tunnel),
    ``jax.block_until_ready`` can return before the device finishes (verified:
    a scalar fetch issued right after a "ready" result took a further 64 s),
    so any timing that does not fetch a result to the host measures dispatch
    rate, not compute. This dispatches ONE reduction that reads one element of
    every array leaf and fetches the scalar to the host — the fetch cannot
    return before every computation those leaves depend on has completed.
    """
    import jax
    import jax.numpy as jnp
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and getattr(l, "size", 0)]
    if not leaves:
        return 0.0
    s = sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves)
    return float(jax.device_get(s))


class AverageMeter:
    """Thread-safe: with --threaded-ingest the same meter is fed from the
    ingest thread (memory_latency_*) and the answer thread (llm_latency*)."""

    def __init__(self, name: str = ""):
        self.name = name
        self._lock = threading.Lock()
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.max = float("-inf")
        self.count = 0

    def update(self, val: float, n: int = 1):
        with self._lock:
            self.val = val
            self.sum += val * n
            self.count += n
            self.avg = self.sum / max(self.count, 1)
            self.max = max(self.max, val)

    def __str__(self):
        return f"{self.name} val={self.val:.4f} avg={self.avg:.4f} max={self.max:.4f}"


class MetricMeter:
    def __init__(self):
        self.meters: Dict[str, AverageMeter] = {}
        self._lock = threading.Lock()

    def update(self, name: str, val: float, n: int = 1):
        with self._lock:
            meter = self.meters.get(name)
            if meter is None:
                meter = self.meters[name] = AverageMeter(name)
        meter.update(val, n)

    def get(self, name: str) -> Optional[AverageMeter]:
        return self.meters.get(name)

    def summary(self) -> str:
        return "\n".join(str(m) for m in self.meters.values())

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {k: {"val": m.val, "avg": m.avg, "max": m.max, "count": m.count}
                for k, m in self.meters.items()}


class Timer:
    """Context manager feeding a MetricMeter series."""

    def __init__(self, meter: MetricMeter, name: str):
        self.meter = meter
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.meter.update(self.name, time.perf_counter() - self.t0)
        return False


class ProfilerSession:
    """jax.profiler trace wrapper (SURVEY.md §5.1: MetricMeter + trace hooks).

    Usage: with ProfilerSession("/tmp/trace"): ...  -> TensorBoard-loadable
    trace of device compute, or a no-op when dir is falsy.
    """

    def __init__(self, trace_dir: Optional[str]):
        self.trace_dir = trace_dir

    def __enter__(self):
        if self.trace_dir:
            import jax
            jax.profiler.start_trace(self.trace_dir)
        return self

    def __exit__(self, *exc):
        if self.trace_dir:
            import jax
            jax.profiler.stop_trace()
        return False


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation) for host-side spans."""
    import jax
    return jax.profiler.TraceAnnotation(name)
