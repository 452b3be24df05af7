"""Process-level runtime setup shared by all CLI entry points."""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache: repeat CLI runs skip recompiles
    (first TPU compiles run 20-40 s through remote compile servers)."""
    import jax
    cache_dir = cache_dir or os.environ.get(
        "VSTREAM_XLA_CACHE",
        os.path.expanduser("~/.cache/flash_vstream_tpu/xla"))
    # key by backend: sharing one dir between CPU test processes and TPU runs
    # corrupts/aborts on deserialization of foreign-backend entries
    cache_dir = os.path.join(cache_dir, jax.default_backend())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
