"""Persistent XLA compile cache.

In the remote-TPU environment every distinct program costs a fresh
compilation round-trip (30-90 s for the big assembly/solve graphs); the
persistent cache makes repeat runs of the scripts start hot."""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None):
    import jax
    path = path or os.environ.get("PYLRBMS_COMPILE_CACHE",
                                  "/tmp/jax_cache_pylrbms")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:   # older jax without the knobs: run cold
        pass
    return path
