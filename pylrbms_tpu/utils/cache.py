"""Persistent XLA compile cache.

In the remote-TPU environment every distinct program costs a fresh
compilation round-trip (30-90 s for the big assembly/solve graphs); the
persistent cache makes repeat runs of the scripts start hot.

The cache directory resolves, in order: explicit ``path`` argument,
``PYLRBMS_JAX_CACHE`` (the variable the CI workflow, tests/conftest.py and
the driver shim use), ``PYLRBMS_COMPILE_CACHE`` (legacy spelling, kept so
existing environments keep working), then a per-user default under the
system temp dir (predictable world-writable paths invite cache poisoning
on multi-user hosts)."""
from __future__ import annotations

import os
import tempfile


def default_cache_dir() -> str:
    """Per-user default compile-cache directory (single source of truth —
    tests/conftest.py and __graft_entry__.py resolve through this too)."""
    try:
        uid = f"_{os.getuid()}"
    except AttributeError:          # non-POSIX
        uid = ""
    return os.path.join(tempfile.gettempdir(), f"jax_cache_pylrbms{uid}")


def resolve_cache_dir(path: str | None = None) -> str:
    return (path
            or os.environ.get("PYLRBMS_JAX_CACHE")
            or os.environ.get("PYLRBMS_COMPILE_CACHE")
            or default_cache_dir())


def enable_compile_cache(path: str | None = None):
    import jax
    path = resolve_cache_dir(path)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:   # older jax without the knobs: run cold
        pass
    return path
