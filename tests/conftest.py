"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-chip behaviour is tested on a virtual 8-device CPU mesh (mirrors the
reference's strategy of exercising MPI semantics on a small real world,
/root/reference/python/test/mpitest.py).

Environment note: this image pre-imports jax via an axon sitecustomize that
registers a remote-TPU PJRT plugin and forces jax_platforms=axon, so plain
``JAX_PLATFORMS=cpu`` env vars are ineffective.  ``jax.config.update`` after
import (but before first backend use) reliably selects the real CPU backend;
XLA_FLAGS must also be set before backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (may already be imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: repeated suite runs skip recompiles
# (resolve_cache_dir honors PYLRBMS_JAX_CACHE and falls back per-user)
from pylrbms_tpu.utils.cache import resolve_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", resolve_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:   # noqa: BLE001  (older jax)
    pass
