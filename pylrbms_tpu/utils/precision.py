"""Matmul-precision control.

On TPU, float32 ``dot_general``/``einsum`` default to bfloat16 MXU passes
(~8 significand bits).  For PDE assembly and Krylov solves that is a
correctness issue, not a performance trade: operator entries come out wrong
at ~1e-4 relative, and a CG solve then stalls at (operator error) x
(condition number) — measured 2e-2 relative residual on the OS2015 bench
problem versus 7e-4 with true-f32 matmuls.

``hp(fn)`` traces fn under ``jax.default_matmul_precision("highest")``
(true-f32 multi-pass on TPU; a no-op for f64-on-CPU).  Our hot paths are
HBM-bandwidth-bound small matmuls, so the extra MXU passes are free in
wall-clock — apply it to every numerics-critical entry point.
"""
from __future__ import annotations

import functools

import jax


def hp(fn):
    """Wrap fn so every matmul traced inside uses 'highest' precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
