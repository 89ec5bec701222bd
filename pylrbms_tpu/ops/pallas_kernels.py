"""Pallas TPU kernels for the hot online ops.

The PCG detailed solve is dominated by the batched per-subdomain dense
matvec ``y[k] = A[k] @ x[k]`` (A [K, N, N] — HBM-bandwidth bound: every
iteration streams A once).  The kernel keeps one diagonal block per grid step
in VMEM and drives the MXU with an [1, N] x [N, N] product; the interface
couplings stay in XLA (tiny).

Guarded: used on TPU backends with f32 inputs and MXU-friendly N (multiple
of 128); everything else falls back to the XLA einsum (identical semantics,
tested against each other).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_matvec_kernel(a_ref, x_ref, y_ref):
    # grid over K: a_ref [1, N, N] is this subdomain's block; x_ref / y_ref
    # hold the full [K, N] arrays in VMEM (small); row k is accessed
    # dynamically.  y[k, i] = sum_j A[k, i, j] x[k, j].
    k = pl.program_id(0)
    xk = x_ref[pl.ds(k, 1), :]                            # [1, N]
    y = jax.lax.dot_general(
        xk, a_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y_ref[pl.ds(k, 1), :] = y.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_matvec_pallas(A, x, interpret: bool = False):
    """y[k] = A[k] @ x[k];  A [K, N, N], x [K, N]."""
    K, N, _ = A.shape
    return pl.pallas_call(
        _block_matvec_kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N * N,
            bytes_accessed=A.size * A.dtype.itemsize + 2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, x)


def _precond_dot_kernel(f_ref, r_ref, z_ref, rz_ref):
    # grid over K: fused preconditioner apply + CG dot.  Per subdomain k:
    #   z[k] = F[k] @ r[k];  rz[k] = r[k] . z[k]
    # The dot rides the same VMEM residency as the matvec, so the [K, N]
    # z / r arrays are not re-streamed from HBM for the reduction (the
    # XLA form reads them once more).  The saving is O(K*N) against the
    # O(K*N^2) factor stream — see docs/results/pallas_roofline_decision.md
    # for why this bounds ALL PCG-body fusion gains at ~2/N.
    k = pl.program_id(0)
    rk = r_ref[pl.ds(k, 1), :]                            # [1, N]
    z = jax.lax.dot_general(
        rk, f_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z_ref[pl.ds(k, 1), :] = z.astype(z_ref.dtype)
    rz_ref[pl.ds(k, 1)] = jnp.sum(rk * z, axis=1).astype(rz_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def precond_dot_pallas(F, r, interpret: bool = False):
    """Fused ``z[k] = F[k] @ r[k]``, ``rz[k] = r[k] . z[k]``.

    The PCG-body fusion experiment named by the round-4 scale study
    (docs/results/spe10_scale_tpu.txt conclusions): the preconditioner
    apply IS the iteration's dominant HBM stream, so the only fusable
    traffic beyond it is the vector pass of the r.z reduction.  Returns
    (z [K, N], rz [K]); ``rz.sum()`` is the CG scalar.
    """
    K, N, _ = F.shape
    return pl.pallas_call(
        _precond_dot_kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda k: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((K, N), F.dtype),
                   jax.ShapeDtypeStruct((K,), F.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N * N + 2 * K * N,
            bytes_accessed=(F.size + 2 * K * N + K) * F.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(F, r)


import os

# Measured on v5e (K=64, N=384, f32): the XLA batched-matvec einsum is
# already HBM-bandwidth-bound and slightly faster than this kernel
# (1.0 ms vs 1.3 ms incl. dispatch), so dispatch defaults to XLA; the kernel
# stays available (tested, correct) behind PYLRBMS_USE_PALLAS_MATVEC=1 and
# for future fusion work (A-apply + couplings + preconditioner in one pass).
_ENABLED = os.environ.get("PYLRBMS_USE_PALLAS_MATVEC", "0") == "1"


def use_pallas_matvec(A, x) -> bool:
    """Gate: opt-in, TPU backend, f32, lane-aligned N, single vector,
    A block + x + y fit comfortably in VMEM."""
    if not _ENABLED:
        return False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except RuntimeError:
        return False
    K, N = A.shape[0], A.shape[-1]
    vmem_ok = (N * N + 2 * K * N) * 4 <= 12 * 1024 * 1024
    return (on_tpu and A.dtype == jnp.float32 and x.ndim == 2
            and N % 128 == 0 and vmem_ok)


def block_matvec(A, x, interpret: bool = False):
    """Dispatch: pallas on TPU when profitable, XLA einsum otherwise."""
    if interpret or use_pallas_matvec(A, x):
        return block_matvec_pallas(A, x, interpret=interpret)
    return jnp.einsum("kij,...kj->...ki", A, x)
