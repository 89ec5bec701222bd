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
    # a_ref [1, N, N], x_ref [1, N] -> y[1, N] = x @ A^T
    # SWIPDG diagonal blocks are symmetric, so x @ A == A @ x; we still
    # contract against the second axis explicitly to stay correct for
    # non-symmetric blocks.
    y_ref[:, :] = jax.lax.dot_general(
        x_ref[:, :], a_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),   # contract x_j A_ij
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_matvec_pallas(A, x, interpret: bool = False):
    """y[k] = A[k] @ x[k];  A [K, N, N], x [K, N]."""
    K, N, _ = A.shape
    return pl.pallas_call(
        _block_matvec_kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N), lambda k: (k, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N * N,
            bytes_accessed=A.size * A.dtype.itemsize + 2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, x)


def use_pallas_matvec(A, x) -> bool:
    """Heuristic gate: TPU backend, f32, lane-aligned N, single vector."""
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except RuntimeError:
        return False
    return (on_tpu and A.dtype == jnp.float32 and x.ndim == 2
            and A.shape[-1] % 128 == 0)


def block_matvec(A, x, interpret: bool = False):
    """Dispatch: pallas on TPU when profitable, XLA einsum otherwise."""
    if interpret or use_pallas_matvec(A, x):
        return block_matvec_pallas(A, x, interpret=interpret)
    return jnp.einsum("kij,...kj->...ki", A, x)
