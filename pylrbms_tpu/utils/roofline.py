"""MFU / roofline accounting for the hot kernels (VERDICT r4 #3).

Counts USEFUL FLOPs and HBM bytes analytically from operator shapes, and
converts measured wall-clock into achieved TFLOP/s / GB/s against the
TPU v5e peaks.  The counting rules are deliberately simple and stated here
so every reported number is reproducible:

- A matvec through any stored-coefficient operator costs
  ``2 * n_coefficients`` FLOPs (one multiply + one add per stored
  coefficient) and streams ``coefficient_bytes`` from HBM once per apply.
  This is exact for the dense block / interface-strip / stencil layouts
  used here (every stored coefficient participates in exactly one
  multiply-add per apply).
- Vector traffic inside a PCG iteration is counted as ``VEC_ROUNDTRIPS``
  passes over the iterate (x, r, z, p updates + dots), each ``K*N``
  elements read+written.
- f64 on TPU is software-emulated: the numbers reported for f64 legs are
  *useful* f64 FLOP/s (the hardware executes ~10x more f32 micro-flops).
  MFU percentages are quoted against the bf16 MXU peak — the unambiguous
  hardware ceiling — so they are lower bounds by construction; the HBM
  utilization number is precision-independent and is the one to read for
  bandwidth-bound legs.

v5e peaks (single chip; public numbers, e.g. jax-ml.github.io/scaling-book
and cloud.google.com/tpu/docs/v5e): 197 TFLOP/s bf16 MXU, 819 GB/s HBM,
16 GiB HBM.  f32 matmuls under ``default_matmul_precision('highest')`` run
as 6-pass bf16 (~197/6 = 33 TFLOP/s effective ceiling).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_HIGHEST_FLOPS = 197e12 / 6.0
V5E_PEAK_HBM_BPS = 819e9
VEC_ROUNDTRIPS = 10     # axpy/dot passes over the iterate per PCG iteration


def _leaf_stats(tree):
    """(n_elements, n_bytes) over all array leaves of a pytree (arrays or
    jax.ShapeDtypeStruct / eval_shape results)."""
    elems = 0
    bytes_ = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and hasattr(leaf, "shape"):
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            elems += n
            bytes_ += n * np.dtype(leaf.dtype).itemsize
    return elems, bytes_


@dataclass
class KernelCost:
    """FLOPs and HBM bytes of ONE application of a kernel."""
    flops: float
    bytes: float

    def __add__(self, other):
        return KernelCost(self.flops + other.flops, self.bytes + other.bytes)

    def __mul__(self, k):
        return KernelCost(self.flops * k, self.bytes * k)

    __rmul__ = __mul__


def matvec_cost(op) -> KernelCost:
    """One apply of a stored-coefficient operator (AffineBlockApply /
    AssembledBlockOp / AssembledStencil / block-Jacobi factor stack /
    anything whose array leaves are exactly its coefficients)."""
    elems, bytes_ = _leaf_stats(op)
    return KernelCost(flops=2.0 * elems, bytes=float(bytes_))


def vector_cost(K: int, N: int, itemsize: int,
                roundtrips: int = VEC_ROUNDTRIPS) -> KernelCost:
    """Per-PCG-iteration vector traffic for one lane."""
    n = K * N
    return KernelCost(flops=2.0 * roundtrips * n,
                      bytes=2.0 * roundtrips * n * itemsize)


def pcg_iteration_cost(op, factors=None, coarse_basis=None, coarse_inv=None,
                       lanes: int = 1, itemsize: int = None) -> KernelCost:
    """Cost of ONE lock-step PCG iteration for ``lanes`` parameter lanes
    sharing the operator/preconditioner HBM stream (the batched-serving
    shape): matrix coefficients stream ONCE, per-lane FLOPs scale with
    ``lanes``, per-lane vector traffic scales with ``lanes``."""
    mv = matvec_cost(op)
    pc = matvec_cost(factors) if factors is not None else KernelCost(0, 0)
    co = KernelCost(0, 0)
    if coarse_basis is not None:
        cb, _ = _leaf_stats(coarse_basis)
        ci, _ = _leaf_stats(coarse_inv) if coarse_inv is not None else (0, 0)
        _, cbb = _leaf_stats(coarse_basis)
        _, cib = _leaf_stats(coarse_inv) if coarse_inv is not None else (0, 0)
        # restrict (C^T r) + prolong (C x_c) + coarse solve apply
        co = KernelCost(flops=2.0 * (2 * cb + ci), bytes=float(cbb + cib))
    if itemsize is None:
        leaves = jax.tree_util.tree_leaves(op)
        itemsize = np.dtype(leaves[0].dtype).itemsize if leaves else 4
    # K, N from the factor stack if present, else skip vector traffic
    vec = KernelCost(0, 0)
    if factors is not None:
        leaves = jax.tree_util.tree_leaves(factors)
        if leaves and len(leaves[0].shape) >= 3:
            K, N = leaves[0].shape[-3], leaves[0].shape[-1]
            vec = vector_cost(K, N, itemsize)
    matrix_stream = KernelCost(mv.flops * lanes + pc.flops * lanes
                               + co.flops * lanes,
                               mv.bytes + pc.bytes + co.bytes)
    return matrix_stream + lanes * vec


def roofline(cost: KernelCost, seconds: float) -> dict:
    """Achieved rates + utilization vs the v5e peaks."""
    tflops = cost.flops / seconds / 1e12
    gbs = cost.bytes / seconds / 1e9
    return {
        "tflops": round(tflops, 4),
        "hbm_gbs": round(gbs, 2),
        "mfu_vs_bf16_peak": round(cost.flops / seconds
                                  / V5E_PEAK_BF16_FLOPS, 5),
        "mfu_vs_f32_highest": round(cost.flops / seconds
                                    / V5E_PEAK_F32_HIGHEST_FLOPS, 5),
        "hbm_util": round(cost.bytes / seconds / V5E_PEAK_HBM_BPS, 4),
    }
