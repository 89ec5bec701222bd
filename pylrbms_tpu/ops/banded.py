"""Banded (static-diagonal) global SWIPDG operator: the latency-optimal apply.

On the structured mesh every SWIPDG coupling sits on a *fixed flattened-index
diagonal*: with the global dof layout ``m = k*N + ((cy*s+cx)*T + t)*nb + i``
the in-cell, V/H-face and subdomain-interface couplings each contribute a
handful of constant offsets ``delta = col - row`` (e.g. 43 distinct diagonals
for the OS2015 8x8/s=8 config, independent of K).  The matvec then becomes

    y[m] = sum_b band_b[m] * x[m + off_b]

— a static sum of elementwise products of contiguous slices: one fused VPU
kernel, no scatters, no reshapes, no per-block einsums.  On the remote-TPU
profile this beats the stencil apply (ops/matrixfree.py), which is
latency-bound by its ~40 small ops per application, by ~2-3x per CG
iteration at reference scale.

The bands are extracted ONCE per affine component from the assembled block
tensors (diag blocks via ``jnp.diagonal``; interface strips via static
scatter on host) — same source of truth as the dense/block views, so the
operator is algebraically identical (tested to 1e-12 against the dense
apply).  <-> the reference's monolithic CSR view of the same physics
(``discretize_elliptic_block_swipdg.py:439-473``), re-laid-out for the TPU's
vector units.

Integration status: NOT wired into ``make_online_step``/``bench.py``.  The
measured online step is bound by the *preconditioner* apply (block-Jacobi
HBM stream, docs/ARCHITECTURE.md "scaling levers"), not the operator matvec,
so swapping the stencil apply for the banded one does not move the bench;
the class is kept as a validated alternative layout (tests/test_banded.py)
for configs where the matvec dominates.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.precision import hp
from .spaces import BlockDGSpace


def _interface_offsets_and_rows(space: BlockDGSpace, which: str):
    """Static metadata for the R (right) / U (up) interface strip families:
    ``(k_m, k_p, row_m, row_p, base)`` — minus/plus subdomain indices [E],
    minus/plus in-block row offsets [s] (at basis index i=0), and the
    k-block stride of the coupling (N for R, kx*N for U).  For strip block
    value [e, f, i, j]: row = k_m[e]*N + row_m[f] + i,
    col = row + (base + row_p[0] - row_m[0]) + (j - i); the offset is
    face-independent because the in-block index is affine in the face index.
    """
    g = space.grid
    assert not space.percell, \
        "banded layout assumes a per-side-constant boundary element " \
        "('crisscross' alternates; use the stencil/dense paths there)"
    s, T, nb, N = space.s, space.T, space.nb, space.N
    kx, ky = g.kx, g.ky

    def flat_idx(cy, cx, t, i):
        return ((cy * s + cx) * T + t) * nb + i

    if which == "R":
        # minus: (k, cy, s-1, tR); plus: (k+1, cy, 0, tL)
        cyf = np.arange(s)
        tR = int(space.side_cells("right")[2][0])
        tL = int(space.side_cells("left")[2][0])
        row_m = flat_idx(cyf, s - 1, tR, 0)          # [s] (i=0)
        row_p = flat_idx(cyf, 0, tL, 0)
        base = N                                      # next k block
        sy, sx = np.meshgrid(np.arange(ky), np.arange(kx - 1), indexing="ij")
        k_m = (sy * kx + sx).ravel()
        k_p = k_m + 1
    elif which == "U":
        cxf = np.arange(s)
        tT = int(space.side_cells("top")[2][0])
        tB = int(space.side_cells("bottom")[2][0])
        row_m = flat_idx(s - 1, cxf, tT, 0)
        row_p = flat_idx(0, cxf, tB, 0)
        base = kx * N
        sy, sx = np.meshgrid(np.arange(ky - 1), np.arange(kx), indexing="ij")
        k_m = (sy * kx + sx).ravel()
        k_p = k_m + kx
    else:
        raise ValueError(which)
    return k_m, k_p, row_m, row_p, base


def banded_layout(space: BlockDGSpace, diag_mask: np.ndarray):
    """Static banded layout for one space.

    ``diag_mask`` [N, N] — boolean sparsity of the (union) diagonal block.
    Returns (offsets tuple, scatter plans) used by :func:`extract_bands`.
    """
    g = space.grid
    N, K = space.N, space.K
    M = K * N
    offs_in = sorted({int(d) for d in range(-(N - 1), N)
                      if diag_mask.diagonal(d).any()}
                     if N > 1 else {0})

    offs = set(offs_in)
    strip_meta = {}
    for which, kx_cond in (("R", g.kx > 1), ("U", g.ky > 1)):
        if not kx_cond:
            continue
        k_m, k_p, row_m, row_p, base = _interface_offsets_and_rows(space, which)
        nb = space.nb
        # offsets for io (minus-row -> plus-col) and oi (plus-row -> minus-col)
        d_io = np.unique((base + row_p[0] - row_m[0]) + (
            np.arange(nb)[None, :] - np.arange(nb)[:, None]))      # i rows, j cols
        d_oi = -d_io[::-1]
        offs.update(int(x) for x in d_io)
        offs.update(int(x) for x in d_oi)
        strip_meta[which] = (k_m, k_p, row_m, row_p, base)
    offsets = tuple(sorted(offs))
    return offsets, offs_in, strip_meta


@dataclass(eq=False)
class BandedOperator:
    """Affine family of banded operators; ``assemble(theta) -> bands [B, M]``.

    ``offsets`` is static metadata; ``bands_q [Q, B, M]`` are the per-affine-
    component diagonal values (pytree leaves, jit-arg-able).
    """
    offsets: Tuple[int, ...]
    bands_q: jnp.ndarray           # [Q, B, M]
    K: int
    N: int

    def assemble(self, theta) -> jnp.ndarray:
        return jnp.einsum("q,qbm->bm", jnp.asarray(theta, self.bands_q.dtype),
                          self.bands_q)

    @hp
    def apply(self, bands: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """x [..., K, N] -> A x [..., K, N] via the banded form."""
        lead = x.shape[:-2]
        M = self.K * self.N
        xf = x.reshape(lead + (M,))
        lo = -min(0, min(self.offsets))
        hi = max(0, max(self.offsets))
        pad = [(0, 0)] * len(lead) + [(lo, hi)]
        xp = jnp.pad(xf, pad)
        y = jnp.zeros_like(xf)
        for b, off in enumerate(self.offsets):
            xs = jax.lax.slice_in_dim(xp, lo + off, lo + off + M,
                                      axis=xp.ndim - 1)
            y = y + bands[b] * xs
        return y.reshape(lead + (self.K, self.N))


def extract_bands(space: BlockDGSpace, offsets, offs_in, strip_meta,
                  A_diag, C_R_io, C_R_oi, C_U_io, C_U_oi, dtype=None):
    """Extract banded values [B, M] from one affine component's block tensors.

    jit-friendly except the (static) scatter plans computed in banded_layout.
    """
    K, N = space.K, space.N
    M = K * N
    dtype = dtype or A_diag.dtype
    B = len(offsets)
    pos = {off: i for i, off in enumerate(offsets)}
    bands = jnp.zeros((B, M), dtype)

    # ---- diagonal blocks: band[d][k*N + n] = A_diag[k, n, n+d] ----
    for d in offs_in:
        diag = jnp.diagonal(A_diag, offset=d, axis1=1, axis2=2)  # [K, N-|d|]
        row0 = max(0, -d)
        buf = jnp.zeros((K, N), dtype)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, diag.astype(dtype),
                                                  row0, axis=1)
        bands = bands.at[pos[d]].set(buf.reshape(M))

    # ---- interface strips ----
    nb, s = space.nb, space.s
    for which, (io, oi) in (("R", (C_R_io, C_R_oi)), ("U", (C_U_io, C_U_oi))):
        if which not in strip_meta:
            continue
        k_m, k_p, row_m, row_p, base = strip_meta[which]
        E = len(k_m)
        if E == 0:
            continue
        # io: row = k_m*N + row_m[f] + i ; col = k_p*N + row_p[f] + j
        # offset = base + row_p[f] - row_m[f] + (j - i)  (f-independent)
        d0 = base + int(row_p[0] - row_m[0])
        rows_io = (k_m[:, None] * N + row_m[None, :])      # [E, s] (i=0)
        rows_oi = (k_p[:, None] * N + row_p[None, :])
        for i in range(nb):
            for j in range(nb):
                d_io = d0 + (j - i)
                d_oi = -d0 + (j - i)
                r_io = (rows_io + i).reshape(-1)
                r_oi = (rows_oi + i).reshape(-1)
                bands = bands.at[pos[d_io], r_io].add(
                    io[:, :, i, j].reshape(-1).astype(dtype))
                bands = bands.at[pos[d_oi], r_oi].add(
                    oi[:, :, i, j].reshape(-1).astype(dtype))
    return bands


def banded_operator(space: BlockDGSpace, op, dtype=None) -> BandedOperator:
    """Build the affine BandedOperator from an :class:`AffineBlockOp`.

    The diagonal sparsity union over components defines the offset set; each
    component's bands are extracted from its block tensors.
    """
    A_diag = op.A_diag                                   # [Q, K, N, N]
    mask = np.asarray(jnp.any(jnp.abs(A_diag) > 0, axis=(0, 1)))
    offsets, offs_in, strip_meta = banded_layout(space, mask)
    Q = A_diag.shape[0]

    def one(q):
        return extract_bands(space, offsets, offs_in, strip_meta,
                             A_diag[q], op.C_R_io[q], op.C_R_oi[q],
                             op.C_U_io[q], op.C_U_oi[q], dtype)

    bands_q = jnp.stack([one(q) for q in range(Q)])
    return BandedOperator(offsets=offsets, bands_q=bands_q,
                          K=space.K, N=space.N)


jax.tree_util.register_dataclass(
    BandedOperator, data_fields=["bands_q"], meta_fields=["offsets", "K", "N"])
