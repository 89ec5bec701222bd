"""Estimator products and constants on the 3D hex family (RS2017 set in 3D).

3D counterparts of ``ops/products.py`` for ``BlockDGSpace3D`` (same kernel
set the reference consumes, SURVEY.md §2.3 "RS2017 estimator kernel set",
extended beyond the 2D-only reference): diffusive-flux products df_aa/ab/bb
on the tensor RT0 hex space, RT0->DG divergence interpolation, jump/boundary
penalty product, and the min-diffusion-eigenvalue constant.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces3d import BlockDGSpace3D
from . import assembly as asm
from . import assembly3d as asm3
from .assembly import IPDGParams, DEFAULT_IPDG


def _kinv_fn(lam_hat, kappa_fn):
    """(lam_hat * kappa)^{-1} pointwise; [..., 3, 3] (kappa None -> I/lam)."""
    def fn(x):
        lh = lam_hat(x)
        if kappa_fn is None:
            inv = jnp.zeros(x.shape[:-1] + (3, 3))
            for a in range(3):
                inv = inv.at[..., a, a].set(1.0 / lh)
            return inv
        k = kappa_fn(x)
        return jnp.linalg.inv(k) / lh[..., None, None]
    return fn


def df_aa(space: BlockDGSpace3D, lam_u, lam_v, lam_hat, kappa_fn=None,
          dtype=jnp.float64):
    """[K, N, N]: int (lam_u lam_v / lam_hat) grad(phi_i) . kappa grad(phi_j)."""
    def weight(x):
        return lam_u(x) * lam_v(x) / lam_hat(x)
    return asm3.volume_elliptic(space, weight, kappa_fn, dtype)


def df_bb(space: BlockDGSpace3D, lam_hat, kappa_fn=None, dtype=jnp.float64):
    """[K, N_rt, N_rt]: int t . (lam_hat kappa)^{-1} s over the subdomain.

    Dispatches to the degree-matched RT hex space: tensor RT0 for Q1,
    RT_[1] for Q2 (``ops/rt1hex.py`` — beyond-reference 3D Q2 estimation)."""
    if space.order == 2:
        from .rt1hex import df_bb_rt1hex
        return df_bb_rt1hex(space, lam_hat, kappa_fn, dtype)
    chi, idx, _div = space.rt_cell_tab()          # chi [1, nq, 6, 3]
    nf = idx.shape[-1]
    kinv = _kinv_fn(lam_hat, kappa_fn)
    xq = asm3.vol_points(space, dtype)            # [K, C, nq, 3]
    Ki = kinv(xq).astype(dtype)                   # [K, C, nq, 3, 3]
    w = jnp.asarray(space.vol_w, dtype)
    chi_j = jnp.asarray(chi[0], dtype)            # [nq, 6, 3]
    blocks = space.volume * jnp.einsum("q,qea,kcqab,qfb->kcef",
                                       w, chi_j, Ki, chi_j)
    K = space.K
    F = space.s ** 3
    rows = idx.reshape(F, nf)
    A = jnp.zeros((K, space.N_rt, space.N_rt), dtype)
    return asm.scatter_blocks(A, blocks.reshape(K, F, nf, nf), rows, rows)


def df_ab(space: BlockDGSpace3D, lam_v, lam_hat, kappa_fn=None,
          dtype=jnp.float64):
    """[K, N, N_rt]: int (lam_v / lam_hat) grad(phi_i) . chi_e."""
    if space.order == 2:
        from .rt1hex import df_ab_rt1hex
        return df_ab_rt1hex(space, lam_v, lam_hat, kappa_fn, dtype)
    chi, idx, _div = space.rt_cell_tab()
    nf = idx.shape[-1]
    xq = asm3.vol_points(space, dtype)
    wgt = (lam_v(xq) / lam_hat(xq)).astype(dtype)              # [K, C, nq]
    w = jnp.asarray(space.vol_w, dtype)
    dphi = jnp.asarray(space.vol_dphi, dtype)                  # [nq, nb, 3]
    chi_j = jnp.asarray(chi[0], dtype)
    blocks = space.volume * jnp.einsum("q,kcq,qia,qea->kcie",
                                       w, wgt, dphi, chi_j)
    K = space.K
    F = space.s ** 3
    rows = np.arange(space.N, dtype=np.int64).reshape(F, space.nb)
    cols = idx.reshape(F, nf)
    A = jnp.zeros((K, space.N, space.N_rt), dtype)
    return asm.scatter_blocks(A, blocks.reshape(K, F, space.nb, nf), rows, cols)


def divergence_matrix(space: BlockDGSpace3D, dtype=jnp.float64):
    """[N, N_rt] (same for every subdomain): RT0 coeffs -> DG coeffs of
    div t (elementwise constant on the tensor RT0 hex space; exact Q2
    nodal interpolation of the elementwise-Q_{1,1,1} divergence for Q2)."""
    if space.order == 2:
        from .rt1hex import divergence_matrix_rt1hex
        return divergence_matrix_rt1hex(space, dtype)
    _chi, idx, div = space.rt_cell_tab()          # div [1, 6]
    nf = idx.shape[-1]
    F = space.s ** 3
    blocks = jnp.broadcast_to(jnp.asarray(div, dtype)[:, None, :],
                              (F, space.nb, nf))
    rows = np.arange(space.N, dtype=np.int64).reshape(F, space.nb)
    cols = idx.reshape(F, nf)
    A = jnp.zeros((space.N, space.N_rt), dtype)
    return A.at[rows[:, :, None], cols[:, None, :]].add(blocks)


def penalty_product(space: BlockDGSpace3D, lam_fn, kappa_fn=None,
                    ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64):
    """[K, N, N]: jump penalty over subdomain-interior faces + one-sided
    boundary penalty on all six subdomain sides (local all-Dirichlet)."""
    order = space.order
    origins = space.subdomain_origins
    A = jnp.zeros((space.K, space.N, space.N), dtype)
    for fam, (cz_m, cy_m, cx_m, cz_p, cy_p, cx_p) in \
            space.interior_face_sets().items():
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm3.face_phys_points(space, tab, cz_m, cy_m, cx_m,
                                            origins)
        Mmm, Mmp, Mpm, Mpp = asm.penalty_face_blocks_inner(
            space, tab, lam_fn, kappa_fn, x_m, x_p, order, ipdg, dtype)
        rows_m = space.cell_dofs(cz_m, cy_m, cx_m)
        rows_p = space.cell_dofs(cz_p, cy_p, cx_p)
        A = asm.scatter_blocks(A, Mmm, rows_m, rows_m)
        A = asm.scatter_blocks(A, Mmp, rows_m, rows_p)
        A = asm.scatter_blocks(A, Mpm, rows_p, rows_m)
        A = asm.scatter_blocks(A, Mpp, rows_p, rows_p)
    for side in ("left", "right", "bottom", "top", "near", "far"):
        for key, cz, cy, cx, _pos in space.boundary_face_groups(side):
            tab = space.face_tabs[key]
            _, x_m, _ = asm3.face_phys_points(space, tab, cz, cy, cx, origins)
            blk = asm.penalty_face_blocks_boundary(
                space, tab, lam_fn, kappa_fn, x_m, order, ipdg, dtype)
            rows = space.cell_dofs(cz, cy, cx)
            A = asm.scatter_blocks(A, blk, rows, rows)
    return A


def min_diffusion_ev(space: BlockDGSpace3D, lam_hat, kappa_fn=None,
                     dtype=jnp.float64):
    """[K]: min over the subdomain of the smallest eigenvalue of
    lam_hat(x) * kappa(x)."""
    xq = asm3.vol_points(space, dtype)
    lh = lam_hat(xq).astype(dtype)
    if kappa_fn is None:
        ev = lh
    else:
        k = kappa_fn(xq).astype(dtype) * lh[..., None, None]
        ev = jnp.linalg.eigvalsh(k)[..., 0]
    return ev.reshape(space.K, -1).min(axis=1)
