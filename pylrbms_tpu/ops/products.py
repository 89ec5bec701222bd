"""Estimator products and constants (the RS2017 kernel set, batched).

TPU-native equivalents of the 13 RS2017 estimator kernels consumed by the
reference (SURVEY.md §2.3 "RS2017 estimator kernel set";
``discretize_elliptic_block_swipdg.py:31-46``):

* ``diffusive_flux_{aa,ab,bb}_product``  -> :func:`df_aa`, :func:`df_ab`,
  :func:`df_bb`; with spd kappa the integrands reduce to
    aa: (lam_u lam_v / lam_hat) grad(u) . kappa grad(v)
    ab: (lam_v / lam_hat)       grad(v) . t
    bb: t . (lam_hat kappa)^{-1} s
  (``...block_swipdg.py:319-378``; assembled per subdomain).
* ``divergence_matrix_operator``         -> :func:`divergence_matrix`
  mapping local RT0 coefficients to the DG coefficients of div(t)
  (exact: div RT0 is elementwise constant).  This interpolation semantics is
  required for the residual concatenations
  ``r_fd = rhs . div`` and ``r_dd = div^T L2 div``
  (``...block_swipdg.py:739-748``) to evaluate int f div(t) and
  int div(t) div(s).
* ``penalty_product``                    -> :func:`penalty_product`
  (jump penalty over subdomain-interior faces + one-sided penalty on the
  subdomain boundary, local all-Dirichlet boundary info,
  ``...block_swipdg.py:657-660``).
* ``residual_indicator_min_diffusion_eigenvalue`` -> :func:`min_diffusion_ev`
* ``residual_indicator_subdomain_diameter``       -> Grid.subdomain_diameter
* ``apply_l2_product`` (f, f)            -> assembly.volume_scalar with f^2

RT0 convention: local basis on triangle T per edge e:
chi_e(x) = (x - p_e) / (2|T|), dof = int_e t . n_out; a family-normal dof c
contributes sigma_{T,e} * c with sigma = +1 iff the family normal is outward.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces import BlockDGSpace
from . import assembly as asm
from .assembly import IPDGParams, DEFAULT_IPDG


def _chi_tab(space: BlockDGSpace):
    """Signed RT0 basis values at volume quad points: [T, nq, nf, 2]
    (cell-invariant; orientation folded in), plus incidence idx [s,s,T,nf]
    and per-face divergence constants div [T,nf].  Element-family aware
    (simplex RT0 on 'tri', tensor RT0 on 'quad'); see
    :meth:`BlockDGSpace.rt_cell_tab`."""
    return space.rt_cell_tab()


def _kinv_fn(lam_hat, kappa_fn):
    """(lam_hat * kappa)^{-1} evaluated pointwise; [..., 2, 2]."""
    def fn(x):
        lh = lam_hat(x)
        if kappa_fn is None:
            inv = jnp.zeros(x.shape[:-1] + (2, 2))
            inv = inv.at[..., 0, 0].set(1.0 / lh)
            inv = inv.at[..., 1, 1].set(1.0 / lh)
            return inv
        k = kappa_fn(x)
        det = k[..., 0, 0] * k[..., 1, 1] - k[..., 0, 1] * k[..., 1, 0]
        inv = jnp.stack([
            jnp.stack([k[..., 1, 1], -k[..., 0, 1]], axis=-1),
            jnp.stack([-k[..., 1, 0], k[..., 0, 0]], axis=-1),
        ], axis=-2) / (det * lh)[..., None, None]
        return inv
    return fn


def df_aa(space: BlockDGSpace, lam_u, lam_v, lam_hat, kappa_fn=None, dtype=jnp.float64):
    """[K, N, N]: int (lam_u lam_v / lam_hat) grad(phi_i) . kappa grad(phi_j)."""
    def weight(x):
        return lam_u(x) * lam_v(x) / lam_hat(x)
    return asm.volume_elliptic(space, weight, kappa_fn, dtype)


def df_bb(space: BlockDGSpace, lam_hat, kappa_fn=None, dtype=jnp.float64):
    """[K, N_rt, N_rt]: int t . (lam_hat kappa)^{-1} s  over the subdomain.

    Dispatches to the degree-matched RT space: RT0 for order-1 DG, RT1 for
    order-2 (``ops/rt1.py`` — beyond-reference P2 estimation)."""
    if space.order == 2:
        from .rt1 import df_bb_rt1
        return df_bb_rt1(space, lam_hat, kappa_fn, dtype)
    chi, idx, _div = _chi_tab(space)
    nf = idx.shape[-1]
    kinv = _kinv_fn(lam_hat, kappa_fn)
    xq = jnp.asarray(asm._vol_points(space), dtype)            # [K,s,s,T,nq,2]
    Ki = kinv(xq).astype(dtype)                                # [K,s,s,T,nq,2,2]
    w = jnp.asarray(space.vol_w, dtype)
    area = space.hx * space.hy
    chi_j = jnp.asarray(chi, dtype)
    blocks = area * jnp.einsum(
        asm._vol_ein(space, "tq,tqea,kyxtqab,tqfb->kyxtef"),
        w, chi_j, Ki, chi_j)
    K = space.K
    F = space.s * space.s * space.T
    blocks = blocks.reshape(K, F, nf, nf)
    rows = idx.reshape(F, nf)
    A = jnp.zeros((K, space.N_rt, space.N_rt), dtype)
    return asm.scatter_blocks(A, blocks, rows, rows)


def df_ab(space: BlockDGSpace, lam_v, lam_hat, kappa_fn=None, dtype=jnp.float64):
    """[K, N, N_rt]: int (lam_v / lam_hat) grad(phi_i) . chi_e
    (kappa^T kappa^{-1} = I for spd kappa)."""
    if space.order == 2:
        from .rt1 import df_ab_rt1
        return df_ab_rt1(space, lam_v, lam_hat, kappa_fn, dtype)
    chi, idx, _div = _chi_tab(space)
    nf = idx.shape[-1]
    xq = jnp.asarray(asm._vol_points(space), dtype)
    wgt = (lam_v(xq) / lam_hat(xq)).astype(dtype)              # [K,s,s,T,nq]
    w = jnp.asarray(space.vol_w, dtype)
    dphi = jnp.asarray(space.vol_dphi, dtype)                  # [T,nq,nb,2]
    area = space.hx * space.hy
    chi_j = jnp.asarray(chi, dtype)
    blocks = area * jnp.einsum(
        asm._vol_ein(space, "tq,kyxtq,tqia,tqea->kyxtie"),
        w, wgt, dphi, chi_j)
    K = space.K
    F = space.s * space.s * space.T
    blocks = blocks.reshape(K, F, space.nb, nf)
    rows = np.arange(space.N, dtype=np.int64).reshape(F, space.nb)
    cols = idx.reshape(F, nf)
    A = jnp.zeros((K, space.N, space.N_rt), dtype)
    return asm.scatter_blocks(A, blocks, rows, cols)


def divergence_matrix(space: BlockDGSpace, dtype=jnp.float64):
    """[N, N_rt] (same for every subdomain): RT0 coeffs -> DG coeffs of div t.

    div chi_e is elementwise constant (both element families), so the DG
    nodal coefficients on an element are all equal to the div constant.
    """
    if space.order == 2:
        from .rt1 import divergence_matrix_rt1
        return divergence_matrix_rt1(space, dtype)
    _chi, idx, div = _chi_tab(space)
    nf = idx.shape[-1]
    F = space.s * space.s * space.T
    if space.percell:                          # div [s, s, T, nf] (crisscross)
        blocks = jnp.broadcast_to(
            jnp.asarray(div, dtype)[:, :, :, None, :],
            (space.s, space.s, space.T, space.nb, nf),
        ).reshape(F, space.nb, nf)
    else:
        blocks = jnp.broadcast_to(
            jnp.asarray(div, dtype)[None, :, None, :],         # [1, T, 1, nf]
            (space.s * space.s, space.T, space.nb, nf),
        ).reshape(F, space.nb, nf)
    rows = np.arange(space.N, dtype=np.int64).reshape(F, space.nb)
    cols = idx.reshape(F, nf)
    A = jnp.zeros((space.N, space.N_rt), dtype)
    return A.at[rows[:, :, None], cols[:, None, :]].add(blocks)


def penalty_product(space: BlockDGSpace, lam_fn, kappa_fn=None,
                    ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64):
    """[K, N, N]: jump penalty over subdomain-interior faces + one-sided
    boundary penalty on all four subdomain sides (local all-Dirichlet)."""
    from .swipdg import _interior_face_sets
    order = space.order
    origins = space.subdomain_origins
    A = jnp.zeros((space.K, space.N, space.N), dtype)
    for fam, (cy_m, cx_m, cy_p, cx_p) in _interior_face_sets(space).items():
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm._face_phys_points(space, tab, cy_m, cx_m, origins)
        Mmm, Mmp, Mpm, Mpp = asm.penalty_face_blocks_inner(
            space, tab, lam_fn, kappa_fn, x_m, x_p, order, ipdg, dtype)
        tm, tp = tab.tri_m, tab.tri_p
        rows_m = space.cell_dofs(cy_m, cx_m, np.full_like(cy_m, tm))
        rows_p = space.cell_dofs(cy_p, cx_p, np.full_like(cy_p, tp))
        A = asm.scatter_blocks(A, Mmm, rows_m, rows_m)
        A = asm.scatter_blocks(A, Mmp, rows_m, rows_p)
        A = asm.scatter_blocks(A, Mpm, rows_p, rows_m)
        A = asm.scatter_blocks(A, Mpp, rows_p, rows_p)
    for side in ("left", "right", "bottom", "top"):
        for key, cy, cx, t, _pos in space.boundary_face_groups(side):
            tab = space.face_tabs[key]
            _, x_m, _ = asm._face_phys_points(space, tab, cy, cx, origins)
            blk = asm.penalty_face_blocks_boundary(
                space, tab, lam_fn, kappa_fn, x_m, order, ipdg, dtype)
            rows = space.cell_dofs(cy, cx, t)
            A = asm.scatter_blocks(A, blk, rows, rows)
    return A


def min_diffusion_ev(space: BlockDGSpace, lam_hat, kappa_fn=None, dtype=jnp.float64):
    """[K]: min over the subdomain of the smallest eigenvalue of
    lam_hat(x) * kappa(x) (2x2 spd closed form)."""
    xq = jnp.asarray(asm._vol_points(space), dtype)
    lh = lam_hat(xq).astype(dtype)
    if kappa_fn is None:
        ev = lh
    else:
        k = kappa_fn(xq).astype(dtype) * lh[..., None, None]
        tr2 = (k[..., 0, 0] + k[..., 1, 1]) / 2
        det = k[..., 0, 0] * k[..., 1, 1] - k[..., 0, 1] * k[..., 1, 0]
        ev = tr2 - jnp.sqrt(jnp.maximum(tr2 * tr2 - det, 0.0))
    return ev.reshape(space.K, -1).min(axis=1)
