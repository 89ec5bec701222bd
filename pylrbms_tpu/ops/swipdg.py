"""Affine-component SWIPDG block assembly.

The TPU-native counterpart of ``discretize_lhs``
(``/root/reference/python/dune/pylrbms/discretize_elliptic_block_swipdg.py:381-507``):
for every affine diffusion component ``lambda_q`` we produce

* ``A_loc``  [K, N, N]  — volume + *subdomain-interior* face terms
  (<-> the per-subdomain ``make_elliptic_swipdg_matrix_operator`` with
  all-Neumann boundary info, ``:399-406`` — interior faces only),
* ``D_side`` {side: [K, s, nb, nb]} — one-sided Dirichlet-penalty blocks for
  *every* subdomain side (block-diagonal per boundary-layer triangle).  At
  physical-domain sides these are the boundary contributions (``:426-437``);
  at interior sides they are used when a side becomes the Dirichlet boundary
  of an oversampled corrector patch
  (<-> ``make_elliptic_swipdg_matrix_operator_on_neighborhood``, ``:241-247``),
* interface quadruples per neighboring pair (right/up edges)
  ``in_in / in_out / out_in / out_out`` [E, s, nb, nb]
  (<-> ``block_space.coupling_assembler`` filling 4 matrices in one walk,
  ``:411-423``; pairs visited once with ii<jj, ``:420-423``).

Faces couple exactly one boundary-layer triangle per side, so all interface
and side blocks are block-diagonal per face — we store them as
``[..., s, nb, nb]`` and never materialize N x N coupling matrices.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from .spaces import BlockDGSpace
from . import assembly as asm
from .assembly import IPDGParams, DEFAULT_IPDG


@dataclass
class SwipdgComponent:
    """One affine component of the block SWIPDG operator."""
    A_loc: jnp.ndarray                     # [K, N, N]
    D_side: Dict[str, jnp.ndarray]         # side -> [K, s, nb, nb]
    R_in_in: jnp.ndarray                   # [E_R, s, nb, nb]
    R_in_out: jnp.ndarray
    R_out_in: jnp.ndarray
    R_out_out: jnp.ndarray
    U_in_in: jnp.ndarray                   # [E_U, s, nb, nb]
    U_in_out: jnp.ndarray
    U_out_in: jnp.ndarray
    U_out_out: jnp.ndarray


def _interior_face_sets(space: BlockDGSpace):
    """Family -> (cy_m, cx_m, cy_p, cx_p); see
    :meth:`BlockDGSpace.interior_face_sets` (kept as a module function for
    the existing consumers)."""
    return space.interior_face_sets()


def assemble_swipdg_component(space: BlockDGSpace, lam_fn, kappa_fn=None,
                              ipdg: IPDGParams = DEFAULT_IPDG,
                              dtype=jnp.float64) -> SwipdgComponent:
    grid = space.grid
    order = space.order
    K, N, s, nb = space.K, space.N, space.s, space.nb
    origins = space.subdomain_origins                    # [K, 2] numpy

    # ---------------- volume ----------------
    A_loc = asm.volume_elliptic(space, lam_fn, kappa_fn, dtype)

    # ---------------- interior faces ----------------
    for fam, (cy_m, cx_m, cy_p, cx_p) in _interior_face_sets(space).items():
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm._face_phys_points(space, tab, cy_m, cx_m, origins)
        Mmm, Mmp, Mpm, Mpp = asm.inner_face_blocks(
            space, tab, lam_fn, kappa_fn, x_m, x_p, order, ipdg, dtype)
        tm, tp = tab.tri_m, tab.tri_p
        rows_m = space.cell_dofs(cy_m, cx_m, np.full_like(cy_m, tm))
        rows_p = space.cell_dofs(cy_p, cx_p, np.full_like(cy_p, tp))
        A_loc = asm.scatter_blocks(A_loc, Mmm, rows_m, rows_m)
        A_loc = asm.scatter_blocks(A_loc, Mmp, rows_m, rows_p)
        A_loc = asm.scatter_blocks(A_loc, Mpm, rows_p, rows_m)
        A_loc = asm.scatter_blocks(A_loc, Mpp, rows_p, rows_p)

    # ---------------- Dirichlet side blocks (all subdomains, all sides) -----
    # assembled per boundary group (one for tri/quad, two parity groups for
    # 'crisscross') and interleaved into the [K, s, nb, nb] side strips
    D_side = {}
    for side in ("left", "right", "bottom", "top"):
        strip = jnp.zeros((K, s, nb, nb), dtype)
        for key, cy, cx, _t, pos in space.boundary_face_groups(side):
            tab = space.face_tabs[key]
            _, x_m, _ = asm._face_phys_points(space, tab, cy, cx, origins)
            blk = asm.boundary_face_blocks(
                space, tab, lam_fn, kappa_fn, x_m, order, ipdg, dtype)
            strip = strip.at[:, pos].set(blk)
        D_side[side] = strip                                   # [K, s, nb, nb]

    # ---------------- interface quadruples ----------------
    kx, ky = grid.kx, grid.ky
    org = origins.reshape(ky, kx, 2)

    def _interface(orient: str, minus_org: np.ndarray):
        """Quadruple [E, s, nb, nb], assembled per face group (one for
        tri/quad, two parity groups for 'crisscross') and interleaved."""
        E = minus_org.shape[0]
        out = [jnp.zeros((E, s, nb, nb), dtype) for _ in range(4)]
        for fam, cy_m, cx_m, pos in space.interface_face_groups(orient):
            tab = space.face_tabs[fam]
            _, x_m, x_p = asm._face_phys_points(space, tab, cy_m, cx_m, minus_org)
            blocks = asm.inner_face_blocks(space, tab, lam_fn, kappa_fn,
                                           x_m, x_p, order, ipdg, dtype)
            out = [o.at[:, pos].set(b) for o, b in zip(out, blocks)]
        return tuple(out)

    if kx > 1:
        Rii, Rio, Roi, Roo = _interface("V", org[:, :-1].reshape(-1, 2))
    else:
        z = jnp.zeros((0, s, nb, nb), dtype)
        Rii = Rio = Roi = Roo = z
    if ky > 1:
        Uii, Uio, Uoi, Uoo = _interface("H", org[:-1, :].reshape(-1, 2))
    else:
        z = jnp.zeros((0, s, nb, nb), dtype)
        Uii = Uio = Uoi = Uoo = z

    return SwipdgComponent(A_loc=A_loc, D_side=D_side,
                           R_in_in=Rii, R_in_out=Rio, R_out_in=Roi, R_out_out=Roo,
                           U_in_in=Uii, U_in_out=Uio, U_out_in=Uoi, U_out_out=Uoo)


# ---------------------------------------------------------------------------
# folding into the applied/block view
# ---------------------------------------------------------------------------

def edge_lists(grid) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Subdomain indices of the primal coupling pairs:
    right pairs (left_k [E_R], right_k [E_R]) and up pairs (low_k, up_k)."""
    kx, ky = grid.kx, grid.ky
    sy, sx = np.meshgrid(np.arange(ky), np.arange(kx - 1), indexing="ij")
    left_k = (sy * kx + sx).ravel()
    right_k = left_k + 1
    sy, sx = np.meshgrid(np.arange(ky - 1), np.arange(kx), indexing="ij")
    low_k = (sy * kx + sx).ravel()
    up_k = low_k + kx
    return left_k, right_k, low_k, up_k


def fold_diag(space: BlockDGSpace, comp: SwipdgComponent, dtype=jnp.float64):
    """Fold boundary + interface in_in/out_out contributions into the
    diagonal blocks -> A_diag [K, N, N]
    (<-> ``mats[ii, ii].axpy(...)`` accumulation,
    ``discretize_elliptic_block_swipdg.py:487-497``)."""
    grid = space.grid
    K, N, s, nb = space.K, space.N, space.s, space.nb
    kx, ky = grid.kx, grid.ky
    A = comp.A_loc

    side_rows = {side: space.side_dofs(side).reshape(s, nb)
                 for side in ("left", "right", "bottom", "top")}

    # physical-domain Dirichlet boundary (all-Dirichlet problems)
    bnd_subs = {
        "left":  np.array([sy * kx for sy in range(ky)]),
        "right": np.array([sy * kx + kx - 1 for sy in range(ky)]),
        "bottom": np.arange(kx),
        "top":   np.arange(kx) + (ky - 1) * kx,
    }
    for side, subs in bnd_subs.items():
        rows = side_rows[side]
        blk = comp.D_side[side][subs]                     # [B, s, nb, nb]
        A = A.at[subs[:, None, None, None],
                 rows[None, :, :, None],
                 rows[None, :, None, :]].add(blk)

    # interface in_in / out_out
    left_k, right_k, low_k, up_k = edge_lists(grid)
    if left_k.size:
        rr, rl = side_rows["right"], side_rows["left"]
        A = A.at[left_k[:, None, None, None], rr[None, :, :, None], rr[None, :, None, :]].add(comp.R_in_in)
        A = A.at[right_k[:, None, None, None], rl[None, :, :, None], rl[None, :, None, :]].add(comp.R_out_out)
    if low_k.size:
        rt, rb = side_rows["top"], side_rows["bottom"]
        A = A.at[low_k[:, None, None, None], rt[None, :, :, None], rt[None, :, None, :]].add(comp.U_in_in)
        A = A.at[up_k[:, None, None, None], rb[None, :, :, None], rb[None, :, None, :]].add(comp.U_out_out)
    return A
