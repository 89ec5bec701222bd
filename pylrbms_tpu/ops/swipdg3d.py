"""Affine-component SWIPDG block assembly on the 3D hex family.

3D counterpart of ``ops/swipdg.py`` (same affine-factor SWIPDG integrands —
the face kernels of ``ops/assembly.py`` are reused verbatim, they are
dimension-agnostic): per affine diffusion component produce

* ``A_loc``  [K, N, N]           — volume + subdomain-interior face terms,
* ``D_side`` {side: [K, s^2, nb, nb]} — one-sided Dirichlet-penalty strips
  for all six box sides (physical boundary + corrector-patch boundaries),
* interface quadruples for the three orientations (x/y/z primal pairs)
  ``in_in / in_out / out_in / out_out`` [E, s^2, nb, nb].

Interface and side blocks stay block-diagonal per face (one boundary-layer
cell per face), stored as strips — never as N x N coupling matrices.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from .spaces3d import BlockDGSpace3D
from . import assembly as asm
from . import assembly3d as asm3
from .assembly import IPDGParams, DEFAULT_IPDG


@dataclass
class SwipdgComponent3:
    """One affine component of the 3D block SWIPDG operator."""
    A_loc: jnp.ndarray                     # [K, N, N]
    D_side: Dict[str, jnp.ndarray]         # side -> [K, s^2, nb, nb]
    X_in_in: jnp.ndarray                   # [E_X, s^2, nb, nb]
    X_in_out: jnp.ndarray
    X_out_in: jnp.ndarray
    X_out_out: jnp.ndarray
    Y_in_in: jnp.ndarray
    Y_in_out: jnp.ndarray
    Y_out_in: jnp.ndarray
    Y_out_out: jnp.ndarray
    Z_in_in: jnp.ndarray
    Z_in_out: jnp.ndarray
    Z_out_in: jnp.ndarray
    Z_out_out: jnp.ndarray


def edge_lists3(grid) -> Tuple[np.ndarray, ...]:
    """Subdomain indices of the primal coupling pairs per orientation:
    (xlo_k, xhi_k, ylo_k, yhi_k, zlo_k, zhi_k)."""
    kx, ky, kz = grid.kx, grid.ky, grid.kz

    def pairs(axis):
        nx, ny, nz = kx, ky, kz
        if axis == 0:
            nx -= 1
        elif axis == 1:
            ny -= 1
        else:
            nz -= 1
        sz, sy, sx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                                 indexing="ij")
        lo = ((sz * ky + sy) * kx + sx).ravel()
        step = {0: 1, 1: kx, 2: kx * ky}[axis]
        return lo, lo + step

    xlo, xhi = pairs(0)
    ylo, yhi = pairs(1)
    zlo, zhi = pairs(2)
    return xlo, xhi, ylo, yhi, zlo, zhi


def assemble_swipdg_component3(space: BlockDGSpace3D, lam_fn, kappa_fn=None,
                               ipdg: IPDGParams = DEFAULT_IPDG,
                               dtype=jnp.float64) -> SwipdgComponent3:
    grid = space.grid
    order = space.order
    K, s, nb = space.K, space.s, space.nb
    F = s * s
    origins = space.subdomain_origins                      # [K, 3] numpy

    # ---------------- volume ----------------
    A_loc = asm3.volume_elliptic(space, lam_fn, kappa_fn, dtype)

    # ---------------- interior faces ----------------
    for fam, (cz_m, cy_m, cx_m, cz_p, cy_p, cx_p) in \
            space.interior_face_sets().items():
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm3.face_phys_points(space, tab, cz_m, cy_m, cx_m, origins)
        Mmm, Mmp, Mpm, Mpp = asm.inner_face_blocks(
            space, tab, lam_fn, kappa_fn, x_m, x_p, order, ipdg, dtype)
        rows_m = space.cell_dofs(cz_m, cy_m, cx_m)
        rows_p = space.cell_dofs(cz_p, cy_p, cx_p)
        A_loc = asm.scatter_blocks(A_loc, Mmm, rows_m, rows_m)
        A_loc = asm.scatter_blocks(A_loc, Mmp, rows_m, rows_p)
        A_loc = asm.scatter_blocks(A_loc, Mpm, rows_p, rows_m)
        A_loc = asm.scatter_blocks(A_loc, Mpp, rows_p, rows_p)

    # ---------------- Dirichlet side strips (all subdomains, 6 sides) ------
    D_side = {}
    for side in ("left", "right", "bottom", "top", "near", "far"):
        for key, cz, cy, cx, pos in space.boundary_face_groups(side):
            tab = space.face_tabs[key]
            _, x_m, _ = asm3.face_phys_points(space, tab, cz, cy, cx, origins)
            blk = asm.boundary_face_blocks(
                space, tab, lam_fn, kappa_fn, x_m, order, ipdg, dtype)
            D_side[side] = blk                             # [K, s^2, nb, nb]

    # ---------------- interface quadruples ----------------
    def _interface(orient: str, minus_org: np.ndarray):
        E = minus_org.shape[0]
        if E == 0:
            z = jnp.zeros((0, F, nb, nb), dtype)
            return z, z, z, z
        (fam, cz_m, cy_m, cx_m, pos), = space.interface_face_groups(orient)
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm3.face_phys_points(space, tab, cz_m, cy_m, cx_m,
                                            minus_org)
        return asm.inner_face_blocks(space, tab, lam_fn, kappa_fn,
                                     x_m, x_p, order, ipdg, dtype)

    kx, ky, kz = grid.kx, grid.ky, grid.kz
    org = origins.reshape(kz, ky, kx, 3)
    Xq = _interface("X", org[:, :, :-1].reshape(-1, 3))
    Yq = _interface("Y", org[:, :-1, :].reshape(-1, 3))
    Zq = _interface("Z", org[:-1].reshape(-1, 3))

    return SwipdgComponent3(
        A_loc=A_loc, D_side=D_side,
        X_in_in=Xq[0], X_in_out=Xq[1], X_out_in=Xq[2], X_out_out=Xq[3],
        Y_in_in=Yq[0], Y_in_out=Yq[1], Y_out_in=Yq[2], Y_out_out=Yq[3],
        Z_in_in=Zq[0], Z_in_out=Zq[1], Z_out_in=Zq[2], Z_out_out=Zq[3])


def fold_diag3(space: BlockDGSpace3D, comp: SwipdgComponent3,
               dtype=jnp.float64):
    """Fold boundary + interface in_in/out_out contributions into the
    diagonal blocks -> A_diag [K, N, N] (3D analog of ``swipdg.fold_diag``)."""
    grid = space.grid
    kx, ky, kz = grid.kx, grid.ky, grid.kz
    A = comp.A_loc

    side_rows = {side: space.side_dofs(side).reshape(space.s * space.s, space.nb)
                 for side in ("left", "right", "bottom", "top", "near", "far")}

    # physical-domain Dirichlet boundary (all-Dirichlet problems)
    subs_all = np.arange(grid.num_subdomains)
    sx = subs_all % kx
    sy = (subs_all // kx) % ky
    sz = subs_all // (kx * ky)
    bnd_subs = {
        "left": subs_all[sx == 0], "right": subs_all[sx == kx - 1],
        "bottom": subs_all[sy == 0], "top": subs_all[sy == ky - 1],
        "near": subs_all[sz == 0], "far": subs_all[sz == kz - 1],
    }
    for side, subs in bnd_subs.items():
        rows = side_rows[side]
        blk = comp.D_side[side][subs]
        A = A.at[subs[:, None, None, None],
                 rows[None, :, :, None],
                 rows[None, :, None, :]].add(blk)

    # interface in_in / out_out
    xlo, xhi, ylo, yhi, zlo, zhi = edge_lists3(grid)

    def fold(A, lo_k, hi_k, in_in, out_out, hi_side, lo_side):
        if lo_k.size == 0:
            return A
        rh, rl = side_rows[hi_side], side_rows[lo_side]
        A = A.at[lo_k[:, None, None, None], rh[None, :, :, None],
                 rh[None, :, None, :]].add(in_in)
        A = A.at[hi_k[:, None, None, None], rl[None, :, :, None],
                 rl[None, :, None, :]].add(out_out)
        return A

    A = fold(A, xlo, xhi, comp.X_in_in, comp.X_out_out, "right", "left")
    A = fold(A, ylo, yhi, comp.Y_in_in, comp.Y_out_out, "top", "bottom")
    A = fold(A, zlo, zhi, comp.Z_in_in, comp.Z_out_out, "far", "near")
    return A
