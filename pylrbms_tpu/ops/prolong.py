"""Inter-grid prolongation for nested structured triangulations.

TPU-native equivalent of dune-gdt's ``prolong`` (``EOC.py:10-12,313,474``):
evaluate the coarse DG function one-sidedly at the nodal points of the fine
space.  For nested refinements (fine mesh = integer subdivision of the coarse
mesh; the diagonal split is the same line on both levels) this is an *exact*
embedding of the coarse DG space into the fine one, for any combination of
orders (P1/P2 coarse -> P1/P2 fine).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces import BlockDGSpace
from .. import basis as B


def prolongation_gather(coarse: BlockDGSpace, fine: BlockDGSpace):
    """Static gather data: for each fine dof, the coarse (subdomain, cell,
    tri) flat block index and the coarse basis values at the fine node.

    Returns (src_idx [Mf], weights [Mf, nb_c]) with Mf = fine.K * fine.N and
    src_idx indexing flat coarse triangles [K_c * s_c * s_c * T].
    """
    gc, gf = coarse.grid, fine.grid
    assert np.isclose(gc.lower_left[0], gf.lower_left[0]) and \
        np.isclose(gc.upper_right[0], gf.upper_right[0])
    # fine nodal points, global: [Kf, s, s, T, nb, 2]
    xn = fine.node_coords_phys()
    Mf = fine.K * fine.N
    xn = xn.reshape(Mf, 2)
    # fine triangle centroids decide which coarse cell/triangle we are in
    org = (fine.subdomain_origins[:, None, None, :]
           + fine.cell_origins_local[None, :, :, :])          # [Kf, s, s, 2]
    scale = np.array([fine.hx, fine.hy])
    if fine.percell:   # crisscross: centroids are per-cell [s, s, T, 2]
        cen = org[:, :, :, None, :] + fine.tri_centroids[None] * scale
    else:
        cen = (org[:, :, :, None, :]
               + fine.tri_centroids[None, None, None, :, :] * scale)
    cen = np.broadcast_to(cen[:, :, :, :, None, :],
                          (fine.K, fine.s, fine.s, fine.T, fine.nb, 2)).reshape(Mf, 2)

    cgx = np.clip(((cen[:, 0] - gc.lower_left[0]) / gc.hx).astype(np.int64),
                  0, gc.global_nx - 1)
    cgy = np.clip(((cen[:, 1] - gc.lower_left[1]) / gc.hy).astype(np.int64),
                  0, gc.global_ny - 1)
    # local unit coords within the coarse cell
    xi = (cen[:, 0] - gc.lower_left[0]) / gc.hx - cgx
    eta = (cen[:, 1] - gc.lower_left[1]) / gc.hy - cgy
    # unit coords of the fine NODE within the coarse cell
    nxi = (xn[:, 0] - gc.lower_left[0]) / gc.hx - cgx
    neta = (xn[:, 1] - gc.lower_left[1]) / gc.hy - cgy
    pts = np.stack([nxi, neta], axis=-1)
    if gc.grid_type == "quad":
        tri = np.zeros(Mf, dtype=np.int64)
        weights = B.eval_basis("Q", coarse.order, pts)
    elif gc.grid_type == "crisscross":
        # per-cell alternating diagonal: parity 0 cells split along the main
        # diagonal into A/B, parity 1 cells along the ANTI-diagonal into C/E
        # (t = 0 lower, 1 upper).  Refinement is nested: the coarse diagonal
        # line is a union of fine edges of matching parity, so one-sided
        # nodal evaluation remains an exact embedding.
        par = (cgx + cgy) % 2
        tri = np.where(par == 0,
                       (eta > xi).astype(np.int64),          # A | B
                       (xi + eta > 1.0).astype(np.int64))    # C | E
        w = {t: B.eval_basis(t, coarse.order, pts) for t in "ABCE"}
        weights = np.where((par == 0)[:, None],
                           np.where(tri[:, None] == 0, w["A"], w["B"]),
                           np.where(tri[:, None] == 0, w["C"], w["E"]))
    else:
        tri = (eta > xi).astype(np.int64)        # 0 = A (below diag), 1 = B
        wA = B.eval_basis("A", coarse.order, pts)  # [Mf, nb_c]
        wB = B.eval_basis("B", coarse.order, pts)
        weights = np.where(tri[:, None] == 0, wA, wB)
    # flat coarse triangle index consistent with the block dof layout
    csx, ccx = cgx // gc.s, cgx % gc.s
    csy, ccy = cgy // gc.s, cgy % gc.s
    k = csy * gc.kx + csx
    flat_tri = (k * (gc.s * gc.s * gc.tri_per_cell)
                + (ccy * gc.s + ccx) * gc.tri_per_cell + tri)
    return flat_tri, weights


def prolongation_gather_3d(coarse, fine):
    """3D hex analogue of :func:`prolongation_gather`: for each fine dof,
    the flat coarse hex-cell block index and the coarse Q1/Q2 basis values
    at the fine nodal point.  Nested tensor refinements keep every fine
    node inside (or on the boundary of) exactly one coarse hex; one-sided
    evaluation chosen by the fine cell centroid makes the embedding exact
    for the discontinuous space.
    """
    gc, gf = coarse.grid, fine.grid
    assert gc.grid_type == gf.grid_type == "hex"
    assert np.allclose(gc.lower_left, gf.lower_left) and \
        np.allclose(gc.upper_right, gf.upper_right)
    xn = fine.node_coords_phys()                     # [Kf, s, s, s, nb, 3]
    Mf = fine.K * fine.N
    xn = xn.reshape(Mf, 3)
    org = (fine.subdomain_origins[:, None, None, None, :]
           + fine.cell_origins_local[None])          # [Kf, s, s, s, 3]
    half = 0.5 * np.array([fine.hx, fine.hy, fine.hz])
    cen = np.broadcast_to((org + half)[..., None, :],
                          (fine.K, fine.s, fine.s, fine.s, fine.nb, 3)
                          ).reshape(Mf, 3)
    ll = np.asarray(gc.lower_left, dtype=float)
    h = np.array([gc.hx, gc.hy, gc.hz])
    nxyz = np.array([gc.global_nx, gc.global_ny, gc.global_nz])
    cg = np.clip(((cen - ll) / h).astype(np.int64), 0, nxyz - 1)  # [Mf, 3]
    pts = (xn - ll) / h - cg                         # unit coords in hex
    weights = B.eval_basis_hex(coarse.order, pts)    # [Mf, nb_c]
    cs, cc = cg // gc.s, cg % gc.s                   # subdomain / cell coords
    k = (cs[:, 2] * gc.ky + cs[:, 1]) * gc.kx + cs[:, 0]
    cell = (cc[:, 2] * gc.s + cc[:, 1]) * gc.s + cc[:, 0]
    flat_cell = k * gc.s ** 3 + cell
    return flat_cell, weights


def prolong(coarse: BlockDGSpace, U_coarse, fine: BlockDGSpace):
    """[.., K_c, N_c] -> [.., K_f, N_f] exact nested-grid prolongation."""
    if getattr(coarse, "dim", 2) == 3:
        src, wts = prolongation_gather_3d(coarse, fine)
    else:
        src, wts = prolongation_gather(coarse, fine)
    lead = U_coarse.shape[:-2]
    Uc = jnp.asarray(U_coarse).reshape(lead + (-1, coarse.nb))   # [.., tris, nb]
    vals = jnp.einsum("...tn,tn->...t", Uc[..., src, :], jnp.asarray(wts))
    return vals.reshape(lead + (fine.K, fine.N))
