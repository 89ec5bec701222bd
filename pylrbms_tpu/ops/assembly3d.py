"""Batched 3D assembly kernels: hex volume terms + face geometry.

3D counterpart of ``ops/assembly.py`` for the 'hex' grid family
(``grid3d.py`` / ``ops/spaces3d.py``).  The *face* SWIPDG kernels of
``ops/assembly.py`` (``inner_face_blocks``, ``boundary_face_blocks``,
``penalty_face_blocks_*``) are dimension-agnostic — they consume FaceTab
tables (with ``length`` = physical face area here) and one-sided evaluation
points of any spatial dimension — so only the volume kernels and the face
point geometry are reimplemented.

Cells are enumerated by a flat axis ``c = (cz*s + cy)*s + cx`` (T = 1),
matching the dof layout of :class:`ops.spaces3d.BlockDGSpace3D`.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces3d import BlockDGSpace3D
from .spaces import FaceTab
from .assembly import scatter_blocks, _EVAL_EPS


# ---------------------------------------------------------------------------
# volume kernels
# ---------------------------------------------------------------------------

def vol_points(space: BlockDGSpace3D, dtype=jnp.float64):
    """[K, C, nq, 3] physical volume quadrature points (C = s^3), built with
    jnp broadcasting from O(K + C + nq) static tables."""
    C = space.s ** 3
    org = (jnp.asarray(space.subdomain_origins, dtype)[:, None, :]
           + jnp.asarray(space.cell_origins_local, dtype).reshape(C, 3)[None])
    scale = np.array([space.hx, space.hy, space.hz])
    qp = jnp.asarray(space.vol_qp * scale, dtype)              # [nq, 3]
    return org[:, :, None, :] + qp[None, None]


def volume_elliptic(space: BlockDGSpace3D, lam_fn, kappa_fn=None,
                    dtype=jnp.float64):
    """[K, N, N]: int lam(x) grad(phi_i) . kappa(x) grad(phi_j)."""
    xq = vol_points(space, dtype)                              # [K, C, nq, 3]
    lam = lam_fn(xq).astype(dtype)                             # [K, C, nq]
    dphi = jnp.asarray(space.vol_dphi, dtype)                  # [nq, nb, 3]
    w = jnp.asarray(space.vol_w, dtype)                        # [nq]
    if kappa_fn is None:
        integ = jnp.einsum("q,kcq,qia,qja->kcij", w, lam, dphi, dphi)
    else:
        kap = kappa_fn(xq).astype(dtype)                       # [K, C, nq, 3, 3]
        integ = jnp.einsum("q,kcq,qia,kcqab,qjb->kcij", w, lam, dphi, kap, dphi)
    return _scatter_cell_blocks(space, space.volume * integ, dtype)


def volume_mass(space: BlockDGSpace3D, weight_fn=None, dtype=jnp.float64):
    """[K, N, N]: int w(x) phi_i phi_j."""
    phi = jnp.asarray(space.vol_phi, dtype)                    # [nq, nb]
    w = jnp.asarray(space.vol_w, dtype)
    C = space.s ** 3
    if weight_fn is None:
        elem = space.volume * jnp.einsum("q,qi,qj->ij", w, phi, phi)
        elem = jnp.broadcast_to(elem, (space.K, C) + elem.shape)
    else:
        xq = vol_points(space, dtype)
        lam = weight_fn(xq).astype(dtype)
        elem = space.volume * jnp.einsum("q,kcq,qi,qj->kcij", w, lam, phi, phi)
    return _scatter_cell_blocks(space, elem, dtype)


def volume_functional(space: BlockDGSpace3D, f_fn, dtype=jnp.float64):
    """[K, N]: int f(x) phi_i."""
    xq = vol_points(space, dtype)
    f = f_fn(xq).astype(dtype)                                 # [K, C, nq]
    phi = jnp.asarray(space.vol_phi, dtype)
    w = jnp.asarray(space.vol_w, dtype)
    elem = space.volume * jnp.einsum("q,kcq,qi->kci", w, f, phi)
    return elem.reshape(space.K, space.N)


def volume_scalar(space: BlockDGSpace3D, f_fn, dtype=jnp.float64):
    """[K]: int_subdomain f(x)."""
    xq = vol_points(space, dtype)
    f = f_fn(xq).astype(dtype)
    w = jnp.asarray(space.vol_w, dtype)
    return space.volume * jnp.einsum("q,kcq->k", w, f)


def _scatter_cell_blocks(space: BlockDGSpace3D, elem, dtype):
    """elem [K, C, nb, nb] -> block-diagonal-in-cells [K, N, N]."""
    K, N, nb = space.K, space.N, space.nb
    C = space.s ** 3
    rows = np.arange(N, dtype=np.int64).reshape(C, nb)
    A = jnp.zeros((K, N, N), dtype)
    return scatter_blocks(A, elem.reshape(K, C, nb, nb), rows, rows)


# ---------------------------------------------------------------------------
# face geometry
# ---------------------------------------------------------------------------

def face_phys_points(space: BlockDGSpace3D, tab: FaceTab, cz, cy, cx, origins):
    """Physical quad points & one-sided evaluation points for a batch of
    faces given their minus-side cell coords [F] and origins [K, 3].

    Returns (x, x_m_eval, x_p_eval) each [K, F, nqf, 3]; the plus cell is
    shifted by one cell along the family normal (interior families only)."""
    scale = np.array([space.hx, space.hy, space.hz])
    cell_org = np.stack([np.asarray(cx) * space.hx,
                         np.asarray(cy) * space.hy,
                         np.asarray(cz) * space.hz], axis=-1)          # [F, 3]
    base = (jnp.asarray(origins)[:, None, :]
            + jnp.asarray(cell_org)[None, :, :])                       # [K, F, 3]
    x = base[:, :, None, :] + jnp.asarray(tab.pts_unit_m * scale)[None, None]
    cen_m = base[:, :, None, :] + jnp.asarray(tab.centroid_m * scale)[None, None]
    x_m = x + _EVAL_EPS * (cen_m - x)
    if tab.phi_p is None:
        return x, x_m, None
    shift = np.abs(np.asarray(tab.normal)) * scale                     # one cell
    cen_p = (base[:, :, None, :]
             + jnp.asarray(shift + tab.centroid_p * scale)[None, None])
    x_p = x + _EVAL_EPS * (cen_p - x)
    return x, x_m, x_p
