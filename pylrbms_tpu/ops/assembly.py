"""Batched assembly kernels: volume and SWIPDG face blocks.

The TPU-native equivalent of dune-gdt's grid walks + local integrands
(SURVEY.md §2.3: "one grid walk" == one fused batched kernel):

* volume kernel  <-> ``make_elliptic_matrix_operator`` / ``make_l2_matrix_operator``
  / ``make_l2_volume_vector_functional``
* face kernel    <-> ``LocalEllipticIpdg*`` SWIPDG integrands behind
  ``make_elliptic_swipdg_affine_factor_matrix_operator`` and
  ``make_local_elliptic_swipdg_{coupling,boundary}_operator``
  (``discretize_elliptic_block_swipdg.py:21-29,399-437``)

SWIPDG affine-factor variant
----------------------------
The reference assembles one SWIPDG operator *per affine diffusion component*
``lambda_q`` and sums them with ``theta_q(mu)`` via ``LincombOperator``
(``discretize_elliptic_block_swipdg.py:581-587``).  For that sum to equal a
consistent SWIPDG discretization of ``lambda(mu) = sum theta_q lambda_q`` the
integrand must be *linear in lambda* ("affine factor"): the interior-penalty
weights and penalty geometry are computed from the non-parametric ``kappa``
only, and ``lambda`` enters linearly:

  delta_s   = n . (kappa_s n)                 (s in {-, +})
  omega_-   = delta_+ / (delta_- + delta_+),   omega_+ = 1 - omega_-
  gamma     = delta_- delta_+ / (delta_- + delta_+)
  penalty   = sigma_inner(p) * gamma * (omega_- lambda_- + omega_+ lambda_+) / |e|^beta
  a_e(u,v)  = int_e penalty [u][v] - {lambda kappa grad u . n}_omega [v]
                                   - {lambda kappa grad v . n}_omega [u]
  (jump [v] = v_- - v_+ w.r.t. the face normal n from '-' to '+';
   {q}_omega = omega_- q_- + omega_+ q_+)

Dirichlet boundary faces (all problems are all-Dirichlet,
``grid.py:45-53``):

  penalty_b = sigma_boundary(p) * delta * lambda / |e|^beta
  a_e(u,v)  = int_e penalty_b u v - lambda kappa grad u . n v
                                  - lambda kappa grad v . n u

Default constants follow the Epshteyn/Riviere values used by dune-gdt:
sigma_inner(1) = 8, sigma_boundary(1) = 14, beta = 1 (configurable through
:class:`IPDGParams`).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .spaces import BlockDGSpace, FaceTab

# relative inward shift for one-sided coefficient evaluation at faces
# (handles discontinuous checkerboard/indicator coefficients robustly)
_EVAL_EPS = 1e-6


@dataclass(frozen=True)
class IPDGParams:
    beta: float = 1.0
    # Epshteyn/Riviere-style polynomial-order dependent penalties (dune-gdt defaults)
    sigma_inner_by_order: tuple = (4.0, 8.0, 20.0, 38.0, 50.0)
    sigma_boundary_by_order: tuple = (4.0, 14.0, 38.0, 74.0, 100.0)

    def sigma_inner(self, order: int) -> float:
        return self.sigma_inner_by_order[min(order, len(self.sigma_inner_by_order) - 1)]

    def sigma_boundary(self, order: int) -> float:
        return self.sigma_boundary_by_order[min(order, len(self.sigma_boundary_by_order) - 1)]


DEFAULT_IPDG = IPDGParams()


def scatter_blocks(A, blocks, rows, cols):
    """A [..., N, M] += blocks [..., F, nr, nc] at (rows [F, nr], cols [F, nc])."""
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    return A.at[..., rows[:, :, None], cols[:, None, :]].add(blocks)


def scatter_vec(b, vals, rows):
    """b [..., N] += vals [..., F, nr] at rows [F, nr]."""
    return b.at[..., jnp.asarray(rows)].add(vals)


# ---------------------------------------------------------------------------
# volume kernels
# ---------------------------------------------------------------------------

def _vol_points(space: BlockDGSpace):
    """[K, s, s, T, nq, 2] physical volume quadrature points.

    Built with jnp broadcasting from small static tables so that, under jit,
    only O(K + s^2 + nq) constants are embedded in the HLO (the expanded
    array would be prohibitive for remote compilation at scale)."""
    org = (jnp.asarray(space.subdomain_origins)[:, None, None, :]
           + jnp.asarray(space.cell_origins_local)[None, :, :, :])  # [K, s, s, 2]
    scale = np.array([space.hx, space.hy])
    qp = jnp.asarray(space.vol_qp * scale)     # [T, nq, 2] | percell [s,s,T,nq,2]
    if space.percell:
        return org[:, :, :, None, None, :] + qp[None]
    return org[:, :, :, None, None, :] + qp[None, None, None]


def _vol_ein(space: BlockDGSpace, expr: str) -> str:
    """Rewrite a volume einsum for per-cell tables ('crisscross'): every
    operand subscript that starts with 't' but lacks the cell axes gains the
    'yx' prefix (the tables are [s, s, T, ...] there)."""
    if not space.percell:
        return expr
    ins, out = expr.split("->")
    ops = ins.split(",")
    ops = [("yx" + o) if o.startswith("t") else o for o in ops]
    return ",".join(ops) + "->" + out


def volume_elliptic(space: BlockDGSpace, lam_fn, kappa_fn=None, dtype=jnp.float64):
    """[K, N, N]: int lam(x) grad(phi_i) . kappa(x) grad(phi_j) per subdomain.

    <-> ``make_elliptic_matrix_operator`` (``...block_swipdg.py:654,685-688``).
    """
    xq = jnp.asarray(_vol_points(space), dtype)                # [K,s,s,T,nq,2]
    lam = lam_fn(xq).astype(dtype)                             # [K,s,s,T,nq]
    dphi = jnp.asarray(space.vol_dphi, dtype)                  # [T,nq,nb,2]
    w = jnp.asarray(space.vol_w, dtype)                        # [T,nq]
    area = space.hx * space.hy
    if kappa_fn is None:
        integ = jnp.einsum(_vol_ein(space, "tq,kyxtq,tqia,tqja->kyxtij"),
                           w, lam, dphi, dphi)
    else:
        kap = kappa_fn(xq).astype(dtype)                       # [K,s,s,T,nq,2,2]
        integ = jnp.einsum(_vol_ein(space, "tq,kyxtq,tqia,kyxtqab,tqjb->kyxtij"),
                           w, lam, dphi, kap, dphi)
    elem = area * integ                                        # [K,s,s,T,nb,nb]
    return _scatter_cell_blocks(space, elem, dtype)


def volume_mass(space: BlockDGSpace, weight_fn=None, dtype=jnp.float64):
    """[K, N, N]: int w(x) phi_i phi_j  <-> ``make_l2_matrix_operator``."""
    phi = jnp.asarray(space.vol_phi, dtype)                    # [T,nq,nb]
    w = jnp.asarray(space.vol_w, dtype)
    area = space.hx * space.hy
    if weight_fn is None:
        expr = ("yxtq,yxtqi,yxtqj->yxtij" if space.percell
                else "tq,tqi,tqj->tij")
        elem = area * jnp.einsum(expr, w, phi, phi)
        shape = ((space.K,) + elem.shape if space.percell
                 else (space.K, space.s, space.s) + elem.shape)
        elem = jnp.broadcast_to(elem, shape)
    else:
        xq = jnp.asarray(_vol_points(space), dtype)
        lam = weight_fn(xq).astype(dtype)
        elem = area * jnp.einsum(_vol_ein(space, "tq,kyxtq,tqi,tqj->kyxtij"),
                                 w, lam, phi, phi)
    return _scatter_cell_blocks(space, elem, dtype)


def volume_functional(space: BlockDGSpace, f_fn, dtype=jnp.float64):
    """[K, N]: int f(x) phi_i  <-> ``make_l2_volume_vector_functional``
    (``discretize_elliptic_block_swipdg.py:518-520``)."""
    xq = jnp.asarray(_vol_points(space), dtype)
    f = f_fn(xq).astype(dtype)                                 # [K,s,s,T,nq]
    phi = jnp.asarray(space.vol_phi, dtype)
    w = jnp.asarray(space.vol_w, dtype)
    area = space.hx * space.hy
    elem = area * jnp.einsum(_vol_ein(space, "tq,kyxtq,tqi->kyxti"), w, f, phi)
    vals = elem.reshape(space.K, space.N)                      # layout matches dof_index
    return vals


def volume_scalar(space: BlockDGSpace, f_fn, dtype=jnp.float64):
    """[K]: int_subdomain f(x)  <-> ``RS2017_apply_l2_product(f, f)``-style
    scalars (``discretize_elliptic_block_swipdg.py:782``)."""
    xq = jnp.asarray(_vol_points(space), dtype)
    f = f_fn(xq).astype(dtype)
    w = jnp.asarray(space.vol_w, dtype)
    area = space.hx * space.hy
    return area * jnp.einsum(_vol_ein(space, "tq,kyxtq->k"), w, f)


def _scatter_cell_blocks(space: BlockDGSpace, elem, dtype):
    """elem [K, s, s, T, nb, nb] -> block-diagonal-in-cells [K, N, N]."""
    K, N, nb = space.K, space.N, space.nb
    C = space.s * space.s * space.T
    blocks = elem.reshape(K, C, nb, nb)
    rows = np.arange(N, dtype=np.int64).reshape(C, nb)
    A = jnp.zeros((K, N, N), dtype)
    return scatter_blocks(A, blocks, rows, rows)


# ---------------------------------------------------------------------------
# face kernels
# ---------------------------------------------------------------------------

def _face_phys_points(space: BlockDGSpace, tab: FaceTab, cy, cx, origins):
    """Physical quad points & one-sided evaluation points for a batch of faces.

    cy, cx: [F] minus-side cell coords (within subdomain); origins [K, 2].
    Returns (x, x_m_eval, x_p_eval) each [K, F, nqf, 2], built with jnp
    broadcasting from small tables (jit-constant-size O(K + F + nqf)).
    plus-side cell offset is inferred from the family tabs (pts_unit_p lives in
    the *plus* cell whose origin differs by one cell for V/H families).
    """
    scale = np.array([space.hx, space.hy])
    cell_org = np.stack([cx * space.hx, cy * space.hy], axis=-1)       # [F, 2]
    base = (jnp.asarray(origins)[:, None, :]
            + jnp.asarray(cell_org)[None, :, :])                       # [K, F, 2]
    x = base[:, :, None, :] + jnp.asarray(tab.pts_unit_m * scale)[None, None]
    cen_m = base[:, :, None, :] + jnp.asarray(tab.centroid_m * scale)[None, None]
    x_m = x + _EVAL_EPS * (cen_m - x)
    if tab.phi_p is None:
        return x, x_m, None
    # plus cell origin: shift by one cell for V (x+hx) / H (y+hy); same cell for D
    if np.allclose(tab.normal, [1.0, 0.0]):
        shift = np.array([space.hx, 0.0])
    elif np.allclose(tab.normal, [0.0, 1.0]):
        shift = np.array([0.0, space.hy])
    else:
        shift = np.zeros(2)
    cen_p = (base[:, :, None, :]
             + jnp.asarray(shift + tab.centroid_p * scale)[None, None])
    x_p = x + _EVAL_EPS * (cen_p - x)
    return x, x_m, x_p


def inner_face_blocks(space: BlockDGSpace, tab: FaceTab, lam_fn, kappa_fn,
                      x_m_eval, x_p_eval, order: int, ipdg: IPDGParams = DEFAULT_IPDG,
                      dtype=jnp.float64):
    """SWIPDG affine-factor blocks for a batch of inner faces.

    Returns (Mmm, Mmp, Mpm, Mpp) each [K, F, nb, nb]
    (the in_in/in_out/out_in/out_out quadruple of
    ``discretize_elliptic_block_swipdg.py:411-423``).
    """
    n = jnp.asarray(tab.normal, dtype)
    w = jnp.asarray(tab.w, dtype)
    ell = tab.length
    phi_m = jnp.asarray(tab.phi_m, dtype)
    phi_p = jnp.asarray(tab.phi_p, dtype)
    dphi_m = jnp.asarray(tab.dphi_m, dtype)
    dphi_p = jnp.asarray(tab.dphi_p, dtype)
    x_m = jnp.asarray(x_m_eval, dtype)
    x_p = jnp.asarray(x_p_eval, dtype)

    lam_m = lam_fn(x_m).astype(dtype)          # [K, F, nqf]
    lam_p = lam_fn(x_p).astype(dtype)
    if kappa_fn is None:
        delta_m = jnp.ones_like(lam_m)
        delta_p = jnp.ones_like(lam_p)
        gdn_m = jnp.einsum("qja,a->qj", dphi_m, n)   # kappa = I
        gdn_p = jnp.einsum("qja,a->qj", dphi_p, n)
        flux_m = lam_m[..., None] * gdn_m            # [K,F,nqf,nb]
        flux_p = lam_p[..., None] * gdn_p
    else:
        kap_m = kappa_fn(x_m).astype(dtype)          # [K,F,nqf,2,2]
        kap_p = kappa_fn(x_p).astype(dtype)
        delta_m = jnp.einsum("...ab,a,b->...", kap_m, n, n)
        delta_p = jnp.einsum("...ab,a,b->...", kap_p, n, n)
        flux_m = lam_m[..., None] * jnp.einsum("kfqab,qjb,a->kfqj", kap_m, dphi_m, n)
        flux_p = lam_p[..., None] * jnp.einsum("kfqab,qjb,a->kfqj", kap_p, dphi_p, n)

    ssum = delta_m + delta_p
    nz = ssum != 0
    om_m = jnp.where(nz, delta_p / jnp.where(nz, ssum, 1.0), 0.5)
    om_p = jnp.where(nz, delta_m / jnp.where(nz, ssum, 1.0), 0.5)
    gamma = jnp.where(nz, delta_m * delta_p / jnp.where(nz, ssum, 1.0), 0.0)
    pen = (ipdg.sigma_inner(order) * gamma * (om_m * lam_m + om_p * lam_p)
           / tab.pen_len ** ipdg.beta)

    wflux_m = om_m[..., None] * flux_m
    wflux_p = om_p[..., None] * flux_p

    def P(phi_i, phi_j, sgn):      # penalty term
        return sgn * ell * jnp.einsum("q,kfq,qi,qj->kfij", w, pen, phi_i, phi_j)

    def Cj(wflux, phi_i, sgn):     # -{grad u}[v]: trial flux x test trace
        return sgn * ell * jnp.einsum("q,kfqj,qi->kfij", w, wflux, phi_i)

    def Ci(wflux, phi_j, sgn):     # -{grad v}[u]: test flux x trial trace
        return sgn * ell * jnp.einsum("q,kfqi,qj->kfij", w, wflux, phi_j)

    Mmm = P(phi_m, phi_m, +1) + Cj(wflux_m, phi_m, -1) + Ci(wflux_m, phi_m, -1)
    Mmp = P(phi_m, phi_p, -1) + Cj(wflux_p, phi_m, -1) + Ci(wflux_m, phi_p, +1)
    Mpm = P(phi_p, phi_m, -1) + Cj(wflux_m, phi_p, +1) + Ci(wflux_p, phi_m, -1)
    Mpp = P(phi_p, phi_p, +1) + Cj(wflux_p, phi_p, +1) + Ci(wflux_p, phi_p, +1)
    return Mmm, Mmp, Mpm, Mpp


def boundary_face_blocks(space: BlockDGSpace, tab: FaceTab, lam_fn, kappa_fn,
                         x_m_eval, order: int, ipdg: IPDGParams = DEFAULT_IPDG,
                         dtype=jnp.float64):
    """Dirichlet-penalty boundary blocks [K, F, nb, nb]
    (<-> ``make_local_elliptic_swipdg_boundary_operator``,
    ``discretize_elliptic_block_swipdg.py:426-437``)."""
    n = jnp.asarray(tab.normal, dtype)
    w = jnp.asarray(tab.w, dtype)
    ell = tab.length
    phi = jnp.asarray(tab.phi_m, dtype)
    dphi = jnp.asarray(tab.dphi_m, dtype)
    x_m = jnp.asarray(x_m_eval, dtype)
    lam = lam_fn(x_m).astype(dtype)
    if kappa_fn is None:
        delta = jnp.ones_like(lam)
        flux = lam[..., None] * jnp.einsum("qja,a->qj", dphi, n)
    else:
        kap = kappa_fn(x_m).astype(dtype)
        delta = jnp.einsum("...ab,a,b->...", kap, n, n)
        flux = lam[..., None] * jnp.einsum("kfqab,qjb,a->kfqj", kap, dphi, n)
    pen = ipdg.sigma_boundary(order) * delta * lam / tab.pen_len ** ipdg.beta
    M = (ell * jnp.einsum("q,kfq,qi,qj->kfij", w, pen, phi, phi)
         - ell * jnp.einsum("q,kfqj,qi->kfij", w, flux, phi)
         - ell * jnp.einsum("q,kfqi,qj->kfij", w, flux, phi))
    return M


def penalty_face_blocks_inner(space, tab, lam_fn, kappa_fn, x_m_eval, x_p_eval,
                              order, ipdg=DEFAULT_IPDG, dtype=jnp.float64):
    """Penalty-only inner face blocks (for the local energy DG product,
    <-> ``RS2017_make_penalty_product_matrix_operator``,
    ``discretize_elliptic_block_swipdg.py:657-660``)."""
    n = jnp.asarray(tab.normal, dtype)
    w = jnp.asarray(tab.w, dtype)
    ell = tab.length
    phi_m = jnp.asarray(tab.phi_m, dtype)
    phi_p = jnp.asarray(tab.phi_p, dtype)
    lam_m = lam_fn(jnp.asarray(x_m_eval, dtype)).astype(dtype)
    lam_p = lam_fn(jnp.asarray(x_p_eval, dtype)).astype(dtype)
    if kappa_fn is None:
        delta_m = jnp.ones_like(lam_m)
        delta_p = jnp.ones_like(lam_p)
    else:
        kap_m = kappa_fn(jnp.asarray(x_m_eval, dtype)).astype(dtype)
        kap_p = kappa_fn(jnp.asarray(x_p_eval, dtype)).astype(dtype)
        delta_m = jnp.einsum("...ab,a,b->...", kap_m, n, n)
        delta_p = jnp.einsum("...ab,a,b->...", kap_p, n, n)
    ssum = delta_m + delta_p
    nz = ssum != 0
    om_m = jnp.where(nz, delta_p / jnp.where(nz, ssum, 1.0), 0.5)
    om_p = jnp.where(nz, delta_m / jnp.where(nz, ssum, 1.0), 0.5)
    gamma = jnp.where(nz, delta_m * delta_p / jnp.where(nz, ssum, 1.0), 0.0)
    pen = (ipdg.sigma_inner(order) * gamma * (om_m * lam_m + om_p * lam_p)
           / tab.pen_len ** ipdg.beta)

    def P(phi_i, phi_j, sgn):
        return sgn * ell * jnp.einsum("q,kfq,qi,qj->kfij", w, pen, phi_i, phi_j)

    return P(phi_m, phi_m, +1), P(phi_m, phi_p, -1), P(phi_p, phi_m, -1), P(phi_p, phi_p, +1)


def penalty_face_blocks_boundary(space, tab, lam_fn, kappa_fn, x_m_eval,
                                 order, ipdg=DEFAULT_IPDG, dtype=jnp.float64):
    """Penalty-only boundary blocks [K, F, nb, nb] (subdomain-boundary part of
    the local energy product; local all-Dirichlet boundary info,
    ``discretize_elliptic_block_swipdg.py:537-539,657-660``)."""
    n = jnp.asarray(tab.normal, dtype)
    w = jnp.asarray(tab.w, dtype)
    ell = tab.length
    phi = jnp.asarray(tab.phi_m, dtype)
    lam = lam_fn(jnp.asarray(x_m_eval, dtype)).astype(dtype)
    if kappa_fn is None:
        delta = jnp.ones_like(lam)
    else:
        kap = kappa_fn(jnp.asarray(x_m_eval, dtype)).astype(dtype)
        delta = jnp.einsum("...ab,a,b->...", kap, n, n)
    pen = ipdg.sigma_boundary(order) * delta * lam / tab.pen_len ** ipdg.beta
    return ell * jnp.einsum("q,kfq,qi,qj->kfij", w, pen, phi, phi)
