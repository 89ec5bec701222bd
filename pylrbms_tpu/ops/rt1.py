"""RT1 (first-order Raviart-Thomas) flux space for P2 SWIPDG estimation.

The reference's estimator pipeline is P1/RT0-only (its P2 space is used
solely as EOC reference, ``/root/reference/python/dune/pylrbms/
discretize_elliptic_swipdg.py:26-71``; no order-2 flux reconstruction exists
in dune-gdt's pylrbms surface).  This module extends the framework beyond
the reference: the full OS2015/RS2017 a-posteriori machinery at polynomial
order 2, with the Ern/Vohralik degree-matched flux reconstruction in
RT1 (edge moments against P1(e) of the SWIPDG numerical flux + interior
moments of -lambda kappa grad(u) against (P0)^2).

Design mirrors the RT0 machinery (``spaces.rt_cell_tab`` /
``fluxreco.FluxReconstructor`` / ``products.df_*``): everything is a
batched, cell-invariant tabulation contracted with einsums.

RT1 on a triangle T:  t(x) = p(x) + x q(x), p in (P1)^2, q in P1-homog;
dim = 8.  Dofs (family-normal convention, like RT0):
  * per edge e (family parametrization tau in [0,1], family normal n):
      m0 = int_e t.n ds,   m1 = int_e t.n (2 tau - 1) ds
  * per triangle:  mi = int_T t.e_i dx,  i = 0, 1.
t.n on an edge is linear in tau (x.n is constant along the edge), so the
two edge moments pin the trace exactly -> the global space is
H(div)-conforming, and div t = const + 3 q(x) is elementwise linear.

Local dof layout per subdomain: edge dofs first (local RT0 edge e ->
dofs 2e, 2e+1), then n_int interior dofs per element
(2*N_rt + n_int*((cy*s+cx)*T+t) + i).  Global layout likewise: doubled RT0
edge layout (D, V, H flat order of ``spaces.rt_local_to_global``)
followed by n_int dofs per global element.

All three grid families are tabulated: 'tri' (A/B element types),
'crisscross' (A/B/C/E, parity-gathered per-cell tables), and 'quad'
(rectangle RT_[1] = Q_{2,1} x Q_{1,2}, dim 12: 2 moments per edge + 4
interior moments against grad(Q1); div in Q_{1,1}, exactly interpolated
by the Q2 nodal basis).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces import BlockDGSpace
from . import assembly as asm


NB_RT1 = 8    # dofs per triangle (RT1 simplex)
NB_RT1Q = 12  # dofs per rectangle (RT_[1] = Q_{2,1} x Q_{1,2})


def _n_int(space) -> int:
    """Interior dofs per element: 2 on triangles ((P0)^2 moments), 4 on
    rectangles (Q_{0,1} x Q_{1,0} moments)."""
    return 4 if space.grid.grid_type == "quad" else 2


def nb_rt1(space) -> int:
    return NB_RT1Q if space.grid.grid_type == "quad" else NB_RT1


# ---------------------------------------------------------------------------
# coefficient basis of RT1 in physical cell-local coords
# ---------------------------------------------------------------------------
def _coeff_basis_vals(x):
    """x [..., 2] -> [..., 8, 2] values of the RT1 coefficient basis
    V = [(1,0),(x,0),(y,0),(0,1),(0,x),(0,y),(x^2,xy),(xy,y^2)]."""
    xs, ys = x[..., 0], x[..., 1]
    z = np.zeros_like(xs)
    o = np.ones_like(xs)
    V = np.stack([
        np.stack([o, z], -1),
        np.stack([xs, z], -1),
        np.stack([ys, z], -1),
        np.stack([z, o], -1),
        np.stack([z, xs], -1),
        np.stack([z, ys], -1),
        np.stack([xs * xs, xs * ys], -1),
        np.stack([xs * ys, ys * ys], -1),
    ], axis=-2)
    return V


def _coeff_basis_div(x):
    """x [..., 2] -> [..., 8] divergences of the coefficient basis."""
    xs, ys = x[..., 0], x[..., 1]
    z = np.zeros_like(xs)
    o = np.ones_like(xs)
    return np.stack([z, o, z, z, z, o, 3 * xs, 3 * ys], axis=-1)


def _coeff_basis_vals_q(x):
    """Rectangle RT_[1] coefficient basis at x [..., 2] -> [..., 12, 2]:
    comp-x spans Q_{2,1} = {1,x,y,xy,x^2,x^2 y}, comp-y spans
    Q_{1,2} = {1,x,y,xy,y^2,x y^2}."""
    xs, ys = x[..., 0], x[..., 1]
    z = np.zeros_like(xs)
    o = np.ones_like(xs)
    cx = [o, xs, ys, xs * ys, xs * xs, xs * xs * ys]
    cy = [o, xs, ys, xs * ys, ys * ys, xs * ys * ys]
    V = ([np.stack([c, z], -1) for c in cx]
         + [np.stack([z, c], -1) for c in cy])
    return np.stack(V, axis=-2)


def _coeff_basis_div_q(x):
    """[..., 12] divergences of the rectangle coefficient basis."""
    xs, ys = x[..., 0], x[..., 1]
    z = np.zeros_like(xs)
    o = np.ones_like(xs)
    dx = [z, o, z, ys, 2 * xs, 2 * xs * ys]
    dy = [z, z, o, xs, 2 * ys, 2 * xs * ys]
    return np.stack(dx + dy, axis=-1)


def _int_test_basis_q(space, x):
    """Interior test fields on the rectangle at x [..., 2] -> [..., 4, 2]:
    r = (1,0), (ybar,0), (0,1), (0,xbar) with centered xbar = 2x/hx - 1,
    ybar = 2y/hy - 1 — the span of grad(Q1), which is what the jump
    lifting needs (see FluxReconstructorRT1._extra_parts)."""
    xb = 2 * x[..., 0] / space.hx - 1
    yb = 2 * x[..., 1] / space.hy - 1
    z = np.zeros_like(xb)
    o = np.ones_like(xb)
    return np.stack([np.stack([o, z], -1), np.stack([yb, z], -1),
                     np.stack([z, o], -1), np.stack([z, xb], -1)], axis=-2)


# ---------------------------------------------------------------------------
# per-element moment matrices and dual-basis tabulation
# ---------------------------------------------------------------------------
def _tri_edge_slots(space: BlockDGSpace):
    """Per element family t in {A, B}: list of 3 (EdgeGeom, normal, length)
    in the RT0 incidence slot order of :meth:`BlockDGSpace.tri_face_dofs`
    (A: bottom H, right V, diag D;  B: left V, top H, diag D)."""
    from .. import basis as B
    slot_fams = {"A": ("H", "V", "D"), "B": ("V", "H", "D")}
    out = {}
    for name in ("A", "B"):
        slots = []
        for fam in slot_fams[name]:
            (tm, em), (tp, ep) = B.EDGES_UNIT[fam]
            geom = em if tm == name else ep
            tab = space.face_tabs[fam]
            slots.append((geom, np.asarray(tab.normal), float(tab.length)))
        out[name] = slots
    return out


def _cc_edge_slots(space: BlockDGSpace):
    """Crisscross: per element type in {A, B, C, E}, slot k = LOCAL edge k
    (the cc incidence order of :meth:`BlockDGSpace.cc_face_dofs`):
    (EdgeGeom, family normal, length).  The boundary-side parametrizations
    of ``basis.CC_BOUNDARY_EDGES_UNIT`` coincide with the interior-family
    ones per element edge, so one table serves both."""
    from .. import basis as B
    out = {name: [None] * 3 for name in ("A", "B", "C", "E")}
    for fam, ((tm, em), (tp, ep)) in B.CC_EDGES_UNIT.items():
        km, kp = B.CC_FACE_LOCAL_EDGE[fam]
        tab = space.face_tabs[fam]
        n, ell = np.asarray(tab.normal), float(tab.length)
        out[tm][km] = (em, n, ell)
        out[tp][kp] = (ep, n, ell)
    assert all(all(s is not None for s in v) for v in out.values())
    return out


def _moment_dual(space, slots, qp_unit, vol_w):
    """Moment matrix -> (Minv, chi [nq, 8, 2], div [nq, 8]) for one element
    type with unit-cell quadrature ``qp_unit`` [nq, 2], weights ``vol_w``."""
    from ..quadrature import edge_rule
    scale = np.array([space.hx, space.hy])
    area = space.hx * space.hy
    tau, wf = edge_rule(space._face_quad)
    M = np.zeros((NB_RT1, NB_RT1))
    for k, (geom, n, ell) in enumerate(slots):
        xe = geom.points(tau) * scale
        Vn = _coeff_basis_vals(xe) @ n
        M[2 * k] = ell * np.einsum("q,qc->c", wf, Vn)
        M[2 * k + 1] = ell * np.einsum("q,q,qc->c", wf, 2 * tau - 1, Vn)
    qp_phys = qp_unit * scale
    Vq = _coeff_basis_vals(qp_phys)                      # [nq, 8, 2]
    M[6] = area * np.einsum("q,qc->c", vol_w, Vq[..., 0])
    M[7] = area * np.einsum("q,qc->c", vol_w, Vq[..., 1])
    Minv = np.linalg.inv(M)
    chi = np.einsum("qca,cj->qja", Vq, Minv)
    div = np.einsum("qc,cj->qj", _coeff_basis_div(qp_phys), Minv)
    return Minv, chi, div


def _quad_edge_slots(space: BlockDGSpace):
    """Rectangle: 4 slots in the quad_face_dofs order [left V, right V,
    bottom H, top H] — (EdgeGeom, family normal, length).  Left/bottom are
    the PLUS side of their family, right/top the MINUS side; boundary
    parametrizations coincide per edge."""
    from .. import basis as B
    (vm_t, vm_e), (vp_t, vp_e) = B.QUAD_EDGES_UNIT["V"]
    (hm_t, hm_e), (hp_t, hp_e) = B.QUAD_EDGES_UNIT["H"]
    nV, lV = np.asarray(space.face_tabs["V"].normal), float(space.face_tabs["V"].length)
    nH, lH = np.asarray(space.face_tabs["H"].normal), float(space.face_tabs["H"].length)
    return [(vp_e, nV, lV), (vm_e, nV, lV), (hp_e, nH, lH), (hm_e, nH, lH)]


def _moment_dual_q(space, qp_unit, vol_w):
    """Rectangle RT_[1] moment-dual basis:
    (Minv [12, 12], chi [nq, 12, 2], div [nq, 12])."""
    from ..quadrature import edge_rule
    scale = np.array([space.hx, space.hy])
    area = space.hx * space.hy
    tau, wf = edge_rule(space._face_quad)
    M = np.zeros((NB_RT1Q, NB_RT1Q))
    for k, (geom, n, ell) in enumerate(_quad_edge_slots(space)):
        xe = geom.points(tau) * scale
        Vn = _coeff_basis_vals_q(xe) @ n
        M[2 * k] = ell * np.einsum("q,qc->c", wf, Vn)
        M[2 * k + 1] = ell * np.einsum("q,q,qc->c", wf, 2 * tau - 1, Vn)
    qp_phys = qp_unit * scale
    Vq = _coeff_basis_vals_q(qp_phys)                    # [nq, 12, 2]
    R = _int_test_basis_q(space, qp_phys)                # [nq, 4, 2]
    for j in range(4):
        M[8 + j] = area * np.einsum("q,qca,qa->c", vol_w, Vq, R[:, j])
    Minv = np.linalg.inv(M)
    chi = np.einsum("qca,cj->qja", Vq, Minv)
    div = np.einsum("qc,cj->qj", _coeff_basis_div_q(qp_phys), Minv)
    return Minv, chi, div


def rt1_cell_tab(space: BlockDGSpace):
    """(chi1 [T, nq, 8, 2], idx1 [s, s, T, 8], div1 [T, nq, 8]).

    ``chi1``/``div1`` are the values/divergences of the 8 moment-dual RT1
    basis functions at the volume quadrature points (physical, cell-local;
    family-normal dof convention — t = sum_j c_j chi1_j with c_j the global
    family dofs restricted to the element, no extra signs).
    Cached on the space.
    """
    tab = getattr(space, "_rt1_tab", None)
    if tab is not None:
        return tab
    gt = space.grid.grid_type
    s, T = space.s, space.T
    if gt == "quad":
        # rectangle RT_[1]: one element type, 4 edge slots + 4 interior
        Minv, chi, div = _moment_dual_q(space, space.vol_qp[0], space.vol_w[0])
        chi1 = chi[None]                                 # [1, nq, 12, 2]
        div1 = div[None]                                 # [1, nq, 12]
        space._rt1_minv = Minv[None]
        idx0 = space.quad_face_dofs()                    # [s, s, 1, 4]
        idx1 = np.zeros((s, s, T, NB_RT1Q), dtype=np.int64)
        for k in range(4):
            idx1[..., 2 * k] = 2 * idx0[..., k]
            idx1[..., 2 * k + 1] = 2 * idx0[..., k] + 1
        cy, cx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        elem = (cy * s + cx)[:, :, None] * T + np.arange(T)[None, None, :]
        for j in range(4):
            idx1[..., 8 + j] = 2 * space.N_rt + 4 * elem + j
        space._rt1_tab = (chi1, idx1, div1)
        return space._rt1_tab
    if gt == "tri":
        slots = _tri_edge_slots(space)
        Minvs, chis, divs = [], [], []
        for ti, name in enumerate(("A", "B")):
            Minv, chi, div = _moment_dual(space, slots[name],
                                          space.vol_qp[ti], space.vol_w[ti])
            Minvs.append(Minv)
            chis.append(chi)
            divs.append(div)
        chi1 = np.stack(chis)                            # [T, nq, 8, 2]
        div1 = np.stack(divs)                            # [T, nq, 8]
        space._rt1_minv = np.stack(Minvs)
        idx0, _sign, _opp = space.tri_face_dofs()        # [s, s, T, 3]
    else:
        # crisscross: 4 element types on the parity checkerboard; per-cell
        # tables gathered by parity (same layout rule as the space's own
        # volume tables, spaces._tabulate_crisscross)
        from ..quadrature import triangle_rule_unit_cell
        from ..ops.spaces import CC_ELEMS
        slots = _cc_edge_slots(space)
        chi_p, div_p, minv_p = [], [], []
        for elems in CC_ELEMS:                           # parity 0, 1
            cs, ds, ms = [], [], []
            for el in elems:                             # t = 0, 1
                qp, w = triangle_rule_unit_cell(el, space._vol_quad)
                Minv, chi, div = _moment_dual(space, slots[el], qp, w)
                cs.append(chi)
                ds.append(div)
                ms.append(Minv)
            chi_p.append(np.stack(cs))                   # [T, nq, 8, 2]
            div_p.append(np.stack(ds))
            minv_p.append(np.stack(ms))
        par = space.cell_parity
        chi1 = np.stack(chi_p)[par]                      # [s, s, T, nq, 8, 2]
        div1 = np.stack(div_p)[par]                      # [s, s, T, nq, 8]
        space._rt1_minv = np.stack(minv_p)               # [2, T, 8, 8]
        idx0, _sign, _opp = space.cc_face_dofs()         # [s, s, T, 3]

    idx1 = np.zeros((s, s, T, NB_RT1), dtype=np.int64)
    for k in range(3):
        idx1[..., 2 * k] = 2 * idx0[..., k]
        idx1[..., 2 * k + 1] = 2 * idx0[..., k] + 1
    cy, cx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    elem = (cy * s + cx)[:, :, None] * T + np.arange(T)[None, None, :]
    idx1[..., 6] = 2 * space.N_rt + 2 * elem
    idx1[..., 7] = 2 * space.N_rt + 2 * elem + 1
    space._rt1_tab = (chi1, idx1, div1)
    return space._rt1_tab


def N_rt1(space: BlockDGSpace) -> int:
    return 2 * space.N_rt + _n_int(space) * space.s * space.s * space.T


def N_rt1_global(space: BlockDGSpace) -> int:
    g = space.grid
    return (2 * space.N_rt_global
            + _n_int(space) * g.global_ny * g.global_nx * space.T)


def rt1_local_to_global(space: BlockDGSpace) -> np.ndarray:
    """[K, N_rt1] flat indices into the flattened global RT1 vector."""
    g = space.grid
    s, T = space.s, space.T
    Sy, Sx = g.global_ny, g.global_nx
    l2g0 = space.rt_local_to_global()                    # [K, N_rt] edges
    out = np.zeros((space.K, N_rt1(space)), dtype=np.int64)
    out[:, 0:2 * space.N_rt:2] = 2 * l2g0
    out[:, 1:2 * space.N_rt:2] = 2 * l2g0 + 1
    off = 2 * space.N_rt_global
    ni = _n_int(space)
    cy, cx, tt = np.meshgrid(np.arange(s), np.arange(s), np.arange(T),
                             indexing="ij")
    loc = 2 * space.N_rt + ni * ((cy * s + cx) * T + tt)
    for ii in range(space.K):
        sx, sy = g.subdomain_coords(ii)
        ge = ((sy * s + cy) * Sx + (sx * s + cx)) * T + tt
        for j in range(ni):
            out[ii, loc.ravel() + j] = (off + ni * ge).ravel() + j
    return out


# ---------------------------------------------------------------------------
# products over RT1 (signatures mirror products.df_bb / df_ab /
# divergence_matrix; dispatched there by space.order)
# ---------------------------------------------------------------------------
def df_bb_rt1(space: BlockDGSpace, lam_hat, kappa_fn=None, dtype=jnp.float64):
    """[K, N_rt1, N_rt1]: int t . (lam_hat kappa)^{-1} s over the subdomain."""
    from .products import _kinv_fn
    chi, idx, _div = rt1_cell_tab(space)
    nf = idx.shape[-1]
    kinv = _kinv_fn(lam_hat, kappa_fn)
    xq = jnp.asarray(asm._vol_points(space), dtype)
    Ki = kinv(xq).astype(dtype)
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
    A = jnp.zeros((K, N_rt1(space), N_rt1(space)), dtype)
    return asm.scatter_blocks(A, blocks, rows, rows)


def df_ab_rt1(space: BlockDGSpace, lam_v, lam_hat, kappa_fn=None,
              dtype=jnp.float64):
    """[K, N, N_rt1]: int (lam_v / lam_hat) grad(phi_i) . chi1_e."""
    chi, idx, _div = rt1_cell_tab(space)
    nf = idx.shape[-1]
    xq = jnp.asarray(asm._vol_points(space), dtype)
    wgt = (lam_v(xq) / lam_hat(xq)).astype(dtype)
    w = jnp.asarray(space.vol_w, dtype)
    dphi = jnp.asarray(space.vol_dphi, dtype)
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
    A = jnp.zeros((K, space.N, N_rt1(space)), dtype)
    return asm.scatter_blocks(A, blocks, rows, cols)


def divergence_matrix_rt1(space: BlockDGSpace, dtype=jnp.float64):
    """[N, N_rt1]: RT1 coeffs -> DG nodal coeffs of div t (exact: div t is
    elementwise linear, the order-2 nodal basis interpolates it exactly)."""
    rt1_cell_tab(space)                                  # ensure Minv cached
    _chi, idx, _div = space._rt1_tab
    nf = idx.shape[-1]
    scale = np.array([space.hx, space.hy])
    F = space.s * space.s * space.T
    if space.percell:                                    # crisscross
        Minv_cell = space._rt1_minv[space.cell_parity]   # [s, s, T, 8, 8]
        nodes_phys = space.nodes_unit * scale            # [s, s, T, nb, 2]
        div_nodal = np.einsum("yxtic,yxtcj->yxtij",
                              _coeff_basis_div(nodes_phys), Minv_cell)
        blocks = jnp.asarray(div_nodal, dtype).reshape(F, space.nb, nf)
    else:
        Minv = space._rt1_minv                           # [T, nf, nf]
        nodes_phys = space.nodes_unit * scale            # [T, nb, 2]
        divf = (_coeff_basis_div_q if space.grid.grid_type == "quad"
                else _coeff_basis_div)
        div_nodal = np.einsum("tic,tcj->tij", divf(nodes_phys), Minv)
        blocks = jnp.broadcast_to(
            jnp.asarray(div_nodal, dtype)[None],
            (space.s * space.s, space.T, space.nb, nf)).reshape(F, space.nb, nf)
    rows = np.arange(space.N, dtype=np.int64).reshape(F, space.nb)
    cols = idx.reshape(F, nf)
    A = jnp.zeros((space.N, N_rt1(space)), dtype)
    return A.at[rows[:, :, None], cols[:, None, :]].add(blocks)


def rt_tab_any_order(space: BlockDGSpace):
    """(chi [T, nq, nf, 2], idx, div_q [T, nq, nf], n_rt_local): the RT cell
    tabulation for the space's matching flux order (RT0 for P1/Q1, RT1 for
    P2), with the divergence uniformly given AT the quadrature points."""
    if space.order == 1:
        chi, idx, div = space.rt_cell_tab()
        nq = chi.shape[-3]
        if space.percell:                                # div [s, s, T, nf]
            div_q = np.broadcast_to(div[..., None, :],
                                    div.shape[:-1] + (nq, div.shape[-1]))
        else:                                            # div [T, nf]
            div_q = np.broadcast_to(div[:, None, :],
                                    (div.shape[0], nq, div.shape[1]))
        return chi, idx, div_q, space.N_rt
    chi, idx, div_q = rt1_cell_tab(space)
    return chi, idx, div_q, N_rt1(space)


# ---------------------------------------------------------------------------
# RT1 flux reconstruction (Ern/Vohralik degree-matched prescription)
# ---------------------------------------------------------------------------
from .fluxreco import FluxReconstructor
from .assembly import IPDGParams, DEFAULT_IPDG


class FluxReconstructorRT1(FluxReconstructor):
    """t_q in RT1 from a P2 DG u: per face the TWO moments of the SWIPDG
    numerical flux (-{lam kappa grad u}_omega . n + penalty [u]) against
    {1, 2 tau - 1}, plus per element the two interior moments of
    -lam kappa grad(u) against (P0)^2.  Same face integrand code as RT0
    (the moment weights and dof layout are the only differences)."""

    nm = 2
    required_order = 2

    def __init__(self, space: BlockDGSpace, kappa_fn=None,
                 ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64):
        super().__init__(space, kappa_fn, ipdg, dtype)
        rt1_cell_tab(space)

    def _make_l2g(self, space):
        return jnp.asarray(rt1_local_to_global(space))

    def _edge_moments(self, w, integrand, ell):
        tau = jnp.asarray(self.space.face_t, integrand.dtype)
        wj = jnp.asarray(w, integrand.dtype)
        W = jnp.stack([wj, wj * (2 * tau - 1)])              # [2, nqf]
        return ell * jnp.einsum("mq,...fq->...fm", W, integrand)

    # -- SIPG jump lifting helpers -------------------------------------
    def _lift_inner(self, lam_fn, tab, x_m, x_p, u_m, u_p, R_m=None, R_p=None):
        """(corr_minus, corr_plus) [..., F, n_int]: the per-side lifting
        omega_T int_e lam_T [u] (kappa_T r_j)·n_e ds (family normal/jump).

        On triangles the interior test fields r are the constants e_0, e_1
        (R_m/R_p None); on rectangles they vary along the edge and are
        passed as R_m/R_p [nqf, n_int, 2] (cell-local per side)."""
        dt = self.dtype
        n = jnp.asarray(tab.normal, dt)
        wq = jnp.asarray(tab.w, dt)
        ell = tab.length
        uv_m = jnp.einsum("...fj,qj->...fq", u_m, jnp.asarray(tab.phi_m, dt))
        uv_p = jnp.einsum("...fj,qj->...fq", u_p, jnp.asarray(tab.phi_p, dt))
        jump = uv_m - uv_p
        lam_m = lam_fn(x_m).astype(dt)
        lam_p = lam_fn(x_p).astype(dt)
        if self.kappa_fn is None:
            om_lam_m, om_lam_p = 0.5 * lam_m, 0.5 * lam_p
            if R_m is None:
                cm = ell * jnp.einsum("q,...fq,a->...fa", wq, om_lam_m * jump, n)
                cp = ell * jnp.einsum("q,...fq,a->...fa", wq, om_lam_p * jump, n)
            else:
                Rn_m = jnp.asarray(R_m, dt) @ n              # [nqf, n_int]
                Rn_p = jnp.asarray(R_p, dt) @ n
                cm = ell * jnp.einsum("q,...fq,qj->...fj", wq, om_lam_m * jump, Rn_m)
                cp = ell * jnp.einsum("q,...fq,qj->...fj", wq, om_lam_p * jump, Rn_p)
        else:
            kap_m = self.kappa_fn(x_m).astype(dt)            # [F, nqf, 2, 2]
            kap_p = self.kappa_fn(x_p).astype(dt)
            delta_m = jnp.einsum("...ab,a,b->...", kap_m, n, n)
            delta_p = jnp.einsum("...ab,a,b->...", kap_p, n, n)
            ssum = delta_m + delta_p
            nz = ssum != 0
            om_m = jnp.where(nz, delta_p / jnp.where(nz, ssum, 1.0), 0.5)
            om_p = jnp.where(nz, delta_m / jnp.where(nz, ssum, 1.0), 0.5)
            kn_m = jnp.einsum("...ab,b->...a", kap_m, n)     # [F, nqf, 2]
            kn_p = jnp.einsum("...ab,b->...a", kap_p, n)
            if R_m is None:
                cm = ell * jnp.einsum("q,...fq,fqa->...fa", wq,
                                      om_m * lam_m * jump, kn_m)
                cp = ell * jnp.einsum("q,...fq,fqa->...fa", wq,
                                      om_p * lam_p * jump, kn_p)
            else:
                Rn_m = jnp.einsum("qja,fqa->fqj", jnp.asarray(R_m, dt), kn_m)
                Rn_p = jnp.einsum("qja,fqa->fqj", jnp.asarray(R_p, dt), kn_p)
                cm = ell * jnp.einsum("q,...fq,fqj->...fj", wq,
                                      om_m * lam_m * jump, Rn_m)
                cp = ell * jnp.einsum("q,...fq,fqj->...fj", wq,
                                      om_p * lam_p * jump, Rn_p)
        return cm, cp

    def _lift_boundary(self, lam_fn, tab, x, u, R=None):
        """[..., F, n_int]: full-weight boundary lifting int_e lam u
        (kappa r_j)·n_out ds ([u] = u, g = 0 all-Dirichlet)."""
        dt = self.dtype
        n_out = jnp.asarray(tab.normal, dt)
        wq = jnp.asarray(tab.w, dt)
        uv = jnp.einsum("...fj,qj->...fq", u, jnp.asarray(tab.phi_m, dt))
        lam = lam_fn(x).astype(dt)
        if self.kappa_fn is None:
            if R is None:
                return tab.length * jnp.einsum("q,...fq,a->...fa", wq,
                                               lam * uv, n_out)
            Rn = jnp.asarray(R, dt) @ n_out
            return tab.length * jnp.einsum("q,...fq,qj->...fj", wq,
                                           lam * uv, Rn)
        kap = self.kappa_fn(x).astype(dt)
        kn = jnp.einsum("...ab,b->...a", kap, n_out)
        if R is None:
            return tab.length * jnp.einsum("q,...fq,fqa->...fa", wq,
                                           lam * uv, kn)
        Rn = jnp.einsum("qja,fqa->fqj", jnp.asarray(R, dt), kn)
        return tab.length * jnp.einsum("q,...fq,fqj->...fj", wq,
                                       lam * uv, Rn)

    def _extra_parts(self, lam_fn, uc, out_dt):
        """Interior moments  m_i = -int_T lam kappa grad(u) . e_i dx
        + the SIPG jump lifting  sum_{e in dT} omega_T int_e lam_T [u]
        (kappa_T n_e)_i ds.

        The lifting cancels the assembled symmetry term
        -int_e {lam kappa grad v}_omega . n [u] when div t is tested with
        v in P1(T) (``assembly.swipdg_face_blocks_inner`` ``Ci`` terms), so
        div t = Pi_1 f up to data oscillation — without it the residual
        indicator loses one order (measured: ||f - div t|| = O(h) instead
        of O(h^2)).  <-> the theta-weighted lifting of Ern/Vohralik's
        degree-k flux equilibration for symmetric weighted IP.
        """
        sp = self.space
        dt = self.dtype
        lead = uc.shape[:-4]
        Sy, Sx = self.Sy, self.Sx
        scale = np.array([sp.hx, sp.hy])
        org = jnp.asarray(self.cell_org, dt)                 # [Sy, Sx, 2]
        g = sp.grid
        area = sp.hx * sp.hy
        if g.grid_type == "quad":
            qp = jnp.asarray(sp.vol_qp * scale, dt)          # [1, nq, 2]
            xq = org[:, :, None, None, :] + qp[None, None]   # [Sy,Sx,1,nq,2]
            w = jnp.asarray(sp.vol_w, dt)
            dphi = jnp.asarray(sp.vol_dphi, dt)              # [1, nq, nb, 2]
            gu = jnp.einsum("...yxtj,tqja->...yxtqa", uc, dphi)
            lam = lam_fn(xq).astype(dt)
            if self.kappa_fn is not None:
                kap = self.kappa_fn(xq).astype(dt)
                gu = jnp.einsum("yxtqab,...yxtqb->...yxtqa", kap, gu)
            R = jnp.asarray(_int_test_basis_q(sp, sp.vol_qp[0] * scale), dt)
            m = -area * jnp.einsum("tq,yxtq,...yxtqa,qja->...yxtj",
                                   w, lam, gu, R)
            m = m + self._lift_quad(lam_fn, uc, m.dtype)
            return [m.reshape(lead + (-1,)).astype(out_dt)]
        if sp.percell:
            # global per-cell tables: tile the subdomain-parity tables over
            # the (ky, kx) subdomain grid (s is even, so parity lines up)
            qp_u = np.tile(sp.vol_qp, (g.ky, g.kx, 1, 1, 1))
            w_u = np.tile(sp.vol_w, (g.ky, g.kx, 1, 1))
            dphi_u = np.tile(sp.vol_dphi, (g.ky, g.kx, 1, 1, 1, 1))
            qp = jnp.asarray(qp_u * scale, dt)               # [Sy,Sx,T,nq,2]
            xq = org[:, :, None, None, :] + qp
            w = jnp.asarray(w_u, dt)
            dphi = jnp.asarray(dphi_u, dt)                   # [Sy,Sx,T,nq,nb,2]
            gu = jnp.einsum("...yxtj,yxtqja->...yxtqa", uc, dphi)
            lam = lam_fn(xq).astype(dt)
            if self.kappa_fn is not None:
                kap = self.kappa_fn(xq).astype(dt)
                gu = jnp.einsum("yxtqab,...yxtqb->...yxtqa", kap, gu)
            area = sp.hx * sp.hy
            m = -area * jnp.einsum("yxtq,yxtq,...yxtqa->...yxta", w, lam, gu)
            m = m + self._lift_cc(lam_fn, uc, m.dtype)
        else:
            qp = jnp.asarray(sp.vol_qp * scale, dt)          # [T, nq, 2]
            xq = org[:, :, None, None, :] + qp[None, None]   # [Sy,Sx,T,nq,2]
            w = jnp.asarray(sp.vol_w, dt)
            dphi = jnp.asarray(sp.vol_dphi, dt)              # [T, nq, nb, 2]
            gu = jnp.einsum("...yxtj,tqja->...yxtqa", uc, dphi)
            lam = lam_fn(xq).astype(dt)
            if self.kappa_fn is not None:
                kap = self.kappa_fn(xq).astype(dt)
                gu = jnp.einsum("yxtqab,...yxtqb->...yxtqa", kap, gu)
            area = sp.hx * sp.hy
            m = -area * jnp.einsum("tq,yxtq,...yxtqa->...yxta", w, lam, gu)
            m = m + self._lift_tri(lam_fn, uc, m.dtype)
        return [m.reshape(lead + (-1,)).astype(out_dt)]

    def _lift_tri(self, lam_fn, uc, mdt):
        sp = self.space
        lead = uc.shape[:-4]
        Sy, Sx = self.Sy, self.Sx
        corr = jnp.zeros(lead + (Sy, Sx, sp.T, 2), mdt)
        org_np = self.cell_org

        # D: minus = (cell, A), plus = (cell, B)
        tab = sp.face_tabs["D"]
        x_m, x_p = self._phys_pts(tab, org_np.reshape(-1, 2))
        cm, cp = self._lift_inner(
            lam_fn, tab, x_m, x_p,
            uc[..., tab.tri_m, :].reshape(lead + (Sy * Sx, sp.nb)),
            uc[..., tab.tri_p, :].reshape(lead + (Sy * Sx, sp.nb)))
        corr = corr.at[..., tab.tri_m, :].add(cm.reshape(lead + (Sy, Sx, 2)))
        corr = corr.at[..., tab.tri_p, :].add(cp.reshape(lead + (Sy, Sx, 2)))

        # V: minus = (cy, cx, A), plus = (cy, cx+1, B)
        if Sx > 1:
            tab = sp.face_tabs["V"]
            x_m, x_p = self._phys_pts(tab, org_np[:, :-1].reshape(-1, 2))
            F = Sy * (Sx - 1)
            cm, cp = self._lift_inner(
                lam_fn, tab, x_m, x_p,
                uc[..., :, :-1, tab.tri_m, :].reshape(lead + (F, sp.nb)),
                uc[..., :, 1:, tab.tri_p, :].reshape(lead + (F, sp.nb)))
            corr = corr.at[..., :, :-1, tab.tri_m, :].add(
                cm.reshape(lead + (Sy, Sx - 1, 2)))
            corr = corr.at[..., :, 1:, tab.tri_p, :].add(
                cp.reshape(lead + (Sy, Sx - 1, 2)))

        # H: minus = (cy, cx, B), plus = (cy+1, cx, A)
        if Sy > 1:
            tab = sp.face_tabs["H"]
            x_m, x_p = self._phys_pts(tab, org_np[:-1, :].reshape(-1, 2))
            F = (Sy - 1) * Sx
            cm, cp = self._lift_inner(
                lam_fn, tab, x_m, x_p,
                uc[..., :-1, :, tab.tri_m, :].reshape(lead + (F, sp.nb)),
                uc[..., 1:, :, tab.tri_p, :].reshape(lead + (F, sp.nb)))
            corr = corr.at[..., :-1, :, tab.tri_m, :].add(
                cm.reshape(lead + (Sy - 1, Sx, 2)))
            corr = corr.at[..., 1:, :, tab.tri_p, :].add(
                cp.reshape(lead + (Sy - 1, Sx, 2)))

        # boundary sides
        for side, sel in (
                ("left", lambda tb: (org_np[:, 0], uc[..., :, 0, tb.tri_m, :],
                                     (slice(None), 0))),
                ("right", lambda tb: (org_np[:, Sx - 1],
                                      uc[..., :, Sx - 1, tb.tri_m, :],
                                      (slice(None), Sx - 1))),
                ("bottom", lambda tb: (org_np[0, :], uc[..., 0, :, tb.tri_m, :],
                                       (0, slice(None)))),
                ("top", lambda tb: (org_np[Sy - 1, :],
                                    uc[..., Sy - 1, :, tb.tri_m, :],
                                    (Sy - 1, slice(None))))):
            tb = sp.face_tabs["bnd_" + side]
            orgs, u, pos = sel(tb)
            x, _ = self._phys_pts(tb, orgs.reshape(-1, 2))
            Fb = orgs.reshape(-1, 2).shape[0]
            c = self._lift_boundary(lam_fn, tb, x,
                                    u.reshape(lead + (Fb, sp.nb)))
            corr = corr.at[(Ellipsis,) + pos + (tb.tri_m, slice(None))].add(c)
        return corr

    def _lift_cc(self, lam_fn, uc, mdt):
        """Crisscross jump lifting: 6 parity-split interior families +
        per-parity boundary groups (same face enumeration as
        ``FluxReconstructor._apply_global_cc``)."""
        sp = self.space
        lead = uc.shape[:-4]
        Sy, Sx = self.Sy, self.Sx
        corr = jnp.zeros(lead + (Sy, Sx, sp.T, 2), mdt)
        org = self.cell_org
        gy, gx = np.meshgrid(np.arange(Sy), np.arange(Sx), indexing="ij")
        P = (gy + gx) % 2

        def u_at(cy, cx, t):
            return uc[..., cy, cx, t, :]

        for p in (0, 1):
            cy, cx = np.nonzero(P == p)
            tab = sp.face_tabs[f"D{p}"]
            x_m, x_p = self._phys_pts(tab, org[cy, cx])
            cm, cp = self._lift_inner(lam_fn, tab, x_m, x_p,
                                      u_at(cy, cx, tab.tri_m),
                                      u_at(cy, cx, tab.tri_p))
            corr = corr.at[..., cy, cx, tab.tri_m, :].add(cm)
            corr = corr.at[..., cy, cx, tab.tri_p, :].add(cp)

            cy, cx = np.nonzero((P == p) & (gx < Sx - 1))
            if cy.size:
                tab = sp.face_tabs[f"V{p}"]
                x_m, x_p = self._phys_pts(tab, org[cy, cx])
                cm, cp = self._lift_inner(lam_fn, tab, x_m, x_p,
                                          u_at(cy, cx, tab.tri_m),
                                          u_at(cy, cx + 1, tab.tri_p))
                corr = corr.at[..., cy, cx, tab.tri_m, :].add(cm)
                corr = corr.at[..., cy, cx + 1, tab.tri_p, :].add(cp)

            cy, cx = np.nonzero((P == p) & (gy < Sy - 1))
            if cy.size:
                tab = sp.face_tabs[f"H{p}"]
                x_m, x_p = self._phys_pts(tab, org[cy, cx])
                cm, cp = self._lift_inner(lam_fn, tab, x_m, x_p,
                                          u_at(cy, cx, tab.tri_m),
                                          u_at(cy + 1, cx, tab.tri_p))
                corr = corr.at[..., cy, cx, tab.tri_m, :].add(cm)
                corr = corr.at[..., cy + 1, cx, tab.tri_p, :].add(cp)

        for side, cells in (
                ("left", (np.arange(Sy), np.zeros(Sy, np.int64))),
                ("right", (np.arange(Sy), np.full(Sy, Sx - 1, np.int64))),
                ("bottom", (np.zeros(Sx, np.int64), np.arange(Sx))),
                ("top", (np.full(Sx, Sy - 1, np.int64), np.arange(Sx)))):
            cy_all, cx_all = cells
            for p in (0, 1):
                msk = (cy_all + cx_all) % 2 == p
                cys, cxs = cy_all[msk], cx_all[msk]
                if not cys.size:
                    continue
                tab = sp.face_tabs[f"bnd_{side}_p{p}"]
                x, _ = self._phys_pts(tab, org[cys, cxs])
                c = self._lift_boundary(lam_fn, tab, x,
                                        u_at(cys, cxs, tab.tri_m))
                corr = corr.at[..., cys, cxs, tab.tri_m, :].add(c)
        return corr

    def _lift_quad(self, lam_fn, uc, mdt):
        """Rectangle jump lifting: V/H interior families + 4 boundary
        sides, with the interior test fields r (grad Q1 span) evaluated at
        the per-side cell-local edge points."""
        from .. import basis as B
        from ..quadrature import edge_rule
        sp = self.space
        lead = uc.shape[:-4]
        Sy, Sx = self.Sy, self.Sx
        scale = np.array([sp.hx, sp.hy])
        tau, _ = edge_rule(sp._face_quad)
        corr = jnp.zeros(lead + (Sy, Sx, 1, 4), mdt)
        org_np = self.cell_org

        def R_of(geom):
            return _int_test_basis_q(sp, geom.points(tau) * scale)

        # V: minus = (cy, cx) right edge, plus = (cy, cx+1) left edge
        if Sx > 1:
            (_, em), (_, ep) = B.QUAD_EDGES_UNIT["V"]
            tab = sp.face_tabs["V"]
            x_m, x_p = self._phys_pts(tab, org_np[:, :-1].reshape(-1, 2))
            F = Sy * (Sx - 1)
            cm, cp = self._lift_inner(
                lam_fn, tab, x_m, x_p,
                uc[..., :, :-1, 0, :].reshape(lead + (F, sp.nb)),
                uc[..., :, 1:, 0, :].reshape(lead + (F, sp.nb)),
                R_m=R_of(em), R_p=R_of(ep))
            corr = corr.at[..., :, :-1, 0, :].add(
                cm.reshape(lead + (Sy, Sx - 1, 4)))
            corr = corr.at[..., :, 1:, 0, :].add(
                cp.reshape(lead + (Sy, Sx - 1, 4)))

        # H: minus = (cy, cx) top edge, plus = (cy+1, cx) bottom edge
        if Sy > 1:
            (_, em), (_, ep) = B.QUAD_EDGES_UNIT["H"]
            tab = sp.face_tabs["H"]
            x_m, x_p = self._phys_pts(tab, org_np[:-1, :].reshape(-1, 2))
            F = (Sy - 1) * Sx
            cm, cp = self._lift_inner(
                lam_fn, tab, x_m, x_p,
                uc[..., :-1, :, 0, :].reshape(lead + (F, sp.nb)),
                uc[..., 1:, :, 0, :].reshape(lead + (F, sp.nb)),
                R_m=R_of(em), R_p=R_of(ep))
            corr = corr.at[..., :-1, :, 0, :].add(
                cm.reshape(lead + (Sy - 1, Sx, 4)))
            corr = corr.at[..., 1:, :, 0, :].add(
                cp.reshape(lead + (Sy - 1, Sx, 4)))

        for side, sel in (
                ("left", (org_np[:, 0], lambda: uc[..., :, 0, 0, :],
                          (slice(None), 0))),
                ("right", (org_np[:, Sx - 1], lambda: uc[..., :, Sx - 1, 0, :],
                           (slice(None), Sx - 1))),
                ("bottom", (org_np[0, :], lambda: uc[..., 0, :, 0, :],
                            (0, slice(None)))),
                ("top", (org_np[Sy - 1, :], lambda: uc[..., Sy - 1, :, 0, :],
                         (Sy - 1, slice(None))))):
            orgs, uget, pos = sel
            tb = sp.face_tabs["bnd_" + side]
            _, geom = B.QUAD_BOUNDARY_EDGES_UNIT[side]
            x, _2 = self._phys_pts(tb, orgs.reshape(-1, 2))
            Fb = orgs.reshape(-1, 2).shape[0]
            c = self._lift_boundary(lam_fn, tb, x,
                                    uget().reshape(lead + (Fb, sp.nb)),
                                    R=R_of(geom))
            corr = corr.at[(Ellipsis,) + pos + (0, slice(None))].add(c)
        return corr
