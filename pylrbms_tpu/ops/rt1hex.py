"""RT_[1] hex flux space for Q2 SWIPDG estimation in 3D.

3D counterpart of the rectangle RT_[1] machinery in ``ops/rt1.py`` (beyond
the reference, whose estimator pipeline is 2D P1/RT0-only): the tensor
Raviart-Thomas space on boxes

  RT_[1](H) = Q_{2,1,1} x Q_{1,2,1} x Q_{1,1,2},   dim 36,

with the Ern/Vohralik degree-matched moments:

* per face (6 faces, family parametrization (u, v), family normal n):
  the FOUR moments of t.n against Q_{1,1}(face) = {1, 2u-1, 2v-1,
  (2u-1)(2v-1)} — t.n restricted to a face lies in Q_{1,1}(face), so the
  moments pin the trace exactly and the global space is H(div)-conforming;
* per cell: the TWELVE interior moments against the span of grad(Q1(hex))
  = { (q(ybar, zbar), 0, 0) : q in Q_{1,1} } (+ y/z rotations) — exactly
  the 3D analog of the rectangle's grad(Q1) interior fields, which is what
  the SIPG jump lifting needs for a second-order eta_r
  (``FluxReconstructorRT1._extra_parts`` docstring).

div t lies in Q_{1,1,1} and is interpolated EXACTLY by the Q2 nodal basis
(divergence_matrix_rt1hex).  Everything is a cell-invariant tabulation (one
element type on the structured hex grid) contracted with batched einsums —
same design as RT0 (``spaces3d.rt_cell_tab`` / ``fluxreco3d``).

Local dof layout per subdomain: face dofs first (local RT0 face f ->
dofs 4f..4f+3), then 12 interior dofs per cell
(4*N_rt + 12*((cz*s+cy)*s+cx) + j).  Global layout likewise: quadrupled
RT0 face layout (X/Y/Z flat order of ``spaces3d.rt_local_to_global``)
followed by 12 dofs per global cell.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces3d import BlockDGSpace3D, _face_pts_unit
from . import assembly as asm
from . import assembly3d as asm3
from .assembly import IPDGParams, DEFAULT_IPDG
from .fluxreco3d import FluxReconstructor3D
from .rt1 import FluxReconstructorRT1

NB_RT1H = 36   # dofs per hex
N_INT_H = 12   # interior dofs per hex
NM_FACE = 4    # face moments

# coefficient basis: for each component axis, the 12 monomials
# x_axis^a * x_b^eb * x_c^ec with a <= 2, eb, ec <= 1 (b, c the other axes)
_EXPS = []
for _axis in range(3):
    for _a in range(3):
        for _eb in range(2):
            for _ec in range(2):
                e = [0, 0, 0]
                e[_axis] = _a
                e[(_axis + 1) % 3] = _eb
                e[(_axis + 2) % 3] = _ec
                _EXPS.append((_axis, tuple(e)))
assert len(_EXPS) == NB_RT1H


def _pow(xs, e):
    m = np.ones(np.broadcast(*xs).shape)
    for d in range(3):
        if e[d]:
            m = m * xs[d] ** e[d]
    return m


def _coeff_basis_vals_h(x):
    """x [..., 3] -> [..., 36, 3] values of the RT_[1] coefficient basis."""
    xs = (x[..., 0], x[..., 1], x[..., 2])
    V = np.zeros(x.shape[:-1] + (NB_RT1H, 3))
    for ci, (axis, e) in enumerate(_EXPS):
        V[..., ci, axis] = _pow(xs, e)
    return V


def _coeff_basis_div_h(x):
    """x [..., 3] -> [..., 36] divergences of the coefficient basis."""
    xs = (x[..., 0], x[..., 1], x[..., 2])
    D = np.zeros(x.shape[:-1] + (NB_RT1H,))
    for ci, (axis, e) in enumerate(_EXPS):
        if e[axis] == 0:
            continue
        de = list(e)
        de[axis] -= 1
        D[..., ci] = e[axis] * _pow(xs, tuple(de))
    return D


def _int_test_basis_h(space, x):
    """Interior test fields at x [..., 3] -> [..., 12, 3]: for each axis the
    four fields q(bbar, cbar) e_axis with q in {1, bbar, cbar, bbar*cbar}
    and centered coords bbar = 2 x_b / h_b - 1 — the span of grad(Q1)."""
    h = (space.hx, space.hy, space.hz)
    xb = [2 * x[..., d] / h[d] - 1 for d in range(3)]
    R = np.zeros(x.shape[:-1] + (N_INT_H, 3))
    j = 0
    for axis in range(3):
        b, c = (axis + 1) % 3, (axis + 2) % 3
        for q in (np.ones_like(xb[0]), xb[b], xb[c], xb[b] * xb[c]):
            R[..., j, axis] = q
            j += 1
    return R


# face slot order of spaces3d.hex_face_dofs: (xlo, xhi, ylo, yhi, zlo, zhi)
_FACE_SLOTS = (("X", 0.0), ("X", 1.0), ("Y", 0.0), ("Y", 1.0),
               ("Z", 0.0), ("Z", 1.0))


def _face_weights(space):
    """[4, nqf] moment weight functions {1, 2u-1, 2v-1, (2u-1)(2v-1)} times
    the face quadrature weights."""
    uv = space.face_uv
    w = np.asarray(space.face_tabs["X"].w)
    a, b = 2 * uv[:, 0] - 1, 2 * uv[:, 1] - 1
    return np.stack([w, w * a, w * b, w * a * b])


def _moment_dual_h(space):
    """(Minv [36, 36], chi [nq, 36, 3], div [nq, 36]) of the moment-dual
    basis on the (cell-invariant) physical hex."""
    scale = np.array([space.hx, space.hy, space.hz])
    V = space.volume
    W = _face_weights(space)                                  # [4, nqf]
    M = np.zeros((NB_RT1H, NB_RT1H))
    naxis = {"X": np.array([1.0, 0, 0]), "Y": np.array([0, 1.0, 0]),
             "Z": np.array([0, 0, 1.0])}
    for k, (fam, c01) in enumerate(_FACE_SLOTS):
        xe = _face_pts_unit(fam, space.face_uv, c01) * scale  # [nqf, 3]
        area = float(space.face_tabs[fam].length)
        Vn = _coeff_basis_vals_h(xe) @ naxis[fam]             # [nqf, 36]
        M[4 * k:4 * k + 4] = area * np.einsum("mq,qc->mc", W, Vn)
    qp_phys = space.vol_qp * scale
    Vq = _coeff_basis_vals_h(qp_phys)                         # [nq, 36, 3]
    R = _int_test_basis_h(space, qp_phys)                     # [nq, 12, 3]
    M[24:] = V * np.einsum("q,qca,qja->jc", space.vol_w, Vq, R)
    Minv = np.linalg.inv(M)
    chi = np.einsum("qca,cj->qja", Vq, Minv)
    div = np.einsum("qc,cj->qj", _coeff_basis_div_h(qp_phys), Minv)
    return Minv, chi, div


def rt1hex_cell_tab(space: BlockDGSpace3D):
    """(chi [nq, 36, 3], idx [s, s, s, 36], div [nq, 36]); cached."""
    tab = getattr(space, "_rt1h_tab", None)
    if tab is not None:
        return tab
    s = space.s
    Minv, chi, div = _moment_dual_h(space)
    space._rt1h_minv = Minv
    idx0 = space.hex_face_dofs()[..., 0, :]                   # [s, s, s, 6]
    idx1 = np.zeros((s, s, s, NB_RT1H), dtype=np.int64)
    for k in range(6):
        for m in range(NM_FACE):
            idx1[..., 4 * k + m] = 4 * idx0[..., k] + m
    cz, cy, cx = np.meshgrid(np.arange(s), np.arange(s), np.arange(s),
                             indexing="ij")
    elem = (cz * s + cy) * s + cx
    for j in range(N_INT_H):
        idx1[..., 24 + j] = 4 * space.N_rt + N_INT_H * elem + j
    space._rt1h_tab = (chi, idx1, div)
    return space._rt1h_tab


def N_rt1h(space: BlockDGSpace3D) -> int:
    return 4 * space.N_rt + N_INT_H * space.s ** 3


def N_rt1h_global(space: BlockDGSpace3D) -> int:
    g = space.grid
    return (4 * space.N_rt_global
            + N_INT_H * g.global_nz * g.global_ny * g.global_nx)


def rt1hex_local_to_global(space: BlockDGSpace3D) -> np.ndarray:
    """[K, N_rt1h] flat indices into the flattened global RT_[1] vector."""
    g = space.grid
    s = space.s
    Sx, Sy, Sz = g.global_nx, g.global_ny, g.global_nz
    l2g0 = space.rt_local_to_global()                         # [K, N_rt]
    out = np.zeros((space.K, N_rt1h(space)), dtype=np.int64)
    for m in range(NM_FACE):
        out[:, m:4 * space.N_rt:4] = 4 * l2g0 + m
    off = 4 * space.N_rt_global
    cz, cy, cx = np.meshgrid(np.arange(s), np.arange(s), np.arange(s),
                             indexing="ij")
    loc = 4 * space.N_rt + N_INT_H * ((cz * s + cy) * s + cx)
    for ii in range(space.K):
        sx, sy, sz = g.subdomain_coords(ii)
        ge = ((sz * s + cz) * Sy + (sy * s + cy)) * Sx + (sx * s + cx)
        for j in range(N_INT_H):
            out[ii, loc.ravel() + j] = (off + N_INT_H * ge).ravel() + j
    return out


def rt_tab_any_order3(space: BlockDGSpace3D):
    """(chi [nq, nf, 3], idx [s, s, s, nf], div_q [nq, nf], n_rt_local): the
    degree-matched RT hex tabulation (RT0 for Q1, RT_[1] for Q2) with the
    divergence uniformly given at the quadrature points."""
    if space.order == 1:
        chi, idx, div = space.rt_cell_tab()                   # chi [1,nq,6,3]
        nq = chi.shape[1]
        div_q = np.broadcast_to(div[0][None, :], (nq, div.shape[-1]))
        return chi[0], idx[..., 0, :], div_q, space.N_rt
    chi, idx, div = rt1hex_cell_tab(space)
    return chi, idx, div, N_rt1h(space)


# ---------------------------------------------------------------------------
# products over RT_[1] hex (dispatched from ops/products3d.py by space.order)
# ---------------------------------------------------------------------------
def df_bb_rt1hex(space: BlockDGSpace3D, lam_hat, kappa_fn=None,
                 dtype=jnp.float64):
    """[K, N_rt1h, N_rt1h]: int t . (lam_hat kappa)^{-1} s."""
    from .products3d import _kinv_fn
    chi, idx, _div = rt1hex_cell_tab(space)
    nf = idx.shape[-1]
    kinv = _kinv_fn(lam_hat, kappa_fn)
    xq = asm3.vol_points(space, dtype)
    Ki = kinv(xq).astype(dtype)
    w = jnp.asarray(space.vol_w, dtype)
    chi_j = jnp.asarray(chi, dtype)
    blocks = space.volume * jnp.einsum("q,qea,kcqab,qfb->kcef",
                                       w, chi_j, Ki, chi_j)
    K = space.K
    F = space.s ** 3
    rows = idx.reshape(F, nf)
    A = jnp.zeros((K, N_rt1h(space), N_rt1h(space)), dtype)
    return asm.scatter_blocks(A, blocks.reshape(K, F, nf, nf), rows, rows)


def df_ab_rt1hex(space: BlockDGSpace3D, lam_v, lam_hat, kappa_fn=None,
                 dtype=jnp.float64):
    """[K, N, N_rt1h]: int (lam_v / lam_hat) grad(phi_i) . chi_e."""
    chi, idx, _div = rt1hex_cell_tab(space)
    nf = idx.shape[-1]
    xq = asm3.vol_points(space, dtype)
    wgt = (lam_v(xq) / lam_hat(xq)).astype(dtype)
    w = jnp.asarray(space.vol_w, dtype)
    dphi = jnp.asarray(space.vol_dphi, dtype)
    chi_j = jnp.asarray(chi, dtype)
    blocks = space.volume * jnp.einsum("q,kcq,qia,qea->kcie",
                                       w, wgt, dphi, chi_j)
    K = space.K
    F = space.s ** 3
    rows = np.arange(space.N, dtype=np.int64).reshape(F, space.nb)
    cols = idx.reshape(F, nf)
    A = jnp.zeros((K, space.N, N_rt1h(space)), dtype)
    return asm.scatter_blocks(A, blocks.reshape(K, F, space.nb, nf),
                              rows, cols)


def divergence_matrix_rt1hex(space: BlockDGSpace3D, dtype=jnp.float64):
    """[N, N_rt1h]: RT_[1] coeffs -> Q2 nodal coeffs of div t (exact:
    div t in Q_{1,1,1}, interpolated exactly by the Q2 nodal basis)."""
    rt1hex_cell_tab(space)
    Minv = space._rt1h_minv
    _chi, idx, _div = space._rt1h_tab
    nf = idx.shape[-1]
    scale = np.array([space.hx, space.hy, space.hz])
    nodes_phys = space.nodes_unit * scale                     # [nb, 3]
    div_nodal = _coeff_basis_div_h(nodes_phys) @ Minv         # [nb, 36]
    F = space.s ** 3
    blocks = jnp.broadcast_to(jnp.asarray(div_nodal, dtype)[None],
                              (F, space.nb, nf))
    rows = np.arange(space.N, dtype=np.int64).reshape(F, space.nb)
    cols = idx.reshape(F, nf)
    A = jnp.zeros((space.N, N_rt1h(space)), dtype)
    return A.at[rows[:, :, None], cols[:, None, :]].add(blocks)


# ---------------------------------------------------------------------------
# RT_[1] hex flux reconstruction
# ---------------------------------------------------------------------------
class FluxReconstructorRT1Hex(FluxReconstructor3D):
    """t_q in RT_[1] hex from a Q2 DG u: per face the FOUR moments of the
    SWIPDG numerical flux against Q_{1,1}(face), plus per cell the twelve
    interior moments of -lambda kappa grad(u) against grad(Q1) with the
    SIPG jump lifting (<-> ``FluxReconstructorRT1`` in 2D; the lifting
    algebra is dimension-generic and reused verbatim)."""

    nm = NM_FACE
    required_order = 2

    # the 2D RT1 lifting einsums are dimension-generic (trailing vector
    # axis a, normals of any length)
    _lift_inner = FluxReconstructorRT1._lift_inner
    _lift_boundary = FluxReconstructorRT1._lift_boundary

    def __init__(self, space: BlockDGSpace3D, kappa_fn=None,
                 ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64):
        super().__init__(space, kappa_fn, ipdg, dtype)
        rt1hex_cell_tab(space)

    def _make_l2g(self, space):
        return jnp.asarray(rt1hex_local_to_global(space))

    def _edge_moments(self, w, integrand, ell):
        W = jnp.asarray(_face_weights(self.space), integrand.dtype)
        return ell * jnp.einsum("mq,...fq->...fm", W, integrand)

    # ------------------------------------------------------------------
    def _extra_parts(self, lam_fn, uc, out_dt):
        """Interior moments -int_H lam kappa grad(u) . r_j dx + the SIPG
        jump lifting over the 3 interior face families and 6 boundary
        sides (see ``FluxReconstructorRT1._extra_parts`` for why the
        lifting is required for a second-order eta_r)."""
        sp = self.space
        dt = self.dtype
        lead = uc.shape[:-4]
        Sx, Sy, Sz = self.Sx, self.Sy, self.Sz
        scale = np.array([sp.hx, sp.hy, sp.hz])
        org = jnp.asarray(self.cell_org, dt)                  # [Sz, Sy, Sx, 3]
        qp = jnp.asarray(sp.vol_qp * scale, dt)               # [nq, 3]
        xq = org[:, :, :, None, :] + qp[None, None, None]     # [Sz,Sy,Sx,nq,3]
        w = jnp.asarray(sp.vol_w, dt)
        dphi = jnp.asarray(sp.vol_dphi, dt)                   # [nq, nb, 3]
        gu = jnp.einsum("...zyxj,qja->...zyxqa", uc, dphi)
        lam = lam_fn(xq).astype(dt)
        if self.kappa_fn is not None:
            kap = self.kappa_fn(xq).astype(dt)
            gu = jnp.einsum("zyxqab,...zyxqb->...zyxqa", kap, gu)
        R = jnp.asarray(_int_test_basis_h(sp, np.asarray(sp.vol_qp) * scale), dt)
        m = -sp.volume * jnp.einsum("q,zyxq,...zyxqa,qja->...zyxj",
                                    w, lam, gu, R)
        m = m + self._lift_hex(lam_fn, uc, m.dtype)
        return [m.reshape(lead + (-1,)).astype(out_dt)]

    def _R_of(self, fam_or_side, c01):
        """Interior test fields at the cell-local face points [nqf, 12, 3]."""
        sp = self.space
        scale = np.array([sp.hx, sp.hy, sp.hz])
        pts = _face_pts_unit(fam_or_side, sp.face_uv, c01) * scale
        return _int_test_basis_h(sp, pts)

    def _lift_hex(self, lam_fn, uc, mdt):
        sp = self.space
        lead = uc.shape[:-4]
        Sx, Sy, Sz = self.Sx, self.Sy, self.Sz
        corr = jnp.zeros(lead + (Sz, Sy, Sx, N_INT_H), mdt)
        org = self.cell_org
        nb = sp.nb

        # interior families: minus = hi side of the minus cell (c01 = 1),
        # plus = lo side of the plus cell (c01 = 0)
        fams = (("X", (slice(None), slice(None), slice(None, -1)),
                 (slice(None), slice(None), slice(1, None)),
                 org[:, :, :-1]),
                ("Y", (slice(None), slice(None, -1), slice(None)),
                 (slice(None), slice(1, None), slice(None)),
                 org[:, :-1, :]),
                ("Z", (slice(None, -1), slice(None), slice(None)),
                 (slice(1, None), slice(None), slice(None)),
                 org[:-1]))
        for fam, sl_m, sl_p, orgs in fams:
            if orgs.size == 0:
                continue
            tab = sp.face_tabs[fam]
            F = int(np.prod(orgs.shape[:-1]))
            x_m, x_p = self._phys_pts(tab, orgs.reshape(-1, 3))
            um = uc[(Ellipsis,) + sl_m + (slice(None),)]
            up = uc[(Ellipsis,) + sl_p + (slice(None),)]
            shp = um.shape[len(lead):-1]
            cm, cp = self._lift_inner(
                lam_fn, tab, x_m, x_p,
                um.reshape(lead + (F, nb)), up.reshape(lead + (F, nb)),
                R_m=self._R_of(fam, 1.0), R_p=self._R_of(fam, 0.0))
            corr = corr.at[(Ellipsis,) + sl_m + (slice(None),)].add(
                cm.reshape(lead + shp + (N_INT_H,)))
            corr = corr.at[(Ellipsis,) + sl_p + (slice(None),)].add(
                cp.reshape(lead + shp + (N_INT_H,)))

        # boundary sides
        from .spaces3d import SIDES3D
        sides = (("left", (slice(None), slice(None), 0), org[:, :, 0]),
                 ("right", (slice(None), slice(None), Sx - 1), org[:, :, Sx - 1]),
                 ("bottom", (slice(None), 0, slice(None)), org[:, 0, :]),
                 ("top", (slice(None), Sy - 1, slice(None)), org[:, Sy - 1, :]),
                 ("near", (0, slice(None), slice(None)), org[0]),
                 ("far", (Sz - 1, slice(None), slice(None)), org[Sz - 1]))
        for side, pos, orgs in sides:
            tab = sp.face_tabs["bnd_" + side]
            fam, c01, _sgn = SIDES3D[side]
            Fb = int(np.prod(orgs.shape[:-1]))
            x, _ = self._phys_pts(tab, orgs.reshape(-1, 3))
            u = uc[(Ellipsis,) + pos + (slice(None),)]
            shp = u.shape[len(lead):-1]
            c = self._lift_boundary(lam_fn, tab, x,
                                    u.reshape(lead + (Fb, nb)),
                                    R=self._R_of(fam, c01))
            corr = corr.at[(Ellipsis,) + pos + (slice(None),)].add(
                c.reshape(lead + shp + (N_INT_H,)))
        return corr
