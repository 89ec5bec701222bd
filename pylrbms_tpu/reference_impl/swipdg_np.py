"""Independent, loop-based numpy/scipy SWIPDG implementation.

Purpose (SURVEY.md §7 stage 3 acceptance: "one detailed solve matching a scipy
cross-check"):

1. validation oracle for the batched TPU assembly — same math, completely
   independent enumeration/scatter code path;
2. the CPU baseline bench.py compares against (the reference's DUNE/ISTL
   pipeline is not runnable in this environment; this plays its role as a
   sequential-CPU implementation of the identical discretization).

Global dof ordering matches the block layout: dof = ii * N + local, with
ii = sy*kx + sx and local = ((cy*s+cx)*2 + t)*nb + i  (cy, cx within the
subdomain).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..grid import Grid
from .. import basis as B
from .. import quadrature as Q
from ..ops.assembly import IPDGParams, DEFAULT_IPDG

_EPS = 1e-6


def _np(fn, x):
    return np.asarray(fn(np.asarray(x)))


class _Tab:
    def __init__(self, grid: Grid, order: int, nq_vol=5, nq_face=5):
        self.grid, self.order = grid, order
        self.nb = B.num_basis(order)
        self.hx, self.hy = grid.hx, grid.hy
        qpA, wA = Q.triangle_rule_unit_cell("A", nq_vol)
        qpB, wB = Q.triangle_rule_unit_cell("B", nq_vol)
        self.vol = {"A": (qpA, wA), "B": (qpB, wB)}
        self.t_face, self.w_face = Q.edge_rule(nq_face)

    def phys_grad(self, d):
        d = d.copy()
        d[..., 0] /= self.hx
        d[..., 1] /= self.hy
        return d


def _dof(grid: Grid, order, gx, gy, t):
    s, kx = grid.s, grid.kx
    nb = B.num_basis(order)
    N = s * s * 2 * nb
    sx, sy = gx // s, gy // s
    cx, cy = gx % s, gy % s
    ii = sy * kx + sx
    local = ((cy * s + cx) * 2 + t) * nb
    return ii * N + local + np.arange(nb)


def assemble_swipdg_np(grid: Grid, lam_fn, kappa_fn=None, order: int = 1,
                       ipdg: IPDGParams = DEFAULT_IPDG):
    """Global sparse SWIPDG matrix for one affine component (lam_fn)."""
    tab = _Tab(grid, order)
    nb, hx, hy = tab.nb, tab.hx, tab.hy
    Sx, Sy = grid.global_nx, grid.global_ny
    ndof = grid.num_subdomains * grid.s ** 2 * 2 * nb
    rows, cols, vals = [], [], []

    def kap(x):
        if kappa_fn is None:
            return np.broadcast_to(np.eye(2), x.shape[:-1] + (2, 2))
        return _np(kappa_fn, x)

    def add(r, c, M):
        rr, cc = np.meshgrid(r, c, indexing="ij")
        rows.append(rr.ravel()); cols.append(cc.ravel()); vals.append(np.asarray(M).ravel())

    # ---------------- volume ----------------
    for gy in range(Sy):
        for gx in range(Sx):
            org = np.array([grid.lower_left[0] + gx * hx, grid.lower_left[1] + gy * hy])
            for t, tri in enumerate(("A", "B")):
                qp, w = tab.vol[tri]
                x = org + qp * [hx, hy]
                lam = _np(lam_fn, x)
                k = kap(x)
                dphi = tab.phys_grad(B.eval_basis_grad_unit(tri, order, qp))
                M = hx * hy * np.einsum("q,q,qia,qab,qjb->ij", w, lam, dphi, k, dphi)
                d = _dof(grid, order, gx, gy, t)
                add(d, d, M)

    # ---------------- faces ----------------
    def face_terms(xq, n, ell, tri_m, pts_m, tri_p, pts_p, cen_m, cen_p):
        """one inner face: returns 4 blocks (mm, mp, pm, pp)"""
        x_m = xq + _EPS * (cen_m - xq)
        x_p = xq + _EPS * (cen_p - xq)
        lam_m, lam_p = _np(lam_fn, x_m), _np(lam_fn, x_p)
        km, kp = kap(x_m), kap(x_p)
        dm = np.einsum("qab,a,b->q", km, n, n)
        dp = np.einsum("qab,a,b->q", kp, n, n)
        ssum = dm + dp
        with np.errstate(invalid="ignore", divide="ignore"):
            om_m = np.where(ssum != 0, dp / np.where(ssum != 0, ssum, 1), 0.5)
            om_p = np.where(ssum != 0, dm / np.where(ssum != 0, ssum, 1), 0.5)
            gam = np.where(ssum != 0, dm * dp / np.where(ssum != 0, ssum, 1), 0.0)
        pen = ipdg.sigma_inner(order) * gam * (om_m * lam_m + om_p * lam_p) / ell ** ipdg.beta
        phi_m = B.eval_basis(tri_m, order, pts_m)
        phi_p = B.eval_basis(tri_p, order, pts_p)
        gm = tab.phys_grad(B.eval_basis_grad_unit(tri_m, order, pts_m))
        gp = tab.phys_grad(B.eval_basis_grad_unit(tri_p, order, pts_p))
        fm = lam_m[:, None] * np.einsum("qab,qjb,a->qj", km, gm, n) * om_m[:, None]
        fp = lam_p[:, None] * np.einsum("qab,qjb,a->qj", kp, gp, n) * om_p[:, None]
        w = tab.w_face
        Pmm = ell * np.einsum("q,q,qi,qj->ij", w, pen, phi_m, phi_m)
        Pmp = -ell * np.einsum("q,q,qi,qj->ij", w, pen, phi_m, phi_p)
        Ppm = -ell * np.einsum("q,q,qi,qj->ij", w, pen, phi_p, phi_m)
        Ppp = ell * np.einsum("q,q,qi,qj->ij", w, pen, phi_p, phi_p)
        Cmm = -ell * (np.einsum("q,qj,qi->ij", w, fm, phi_m) + np.einsum("q,qi,qj->ij", w, fm, phi_m))
        Cmp = -ell * np.einsum("q,qj,qi->ij", w, fp, phi_m) + ell * np.einsum("q,qi,qj->ij", w, fm, phi_p)
        Cpm = ell * np.einsum("q,qj,qi->ij", w, fm, phi_p) - ell * np.einsum("q,qi,qj->ij", w, fp, phi_m)
        Cpp = ell * (np.einsum("q,qj,qi->ij", w, fp, phi_p) + np.einsum("q,qi,qj->ij", w, fp, phi_p))
        return Pmm + Cmm, Pmp + Cmp, Ppm + Cpm, Ppp + Cpp

    tgl = tab.t_face
    cenA = B.TRI_VERTS_UNIT["A"].mean(0)
    cenB = B.TRI_VERTS_UNIT["B"].mean(0)
    for gy in range(Sy):
        for gx in range(Sx):
            org = np.array([grid.lower_left[0] + gx * hx, grid.lower_left[1] + gy * hy])
            scale = np.array([hx, hy])
            # D face (within cell): minus=A, plus=B
            ptsD = np.stack([tgl, tgl], axis=-1)
            xq = org + ptsD * scale
            nD = np.array([-hy, hx]) / np.hypot(hx, hy)
            mm, mp, pm, pp = face_terms(xq, nD, np.hypot(hx, hy), "A", ptsD, "B", ptsD,
                                        org + cenA * scale, org + cenB * scale)
            dA = _dof(grid, order, gx, gy, 0)
            dB = _dof(grid, order, gx, gy, 1)
            add(dA, dA, mm); add(dA, dB, mp); add(dB, dA, pm); add(dB, dB, pp)
            # V face to the right: minus=(gx,gy,A), plus=(gx+1,gy,B)
            if gx < Sx - 1:
                pts_m = np.stack([np.ones_like(tgl), tgl], axis=-1)
                pts_p = np.stack([np.zeros_like(tgl), tgl], axis=-1)
                xq = org + pts_m * scale
                org_p = org + [hx, 0.0]
                mm, mp, pm, pp = face_terms(xq, np.array([1.0, 0.0]), hy, "A", pts_m, "B", pts_p,
                                            org + cenA * scale, org_p + cenB * scale)
                dP = _dof(grid, order, gx + 1, gy, 1)
                add(dA, dA, mm); add(dA, dP, mp); add(dP, dA, pm); add(dP, dP, pp)
            # H face above: minus=(gx,gy,B), plus=(gx,gy+1,A)
            if gy < Sy - 1:
                pts_m = np.stack([tgl, np.ones_like(tgl)], axis=-1)
                pts_p = np.stack([tgl, np.zeros_like(tgl)], axis=-1)
                xq = org + pts_m * scale
                org_p = org + [0.0, hy]
                mm, mp, pm, pp = face_terms(xq, np.array([0.0, 1.0]), hx, "B", pts_m, "A", pts_p,
                                            org + cenB * scale, org_p + cenA * scale)
                dP = _dof(grid, order, gx, gy + 1, 0)
                add(dB, dB, mm); add(dB, dP, mp); add(dP, dB, pm); add(dP, dP, pp)

    # ---------------- Dirichlet boundary ----------------
    def bface(gx, gy, t, tri, pts, n, ell, cen):
        org = np.array([grid.lower_left[0] + gx * hx, grid.lower_left[1] + gy * hy])
        scale = np.array([hx, hy])
        xq = org + pts * scale
        x_m = xq + _EPS * (org + cen * scale - xq)
        lam = _np(lam_fn, x_m)
        k = kap(x_m)
        delta = np.einsum("qab,a,b->q", k, n, n)
        pen = ipdg.sigma_boundary(order) * delta * lam / ell ** ipdg.beta
        phi = B.eval_basis(tri, order, pts)
        g = tab.phys_grad(B.eval_basis_grad_unit(tri, order, pts))
        fl = lam[:, None] * np.einsum("qab,qjb,a->qj", k, g, n)
        w = tab.w_face
        M = (ell * np.einsum("q,q,qi,qj->ij", w, pen, phi, phi)
             - ell * np.einsum("q,qj,qi->ij", w, fl, phi)
             - ell * np.einsum("q,qi,qj->ij", w, fl, phi))
        d = _dof(grid, order, gx, gy, t)
        add(d, d, M)

    z, o = np.zeros_like(tgl), np.ones_like(tgl)
    for gy in range(Sy):
        bface(0, gy, 1, "B", np.stack([z, tgl], -1), np.array([-1.0, 0.0]), hy, cenB)
        bface(Sx - 1, gy, 0, "A", np.stack([o, tgl], -1), np.array([1.0, 0.0]), hy, cenA)
    for gx in range(Sx):
        bface(gx, 0, 0, "A", np.stack([tgl, z], -1), np.array([0.0, -1.0]), hx, cenA)
        bface(gx, Sy - 1, 1, "B", np.stack([tgl, o], -1), np.array([0.0, 1.0]), hx, cenB)

    A = sp.csr_matrix((np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
                      shape=(ndof, ndof))
    A.sum_duplicates()
    return A


def assemble_rhs_np(grid: Grid, f_fn, order: int = 1):
    tab = _Tab(grid, order)
    nb, hx, hy = tab.nb, tab.hx, tab.hy
    Sx, Sy = grid.global_nx, grid.global_ny
    ndof = grid.num_subdomains * grid.s ** 2 * 2 * nb
    b = np.zeros(ndof)
    for gy in range(Sy):
        for gx in range(Sx):
            org = np.array([grid.lower_left[0] + gx * hx, grid.lower_left[1] + gy * hy])
            for t, tri in enumerate(("A", "B")):
                qp, w = tab.vol[tri]
                x = org + qp * [hx, hy]
                f = _np(f_fn, x)
                phi = B.eval_basis(tri, order, qp)
                b[_dof(grid, order, gx, gy, t)] += hx * hy * np.einsum("q,q,qi->i", w, f, phi)
    return b


def solve_np(grid: Grid, lam_funcs, coeffs, f_fn, kappa_fn=None, order: int = 1,
             mu=None, ipdg: IPDGParams = DEFAULT_IPDG):
    """Full FOM solve: assemble affine sum and sparse-solve (CPU oracle)."""
    from scipy.sparse.linalg import spsolve
    A = None
    for lf, c in zip(lam_funcs, coeffs):
        c_val = float(c.evaluate(mu)) if hasattr(c, "evaluate") else float(c)
        Aq = assemble_swipdg_np(grid, lf, kappa_fn, order, ipdg)
        A = c_val * Aq if A is None else A + c_val * Aq
    b = assemble_rhs_np(grid, f_fn, order)
    return spsolve(A.tocsc(), b), A, b
