"""Independent numpy implementations of the estimator kernels (kappa = I).

Loop-based oracles for the two least-cross-checkable kernels — Oswald
interpolation and RT0 diffusive-flux reconstruction — plus a full
"online step" on the CPU (scipy solve + numpy estimator) used as the honest
baseline in bench.py (the reference's sequential CPU pipeline stand-in).
Independent code path: global-cell loops, np.add.at scatters, no shared
helpers with the batched implementation beyond the basis module.
"""
from __future__ import annotations

import numpy as np

from ..grid import Grid
from .. import basis as B
from .. import quadrature as Q
from ..ops.assembly import DEFAULT_IPDG

_EPS = 1e-6


def _cells_view(grid: Grid, U):
    """[K, N] block layout -> [Sy, Sx, 2, 3] global-cell nodal values."""
    s = grid.s
    U = np.asarray(U).reshape(grid.ky, grid.kx, s, s, 2, 3)
    U = np.moveaxis(U, 1, 2)             # [ky, s, kx, s, 2, 3]
    return U.reshape(grid.global_ny, grid.global_nx, 2, 3)


def _block_view(grid: Grid, C):
    s = grid.s
    C = C.reshape(grid.ky, s, grid.kx, s, 2, 3)
    C = np.moveaxis(C, 2, 1)
    return C.reshape(grid.num_subdomains, s * s * 2 * 3)


def oswald_error_np(grid: Grid, U):
    """u - I_os(u) by explicit vertex accumulation (all-Dirichlet zeroing)."""
    Sy, Sx = grid.global_ny, grid.global_nx
    uc = _cells_view(grid, U)
    sums = np.zeros((Sy + 1, Sx + 1))
    counts = np.zeros((Sy + 1, Sx + 1))
    # vertex of each (tri, node): A -> (0,0),(0,1),(1,1); B -> (0,0),(1,0),(1,1)
    vmap = {(0, 0): (0, 0), (0, 1): (0, 1), (0, 2): (1, 1),
            (1, 0): (0, 0), (1, 1): (1, 0), (1, 2): (1, 1)}
    for (t, i), (dy, dx) in vmap.items():
        np.add.at(sums, (np.arange(Sy)[:, None] + dy, np.arange(Sx)[None, :] + dx),
                  uc[:, :, t, i])
        np.add.at(counts, (np.arange(Sy)[:, None] + dy, np.arange(Sx)[None, :] + dx),
                  np.ones((Sy, Sx)))
    avg = sums / np.maximum(counts, 1.0)
    avg[0, :] = avg[-1, :] = 0.0
    avg[:, 0] = avg[:, -1] = 0.0
    out = np.empty_like(uc)
    for (t, i), (dy, dx) in vmap.items():
        out[:, :, t, i] = uc[:, :, t, i] - avg[dy:Sy + dy, dx:Sx + dx]
    return _block_view(grid, out).reshape(np.asarray(U).shape)


def flux_reconstruction_np(grid: Grid, lam_fn, U, order: int = 1,
                           ipdg=DEFAULT_IPDG, nqf: int = 5):
    """Global RT0 face dofs (family-normal convention; concat D, V, H)."""
    Sy, Sx = grid.global_ny, grid.global_nx
    hx, hy = grid.hx, grid.hy
    uc = _cells_view(grid, U)
    t, w = Q.edge_rule(nqf)
    sig_i = ipdg.sigma_inner(order)
    sig_b = ipdg.sigma_boundary(order)
    beta = ipdg.beta
    cen = {0: B.TRI_VERTS_UNIT["A"].mean(0), 1: B.TRI_VERTS_UNIT["B"].mean(0)}
    tri_name = {0: "A", 1: "B"}
    scale = np.array([hx, hy])

    def lam(x):
        return np.asarray(lam_fn(x))

    def grad_u(cell_u, tri, pts):
        g = B.eval_basis_grad_unit(tri_name[tri], order, pts).copy()
        g[..., 0] /= hx
        g[..., 1] /= hy
        return np.einsum("j,qja->qa", cell_u, g)

    def val_u(cell_u, tri, pts):
        return np.einsum("j,qj->q", cell_u, B.eval_basis(tri_name[tri], order, pts))

    def inner_moment(org, tm, um, pm, tp, up, pp, n, ell, shift_p):
        x = org + pm * scale
        xm = x + _EPS * ((org + cen[tm] * scale) - x)
        xp = x + _EPS * ((org + shift_p + cen[tp] * scale) - x)
        lm, lp = lam(xm), lam(xp)
        pen = sig_i * 0.5 * (0.5 * lm + 0.5 * lp) / ell ** beta
        gm = np.einsum("qa,a->q", grad_u(um, tm, pm), n)
        gp = np.einsum("qa,a->q", grad_u(up, tp, pp), n)
        jump = val_u(um, tm, pm) - val_u(up, tp, pp)
        integ = -(0.5 * lm * gm + 0.5 * lp * gp) + pen * jump
        return ell * np.dot(w, integ)

    def bnd_moment(org, tm, um, pm, n_out, ell, sign):
        x = org + pm * scale
        xm = x + _EPS * ((org + cen[tm] * scale) - x)
        lm = lam(xm)
        pen = sig_b * lm / ell ** beta
        g = np.einsum("qa,a->q", grad_u(um, tm, pm), n_out)
        integ = -lm * g + pen * val_u(um, tm, pm)
        return sign * ell * np.dot(w, integ)

    len_d = np.hypot(hx, hy)
    nD = np.array([-hy, hx]) / len_d
    ptsD = np.stack([t, t], -1)
    ptsVm = np.stack([np.ones_like(t), t], -1)
    ptsVp = np.stack([np.zeros_like(t), t], -1)
    ptsHm = np.stack([t, np.ones_like(t)], -1)
    ptsHp = np.stack([t, np.zeros_like(t)], -1)

    D = np.zeros((Sy, Sx))
    V = np.zeros((Sy, Sx + 1))
    H = np.zeros((Sy + 1, Sx))
    for gy in range(Sy):
        for gx in range(Sx):
            org = np.array([grid.lower_left[0] + gx * hx,
                            grid.lower_left[1] + gy * hy])
            D[gy, gx] = inner_moment(org, 0, uc[gy, gx, 0], ptsD,
                                     1, uc[gy, gx, 1], ptsD, nD, len_d,
                                     np.zeros(2))
            if gx < Sx - 1:
                V[gy, gx + 1] = inner_moment(org, 0, uc[gy, gx, 0], ptsVm,
                                             1, uc[gy, gx + 1, 1], ptsVp,
                                             np.array([1.0, 0.0]), hy,
                                             np.array([hx, 0.0]))
            if gy < Sy - 1:
                H[gy + 1, gx] = inner_moment(org, 1, uc[gy, gx, 1], ptsHm,
                                             0, uc[gy + 1, gx, 0], ptsHp,
                                             np.array([0.0, 1.0]), hx,
                                             np.array([0.0, hy]))
    for gy in range(Sy):
        orgL = np.array([grid.lower_left[0], grid.lower_left[1] + gy * hy])
        V[gy, 0] = bnd_moment(orgL, 1, uc[gy, 0, 1], ptsVp,
                              np.array([-1.0, 0.0]), hy, -1.0)
        orgR = np.array([grid.lower_left[0] + (Sx - 1) * hx,
                         grid.lower_left[1] + gy * hy])
        V[gy, Sx] = bnd_moment(orgR, 0, uc[gy, Sx - 1, 0], ptsVm,
                               np.array([1.0, 0.0]), hy, +1.0)
    for gx in range(Sx):
        orgB = np.array([grid.lower_left[0] + gx * hx, grid.lower_left[1]])
        H[0, gx] = bnd_moment(orgB, 0, uc[0, gx, 0], ptsHp,
                              np.array([0.0, -1.0]), hx, -1.0)
        orgT = np.array([grid.lower_left[0] + gx * hx,
                         grid.lower_left[1] + (Sy - 1) * hy])
        H[Sy, gx] = bnd_moment(orgT, 1, uc[Sy - 1, gx, 1], ptsHm,
                               np.array([0.0, 1.0]), hx, +1.0)
    return np.concatenate([D.ravel(), V.ravel(), H.ravel()])


def flux_reconstruction_np_vec(grid: Grid, lam_fn, U, order: int = 1,
                               ipdg=DEFAULT_IPDG, nqf: int = 5):
    """Vectorized numpy flux reconstruction (same math as the loop oracle;
    used in the CPU baseline so the comparison is against competent numpy,
    not python loops).  kappa = I."""
    Sy, Sx = grid.global_ny, grid.global_nx
    hx, hy = grid.hx, grid.hy
    uc = _cells_view(grid, U)                          # [Sy, Sx, 2, 3]
    t, w = Q.edge_rule(nqf)
    sig_i = ipdg.sigma_inner(order)
    sig_b = ipdg.sigma_boundary(order)
    beta = ipdg.beta
    scale = np.array([hx, hy])
    cenA = B.TRI_VERTS_UNIT["A"].mean(0)
    cenB = B.TRI_VERTS_UNIT["B"].mean(0)
    # cell origins [Sy, Sx, 2]
    oy, ox = np.meshgrid(np.arange(Sy), np.arange(Sx), indexing="ij")
    org = np.stack([grid.lower_left[0] + ox * hx,
                    grid.lower_left[1] + oy * hy], axis=-1)

    def tab(tri, pts):
        phi = B.eval_basis(tri, order, pts)            # [q, 3]
        g = B.eval_basis_grad_unit(tri, order, pts).copy()
        g[..., 0] /= hx
        g[..., 1] /= hy
        return phi, g

    def lam_at(base_org, pts, cen, shift=(0.0, 0.0)):
        x = base_org[..., None, :] + (pts * scale)[None, None]
        c = base_org[..., None, :] + np.asarray(shift) + (cen * scale)[None, None]
        return np.asarray(lam_fn(x + _EPS * (c - x)))  # [..., q]

    def inner(base_org, um, tri_m, pts_m, cen_m, up, tri_p, pts_p, cen_p,
              shift_p, n, ell):
        lm = lam_at(base_org, pts_m, cen_m)
        lp = lam_at(base_org, pts_m, cen_p, shift_p)
        phim, gm = tab(tri_m, pts_m)
        phip, gp = tab(tri_p, pts_p)
        gmn = np.einsum("...j,qja,a->...q", um, gm, n)
        gpn = np.einsum("...j,qja,a->...q", up, gp, n)
        jump = np.einsum("...j,qj->...q", um, phim) - np.einsum("...j,qj->...q", up, phip)
        pen = sig_i * 0.5 * (0.5 * lm + 0.5 * lp) / ell ** beta
        return ell * np.einsum("q,...q->...", w, -(0.5 * lm * gmn + 0.5 * lp * gpn)
                               + pen * jump)

    def bnd(base_org, um, tri_m, pts_m, cen_m, n_out, ell, sign):
        lm = lam_at(base_org, pts_m, cen_m)
        phim, gm = tab(tri_m, pts_m)
        gmn = np.einsum("...j,qja,a->...q", um, gm, n_out)
        pen = sig_b * lm / ell ** beta
        uv = np.einsum("...j,qj->...q", um, phim)
        return sign * ell * np.einsum("q,...q->...", w, -lm * gmn + pen * uv)

    len_d = np.hypot(hx, hy)
    nD = np.array([-hy, hx]) / len_d
    ptsD = np.stack([t, t], -1)
    ptsVm = np.stack([np.ones_like(t), t], -1)
    ptsVp = np.stack([np.zeros_like(t), t], -1)
    ptsHm = np.stack([t, np.ones_like(t)], -1)
    ptsHp = np.stack([t, np.zeros_like(t)], -1)

    D = inner(org, uc[:, :, 0], "A", ptsD, cenA, uc[:, :, 1], "B", ptsD, cenB,
              (0.0, 0.0), nD, len_d)
    V = np.zeros((Sy, Sx + 1))
    if Sx > 1:
        V[:, 1:Sx] = inner(org[:, :-1], uc[:, :-1, 0], "A", ptsVm, cenA,
                           uc[:, 1:, 1], "B", ptsVp, cenB, (hx, 0.0),
                           np.array([1.0, 0.0]), hy)
    V[:, 0] = bnd(org[:, 0], uc[:, 0, 1], "B", ptsVp, cenB,
                  np.array([-1.0, 0.0]), hy, -1.0)
    V[:, Sx] = bnd(org[:, Sx - 1], uc[:, Sx - 1, 0], "A", ptsVm, cenA,
                   np.array([1.0, 0.0]), hy, +1.0)
    H = np.zeros((Sy + 1, Sx))
    if Sy > 1:
        H[1:Sy] = inner(org[:-1], uc[:-1, :, 1], "B", ptsHm, cenB,
                        uc[1:, :, 0], "A", ptsHp, cenA, (0.0, hy),
                        np.array([0.0, 1.0]), hx)
    H[0] = bnd(org[0], uc[0, :, 0], "A", ptsHp, cenA,
               np.array([0.0, -1.0]), hx, -1.0)
    H[Sy] = bnd(org[Sy - 1], uc[Sy - 1, :, 1], "B", ptsHm, cenB,
                np.array([0.0, 1.0]), hx, +1.0)
    return np.concatenate([D.ravel(), V.ravel(), H.ravel()])


def make_cpu_online_query(d):
    """Streaming-mu CPU baseline: returns ``query(theta_np, theta_f_np)``
    doing the FULL per-parameter work — assemble A(mu) from the affine
    components, sparse LU, solve, localized estimate — mirroring what the
    TPU online step does per query (no cross-query factorization reuse; the
    reference's ISTL pipeline also re-iterates per mu,
    ``online_adaptive_lrbms.py:71-95``).  mu-independent tensors (affine
    component CSRs, estimator tensors) are prepared once, outside."""
    from scipy.sparse.linalg import splu
    from ..la.block import to_scipy_csr
    import jax.numpy as jnp

    grid = d.grid
    ed = d.estimator.data
    Q = d.op.A_diag.shape[0]
    eyeQ = np.eye(Q)
    A_q = [to_scipy_csr(d.op.assemble(jnp.asarray(eyeQ[q]))).astype(np.float64)
           for q in range(Q)]
    b_q = np.asarray(d.rhs_q, np.float64)
    E_bar = np.asarray(ed.E_bar, np.float64)
    BB = np.asarray(ed.BB, np.float64)
    M_aa = np.asarray(ed.M_aa, np.float64)
    M_ab = np.asarray(ed.M_ab, np.float64)
    d_vec = np.asarray(ed.d_vec, np.float64)
    R_dd = np.asarray(ed.R_dd, np.float64)
    rf_qq = np.asarray(ed.rf_qq, np.float64)
    min_ev = np.asarray(ed.min_ev, np.float64)
    diam = np.asarray(ed.diam, np.float64)
    rt_l2g = np.asarray(d.space.rt_local_to_global())
    lam_funcs = ed.lambda_funcs
    K, N = d.space.K, d.space.N

    def query(theta_np, theta_f_np, lu=None):
        if lu is None:
            A = sum(float(th) * Aq for th, Aq in zip(theta_np, A_q)).tocsc()
            lu = splu(A)
        b = np.einsum("q,qkn->kn", theta_f_np, b_q)
        u = lu.solve(b.reshape(-1)).reshape(K, N)
        t_g = sum(th * flux_reconstruction_np_vec(grid, lf, u)
                  for th, lf in zip(theta_np, lam_funcs))
        t_loc = t_g[rt_l2g]
        u_o = oswald_error_np(grid, u)
        nc = np.einsum("kn,knm,km->k", u_o, E_bar, u_o)
        rf = np.einsum("p,r,prk->k", theta_f_np, theta_f_np, rf_qq)
        r_fd = np.einsum("p,pkn,kn->k", theta_f_np, d_vec, t_loc)
        r_dd = np.einsum("kn,knm,km->k", t_loc, R_dd, t_loc)
        r = (rf - 2 * r_fd + r_dd) * (1.0 / np.pi ** 2 / min_ev) * diam ** 2
        aa = np.einsum("p,r,prknm,kn,km->k", theta_np, theta_np, M_aa, u, u)
        bb = np.einsum("kn,knm,km->k", t_loc, BB, t_loc)
        ab = np.einsum("p,pknm,kn,km->k", theta_np, M_ab, u, t_loc)
        return u, nc + r + (aa + bb + 2 * ab)

    return query


def make_cpu_online_step(d, theta_np, theta_f_np, mu):
    """Fixed-mu variant with the sparse LU PREfactorized outside the timed
    region (generous to the CPU baseline; kept for parity tests)."""
    from scipy.sparse.linalg import splu
    from ..la.block import to_scipy_csr
    import jax.numpy as jnp
    query = make_cpu_online_query(d)
    A_csr = to_scipy_csr(d.op.assemble(jnp.asarray(theta_np))).astype(np.float64).tocsc()
    lu = splu(A_csr)

    def step():
        return query(theta_np, theta_f_np, lu=lu)

    return step
