#!/usr/bin/env python
"""Numerical proof of the eta_nc triangulation attribution.

docs/results/golden_gap_attribution.md bounds the eta_nc remainder (our
1.99e-01 vs the reference golden 1.66e-01, paper convention, matched mesh)
by "Oswald zeroing + the ALU bisection (crisscross) triangulation".  This
script PROVES the triangulation part with data: an independent numpy/scipy
SWIPDG oracle on an *unstructured* triangle list assembles the same scheme
(sigma=8/14, kappa-only weights, beta=1) on

  (a) the uniform Kuhn diagonal mesh (our grid family), and
  (b) the crisscross mesh (per-2x2 quad block, diagonals meeting at the
      center — the pattern ALU_2D_SIMPLEX_CONFORMING's newest-vertex
      bisection produces from a Kuhn macro pair after two halvings),

at the golden config (OS2015, [4,4] subdomains, 8x8 fine cells, mu=1), and
computes eta_nc in the paper convention for both.  The oracle's (a) value
validates against the pipeline's 1.9921e-01; its (b) value lands on the
reference golden 1.66e-01.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
         python scripts/crisscross_oracle.py
Asserted in tests/test_scripts.py::test_crisscross_closes_eta_nc_gap.
"""
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

SIGMA_IN, SIGMA_BND = 8.0, 14.0


def lam(x):          # OS2015 diffusion at mu=1: lambda == 1
    return np.ones(x.shape[:-1])


def rhs_f(x):
    return (0.5 * np.pi ** 2 * np.cos(0.5 * np.pi * x[..., 0])
            * np.cos(0.5 * np.pi * x[..., 1]))


def diagonal_mesh(n):
    """Uniform Kuhn diagonal: each cell split along (0,0)-(1,1)."""
    xs = np.linspace(-1.0, 1.0, n + 1)
    vid = lambda iy, ix: iy * (n + 1) + ix
    V = np.array([[x, y] for y in xs for x in xs])
    tris = []
    for iy in range(n):
        for ix in range(n):
            a, b = vid(iy, ix), vid(iy, ix + 1)
            c, d = vid(iy + 1, ix), vid(iy + 1, ix + 1)
            tris += [(a, b, d), (a, c, d)]       # below / above the diagonal
    return V, np.array(tris)


def crisscross_mesh(n):
    """Crisscross: in each 2x2 block of cells the four diagonals meet at the
    block center (the conforming-bisection pattern).  n must be even."""
    assert n % 2 == 0
    xs = np.linspace(-1.0, 1.0, n + 1)
    vid = lambda iy, ix: iy * (n + 1) + ix
    V = np.array([[x, y] for y in xs for x in xs])
    tris = []
    for by in range(0, n, 2):
        for bx in range(0, n, 2):
            cy, cx = by + 1, bx + 1              # block-center vertex
            c = vid(cy, cx)
            for iy in range(by, by + 2):
                for ix in range(bx, bx + 2):
                    a, b = vid(iy, ix), vid(iy, ix + 1)
                    d, e = vid(iy + 1, ix), vid(iy + 1, ix + 1)
                    # split the cell by the diagonal through the center
                    if (iy < cy) == (ix < cx):   # diagonal a-e through c?
                        # corner cells whose diagonal passes the center:
                        # (lower-left, upper-right use a-e; others b-d)
                        pass
                    # diagonal = the cell diagonal whose endpoint is c
                    if c in (a, b, d, e):
                        # c is a corner of this cell: use the diagonal AT c
                        if c == a or c == e:
                            tris += [(a, b, e), (a, d, e)]
                        else:
                            tris += [(b, a, d), (b, e, d)]
                    else:
                        raise AssertionError("center must be a cell corner")
    return V, np.array(tris)


def assemble_swipdg(V, T, nq_vol=3):
    """P1 DG SWIPDG (sigma=8/14, kappa=I weights): returns (A, b, aux)."""
    nt = T.shape[0]
    N = 3 * nt
    P = V[T]                                      # [nt, 3, 2]
    e1 = P[:, 1] - P[:, 0]
    e2 = P[:, 2] - P[:, 0]
    detJ = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    area = 0.5 * np.abs(detJ)
    # P1 basis gradients (constant per triangle)
    grads = np.zeros((nt, 3, 2))
    for i in range(3):
        # gradient of barycentric coordinate i
        j, k = (i + 1) % 3, (i + 2) % 3
        edge = P[:, k] - P[:, j]
        normal = np.stack([-edge[:, 1], edge[:, 0]], -1)
        # orient toward vertex i
        sgn = np.sign(np.einsum("td,td->t", normal, P[:, i] - P[:, j]))
        h_i = np.abs(np.einsum("td,td->t", normal, P[:, i] - P[:, j])) \
            / np.linalg.norm(normal, axis=1)
        grads[:, i] = (normal * sgn[:, None]
                       / (np.linalg.norm(normal, axis=1) * h_i)[:, None])

    rows, cols, vals = [], [], []
    bvec = np.zeros(N)

    # volume terms (midpoint-edge quadrature, exact for quadratics)
    qp_bary = np.array([[0.5, 0.5, 0.0], [0.0, 0.5, 0.5], [0.5, 0.0, 0.5]])
    qw = np.array([1 / 3, 1 / 3, 1 / 3])
    xq = np.einsum("qi,tid->tqd", qp_bary, P)     # [nt, nq, 2]
    lam_q = lam(xq)
    f_q = rhs_f(xq)
    phi_q = qp_bary                               # [nq, 3] barycentric = P1
    for i in range(3):
        bvec[np.arange(nt) * 3 + i] += area * np.einsum(
            "q,tq,qi->t", qw, f_q, phi_q[:, i:i + 1])
        for j in range(3):
            gij = np.einsum("q,tq->t", qw, lam_q) * np.einsum(
                "td,td->t", grads[:, i], grads[:, j]) * area
            rows.append(np.arange(nt) * 3 + i)
            cols.append(np.arange(nt) * 3 + j)
            vals.append(gij)

    # face lists: map sorted vertex pair -> [(tri, local_edge)...]
    edges = {}
    for t in range(nt):
        for le, (i, j) in enumerate(((0, 1), (1, 2), (2, 0))):
            key = tuple(sorted((T[t, i], T[t, j])))
            edges.setdefault(key, []).append((t, le))

    def edge_quad(key):
        a, b = V[key[0]], V[key[1]]
        length = np.linalg.norm(b - a)
        gq = np.array([0.5 - 0.5 / np.sqrt(3), 0.5 + 0.5 / np.sqrt(3)])
        pts = a[None] + gq[:, None] * (b - a)[None]
        return length, pts, np.array([0.5, 0.5])

    def tri_trace(t, pts):
        """P1 basis values of triangle t at physical points [nq, 3]."""
        A_ = np.column_stack([P[t, 1] - P[t, 0], P[t, 2] - P[t, 0]])
        loc = np.linalg.solve(A_, (pts - P[t, 0]).T).T     # [nq, 2]
        return np.column_stack([1 - loc[:, 0] - loc[:, 1],
                                loc[:, 0], loc[:, 1]])

    def add(r, c, v):
        rows.append(np.atleast_1d(r))
        cols.append(np.atleast_1d(c))
        vals.append(np.atleast_1d(v))

    for key, adj in edges.items():
        length, pts, wq = edge_quad(key)
        lam_e = lam(pts)
        if len(adj) == 2:                          # interior face
            (tm, _), (tp, _) = adj
            nvec = V[key[1]] - V[key[0]]
            nvec = np.array([nvec[1], -nvec[0]])
            nvec /= np.linalg.norm(nvec)
            cm = P[tm].mean(0)
            if np.dot(nvec, P[tp].mean(0) - cm) < 0:
                nvec = -nvec                       # minus -> plus
            pen = SIGMA_IN * 0.5 * lam_e.mean() / length   # gamma=1/2, om=1/2
            phm, php = tri_trace(tm, pts), tri_trace(tp, pts)
            gm = lam_e.mean() * grads[tm] @ nvec   # [3]
            gp = lam_e.mean() * grads[tp] @ nvec
            for i in range(3):
                for j in range(3):
                    pen_ij = pen * length * np.einsum(
                        "q,q,q->", wq, phm[:, i], phm[:, j])
                    add(tm * 3 + i, tm * 3 + j, pen_ij
                        - 0.5 * length * gm[j] * phm[:, i] @ wq
                        - 0.5 * length * gm[i] * phm[:, j] @ wq)
                    pen_pp = pen * length * np.einsum(
                        "q,q,q->", wq, php[:, i], php[:, j])
                    add(tp * 3 + i, tp * 3 + j, pen_pp
                        + 0.5 * length * gp[j] * php[:, i] @ wq
                        + 0.5 * length * gp[i] * php[:, j] @ wq)
                    pen_mp = -pen * length * np.einsum(
                        "q,q,q->", wq, phm[:, i], php[:, j])
                    add(tm * 3 + i, tp * 3 + j, pen_mp
                        - 0.5 * length * gp[j] * phm[:, i] @ wq
                        + 0.5 * length * gm[i] * php[:, j] @ wq)
                    pen_pm = -pen * length * np.einsum(
                        "q,q,q->", wq, php[:, i], phm[:, j])
                    add(tp * 3 + i, tm * 3 + j, pen_pm
                        + 0.5 * length * gm[j] * php[:, i] @ wq
                        - 0.5 * length * gp[i] * phm[:, j] @ wq)
        else:                                      # Dirichlet boundary face
            (tm, _), = adj
            nvec = V[key[1]] - V[key[0]]
            nvec = np.array([nvec[1], -nvec[0]])
            nvec /= np.linalg.norm(nvec)
            if np.dot(nvec, P[tm].mean(0) - V[key[0]]) > 0:
                nvec = -nvec                       # outward
            pen = SIGMA_BND * lam_e.mean() / length
            phm = tri_trace(tm, pts)
            gm = lam_e.mean() * grads[tm] @ nvec
            for i in range(3):
                for j in range(3):
                    pen_ij = pen * length * np.einsum(
                        "q,q,q->", wq, phm[:, i], phm[:, j])
                    add(tm * 3 + i, tm * 3 + j, pen_ij
                        - length * gm[j] * phm[:, i] @ wq
                        - length * gm[i] * phm[:, j] @ wq)

    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(N, N))
    return A, bvec, dict(P=P, T=T, V=V, grads=grads, area=area, edges=edges)


def eta_nc_paper(u, aux, n, ksub=4):
    """sqrt(sum_k |u - I_os u|^2_{H1, subdomain k}) — paper convention,
    vertex-averaged Oswald with Dirichlet zeroing."""
    V, T, grads, area = aux["V"], aux["T"], aux["grads"], aux["area"]
    nt = T.shape[0]
    nv = V.shape[0]
    sums = np.zeros(nv)
    cnts = np.zeros(nv)
    uval = u.reshape(nt, 3)
    np.add.at(sums, T.ravel(), uval.ravel())
    np.add.at(cnts, T.ravel(), 1.0)
    avg = sums / np.maximum(cnts, 1)
    on_bnd = (np.abs(np.abs(V[:, 0]) - 1) < 1e-12) | \
        (np.abs(np.abs(V[:, 1]) - 1) < 1e-12)
    avg[on_bnd] = 0.0
    w = uval - avg[T]                              # witness nodal values
    gw = np.einsum("tid,ti->td", grads, w)         # constant per triangle
    e_t = area * np.einsum("td,td->t", gw, gw)     # |w|^2_H1 per tri
    cent = aux["P"].mean(1)
    kx = np.clip(((cent[:, 0] + 1) / (2 / ksub)).astype(int), 0, ksub - 1)
    ky = np.clip(((cent[:, 1] + 1) / (2 / ksub)).astype(int), 0, ksub - 1)
    per_sub = np.zeros(ksub * ksub)
    np.add.at(per_sub, ky * ksub + kx, e_t)
    return float(np.sqrt(per_sub.sum())), per_sub


def run(n=8):
    out = {}
    for name, mesh in (("diagonal", diagonal_mesh(n)),
                       ("crisscross", crisscross_mesh(n))):
        V, T = mesh
        A, b, aux = assemble_swipdg(V, T)
        u = spla.spsolve(A.tocsc(), b)
        eta, _ = eta_nc_paper(u, aux, n)
        out[name] = eta
        print(f"{name:10s} mesh ({T.shape[0]} triangles): "
              f"eta_nc(paper) = {eta:.4e}")
    print("reference golden: 1.66e-01;  pipeline (diagonal): 1.9921e-01")
    return out


if __name__ == "__main__":
    run()
