"""Host-CPU (numpy/scipy) weak-greedy iteration — the MEASURED full host
floor for the north-star greedy claim.

The bench's conservative floor charges the host one splu FOM solve per
greedy iteration (``bench.py``'s ``greedy_host_fom_solve_s``).  The real
host pipeline pays the whole iteration: surrogate sweep over the training
set (reduced solves + FOM residual norms), the FOM snapshot solve, the
blockwise Gram-Schmidt extension, and the re-projection of every affine
operator component onto the grown bases — the same four phases the device
``weak_greedy`` runs (``pylrbms_tpu/greedy.py:233-270``; reference pipeline:
``/root/reference/python/scripts/online_adaptive_lrbms.py`` phases 2-3 +
``reductor.py:33-73``).

This module implements that identical iteration on the scipy/numpy path an
honest CPU port would use, with every fairness lever pulled FOR the host:

- the affine-component CSRs (mu-independent) are assembled once, outside
  the timed region — same reuse policy as the device and the serving
  baseline;
- the projection is INCREMENTAL (only new basis columns are pushed through
  the operators), mirroring the device reductor's image cache;
- operator symmetry (SWIPDG) halves the coupling-projection work;
- the host is NOT charged for the online-estimator projections (Oswald /
  flux-reconstruction images) that the device re-reduction does pay.

So the measured ``host_iteration_s`` is still a floor — but a measured one,
covering all four phases, not a single-solve footnote."""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List

import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import splu


@dataclass
class HostGreedyResult:
    iteration_s: List[float]          # wall per full iteration
    phase_s: List[dict]               # per-iteration phase breakdown
    max_etas: List[float]             # surrogate maxima (parity check)
    chosen_idx: List[int]             # training indices chosen
    extras: dict = field(default_factory=dict)


def _block_diag_basis(bases: List[np.ndarray]) -> sp.csr_matrix:
    """[r_k, N] per block -> sparse global [K*N, R] with block-grouped
    column ordering (the host analog of the padded device bases)."""
    return sp.block_diag([b.T for b in bases], format="csr")


def host_weak_greedy(d, A_q, training_set, n_iter: int,
                     b0: np.ndarray | None = None) -> HostGreedyResult:
    """Run ``n_iter`` full weak-greedy iterations on the host path.

    ``d`` is the (device) model — used ONLY for mu-independent offline
    artifacts pulled outside the timed regions: theta(mu) weights per
    training parameter, the initial order-0 local bases, and the local
    energy products for Gram-Schmidt.  ``A_q`` are the pre-assembled
    affine-component CSRs (the same list the bench's conservative floor
    uses); ``b0`` the assembled RHS vector (mu-independent here)."""
    K, N = d.space.K, d.space.N
    Q = len(A_q)
    if b0 is None:
        b0 = np.asarray(d.rhs(d.parse_parameter([1.0])), np.float64).reshape(-1)

    # ---- offline artifacts (untimed; identical to the device greedy) ----
    mus = [d.parse_parameter(mu) for mu in training_set]
    thetas = [np.asarray(d.theta(mu), np.float64) for mu in mus]
    products = np.asarray(
        d.products.get("energy_mu_bar", d.products["l2"]), np.float64)
    bases = [np.atleast_2d(np.asarray(d.shape_functions(k, 0), np.float64))
             for k in range(K)]
    for k in range(K):       # normalize w.r.t. the local energy product
        b = bases[k]
        bases[k] = b / np.sqrt(np.einsum("rn,nm,rm->r", b, products[k], b)
                               )[:, None]
    # symmetry check (SWIPDG): lets the coupling projection use A V_new once
    sym = all(abs(Aq - Aq.T).max() < 1e-10 * max(abs(Aq).max(), 1e-300)
              for Aq in A_q)

    V = _block_diag_basis(bases)
    # initial projection (counted as offline, like the device's initial
    # reduction outside the steady-iteration median)
    AV = [Aq @ V.toarray() for Aq in A_q]          # dense [K*N, R]
    A_red = [np.asarray(V.T @ Y) for Y in AV]      # [R, R]
    b_red = V.T @ b0

    iteration_s, phase_s, max_etas, chosen_idx = [], [], [], []
    for it in range(n_iter):
        ph = {}
        t_it = time.perf_counter()

        # ---- phase 1: surrogate sweep (reduced solve + FOM residual) ----
        t0 = time.perf_counter()
        etas = np.empty(len(mus))
        for j, th in enumerate(thetas):
            Ar = sum(t * Aq for t, Aq in zip(th, A_red))
            c = np.linalg.solve(Ar, b_red)
            u = V @ c
            r = b0 - sum(t * (Aq @ u) for t, Aq in zip(th, A_q))
            etas[j] = np.linalg.norm(r)
        ph["sweep"] = time.perf_counter() - t0
        worst = int(np.argmax(etas))
        max_etas.append(float(etas[worst]))
        chosen_idx.append(worst)

        # ---- phase 2: FOM snapshot solve (assemble + splu) -------------
        t0 = time.perf_counter()
        th = thetas[worst]
        A_mu = sum(float(t) * Aq for t, Aq in zip(th, A_q))
        lu = splu(A_mu.tocsc())
        U = lu.solve(b0).reshape(K, N)
        ph["snapshot"] = time.perf_counter() - t0

        # ---- phase 3: blockwise Gram-Schmidt extension ------------------
        t0 = time.perf_counter()
        new_cols = []
        for k in range(K):
            v = U[k].copy()
            B, P = bases[k], products[k]
            Pv = P @ v
            nrm0 = np.sqrt(v @ Pv)
            v = v - B.T @ (B @ Pv)
            Pv = P @ v
            v = v - B.T @ (B @ Pv)                 # re-orthogonalize
            nrm = np.sqrt(max(v @ (P @ v), 0.0))
            if nrm > 1e-10 * max(nrm0, 1e-300):
                v = v / nrm
                bases[k] = np.vstack([B, v])
                new_cols.append((k, v))
        ph["gs"] = time.perf_counter() - t0

        # ---- phase 4: incremental re-projection -------------------------
        t0 = time.perf_counter()
        if new_cols:
            R_old = b_red.shape[0]
            Vn = sp.lil_matrix((K * N, len(new_cols)))
            for j, (k, v) in enumerate(new_cols):
                Vn[k * N:(k + 1) * N, j] = v[:, None]
            Vn = Vn.tocsr()
            Vd = _block_diag_basis(
                [bases[k][:-1] if any(kk == k for kk, _ in new_cols)
                 else bases[k] for k in range(K)])   # old columns only
            A_red_new = []
            for q in range(Q):
                Y = A_q[q] @ Vn.toarray()            # [K*N, R_new]
                tl = A_red[q]
                tr = np.asarray(Vd.T @ Y)            # [R_old, R_new]
                br = np.asarray(Vn.T @ Y)            # [R_new, R_new]
                if sym:
                    bl = tr.T
                else:
                    bl = np.asarray((A_q[q].T @ Vn.toarray()).T @ Vd.toarray())
                A_red_new.append(np.block([[tl, tr], [bl, br]]))
            A_red = A_red_new
            b_red = np.concatenate([b_red, np.asarray(Vn.T @ b0)])
            # the incremental update appends new columns at the END; V is
            # block-ordered — permute the reduced tensors to match (a pure
            # relabeling of the reduced coordinates, costing [R,R] copies)
            V = _block_diag_basis(bases)
            perm = _appended_to_blocked_perm(bases, new_cols, R_old)
            A_red = [Aq[np.ix_(perm, perm)] for Aq in A_red]
            b_red = b_red[perm]
        ph["projection"] = time.perf_counter() - t0

        iteration_s.append(time.perf_counter() - t_it)
        phase_s.append(ph)
    return HostGreedyResult(iteration_s=iteration_s, phase_s=phase_s,
                            max_etas=max_etas, chosen_idx=chosen_idx,
                            extras={"symmetric": sym})


def _appended_to_blocked_perm(bases, new_cols, R_old):
    """Permutation taking [old blocked columns..., new columns...] to the
    blocked ordering of the grown bases (new column last within its block)."""
    K = len(bases)
    old_sizes = [bases[k].shape[0] - (1 if any(kk == k for kk, _ in new_cols)
                                      else 0) for k in range(K)]
    new_of = {k: j for j, (k, _) in enumerate(new_cols)}
    perm = []
    old_off = np.concatenate([[0], np.cumsum(old_sizes)])
    for k in range(K):
        perm.extend(range(int(old_off[k]), int(old_off[k + 1])))
        if k in new_of:
            perm.append(R_old + new_of[k])
    return np.asarray(perm)
