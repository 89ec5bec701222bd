"""LRBMS reductors: local reduced bases + blockwise Galerkin projection.

TPU-native re-design of ``/root/reference/python/dune/pylrbms/reductor.py``
(``LRBMSReductor(GenericRBSystemReductor)``, ``:17-78``) and the pyMOR
machinery it consumes (SURVEY.md §2.4):

* local bases live per subdomain, orthonormalized w.r.t. the local energy DG
  product (gram_schmidt, ``reductor.py:30-31``; products passed at
  ``scripts/linearelliptic_block_swipdg_decomp.py:46-48``);
* ``reduce()`` projects the affine block operator/rhs blockwise
  (A_hat_ij = V_i^T A_ij V_j, pyMOR ``GenericRBSystemReductor._reduce``) and
  precomputes *projected estimator tensors* so the online estimate is
  N-independent (the role of the projected Oswald/flux-reconstruction
  operators, ``reductor.py:33-73``);
* ``enrich_local(subdomain, U, mu)`` solves the oversampled corrector problem
  and extends the local basis (``reductor.py:75-78``).

Offline linear algebra runs in float64 numpy on host (it is small and
latency-bound); the produced ReducedModel carries padded, batched jnp tensors
so the online solve + localized estimate are jit-able array programs.

``ParallelLRBMSReductor`` (``reductor.py:81-147``) exists in the reference for
MPI operator summation but its reduction path is dead code (early return at
``:125``); its role here is played by sharding the K axis (parallel/).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .model import StationaryBlockModel
from .la.block import AssembledBlockOp, dense_inv_mixed
from .utils.precision import hp
from .parameters import evaluate_coefficients


class ExtensionError(Exception):
    """Basis extension added nothing new (<-> pymor.core.exceptions.ExtensionError)."""


def gram_schmidt(new: np.ndarray, existing: np.ndarray, P: np.ndarray,
                 rtol: float = 1e-10):
    """Orthonormalize rows of `new` [m, N] against `existing` [r, N] w.r.t.
    the spd product P [N, N]; returns accepted rows (orthonormal)."""
    accepted = []
    basis = [v for v in existing]
    for v in new:
        v = np.asarray(v, dtype=np.float64).copy()
        norm0 = np.sqrt(max(v @ (P @ v), 0.0))
        if norm0 <= 0.0:
            continue
        for _ in range(2):   # reorthogonalization pass
            for b in basis:
                v -= (b @ (P @ v)) * b
        norm = np.sqrt(max(v @ (P @ v), 0.0))
        if norm > rtol * norm0:
            v /= norm
            basis.append(v)
            accepted.append(v)
    return np.asarray(accepted).reshape(len(accepted), new.shape[1])


@dataclass
class ReducedModel:
    """Dense reduced block model + batched projected estimator.

    Online layout: padded coefficients c [K, r_max]; the reduced system is a
    dense [K*r_max, K*r_max] matrix with identity rows on padding.
    """
    reductor: "LRBMSReductor"
    A_red: jnp.ndarray          # [Q, R, R] (R = K*r_max), padded
    b_red: jnp.ndarray          # [Qf, R]
    sizes: np.ndarray           # [K] actual local basis sizes
    r_max: int
    # ---- projected estimator tensors (neighborhood-padded, P = 9*r_max) ----
    nbhd_idx: np.ndarray        # [K, 9] neighbor subdomain ids (-1 pad)
    G_nc: jnp.ndarray           # [K, P, P]
    AA: jnp.ndarray             # [Q, Q, K, r_max, r_max]
    ABT: jnp.ndarray            # [Q(lam), Q(flux), K, r_max, P]
    BBT: jnp.ndarray            # [Q, Q, K, P, P]
    DV: jnp.ndarray             # [Qf, Q, K, P]
    RD: jnp.ndarray             # [Q, Q, K, P, P]
    rf_qq: jnp.ndarray          # [Qf, Qf, K]
    min_ev: jnp.ndarray
    diam: jnp.ndarray
    # ---- algebraic-residual Gramians (greedy surrogate; N-independent) ----
    parabolic: dict = None      # projected parabolic tensors (optional)
    G_bb: jnp.ndarray = None    # [Qf, Qf]
    G_Ab: jnp.ndarray = None    # [Q, Qf, R]
    G_AA: jnp.ndarray = None    # [Q, Q, R, R]

    # ------------------------------------------------------------------
    @property
    def d(self):
        return self.reductor.d

    @property
    def solution_dim(self) -> int:
        return int(self.sizes.sum())

    def parse_parameter(self, mu):
        return self.d.parse_parameter(mu)

    @property
    def parameter_space(self):
        return self.d.parameter_space

    def solve(self, mu):
        """Dense reduced block solve (<-> ``rd.solve``)."""
        mu = self.parse_parameter(mu)
        theta = self.d.theta(mu)
        A = jnp.einsum("q,qij->ij", theta, self.A_red)
        b = jnp.einsum("q,qi->i", self.d.theta_f(mu), self.b_red)
        from .la.block import dense_solve_mixed
        c = dense_solve_mixed(A, b)
        return c.reshape(len(self.sizes), self.r_max)

    def reconstruct(self, c):
        return self.reductor.reconstruct(c)

    def solve_sharded(self, mu, mesh, tol: float = 1e-12,
                      maxiter: int = 2000):
        """Block-row-sharded reduced solve — the TP analog (SURVEY §2.5):
        the reduced block system's K axis is laid out over the device mesh,
        each device owns its subdomains' block ROWS of A_red(theta) and the
        matvec's gather of the replicated iterate rides the mesh (GSPMD
        inserts the collectives).  The solver is block-Jacobi PCG on the
        (SPD, identity-padded) reduced system: per-subdomain [r_max, r_max]
        diagonal-block inverses precondition, so iteration counts stay small
        while the memory/compute of the reduced solve scales 1/n_devices —
        the scaling wall PARITY.md §2.5 previously listed as future work
        (large K*r at model-2 scale).

        Parity: == :meth:`solve` (dense replicated LU) at solver tolerance;
        asserted in tests/test_reduced_sharded.py and the driver dryrun."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        mu = self.parse_parameter(mu)
        theta = self.d.theta(mu)
        theta_f = self.d.theta_f(mu)
        K = len(self.sizes)
        r = self.r_max
        Q = self.A_red.shape[0]
        A_rows = self.A_red.reshape(Q, K, r, K * r)
        A_rows = jax.device_put(A_rows, NamedSharding(mesh, P(None, axis)))
        b_rows = jax.device_put(self.b_red.reshape(-1, K, r),
                                NamedSharding(mesh, P(None, axis)))
        key = ("solve_sharded", Q, K, r, float(tol), int(maxiter), axis,
               mesh.devices.size)
        cache = _ONLINE_JIT_CACHE
        fn = cache.get(key)
        if fn is None:
            @jax.jit
            @hp
            def fn(A_rows_, b_rows_, th, th_f):
                A = jnp.einsum("q,qkrR->krR", th, A_rows_)
                b = jnp.einsum("q,qkr->kr", th_f, b_rows_)
                # per-subdomain diagonal blocks (identity on padding) ->
                # the block-Jacobi preconditioner of the reduced system.
                # One-hot contraction instead of a gather: the k axis of D
                # inherits A's sharding with no cross-device movement.
                A4 = A.reshape(K, r, K, r)
                D = jnp.einsum("krCs,kC->krs", A4, jnp.eye(K, dtype=A.dtype))
                dt_ = A.dtype
                inv_dt = (jnp.float32
                          if (dt_ == jnp.float64
                              and jax.default_backend() != "cpu") else dt_)
                Dinv = jnp.linalg.inv(D.astype(inv_dt)).astype(dt_)

                def mv(c):
                    return jnp.einsum("krR,R->kr", A, c.reshape(-1))

                def M(rv):
                    return jnp.einsum("krs,ks->kr", Dinv, rv)

                def dot(u, v):
                    return jnp.vdot(u, v)

                atol2 = (tol ** 2) * jnp.maximum(dot(b, b), 1e-300)
                x0 = jnp.zeros_like(b)
                r0 = b - mv(x0)
                z0 = M(r0)
                st0 = (x0, r0, z0, z0, dot(r0, z0), 0)

                def cond(st):
                    return jnp.logical_and(dot(st[1], st[1]) > atol2,
                                           st[5] < maxiter)

                def body(st):
                    x, rr, z, p, rz, it = st
                    Ap = mv(p)
                    alpha = rz / dot(p, Ap)
                    x = x + alpha * p
                    rr = rr - alpha * Ap
                    z = M(rr)
                    rzn = dot(rr, z)
                    p = z + (rzn / rz) * p
                    return (x, rr, z, p, rzn, it + 1)

                out = jax.lax.while_loop(cond, body, st0)
                return out[0]
            cache[key] = fn
        with mesh:
            return fn(A_rows, b_rows, theta, theta_f)

    # ------------------------------------------------------------------
    def _gather_neighborhood(self, c):
        """c [..., K, r_max] -> chat [..., K, P*r_max] (zero-padded;
        P = patch size, 9 in 2D / 27 in 3D)."""
        idx = jnp.asarray(np.where(self.nbhd_idx < 0, 0, self.nbhd_idx))
        mask = jnp.asarray((self.nbhd_idx >= 0).astype(np.float64))
        Pn = self.nbhd_idx.shape[1]
        g = c[..., idx, :]                             # [..., K, P, r_max]
        g = g * mask[..., :, None]
        return g.reshape(g.shape[:-2] + (Pn * self.r_max,))

    def residual_norm(self, c, mu):
        """l2 dual norm of the algebraic FOM residual ||b(mu) - A(mu) V c||_2,
        assembled from the projected Gramians — the greedy error surrogate
        (goes to 0 as the ROM approaches the FOM, unlike the LRBMS total-error
        estimator which is floored by the discretization error)."""
        # the three terms nearly cancel as the ROM converges: compute in the
        # widest available precision (f64 when x64 is enabled; the reduced
        # Gramians are small, so emulated f64 on TPU is cheap).  In plain
        # f32 the surrogate collapses to 0 and the greedy never selects.
        wide = jax.dtypes.canonicalize_dtype(jnp.float64)
        theta = self.d.theta(mu).astype(wide)
        theta_f = self.d.theta_f(mu).astype(wide)
        cf = c.reshape(c.shape[:-2] + (-1,)).astype(wide)
        bb = jnp.einsum("p,r,pr->", theta_f, theta_f, self.G_bb.astype(wide))
        Ab = jnp.einsum("q,f,qfi,...i->...", theta, theta_f,
                        self.G_Ab.astype(wide), cf)
        AA = jnp.einsum("p,r,prij,...i,...j->...", theta, theta,
                        self.G_AA.astype(wide), cf, cf)
        return jnp.sqrt(jnp.maximum(bb - 2.0 * Ab + AA, 0.0))

    def local_quantities(self, c, mu):
        """Reduced localized squared quantities; c [..., K, r_max] -> [..., K].

        Algebraically identical to the FOM estimator applied to the
        reconstruction (exact Galerkin projection), at N-independent cost.
        (Batched callers that need the Gramians as jit ARGUMENTS rather
        than HLO constants rebuild the model with tracer fields via
        ``dataclasses.replace`` — see ``estimate_batch``.)"""
        theta = self.d.theta(mu)
        theta_f = self.d.theta_f(mu)
        ch = self._gather_neighborhood(c)              # [..., K, P]

        eta_nc = jnp.einsum("...kp,kpr,...kr->...k", ch, self.G_nc, ch)

        rf = jnp.einsum("p,r,prk->k", theta_f, theta_f, self.rf_qq)
        r_fd = jnp.einsum("f,q,fqkp,...kp->...k", theta_f, theta, self.DV, ch)
        r_dd = jnp.einsum("p,r,prkuv,...ku,...kv->...k", theta, theta, self.RD, ch, ch)
        scale = (1.0 / (jnp.pi ** 2) / self.min_ev) * self.diam ** 2
        eta_r = (rf - 2.0 * r_fd + r_dd) * scale

        aa = jnp.einsum("p,r,prkuv,...ku,...kv->...k", theta, theta, self.AA, c, c)
        bb = jnp.einsum("p,r,prkuv,...ku,...kv->...k", theta, theta, self.BBT, ch, ch)
        ab = jnp.einsum("p,r,prkuv,...ku,...kv->...k", theta, theta, self.ABT, c, ch)
        eta_df = aa + bb + 2.0 * ab
        return eta_nc, eta_r, eta_df

    def estimate(self, c, mu, decompose: bool = False,
                 paper_convention: bool = False):
        """Reduced estimate (same aggregation as the FOM estimator,
        estimators.py docstring)."""
        from .estimators import aggregate_eta
        mu = self.parse_parameter(mu)
        est = self.d.estimator
        single = c.ndim == 2
        cb = c[None] if single else c
        eta_nc, eta_r, eta_df = self.local_quantities(cb, mu)
        return aggregate_eta(est, mu, eta_nc, eta_r, eta_df, decompose,
                             paper_convention=paper_convention)

    # ------------------------------------------------------------------
    _ARRAY_FIELDS = ("A_red", "b_red", "G_nc", "AA", "ABT", "BBT", "DV",
                     "RD", "rf_qq", "min_ev", "diam", "G_bb", "G_Ab", "G_AA")

    def online_step(self, mu):
        """One jitted ROM online step ``mu -> (c, eta, indicators)``.

        Collapses the adaptive loop's per-round cost from ~30 eager device
        round-trips (solve + estimate op-by-op) to ONE dispatch.  The
        compiled program is keyed on tensor shapes only, so it is reused
        across enrichment rounds within the same r_max bucket (reduce()
        buckets r_max by R_BUCKET) — the tensors ride in as arguments, the
        cached skeleton contributes nothing but static metadata (K and the
        neighborhood table, which never change for a given model)."""
        import dataclasses
        mu = self.parse_parameter(mu)
        # Optional CPU-hosting of the reduced step (reductor.host_online):
        # OFF by default — the reduced tensors are small (~30 MB at SPE10
        # scale) so HBM pressure is negligible, while the per-reduce
        # device->host copy is expensive when the chip is REMOTE (measured
        # ~12 s/enrichment round over the tunnel vs a 0.04 s on-device
        # step).  Set reductor.host_online = True to host the step on CPU
        # (e.g. local chips with tight HBM).
        use_cpu = (jax.default_backend() != "cpu"
                   and bool(getattr(self.reductor, "host_online", False))
                   and len(self.sizes) * self.r_max >= 2048)
        if use_cpu:
            arrays = getattr(self, "_host_arrays", None)
            if arrays is None:
                cpu = jax.devices("cpu")[0]
                arrays = {n: jax.device_put(getattr(self, n), cpu)
                          for n in self._ARRAY_FIELDS
                          if getattr(self, n) is not None}
                object.__setattr__(self, "_host_arrays", arrays)
            cpu = jax.devices("cpu")[0]
            mu = {k: jax.device_put(jnp.asarray(v), cpu)
                  for k, v in mu.items()}
        else:
            arrays = {n: getattr(self, n) for n in self._ARRAY_FIELDS
                      if getattr(self, n) is not None}
        key = (use_cpu,) + tuple((n, tuple(map(int, a.shape)), str(a.dtype))
                                 for n, a in sorted(arrays.items()))
        fn = _ONLINE_JIT_CACHE.get(key)
        if fn is None:
            skeleton = self

            @jax.jit
            @hp
            def fn(arrays, mu):
                rdt = dataclasses.replace(skeleton, **arrays)
                c = rdt.solve(mu)
                eta, _, indicators = rdt.estimate(c, mu, decompose=True)
                return c, eta, indicators

            _ONLINE_JIT_CACHE[key] = fn
        if use_cpu:
            with jax.default_device(jax.devices("cpu")[0]):
                return fn(arrays, mu)
        return fn(arrays, mu)


_ONLINE_JIT_CACHE: dict = {}


class LRBMSReductor:
    """<-> ``reductor.LRBMSReductor`` (``reductor.py:17-78``)."""

    def __init__(self, d: StationaryBlockModel, bases: Optional[List[np.ndarray]] = None,
                 products: Optional[jnp.ndarray] = None, order: Optional[int] = None,
                 num_cpus: int = 1, solver_options=None, mesh=None):
        assert order is None or 0 <= order <= 1
        self.d = d
        self.solver_options = solver_options
        # default SubdomainMesh for reduce(); every re-reduction in the
        # greedy / online-enrichment loops then runs K-sharded
        self.mesh = mesh
        K, N = d.space.K, d.space.N
        if products is None:
            products = d.products.get("energy_mu_bar", d.products["l2"])
        self.products = np.asarray(products, dtype=np.float64)   # [K, N, N]
        self.bases: List[np.ndarray] = ([np.asarray(b, dtype=np.float64).reshape(-1, N)
                                         for b in bases] if bases is not None
                                        else [np.zeros((0, N))] * K)
        self.bases = list(self.bases)
        if order is None and bases is None:
            order = 0
        if order is not None:
            for ii in range(K):
                self.extend_basis_local(ii, np.asarray(d.shape_functions(ii, order)))

    # ------------------------------------------------------------------
    def extend_basis_local(self, subdomain: int, vectors) -> int:
        """Gram-Schmidt extend the local basis w.r.t. the local energy product
        (``reductor.py:30-31,78``).  Raises ExtensionError if nothing new."""
        vecs = np.atleast_2d(np.asarray(vectors, dtype=np.float64))
        added = gram_schmidt(vecs, self.bases[subdomain], self.products[subdomain])
        if added.shape[0] == 0:
            raise ExtensionError(f"no new basis vectors on subdomain {subdomain}")
        self.bases[subdomain] = np.vstack([self.bases[subdomain], added])
        return added.shape[0]

    # Device-batched Gram-Schmidt for single-snapshot extensions: OFF by
    # default — measured SLOWER than the host loop at SPE10 f64 scale
    # (5-10 s vs 0.2-1.7 s: the [K,N,N] product einsums are f64-EMULATED on
    # the chip, i.e. the same flops as host numpy, and the greedy's
    # monotonically growing r_max forces a remote recompile every
    # iteration).  Kept as an option (True) for f32 models / large batches
    # where the einsums run native; tested equivalent in test_mor.py.
    batched_gs = False

    def extend_basis(self, U) -> int:
        """Blockwise extension with a global snapshot [.., K, N]
        (<-> ``GenericRBSystemReductor.extend_basis``)."""
        U = np.asarray(U, dtype=np.float64)
        if U.ndim == 2:
            U = U[None]
        use_dev = bool(self.batched_gs)
        if use_dev and U.shape[0] == 1:
            return self._extend_basis_batched(U[0])
        total = 0
        for ii in range(self.d.space.K):
            try:
                total += self.extend_basis_local(ii, U[:, ii, :])
            except ExtensionError:
                pass
        if total == 0:
            raise ExtensionError("no new basis vectors on any subdomain")
        return total

    def _extend_basis_batched(self, u: np.ndarray, rtol: float = 1e-10) -> int:
        """Device-batched Gram-Schmidt for the greedy shape (ONE new column
        per subdomain): all K projections against the local bases run as
        three batched einsums instead of a K-long host loop of per-subdomain
        numpy products (which also pulls each product block over the device
        boundary — the measured 0.2-1.7 s 'basis extension' span at SPE10
        scale).  Since the existing bases are P-orthonormal, the classical
        (sum) projection equals the host loop's sequential (modified-GS)
        projection in exact arithmetic; the same two re-orthogonalization
        passes bound the roundoff.  Acceptance semantics mirror
        :func:`gram_schmidt` (reject when the orthogonal remainder falls
        below rtol * the initial P-norm)."""
        K, N = self.d.space.K, self.d.space.N
        sizes = self.basis_sizes()
        r_max = max(1, int(sizes.max()))
        V = jnp.asarray(self._padded_bases(r_max))
        mask = jnp.asarray((np.arange(r_max)[None, :]
                            < sizes[:, None]).astype(np.float64))
        if not hasattr(self, "_gs_cache"):
            self._gs_cache = {}
        fn = self._gs_cache.get((r_max, rtol))
        if fn is None:
            @jax.jit
            @hp
            def fn(P, V, mask, u):
                def pnorm(v):
                    q = jnp.einsum("kn,knm,km->k", v, P, v)
                    return jnp.sqrt(jnp.maximum(q, 0.0))
                norm0 = pnorm(u)
                v = u
                for _ in range(2):   # re-orthogonalization pass
                    Pv = jnp.einsum("knm,km->kn", P, v)
                    coef = jnp.einsum("krn,kn->kr", V, Pv) * mask
                    v = v - jnp.einsum("kr,krn->kn", coef, V)
                norm = pnorm(v)
                accept = (norm > rtol * norm0) & (norm0 > 0.0)
                w = v / jnp.where(norm > 0.0, norm, 1.0)[:, None]
                return w, accept
            self._gs_cache[(r_max, rtol)] = fn
        w, accept = fn(jnp.asarray(self.products), V, mask,
                       jnp.asarray(u, jnp.float64))
        w = np.asarray(w, dtype=np.float64)
        accept = np.asarray(accept)
        total = 0
        for k in np.where(accept)[0]:
            self.bases[k] = np.vstack([self.bases[k], w[k]])
            total += 1
        if total == 0:
            raise ExtensionError("no new basis vectors on any subdomain")
        return total

    def basis_sizes(self) -> np.ndarray:
        return np.array([b.shape[0] for b in self.bases])

    def reconstruct(self, c) -> jnp.ndarray:
        """Padded reduced coefficients [.., K, r_max] -> [.., K, N]."""
        c = np.asarray(c)
        K, N = self.d.space.K, self.d.space.N
        r_max = c.shape[-1]
        V = self._padded_bases(r_max)                      # [K, r_max, N]
        return jnp.asarray(np.einsum("...kr,krn->...kn", c, V))

    def reconstruct_local(self, c, subdomain: int):
        c = np.asarray(c)
        V = self.bases[subdomain]
        r = V.shape[0]
        return jnp.asarray(np.einsum("...r,rn->...n", c[..., subdomain, :r], V))

    def _padded_bases(self, r_max: int) -> np.ndarray:
        K, N = self.d.space.K, self.d.space.N
        V = np.zeros((K, r_max, N))
        for ii, b in enumerate(self.bases):
            V[ii, :b.shape[0]] = b
        return V

    # ------------------------------------------------------------------
    def enrich_local(self, subdomain: int, U=None, mu=None, mode: str = "residual",
                     current_solution=None):
        """Corrector solve + local extension (``reductor.py:75-78``).

        ``U`` is the current *reduced* solution (padded coefficients); in
        residual mode it is reconstructed to drive the residual corrector
        (<-> ``reconstruct_local`` per neighborhood member, ``reductor.py:76``).
        Pass ``current_solution`` ([K, N]) directly when the bases may have
        grown since ``U`` was computed (mid-enrichment-round).
        Returns the number of added vectors (0 if extension failed)."""
        current = current_solution
        if current is None and U is not None and mode == "residual":
            current = self.reconstruct(U)
        w = self.d.solve_for_local_correction(subdomain, None, mu,
                                              inverse_options=self.solver_options,
                                              current_solution=current, mode=mode)
        try:
            return self.extend_basis_local(subdomain, np.asarray(w))
        except ExtensionError:
            return 0

    # ------------------------------------------------------------------
    # the full blockwise projection as ONE jitted batched computation.
    # r_max is bucketed (rounded up to a multiple of 4) so enrichment only
    # recompiles when the padded width grows past a bucket boundary
    # (SURVEY.md §7 hard part 1: growing bases vs XLA static shapes).
    R_BUCKET = 4

    @staticmethod
    def _project(op_arrays, ed_arrays, rhs_q, V, mask, side_rows, edges):
        """V [K, r_max, N] padded bases (rows masked), -> all reduced tensors."""
        A_diag, C_R_io, C_R_oi, C_U_io, C_U_oi, *Wrest = op_arrays
        C_W_io, C_W_oi = Wrest if Wrest else (None, None)
        left_k, right_k, low_k, up_k, *erest = edges
        near_k, far_k = erest if erest else (None, None)
        K, r_max, N = V.shape
        Q = A_diag.shape[0]
        R = K * r_max

        # --- reduced affine operator ---
        diag = jnp.einsum("kan,qknm,kbm->qkab", V, A_diag, V)
        kk = jnp.arange(K)
        blk_r = (kk[:, None] * r_max + jnp.arange(r_max)[None, :])   # [K, r]
        A_red = jnp.zeros((Q, R, R), V.dtype)
        # scatter the K diagonal r x r blocks for all Q components at once
        # (index arrays broadcast to [K, r, r] against the leading Q axis)
        A_red = A_red.at[:, blk_r[:, :, None], blk_r[:, None, :]].add(diag)

        def couple(A_red, C, k_out, k_in, rows_out, rows_in):
            if k_out.size == 0:
                return A_red
            s, nb = C.shape[2], C.shape[3]
            Vo = V[k_out][:, :, rows_out.reshape(-1)].reshape(-1, r_max, s, nb)
            Vi = V[k_in][:, :, rows_in.reshape(-1)].reshape(-1, r_max, s, nb)
            blk = jnp.einsum("eafi,qefij,ebfj->qeab", Vo, C, Vi)
            ro = k_out[:, None] * r_max + jnp.arange(r_max)[None, :]
            ri = k_in[:, None] * r_max + jnp.arange(r_max)[None, :]
            return A_red.at[:, ro[:, :, None], ri[:, None, :]].add(blk)

        A_red = couple(A_red, C_R_io, left_k, right_k,
                       side_rows["right"], side_rows["left"])
        A_red = couple(A_red, C_R_oi, right_k, left_k,
                       side_rows["left"], side_rows["right"])
        A_red = couple(A_red, C_U_io, low_k, up_k,
                       side_rows["top"], side_rows["bottom"])
        A_red = couple(A_red, C_U_oi, up_k, low_k,
                       side_rows["bottom"], side_rows["top"])
        if C_W_io is not None:                      # 3D z-pairs
            A_red = couple(A_red, C_W_io, near_k, far_k,
                           side_rows["far"], side_rows["near"])
            A_red = couple(A_red, C_W_oi, far_k, near_k,
                           side_rows["near"], side_rows["far"])

        # identity on padded rows keeps the dense solve well-posed
        flat_mask = mask.reshape(R)          # 1 = real dof, 0 = padding
        A_red = A_red * flat_mask[None, :, None] * flat_mask[None, None, :]
        A_red = A_red.at[0].add(jnp.diag(1.0 - flat_mask))

        b_red = jnp.einsum("qkn,krn->qkr", rhs_q, V).reshape(-1, R)
        b_red = b_red * flat_mask[None, :]
        # NOTE: no [R, K, N] column stack is built here — its zeros
        # broadcast alone was a measured 12 GB padded HLO temp at SPE10
        # scale (compile-OOM); consumers chunk-build columns from V
        # (_full's _map_rowsV / _patch_rows / _colored_rows)
        return A_red, b_red

    @staticmethod
    def _patch_rows(oswald, flux, lam_funcs, V, rows_safe, valid_f, store,
                    ch: int):
        """Memory-lean Wk/Tk: neighborhood-gathered Oswald errors and flux
        reconstructions of ALL basis rows WITHOUT materializing the
        [R, K, N] stacked intermediates (B_all / W_all / T_all — the
        dominant reduce() HBM cost at SPE10 scale, ~2.5 GB at 98k dofs).

        Chunks of ``ch`` basis rows are built from V, pushed through the
        operators, and their contributions immediately gathered into the
        [K, P, (N|Nrt)] neighborhood tensors the estimator projections
        actually consume; peak extra memory is one [ch, K, N] chunk.
        Returns (Wk [K, P, N], Tk [Q, K, P, Nrt]).
        """
        K, r_max, N = V.shape
        R_all = K * r_max
        P = rows_safe.shape[1]
        # local flux width from the reconstructor itself: N_rt for RT0,
        # N_rt1 for the order-2 RT1 reconstruction (space.N_rt would
        # mis-size the stack for P2 models)
        Nrt = flux.rt_l2g.shape[-1]
        Q = len(lam_funcs)
        kk = jnp.arange(K)
        nchunks = -(-R_all // ch)
        Wk0 = jnp.zeros((K, P, N), store)
        Tk0 = jnp.zeros((Q, K, P, Nrt), store)

        def body(i, acc):
            Wk, Tk = acc
            c0 = i * ch
            r_idx = c0 + jnp.arange(ch)
            ok = (r_idx < R_all)
            r_clamped = jnp.minimum(r_idx, R_all - 1)
            k_idx = r_clamped // r_max
            j_idx = r_clamped % r_max
            vals = V[k_idx, j_idx] * ok[:, None].astype(V.dtype)
            B_chunk = jnp.zeros((ch, K, N), V.dtype)
            B_chunk = B_chunk.at[jnp.arange(ch), k_idx].set(vals)
            in_chunk = ((rows_safe >= c0) & (rows_safe < c0 + ch)
                        & (valid_f > 0))                       # [K, P]
            loc = jnp.clip(rows_safe - c0, 0, ch - 1)
            sel = in_chunk[:, :, None].astype(store)
            Wc = oswald.apply(B_chunk).astype(store)           # [ch, K, N]
            Wk = Wk + Wc[loc, kk[:, None], :] * sel
            for q, lf in enumerate(lam_funcs):
                Tc = flux.apply(lf, B_chunk).astype(store)     # [ch, K, Nrt]
                Tk = Tk.at[q].add(Tc[loc, kk[:, None], :] * sel)
            return Wk, Tk

        return jax.lax.fori_loop(0, nchunks, body, (Wk0, Tk0))

    def _make_contract_fn(self):
        """Jitted contraction-only projection: consumes CACHED neighborhood
        image stacks (Wk [K, P, N], Tk [Q, K, P, Nrt]) instead of
        recomputing the Oswald/flux applies of every basis column — the
        incremental re-reduction's fast path (lean/at-scale tensors only)."""
        d = self.d
        st = d.op.static
        side_rows = {k: jnp.asarray(v) for k, v in st.side_rows.items()}
        edges = ((st.left_k, st.right_k, st.low_k, st.up_k)
                 + ((st.near_k, st.far_k)
                    if st.near_k is not None else ()))

        @jax.jit
        @hp
        def _contract(op_arrays, ed_arrays, rhs_q, V, mask, Wk, Tk):
            A_red, b_red = LRBMSReductor._project(
                op_arrays, ed_arrays, rhs_q, V * mask[:, :, None],
                mask, side_rows, edges)
            Vm = V * mask[:, :, None]
            out = LRBMSReductor._est_projections(ed_arrays, Vm, Wk, Tk)
            out.update(A_red=A_red, b_red=b_red,
                       G_bb=None, G_Ab=None, G_AA=None)
            return out

        return _contract

    @staticmethod
    def _est_projections(ed_arrays, Vm, Wk, Tk):
        """The six projected estimator tensors.

        Contracted in the PROMOTED (wide) dtype even when the matrix
        tensors are stored f32 at scale: eta_r (rf - 2 r_fd + r_dd) and
        eta_df (aa + bb + 2 ab) are cancellation formulas, and contracting
        in f32 floors them orders of magnitude higher — measured at SPE10
        (98k dofs, contrast 3e6): online eta 5.8e2 with the promoted
        contraction vs 2.4e7 (and no longer decreasing under enrichment)
        with an f32 contraction of the same f32-stored tensors.  The f32
        STORAGE rounding of the tensor entries largely cancels between the
        r_fd/r_dd (ab/aa) terms because both derive from the same rounded
        data; independent f32 accumulation noise does not.  The promoted
        einsums cost ~264 ms at that scale — negligible against the
        re-reduction total."""
        (E_bar, BB, M_aa, M_ab, d_vec, R_dd, _l2, _div) = ed_arrays
        G_nc = jnp.einsum("kpn,knm,kqm->kpq", Wk, E_bar, Wk)
        BBT = jnp.einsum("pkur,krs,qkvs->pqkuv", Tk, BB, Tk)
        RD = jnp.einsum("pkur,krs,qkvs->pqkuv", Tk, R_dd, Tk)
        AA = jnp.einsum("prknm,kan,kbm->prkab", M_aa, Vm, Vm)
        ABT = jnp.einsum("kan,pknr,qkur->pqkau", Vm, M_ab, Tk)
        DV = jnp.einsum("fkr,qkur->fqku", d_vec, Tk)
        return dict(G_nc=G_nc, AA=AA, ABT=ABT, BBT=BBT, DV=DV, RD=RD)

    @staticmethod
    def _subdomain_colors(grid):
        """3-periodic subdomain coloring: same-color subdomains are >= 3
        apart per axis, so their 3x3(x3) oversampling neighborhoods — and
        hence the supports of Oswald/flux images of columns living on them
        (both operators are one-element-layer local, tested in
        tests/test_colored_images.py) — are DISJOINT.  Images of all
        same-color columns can then be computed in ONE batch element
        without contaminating each other's neighborhood slots.  Returns
        (color[k] in [0, n_colors), n_colors) with colors compacted to the
        ones actually used (small grids use fewer than 9/27).  ``None`` if
        the grid exposes no structured subdomain lattice."""
        K = grid.num_subdomains
        if getattr(grid, "dim", 2) == 3:
            if not hasattr(grid, "subdomain_coords"):
                return None
            coords = np.array([grid.subdomain_coords(k) for k in range(K)])
            raw = (coords[:, 0] % 3 + 3 * (coords[:, 1] % 3)
                   + 9 * (coords[:, 2] % 3))
        else:
            if not (hasattr(grid, "kx") and hasattr(grid, "ky")):
                return None
            sx = np.arange(K) % grid.kx
            sy = np.arange(K) // grid.kx
            raw = sx % 3 + 3 * (sy % 3)
        uniq, color = np.unique(raw, return_inverse=True)
        return color.astype(np.int64), int(len(uniq))

    # colored image computation is exact (disjoint supports) — the flag
    # exists so tests can compare against the row-chunked reference path
    use_colored_images = True

    @staticmethod
    def _colored_rows(oswald, flux, lam_funcs, V, rows_safe, valid_f, store,
                      color_k, n_colors: int):
        """Memory-lean Wk/Tk via neighborhood-disjoint COLOR batching:
        instead of one batch element per basis column (K*r_max global
        [K, N] vectors pushed through Oswald/flux — the measured
        re-reduction bound at SPE10 scale, each vector 99.6% zeros), one
        batch element holds ALL same-color subdomains' columns of one slot
        j.  Their images have disjoint supports (see
        :meth:`_subdomain_colors`), so each neighborhood slot reads its own
        column's image uncontaminated: n_colors * r_max applies replace
        K * r_max — a ~K/n_colors (~28x at SPE10 scale) reduction.
        Returns (Wk [K, P, N], Tk [Q, K, P, Nrt]); exact-equal to
        :meth:`_patch_rows` (adding structural zeros is exact in IEEE)."""
        K, r_max, N = V.shape
        P = rows_safe.shape[1]
        Nrt = flux.rt_l2g.shape[-1]
        Q = len(lam_funcs)
        kk = jnp.arange(K)
        onehot = (jnp.asarray(color_k)[None, :]
                  == jnp.arange(n_colors)[:, None]).astype(V.dtype)  # [C, K]
        k_src = rows_safe // r_max
        jj = rows_safe % r_max
        c_src = jnp.asarray(color_k)[k_src]                          # [K, P]
        # j-slab chunking bounds the [C*jc, K, N] batch (same role as
        # _patch_rows' row chunking); one slab at typical buckets
        jc = max(1, min(r_max, 64 // n_colors))
        njc = -(-r_max // jc)
        Wk0 = jnp.zeros((K, P, N), store)
        Tk0 = jnp.zeros((Q, K, P, Nrt), store)

        def body(i, acc):
            Wk, Tk = acc
            j0 = i * jc
            jsl = j0 + jnp.arange(jc)
            okj = (jsl < r_max)[None, :, None].astype(V.dtype)
            Vs = V[:, jnp.minimum(jsl, r_max - 1), :] * okj    # [K, jc, N]
            B = (onehot[:, None, :, None]
                 * Vs.transpose(1, 0, 2)[None])                # [C, jc, K, N]
            B = B.reshape(n_colors * jc, K, N)
            in_sl = ((jj >= j0) & (jj < j0 + jc)
                     & (valid_f > 0))                          # [K, P]
            loc = c_src * jc + jnp.clip(jj - j0, 0, jc - 1)    # [K, P]
            sel = in_sl[:, :, None].astype(store)
            Wc = oswald.apply(B).astype(store)                 # [C*jc, K, N]
            Wk = Wk + Wc[loc, kk[:, None], :] * sel
            for q, lf in enumerate(lam_funcs):
                Tc = flux.apply(lf, B).astype(store)           # [C*jc, K, Nrt]
                Tk = Tk.at[q].add(Tc[loc, kk[:, None], :] * sel)
            return Wk, Tk

        return jax.lax.fori_loop(0, njc, body, (Wk0, Tk0))

    def _make_image_update_fn(self, r_max: int, ch: int, n_batch: int = 0):
        """Jitted incremental image update for one (bucket, chunk) shape:
        computes the Oswald/flux images of up to ``ch`` NEW basis columns
        and scatters them into the cached neighborhood stacks.

        With ``n_batch`` > 0 the applies run COLOR-batched: the host
        supplies ``batch_idx`` assigning each new column to a
        (color, per-subdomain-rank) batch element with guaranteed-disjoint
        image supports (:meth:`_subdomain_colors`), so the Oswald/flux
        batch shrinks from ``ch`` global vectors to ``n_batch`` (~9 at
        SPE10 scale vs 512) — the measured steady re-reduction bound."""
        d = self.d
        ed = d.estimator.data
        K, N = d.space.K, d.space.N
        lam_funcs = ed.lambda_funcs
        oswald, flux = ed.oswald, ed.flux
        kk = jnp.arange(K)

        @jax.jit
        @hp
        def _update(V, mask, new_ids, Wk, Tk, rows_safe, valid_f,
                    batch_idx=None):
            # new_ids [ch]: ASCENDING global row ids (k*r_max + j), padded
            # at the END with the sentinel K*r_max (keeps searchsorted valid)
            sentinel = K * r_max
            ok = new_ids < sentinel
            rid = jnp.minimum(new_ids, sentinel - 1)
            k_idx = rid // r_max
            j_idx = rid % r_max
            Vm = V * mask[:, :, None]
            vals = Vm[k_idx, j_idx] * ok[:, None].astype(V.dtype)
            if n_batch:
                # sentinel rows scatter into the extra row n_batch (sliced
                # off before the applies) so they cannot clobber a real
                # (batch, k) pair
                bi = jnp.where(ok, batch_idx, n_batch)
                B_chunk = jnp.zeros((n_batch + 1, K, N), V.dtype)
                B_chunk = B_chunk.at[bi, k_idx].set(vals)[:n_batch]
            else:
                B_chunk = jnp.zeros((ch, K, N), V.dtype)
                B_chunk = B_chunk.at[jnp.arange(ch), k_idx].set(vals)
            # slot membership: which (k, p) neighborhood slots hold new ids
            pos = jnp.searchsorted(new_ids, rows_safe)           # [K, P]
            pos = jnp.clip(pos, 0, ch - 1)
            hit = (new_ids[pos] == rows_safe) & (valid_f > 0)
            sel = hit[:, :, None].astype(Wk.dtype)
            gi = batch_idx[pos] if n_batch else pos              # [K, P]
            Wc = oswald.apply(B_chunk).astype(Wk.dtype)
            Wk = Wk + Wc[gi, kk[:, None], :] * sel
            for q, lf in enumerate(lam_funcs):
                Tc = flux.apply(lf, B_chunk).astype(Tk.dtype)
                Tk = Tk.at[q].add(Tc[gi, kk[:, None], :] * sel)
            return Wk, Tk

        return _update

    def _make_project_fn(self, with_gramians):
        """Build the jitted full-projection function.  Shape-polymorphic:
        jit retraces per r_max bucket; also used by the background bucket
        prefetch (:meth:`prefetch_bucket`)."""
        d = self.d
        ed = d.estimator.data
        st = d.op.static
        K = d.space.K
        side_rows = {k: jnp.asarray(v) for k, v in st.side_rows.items()}
        edges = ((st.left_k, st.right_k, st.low_k, st.up_k)
                 + ((st.near_k, st.far_k)
                    if st.near_k is not None else ()))
        lam_funcs = ed.lambda_funcs
        oswald, flux = ed.oswald, ed.flux
        parabolic = getattr(self, 'parabolic_tensors', False)
        colors = (self._subdomain_colors(d.grid)
                  if self.use_colored_images else None)

        def _full(op_arrays, ed_arrays, rhs_q, V, mask, rows_safe, valid_f):
            A_red, b_red = LRBMSReductor._project(
                op_arrays, ed_arrays, rhs_q, V * mask[:, :, None],
                mask, side_rows, edges)
            (E_bar, BB, M_aa, M_ab, d_vec, R_dd,
             l2_blocks, A_div_c) = ed_arrays

            # R = K*r_max global basis columns: applying the flux
            # reconstruction / operator to ALL of them at once
            # materializes [R, faces, nq] temporaries (~4 GB at K=256) —
            # chunk the R axis with lax.map (serialized, memory-bounded;
            # a no-op chunking for small K)
            K_, r_max, N_ = V.shape
            R_all = K_ * r_max
            ch = max(1, min(R_all, 4096 // K))
            if getattr(self, "force_chunk", None):   # test hook
                ch = int(self.force_chunk)
            # chunk width for the maps whose STACKED output is [nch, ch,
            # K, N]: XLA lays those out with the chunk axis minor-most in
            # the 128-lane position, so a small ch pads 8x (a measured
            # 12 GB HLO temp for ch=16 at SPE10 scale, compile-OOM) —
            # lane-align it
            chV = max(ch, min(R_all, 128))
            if getattr(self, "force_chunk", None):
                chV = ch

            def _map_rows(f, B, c=None):
                c = ch if c is None else c
                pad = (-B.shape[0]) % c
                Bp = jnp.pad(B, ((0, pad),) + ((0, 0),) * (B.ndim - 1))
                out = jax.lax.map(f, Bp.reshape((-1, c) + B.shape[1:]))
                return out.reshape((-1,) + out.shape[2:])[:B.shape[0]]

            def _map_rowsV(f):
                """f applied to [chV, K, N] chunks of the VIRTUAL column
                stack B[k*r_max+j] = e_k (x) V[k, j], built on the fly —
                the materialized [R, K, N] stack's zeros broadcast alone
                was a measured 12 GB padded HLO temp at SPE10 scale
                (compile-OOM in the parabolic reduce)."""
                Vm_ = V * mask[:, :, None]
                nch = -(-R_all // chV)

                def body(i):
                    r_idx = i * chV + jnp.arange(chV)
                    ok = (r_idx < R_all)
                    r_cl = jnp.minimum(r_idx, R_all - 1)
                    k_idx = r_cl // r_max
                    vals = (Vm_[k_idx, r_cl % r_max]
                            * ok[:, None].astype(V.dtype))
                    B_chunk = jnp.zeros((chV, K, N_), V.dtype)
                    return f(B_chunk.at[jnp.arange(chV), k_idx].set(vals))

                out = jax.lax.map(body, jnp.arange(nch))
                return out.reshape((-1,) + out.shape[2:])[:R_all]

            # on accelerators the f64 [R, K, N] intermediates are
            # software-emulated (2x storage, ~4x dot temporaries): store
            # them in f32 and ACCUMULATE the Gramians in f64
            # (preferred_element_type) — entry error ~1e-7 relative, far
            # below what the residual surrogate or the estimator tensors
            # resolve.  On CPU this is the identity.
            # NOTE the f32 storage is only engaged at scale (R > 1024),
            # where the greedy uses the DIRECT residual criterion
            # ('residual_fom', greedy.py) — the quadratic-form Gramian
            # surrogate cancels below f32 entry noise at high contrast
            # (SPE10: ||A_q v||^2 entries ~1e12 vs residual^2 ~1e-4).
            wide = V.dtype
            store = wide
            if (wide == jnp.float64 and jax.default_backend() != "cpu"
                    and R_all > 1024):
                store = jnp.float32

            kk = jnp.arange(K)
            # Wk/Tk in EVERY mode via batched apply + immediate
            # neighborhood gather — never materialize the [R, K, N]
            # W_all/T_all stacks (~2.5 GB each at SPE10 scale).  The
            # gathered [K, P, *] image stacks are small and kept in the
            # WIDE dtype; the estimator-tensor projections also contract
            # PROMOTED — an f32 contraction floors the eta_r/eta_df
            # cancellations orders of magnitude higher (measured: see
            # _est_projections' docstring before "optimizing" this).
            if colors is not None:
                # neighborhood-disjoint color batching: K*r_max
                # column applies collapse to n_colors*r_max (~28x at
                # SPE10 scale; exact — see _colored_rows)
                Wk, Tk = LRBMSReductor._colored_rows(
                    oswald, flux, lam_funcs, V * mask[:, :, None],
                    rows_safe, valid_f, wide, colors[0], colors[1])
            else:
                Wk, Tk = LRBMSReductor._patch_rows(
                    oswald, flux, lam_funcs, V * mask[:, :, None],
                    rows_safe, valid_f, wide, ch)
            lean_images = ((Wk, Tk) if not (with_gramians or parabolic)
                           else None)
            A_diag_q, CRio, CRoi, CUio, CUoi, *Wq = op_arrays
            CWio, CWoi = Wq if Wq else (None, None)
            if with_gramians or parabolic:
                # keep the Q operator applies as a LIST (a stacked
                # [Q, R, K, N] copy is gigabytes at SPE10 scale, doubled
                # again by the f64-on-TPU split representation), each
                # chunk-built from V (_map_rowsV)
                AVs = [
                    _map_rowsV(lambda blk, q=q: AssembledBlockOp(
                        st, A_diag_q[q], CRio[q], CRoi[q], CUio[q],
                        CUoi[q],
                        None if CWio is None else CWio[q],
                        None if CWoi is None else CWoi[q],
                    ).apply(blk).astype(store))
                    for q in range(len(lam_funcs))]              # Q x [R, K, N]
            if with_gramians:
                G_bb = jnp.einsum("pkn,rkn->pr", rhs_q, rhs_q)
                rhs_s = rhs_q.astype(store)
                # Gramians: per-subdomain partial dots in the storage
                # dtype, reduced over K in the wide dtype.  A direct
                # f64-accumulate dot of f32 operands would push the WHOLE
                # contraction into the x64-emulation path (multi-GB
                # temporaries, the OOM at SPE10 scale); block-dot + wide
                # tree-sum keeps temporaries at chunk size with
                # ~sqrt(N)*eps_f32 entry error.
                G_Ab = jnp.stack([
                    _map_rows(lambda c: jnp.einsum("ckn,fkn->ckf", c,
                                                   rhs_s)
                              .astype(wide).sum(axis=1), AVq).T
                    for AVq in AVs])                             # [Q, Qf, R]
                G_AA = jnp.stack([jnp.stack([
                    _map_rows(lambda c, Aq=Aq: jnp.einsum(
                        "ckn,skn->cks", c, Aq).astype(wide).sum(axis=1),
                              Ap)
                    for Aq in AVs]) for Ap in AVs])              # [Q, Q, R, R]
            else:
                G_bb = G_Ab = G_AA = None

            Vm = V * mask[:, :, None]
            out = LRBMSReductor._est_projections(ed_arrays, Vm, Wk, Tk)
            out.update(A_red=A_red, b_red=b_red,
                       G_bb=G_bb, G_Ab=G_Ab, G_AA=G_AA)
            if lean_images is not None:
                # expose the gathered image stacks so reduce() can cache
                # them for INCREMENTAL re-reductions (enrichment adds a few
                # columns; re-applying Oswald/flux to all K*r_max columns
                # was the measured offline/online re-reduction bound at
                # SPE10 scale — docs/results/spe10_greedy_tpu.txt)
                out["_Wk"], out["_Tk"] = lean_images
            if parabolic:
                # fully projected parabolic estimator tensors:
                # BU_R = M^-1 A(mu) V c; F_R = M^-1 F;  needed for the
                # time residual ||B dU||^2_{M^-1} and the elliptic-
                # reconstruction eta_r additions (estimators.py parabolic
                # branch), all N-independent online.
                L2 = l2_blocks
                Linv = dense_inv_mixed(L2)
                # keep the Q mass-preconditioned applies as a LIST and the
                # Gramian as chunked block-dots (like G_AA above): a stacked
                # [Q,R,K,N] copy plus a one-shot einsum materializes
                # chunk-broadcast temporaries of O(chunk*Q*R*K*N) — measured
                # 25.7 GB compile-OOM at the SPE10 98k-dof / r_max=16 config
                MAVs = [
                    _map_rows(lambda blk: jnp.einsum(
                        "knm,ckm->ckn", Linv, blk).astype(store), AVq,
                        c=chV)
                    for AVq in AVs]                            # Q x [R,K,N]
                FR = jnp.einsum("knm,fkm->fkn", Linv, rhs_q)   # [Qf,K,N]
                # time residual Gramian: (A_q V)^T M^-1 (A_q' V) [Q,Q,R,R]
                out["G_MAA"] = jnp.stack([jnp.stack([
                    _map_rows(lambda c, Aq=Aq: jnp.einsum(
                        "ckn,skn->cks", c, Aq).astype(wide).sum(axis=1),
                              MAVp)
                    for Aq in AVs]) for MAVp in MAVs])         # [Q,Q,R,R]
                # neighborhood-padded per-subdomain tensors
                Bk = (jnp.stack([MAVq[rows_safe, kk[:, None], :]
                                 for MAVq in MAVs])
                      * valid_f[None, :, :, None])             # [Q,K,P,N]
                divTk = jnp.einsum("nr,qkur->qkun", A_div_c, Tk)  # [Q,K,P,N]
                out["G_BLB"] = jnp.einsum("pkun,knm,qkvm->pqkuv", Bk, L2, Bk)
                out["G_BLdiv"] = jnp.einsum("pkun,knm,qkvm->pqkuv", Bk, L2, divTk)
                out["G_FLF"] = jnp.einsum("fkn,knm,gkm->fgk", FR, L2, FR)
                out["G_BLF"] = jnp.einsum("pkun,knm,fkm->pfku", Bk, L2, FR)
                out["G_FLdiv"] = jnp.einsum("fkn,knm,qkum->fqku", FR, L2, divTk)
            return out

        return jax.jit(hp(_full))

    @staticmethod
    def _bucket_rows(grid, K: int, r_max: int):
        """Static neighborhood-gather metadata for a bucket width
        (patch size 9 in 2D, 27 on the 3D hex family)."""
        Pn = 27 if getattr(grid, "dim", 2) == 3 else 9
        nbhd_idx = -np.ones((K, Pn), dtype=np.int64)
        for k in range(K):
            nb_list = grid.neighborhood_of(k)
            nbhd_idx[k, :len(nb_list)] = nb_list
        rows = np.where(nbhd_idx[:, :, None] >= 0,
                        nbhd_idx[:, :, None] * r_max
                        + np.arange(r_max)[None, None, :],
                        -1).reshape(K, Pn * r_max)
        valid = (rows >= 0)
        return nbhd_idx, np.where(valid, rows, 0), valid

    def _project_key(self, r_max):
        """(jit-cache key, with_gramians) for a bucket width."""
        d = self.d
        K, N = d.space.K, d.space.N
        ed = d.estimator.data
        Q = len(ed.lambda_funcs)
        Qf = len(d.f_coeffs)
        with_gramians = not (K * r_max > 1024
                             and jax.default_backend() != "cpu")
        if getattr(self, "force_lean", False):
            # skip the algebraic-residual Gramians regardless of the size
            # heuristic: set by tests (exercise the at-scale path on CPU)
            # and by weak_greedy when its criterion never reads them
            with_gramians = False
        key = (K, N, r_max, Q, Qf, with_gramians,
               getattr(self, "force_chunk", None), self.use_colored_images)
        return key, with_gramians

    def prefetch_bucket(self, r_next: int, mesh=None):
        """AOT-compile the projection for a FUTURE r_max bucket in a daemon
        thread.  With the persistent compilation cache enabled the
        foreground jit call at that bucket becomes a disk-cache hit —
        hiding the multi-minute recompile that otherwise lands in the
        middle of an online-enrichment round at scale
        (docs/results/spe10_greedy_tpu.txt: the r_max bucket growth at
        online mu #2 cost ~450 s of compiles).  With ``mesh`` the lowering
        uses the same K-axis shardings as ``reduce(mesh=...)``.
        Best-effort end to end: a prefetch failure (e.g. a device_put
        RESOURCE_EXHAUSTED on a full chip) must never fail the reduce
        that triggered it."""
        try:
            self._prefetch_bucket(r_next, mesh)
        except Exception:       # noqa: BLE001 — prefetch is best-effort
            pass

    def _prefetch_bucket(self, r_next: int, mesh=None):
        import threading
        d = self.d
        K = d.space.K
        ed = d.estimator.data
        key, with_gramians = self._project_key(r_next)
        if not hasattr(self, "_project_cache"):
            self._project_cache = {}
        if not hasattr(self, "_prefetching"):
            self._prefetching = {}              # key -> in-flight Thread
        if key in self._project_cache or key in self._prefetching:
            return
        fn = self._make_project_fn(with_gramians)
        _, rows_safe, valid = self._bucket_rows(d.grid, K, r_next)
        # lowering inputs are SHAPE-ONLY: ShapeDtypeStructs cost no HBM
        # (a real zeros V0 device_put used to RESOURCE_EXHAUST the chip
        # when the prefetch fired while the FOM working set was resident)
        wdt = d.rhs_q.dtype
        k0sh = mesh.shard_k(0) if mesh is not None else None

        def _sds(shape, dt=wdt):
            return (jax.ShapeDtypeStruct(shape, dt, sharding=k0sh)
                    if k0sh is not None else jax.ShapeDtypeStruct(shape, dt))

        V0 = _sds((K, r_next, d.space.N))
        mask0 = _sds((K, r_next))
        rows_j = jnp.asarray(rows_safe)
        valid_j = jnp.asarray(valid, wdt)
        op_arrays = ((d.op.A_diag, d.op.C_R_io, d.op.C_R_oi,
                      d.op.C_U_io, d.op.C_U_oi)
                     + ((d.op.C_W_io, d.op.C_W_oi)
                        if d.op.C_W_io is not None else ()))
        ed_arrays = (ed.E_bar, ed.BB, ed.M_aa, ed.M_ab, ed.d_vec,
                     ed.R_dd, ed.L2, ed.A_div)
        rhs_q = d.rhs_q
        if mesh is not None:
            put = jax.device_put
            k1, k0, k2 = mesh.shard_k(1), mesh.shard_k(0), mesh.shard_k(2)
            rep = mesh.replicated()
            A_diag, *Cstrips = op_arrays
            op_arrays = ((put(A_diag, k1),)
                         + tuple(put(C, rep) for C in Cstrips))
            E_bar, BB, M_aa, M_ab, d_vec, R_dd, L2b, A_div_c = ed_arrays
            ed_arrays = (put(E_bar, k0), put(BB, k0), put(M_aa, k2),
                         put(M_ab, k1), put(d_vec, k1), put(R_dd, k0),
                         put(L2b, k0), put(A_div_c, rep))
            rhs_q = put(rhs_q, k1)
            # V0/mask0 are ShapeDtypeStructs already carrying the k0
            # sharding (built in _sds above)
            rows_j, valid_j = put(rows_j, k0), put(valid_j, k0)

        def work():
            # On the SHARDED path the incremental image-cache path never
            # runs (reduce requires mesh is None), so the full-projection
            # compile is the one thing the foreground will join on —
            # compile it FIRST and skip the incremental warms entirely.
            if mesh is not None:
                try:
                    # (Mesh contexts are thread-local — re-enter here.)
                    with mesh.mesh:
                        fn.lower(op_arrays, ed_arrays, rhs_q, V0, mask0,
                                 rows_j, valid_j).compile()
                    self._project_cache[key] = fn
                except Exception:   # noqa: BLE001 — best-effort
                    pass
                finally:
                    self._prefetching.pop(key, None)
                return
            # UNSHARDED: at a bucket growth the foreground needs the
            # ONLINE STEP + INCREMENTAL update/contract fns (the image
            # cache carries over; the full projection is only the
            # fallback), so warm those FIRST — the online-step warm needs
            # only eval_shape of fn, not its compile.  Each stage fails
            # independently: a warm failure must not prevent the full
            # projection from being compiled and cached.
            try:
                # warm the ROM online-step compile for this bucket
                # (finishes VERDICT round-1 item 5: the online step used to
                # recompile mid-enrichment at every bucket growth): build a
                # zero-filled ReducedModel with the projection's exact
                # output shapes (eval_shape — no FLOPs) and run one step,
                # populating the shape-keyed _ONLINE_JIT_CACHE.
                outs = jax.eval_shape(fn, op_arrays, ed_arrays, rhs_q, V0,
                                      mask0, rows_j, valid_j)
                # lean outputs carry None for the Gramians — keep them None
                # (a bare .shape access here used to abort the whole
                # best-effort warm silently)
                zeros = {k: (None if v is None
                             else jnp.zeros(v.shape, v.dtype))
                         for k, v in outs.items()}
                nb_idx, _, _ = self._bucket_rows(d.grid, K, r_next)
                rd0 = self._build_reduced(zeros, np.full(K, r_next), r_next,
                                          nb_idx)
                mu0 = ed.mu_bar or {}
                rd0.online_step(mu0)
                if not with_gramians:
                    # also warm the INCREMENTAL path's compiles for this
                    # bucket: the image-update fns for the production chunk
                    # shapes (enrichment adds a few columns -> ch=8; greedy
                    # adds one per subdomain -> the >=K rung) and the
                    # contract fn — the r_max-bucket growth otherwise lands
                    # these compiles mid-enrichment (measured ~54 s at
                    # SPE10 scale, docs/results/spe10_greedy_tpu.txt).
                    colors = (self._subdomain_colors(d.grid)
                              if self.use_colored_images else None)
                    if not hasattr(self, "_upd_cache"):
                        self._upd_cache = {}
                    Q = len(ed.lambda_funcs)
                    Nrt = ed.BB.shape[-1]
                    P = rows_j.shape[1]
                    Wk0 = jax.ShapeDtypeStruct((K, P, d.space.N), wdt)
                    Tk0 = jax.ShapeDtypeStruct((Q, K, P, Nrt), wdt)
                    chs = {next((c for c in self._UPD_CHUNKS if c >= n),
                                self._UPD_CHUNKS[-1])
                           for n in (8, K)}
                    for ch in sorted(chs):
                        n_batch = colors[1] if colors is not None else 0
                        ukey = (r_next, ch, n_batch)
                        if ukey in self._upd_cache:
                            continue
                        upd = self._make_image_update_fn(r_next, ch,
                                                         n_batch)
                        ids0 = jnp.asarray(np.full(ch, K * r_next,
                                                   np.int64))
                        bidx0 = (jnp.asarray(np.zeros(ch, np.int64))
                                 if n_batch else None)
                        upd.lower(V0, mask0, ids0, Wk0, Tk0, rows_j,
                                  valid_j, bidx0).compile()
                        self._upd_cache[ukey] = upd
                    contract = getattr(self, "_contract_fn", None)
                    if contract is None:
                        contract = self._make_contract_fn()
                        self._contract_fn = contract
                    contract.lower(op_arrays, ed_arrays, rhs_q, V0, mask0,
                                   Wk0, Tk0).compile()
            except Exception:      # noqa: BLE001 — warms are best-effort
                pass
            try:
                # the full projection LAST: it only runs when the image
                # cache cannot be reused (fresh reductor / parabolic), so
                # its multi-minute compile must not delay the
                # growth-critical fns above
                fn.lower(op_arrays, ed_arrays, rhs_q, V0, mask0,
                         rows_j, valid_j).compile()
                self._project_cache[key] = fn
            except Exception:      # noqa: BLE001 — prefetch is best-effort
                pass
            finally:
                self._prefetching.pop(key, None)

        t = threading.Thread(target=work, daemon=True, name="bucket-prefetch")
        self._prefetching[key] = t
        t.start()

    def reduce(self, mesh=None) -> ReducedModel:
        """Blockwise Galerkin projection + projected estimator tensors.

        With ``mesh`` (a :class:`~pylrbms_tpu.parallel.mesh.SubdomainMesh`)
        the projection runs K-sharded over the device mesh: every
        per-subdomain input is placed with its K axis on the mesh axis and
        GSPMD shards the whole projection graph — this divides the peak
        HBM of the offline/enrichment re-reduction (the single-chip
        capacity edge at SPE10 scale, docs/results/spe10_greedy_tpu.txt)
        by the device count.  Results match the unsharded path (tested on
        the virtual 8-device mesh).  Defaults to ``self.mesh`` so the
        greedy / enrichment re-reductions inherit the sharding."""
        mesh = mesh if mesh is not None else getattr(self, "mesh", None)
        d = self.d
        sp = d.space
        K, N, Nrt = sp.K, sp.N, sp.N_rt
        sizes = self.basis_sizes()
        r_max = int(max(1, sizes.max()))
        r_max = -(-r_max // self.R_BUCKET) * self.R_BUCKET   # bucket
        V = jnp.asarray(self._padded_bases(r_max))           # [K, r_max, N]
        mask = jnp.asarray((np.arange(r_max)[None, :]
                            < sizes[:, None]).astype(np.float64))
        ed = d.estimator.data
        Q = len(ed.lambda_funcs)
        Qf = len(d.f_coeffs)

        # neighborhood gather rows [K, P] into the stacked basis axis
        nbhd_idx, rows_safe, valid = self._bucket_rows(d.grid, K, r_max)

        op_arrays = ((d.op.A_diag, d.op.C_R_io, d.op.C_R_oi,
                      d.op.C_U_io, d.op.C_U_oi)
                     + ((d.op.C_W_io, d.op.C_W_oi)
                        if d.op.C_W_io is not None else ()))
        ed_arrays = (ed.E_bar, ed.BB, ed.M_aa, ed.M_ab, ed.d_vec,
                     ed.R_dd, ed.L2, ed.A_div)

        # per-reductor jit cache (the traced closure captures this model's
        # coefficient functions); keyed by the bucketed padded width.
        # Note on with_gramians: at scale the greedy uses the direct
        # FOM-residual criterion (residual_fom, greedy.py), so the
        # algebraic-residual Gramians — the most memory-hungry projections
        # (Q applies of A to ALL R global basis columns + [R, R] chunk
        # loops) — are skipped entirely.
        if not hasattr(self, "_project_cache"):
            self._project_cache = {}
        key, with_gramians = self._project_key(r_max)
        # will the incremental image-cache path serve this reduce?  Then the
        # full-projection fn is never CALLED (only threaded through as the
        # fallback), so do NOT block on an in-flight prefetch compile of it
        # — joining here cost ~90 s at the first bucket growth of an
        # enrichment mu at SPE10 scale.
        cache_ = getattr(self, "_img_cache", None)
        incremental = (not with_gramians
                       and not getattr(self, "parabolic_tensors", False)
                       and cache_ is not None
                       and not getattr(self, "force_full_projection", False)
                       and cache_["r_max"] <= r_max
                       and bool(np.all(sizes >= cache_["sizes"]))
                       and mesh is None)
        fn = self._project_cache.get(key)
        if fn is None and not incremental:
            # reuse an in-flight prefetch compile rather than racing it with
            # a second identical foreground compile
            t = getattr(self, "_prefetching", {}).get(key)
            if t is not None:
                t.join()
                fn = self._project_cache.get(key)
        if fn is None and not incremental:
            fn = self._make_project_fn(with_gramians)
            self._project_cache[key] = fn
        # when incremental, fn may stay None — _reduce_unsharded only
        # needs it on the fallback path and builds it lazily there


        rows_j = jnp.asarray(rows_safe)
        valid_j = jnp.asarray(valid, V.dtype)
        rhs_j = d.rhs_q
        if mesh is not None:
            put = jax.device_put
            k1, k0, k2 = mesh.shard_k(1), mesh.shard_k(0), mesh.shard_k(2)
            rep = mesh.replicated()
            A_diag, *Cstrips = op_arrays
            op_arrays = ((put(A_diag, k1),)
                         + tuple(put(C, rep) for C in Cstrips))
            E_bar, BB, M_aa, M_ab, d_vec, R_dd, L2b, A_div_c = ed_arrays
            ed_arrays = (put(E_bar, k0), put(BB, k0), put(M_aa, k2),
                         put(M_ab, k1), put(d_vec, k1), put(R_dd, k0),
                         put(L2b, k0), put(A_div_c, rep))
            rhs_j = put(rhs_j, k1)
            V = put(V, k0)
            mask = put(mask, k0)
            rows_j = put(rows_j, k0)
            valid_j = put(valid_j, k0)
            with mesh.mesh:
                out = fn(op_arrays, ed_arrays, rhs_j, V, mask, rows_j, valid_j)
            out.pop("_Wk", None), out.pop("_Tk", None)
        else:
            out = self._reduce_unsharded(fn, with_gramians, op_arrays,
                                         ed_arrays, rhs_j, V, mask, rows_j,
                                         valid_j, sizes, r_max)
        # overlap the NEXT bucket's compile with ongoing work (greedy /
        # enrichment grow r_max monotonically); accelerators only — on
        # CPU (tests) compiles are cheap and threads add noise.  The
        # K-sharded path prefetches with the same shardings.
        if getattr(self, "prefetch_next", jax.default_backend() != "cpu"):
            self.prefetch_bucket(r_max + self.R_BUCKET, mesh=mesh)

        return self._build_reduced(out, sizes, r_max, nbhd_idx)

    # incremental-update chunk ladder: few distinct compiled shapes
    _UPD_CHUNKS = (8, 64, 512)

    def _reduce_unsharded(self, fn, with_gramians, op_arrays, ed_arrays,
                          rhs_j, V, mask, rows_j, valid_j, sizes, r_max):
        """Unsharded projection with INCREMENTAL re-reduction: the cached
        neighborhood image stacks (Wk/Tk) are updated only for basis
        columns added since the previous reduce() — enrichment adds a few
        columns per round, while re-applying Oswald/flux to all K*r_max
        columns was the measured re-reduction bound at SPE10 scale
        (docs/results/spe10_greedy_tpu.txt).  Bases are append-only
        (extend_basis_local), so previously computed images stay valid;
        bucket growth remaps the slot layout.  Falls back to the full
        projection whenever the cache cannot be reused."""
        K = self.d.space.K
        lean = not (with_gramians
                    or getattr(self, "parabolic_tensors", False))
        cache = getattr(self, "_img_cache", None)
        if (lean and cache is not None
                and not getattr(self, "force_full_projection", False)
                and cache["r_max"] <= r_max
                and np.all(sizes >= cache["sizes"])):
            Wk, Tk = cache["Wk"], cache["Tk"]
            r_old = cache["r_max"]
            if r_old < r_max:          # bucket grew: remap slot layout
                def grow(X, axis):
                    shp = list(X.shape)
                    Pn = shp[axis] // r_old
                    Xr = X.reshape(shp[:axis] + [Pn, r_old] + shp[axis + 1:])
                    pad = [(0, 0)] * Xr.ndim
                    pad[axis + 1] = (0, r_max - r_old)
                    Xr = jnp.pad(Xr, pad)
                    return Xr.reshape(shp[:axis] + [Pn * r_max]
                                      + shp[axis + 1:])
                Wk, Tk = grow(Wk, 1), grow(Tk, 2)
            new_rows = np.concatenate([
                k * r_max + np.arange(cache["sizes"][k], sizes[k])
                for k in range(K)]).astype(np.int64)
            if not hasattr(self, "_upd_cache"):
                self._upd_cache = {}
            colors = (self._subdomain_colors(self.d.grid)
                      if self.use_colored_images else None)
            i = 0
            while i < len(new_rows):
                n = len(new_rows) - i
                ch = next((c for c in self._UPD_CHUNKS if c >= n),
                          self._UPD_CHUNKS[-1])
                take = min(n, ch)
                ids = np.full(ch, K * r_max, np.int64)   # end sentinel
                ids[:take] = np.sort(new_rows[i:i + take])
                n_batch = 0
                bidx = None
                if colors is not None:
                    color_k, n_colors = colors
                    kseq = ids[:take] // r_max           # ascending, same-k
                    # per-subdomain rank within the chunk (adjacent runs)
                    rank = np.arange(take) - np.searchsorted(kseq, kseq)
                    mb = 1 << int(np.max(rank, initial=0)).bit_length() \
                        if rank.size and rank.max() > 0 else 1
                    n_batch = n_colors * mb
                    bidx = np.zeros(ch, np.int64)
                    bidx[:take] = color_k[kseq] * mb + rank
                    bidx = jnp.asarray(bidx)
                ukey = (r_max, ch, n_batch)
                upd = self._upd_cache.get(ukey)
                if upd is None:
                    upd = self._make_image_update_fn(r_max, ch, n_batch)
                    self._upd_cache[ukey] = upd
                Wk, Tk = upd(V, mask, jnp.asarray(ids), Wk, Tk,
                             rows_j, valid_j, bidx)
                i += take
            contract = getattr(self, "_contract_fn", None)
            if contract is None:
                contract = self._make_contract_fn()
                self._contract_fn = contract
            out = contract(op_arrays, ed_arrays, rhs_j, V, mask, Wk, Tk)
            self._img_cache = {"r_max": r_max, "sizes": sizes.copy(),
                               "Wk": Wk, "Tk": Tk}
            return out
        if fn is None:      # reduce() skipped building it (incremental
            # was expected to serve); build + cache for this rare fallback
            key, _ = self._project_key(r_max)
            fn = self._project_cache.get(key)
            if fn is None:
                fn = self._make_project_fn(with_gramians)
                self._project_cache[key] = fn
        out = fn(op_arrays, ed_arrays, rhs_j, V, mask, rows_j, valid_j)
        Wk = out.pop("_Wk", None)
        Tk = out.pop("_Tk", None)
        if lean and Wk is not None:
            self._img_cache = {"r_max": r_max, "sizes": sizes.copy(),
                               "Wk": Wk, "Tk": Tk}
        return out

    def _build_reduced(self, out, sizes, r_max, nbhd_idx) -> "ReducedModel":
        ed = self.d.estimator.data
        return ReducedModel(
            reductor=self, A_red=out["A_red"], b_red=out["b_red"],
            sizes=sizes, r_max=r_max, nbhd_idx=nbhd_idx,
            G_nc=out["G_nc"], AA=out["AA"], ABT=out["ABT"], BBT=out["BBT"],
            DV=out["DV"], RD=out["RD"], rf_qq=ed.rf_qq, min_ev=ed.min_ev,
            diam=ed.diam, G_bb=out["G_bb"], G_Ab=out["G_Ab"],
            G_AA=out["G_AA"],
            parabolic={k: out[k] for k in
                       ("G_MAA", "G_BLB", "G_BLdiv", "G_FLF",
                        "G_BLF", "G_FLdiv") if k in out} or None)


class ParallelLRBMSReductor(LRBMSReductor):
    """Distributed-by-default reductor (<-> ``reductor.ParallelLRBMSReductor``,
    ``reference reductor.py:81-147``: the reference's MPI Allreduce of reduced
    operators is dead code — its ``_reduce`` returns before summing).

    In this framework the base reductor is already mesh-capable
    (``reduce(mesh=...)`` K-shards the whole projection graph over the
    device mesh, and ``mesh=`` in ``__init__`` makes that the default).
    This subclass makes distribution the DEFAULT: when no mesh is passed
    and more than one device is visible, it builds a 1D
    :class:`~pylrbms_tpu.parallel.mesh.SubdomainMesh` over the largest
    device prefix that divides K, so every reduce / enrichment
    re-reduction runs sharded without further plumbing.  On a single
    device it degrades to the (identical-result) local path."""

    def __init__(self, d, *args, mesh=None, **kwargs):
        if mesh is None:
            import jax
            n = len(jax.devices())
            K = d.space.K
            while n > 1 and K % n:
                n -= 1
            if n > 1:
                from .parallel.mesh import SubdomainMesh
                mesh = SubdomainMesh.create(n)
        super().__init__(d, *args, mesh=mesh, **kwargs)


class ParabolicLRBMSReductor(LRBMSReductor):
    """<-> ``reductor.ParabolicLRBMSReductor`` (``reductor.py:149-180``, a
    ``pass`` stub in the reference).  Adds the reduced mass matrix and the
    fully projected parabolic estimator tensors."""

    parabolic_tensors = True

    def reduce(self, mesh=None) -> "ReducedParabolicModel":
        rd = super().reduce(mesh=mesh)
        d = self.d
        sizes, r_max = rd.sizes, rd.r_max
        K = d.space.K
        V = self._padded_bases(r_max)
        L2 = np.asarray(d.products["l2"])
        R = K * r_max
        M_red = np.zeros((R, R))
        diag = np.einsum("kan,knm,kbm->kab", V, L2, V)
        for k in range(K):
            M_red[k * r_max:(k + 1) * r_max, k * r_max:(k + 1) * r_max] = diag[k]
        return ReducedParabolicModel(rd, jnp.asarray(M_red))


@dataclass
class ReducedParabolicModel:
    """Implicit Euler on the reduced system + parabolic reduced estimate."""
    elliptic: ReducedModel
    M_red: jnp.ndarray

    def __getattr__(self, name):
        return getattr(self.elliptic, name)

    def solve(self, mu, T: float = None, nt: int = None):
        """Reduced implicit-Euler trajectory, ONE jitted dispatch for the
        whole scan (reduced tensors as arguments): eager per-step dispatches
        cost one chip round-trip each on the remote path — measured 60
        ms/step for an N-independent solve that runs in ~1 ms/step jitted.
        On backends without f64 LU the factorization runs f32 with one f64
        iterative-refinement step per solve."""
        rd = self.elliptic
        d = rd.d
        im = self._instationary
        T = T if T is not None else im.T
        nt = int(nt if nt is not None else im.nt)
        mu = d.parse_parameter(mu)
        dt = T / nt
        fn = self._traj_fn(dt, nt, batched=False)
        return fn(self.elliptic.A_red, self.M_red, self.elliptic.b_red, mu)

    def solve_batch(self, mus, T: float = None, nt: int = None):
        """B reduced trajectories in ONE jitted dispatch ([B, nt+1, K, r]):
        the POD-greedy training sweep / parabolic ROM serving shape (the
        per-mu reduced solve is latency-bound on the remote path — one
        dispatch amortizes it B-fold, like the elliptic batched online
        step)."""
        rd = self.elliptic
        im = self._instationary
        T = T if T is not None else im.T
        nt = int(nt if nt is not None else im.nt)
        mus = [rd.d.parse_parameter(m) for m in mus]
        dt = T / nt
        fn = self._traj_fn(dt, nt, batched=True)
        mus_stacked = {k: jnp.stack([jnp.asarray(m[k]) for m in mus])
                       for k in mus[0]}
        return fn(rd.A_red, self.M_red, rd.b_red, mus_stacked)

    def _traj_fn(self, dt, nt, batched: bool):
        rd = self.elliptic
        d = rd.d
        K, r_max = len(rd.sizes), rd.r_max
        cache = getattr(self, "_traj_cache", None)
        if cache is None:
            cache = self._traj_cache = {}
        key = (float(dt), nt, K, int(r_max), batched)
        fn = cache.get(key)
        if fn is None:
            lambda_coeffs, f_coeffs = d.lambda_coeffs, d.f_coeffs
            from .utils.precision import hp

            @hp
            def _traj(A_red_q, M_red, b_red_q, mu_):
                theta = evaluate_coefficients(lambda_coeffs, mu_)
                A = jnp.einsum("q,qij->ij", theta, A_red_q)
                G = M_red + dt * A
                # keep padding rows solvable
                G = G + jnp.diag(jnp.where(jnp.diag(G) == 0, 1.0, 0.0))
                refine = (G.dtype == jnp.float64
                          and jax.default_backend() != "cpu")
                lu_dtype = jnp.float32 if refine else G.dtype
                lu, piv = jax.scipy.linalg.lu_factor(G.astype(lu_dtype))

                def lsolve(rhs):
                    x = jax.scipy.linalg.lu_solve(
                        (lu, piv), rhs.astype(lu_dtype)).astype(rhs.dtype)
                    if refine:
                        r = rhs - G @ x
                        x = x + jax.scipy.linalg.lu_solve(
                            (lu, piv), r.astype(lu_dtype)).astype(rhs.dtype)
                    return x

                def theta_f_at(t):
                    mu_t = dict(mu_)
                    mu_t["_t"] = t
                    return evaluate_coefficients(f_coeffs, mu_t)

                def step(c, n):
                    f = jnp.einsum("q,qi->i", theta_f_at((n + 1.0) * dt),
                                   b_red_q)
                    c_next = lsolve(M_red @ c + dt * f)
                    return c_next, c_next

                c0 = jnp.zeros((K * r_max,), G.dtype)
                _, traj = jax.lax.scan(step, c0, jnp.arange(nt))
                traj = jnp.concatenate([c0[None], traj], axis=0)
                return traj.reshape(nt + 1, K, r_max)

            if batched:
                fn = jax.jit(jax.vmap(_traj, in_axes=(None, None, None, 0)))
            else:
                fn = jax.jit(_traj)
            cache[key] = fn
        return fn

    def attach_instationary(self, im):
        self._instationary = im
        return self

    def estimate_batch(self, cs, mus):
        """B projected parabolic estimates in ONE jitted dispatch.

        ``cs`` [B, nt+1, K, r_max] (e.g. from :meth:`solve_batch`), ``mus``
        a length-B list -> etas [B].  The POD-greedy training-sweep shape:
        the eager per-mu projected estimate costs one remote round-trip per
        einsum, here the whole sweep is one compiled program with the
        reduced tensors as arguments (remote-compile safe).

        Like the per-mu :meth:`estimate`, dt comes from the ATTACHED
        instationary model's (T, nt) — cached per (T, nt, shapes), so
        re-attaching a model with a different time grid retraces."""
        import dataclasses
        rd = self.elliptic
        im = self._instationary
        d = rd.d
        mus = [dict(d.parse_parameter(m)) for m in mus]
        for m in mus:
            m.setdefault("_t", 0.0)
        mus_stacked = {k: jnp.stack([jnp.asarray(m[k]) for m in mus])
                       for k in mus[0]}
        arrays = {n: getattr(rd, n) for n in rd._ARRAY_FIELDS
                  if getattr(rd, n) is not None}
        pb = rd.parabolic
        cache = getattr(self, "_est_batch_cache", None)
        if cache is None:
            cache = self._est_batch_cache = {}
        key = (float(im.T), int(im.nt), tuple(map(int, cs.shape)),
               tuple((n, tuple(map(int, a.shape)))
                     for n, a in sorted(arrays.items())))
        fn = cache.get(key)
        if fn is None:
            skeleton = self

            @jax.jit
            @hp
            def fn(arrays_, M_red_, pb_, cs_, mus_):
                rdt = dataclasses.replace(skeleton.elliptic, **arrays_,
                                          parabolic=pb_)
                pm = ReducedParabolicModel(elliptic=rdt, M_red=M_red_)
                pm._instationary = skeleton._instationary

                def one(c, mu_):
                    eta, _ = pm.estimate(c, mu_, projected=True)
                    return eta

                return jax.vmap(one)(cs_, mus_)

            cache[key] = fn
        return fn(arrays, self.M_red, pb, cs, mus_stacked)

    def estimate(self, c, mu, decompose: bool = False, projected: bool = True):
        """Parabolic reduced estimate.

        projected=True (default): fully projected, N-independent — the same
        formulas as ``ParabolicEstimator.estimate`` evaluated from the
        neighborhood-padded parabolic tensors (time residual from G_MAA,
        elliptic-reconstruction eta_r additions from G_BLB/G_FLF/G_*div).
        projected=False: exact-via-reconstruction (the validation path)."""
        im = self._instationary
        if not projected or self.elliptic.parabolic is None:
            U = self.elliptic.reconstruct(c)
            return im.estimate(U, mu, decompose=decompose)

        rd = self.elliptic
        d = rd.d
        est = d.estimator
        pb = rd.parabolic
        mu = dict(d.parse_parameter(mu))
        mu.setdefault("_t", 0.0)
        dt = im.T / im.nt
        theta = d.theta(mu)
        theta_f = d.theta_f(mu)

        # elliptic local quantities + elliptic-reconstruction eta_r additions
        eta_nc, eta_r, eta_df = rd.local_quantities(c, mu)      # [nt+1, K]
        ch = rd._gather_neighborhood(c)                          # [nt+1, K, P]
        blb = jnp.einsum("p,r,prkuv,...ku,...kv->...k", theta, theta,
                         pb["G_BLB"], ch, ch)
        flf = jnp.einsum("f,g,fgk->k", theta_f, theta_f, pb["G_FLF"])
        bld = jnp.einsum("p,r,prkuv,...ku,...kv->...k", theta, theta,
                         pb["G_BLdiv"], ch, ch)
        fld = jnp.einsum("f,q,fqku,...ku->...k", theta_f, theta,
                         pb["G_FLdiv"], ch)
        scale = (1.0 / (jnp.pi ** 2) / rd.min_ev) * rd.diam ** 2
        eta_r = eta_r + (blb - flf - 2.0 * (bld - fld)) * scale

        from .estimators import aggregate_eta
        eta = aggregate_eta(est, mu, eta_nc, eta_r, eta_df)

        # time residual dt/3 ||B dU||^2_{M^-1} from the G_MAA Gramian
        dc = (c[1:] - c[:-1]).reshape(c.shape[0] - 1, -1)        # [nt, R]
        tr2 = jnp.einsum("p,r,prij,bi,bj->b", theta, theta, pb["G_MAA"], dc, dc)
        time_res = jnp.sqrt(dt / 3.0 * jnp.maximum(tr2, 0.0))

        cscale = 2.0 * jnp.sqrt(dt / 3.0)
        eta = eta * cscale
        nc, r, df = (jnp.moveaxis(v, 0, -1) * cscale
                     for v in (eta_nc, eta_r, eta_df))

        # time-derivative nonconformity from G_nc on dc
        dch = rd._gather_neighborhood(c[1:] - c[:-1])
        tdnc = jnp.einsum("bkp,kpr,bkr->kb", dch, rd.G_nc, dch) / dt
        tdnc = jnp.sqrt(jnp.maximum(tdnc, 0.0))

        out = (jnp.linalg.norm(jnp.atleast_1d(eta))
               + jnp.linalg.norm(time_res) + jnp.linalg.norm(tdnc))
        return out, (nc, r, df, time_res, tdnc)
