"""Model containers: stationary / instationary block discretizations.

TPU-native replacement for the pyMOR ``StationaryDiscretization`` /
``InstationaryDiscretization`` containers and the reference's
``DuneDiscretization`` / ``InstationaryDuneDiscretization``
(``discretize_elliptic_block_swipdg.py:203-316``,
``discretize_parabolic_block_swipdg.py:15-40``).

A model owns the affine block operator + rhs, the named products, the
estimator, the parameter space, and the enrichment machinery
(``solve_for_local_correction`` — the oversampled corrector patch solve,
``discretize_elliptic_block_swipdg.py:227-316``).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import contextlib
import threading

import numpy as np
import jax
import jax.numpy as jnp

# guards the lazy init of the matrix-free operator + jit cache (raced by
# the background prepare_solver thread vs the foreground sweep)
_MF_INIT_LOCK = threading.Lock()

from .grid import Grid
from .ops.spaces import BlockDGSpace
from .ops.swipdg import SwipdgComponent, edge_lists
from .la.block import AffineBlockOp, unblock, reblock
from .utils.precision import hp
from .parameters import (CubicParameterSpace, evaluate_coefficients,
                         parse_parameter)
from .estimators import EllipticEstimator, ParabolicEstimator


class SolverError(RuntimeError):
    """Raised when the solver post-check fails (<-> ISTL
    ``post_check_solves_system``)."""


class OperatorDictView:
    """Read-only dict facade over the named per-subdomain operators
    (API parity with the reference's ``d.operators`` string keys)."""

    def __init__(self, model: "StationaryBlockModel"):
        self._m = model

    def _lookup(self, key: str):
        m = self._m
        ed = m.estimator.data if m.estimator else None
        name, _, idx = key.rpartition("_")
        if idx.isdigit():
            ii = int(idx)
            table = {
                "local_energy_dg_product": lambda: m.products["energy_mu_bar"][ii],
                "nc": lambda: ed.E_bar[ii],
                "r_dd": lambda: ed.R_dd[ii],
                "r_fd": lambda: ed.d_vec[:, ii],
                "df_bb": lambda: ed.BB[ii],
                "df_aa": lambda: ed.M_aa[:, :, ii],
                "df_ab": lambda: ed.M_ab[:, ii],
                "r_l2": lambda: m.products["l2"][ii],
                "r_ud": lambda: jnp.einsum("nm,mr->nr", m.products["l2"][ii], ed.A_div),
            }
            if name in table:
                return table[name]()
        if key in m.products:
            return m.products[key]
        raise KeyError(key)

    def __getitem__(self, key):
        return self._lookup(key)

    def __contains__(self, key):
        try:
            self._lookup(key)
            return True
        except KeyError:
            return False


@dataclass
class StationaryBlockModel:
    grid: Grid
    space: BlockDGSpace
    op: AffineBlockOp
    lambda_coeffs: list
    rhs_q: jnp.ndarray                     # [Qf, K, N]
    f_coeffs: list
    estimator: Optional[EllipticEstimator]
    parameter_space: Optional[CubicParameterSpace]
    parameter_type: Optional[dict]
    components: List[SwipdgComponent] = field(default_factory=list)
    products: Dict[str, jnp.ndarray] = field(default_factory=dict)
    solver_options: Optional[dict] = None
    dtype: object = jnp.float64
    name: str = "StationaryBlockModel"

    # ------------------------------------------------------------------
    @property
    def operators(self) -> "OperatorDictView":
        """Stringly-keyed view of the named per-subdomain operators, for API
        parity with the reference's ``d.operators['local_energy_dg_product_{ii}']``
        / ``'nc_{ii}'`` etc. (``discretize_elliptic_block_swipdg.py:625-770``).
        Values are the per-subdomain tensors; the estimator consumes the
        batched originals directly."""
        return OperatorDictView(self)

    def enable_caching(self, region: str = "memory"):
        """Memoize ``solve`` by parameter (<-> pyMOR ``cache_region``;
        the reference disables caching explicitly,
        ``online_adaptive_lrbms.py:63`` — ours is opt-in)."""
        object.__setattr__(self, "_solution_cache", {})
        return self

    def disable_caching(self):
        object.__setattr__(self, "_solution_cache", None)
        return self

    def parse_parameter(self, mu):
        return parse_parameter(self.parameter_type, mu)

    def theta(self, mu):
        return evaluate_coefficients(self.lambda_coeffs, mu)

    def theta_f(self, mu):
        return evaluate_coefficients(self.f_coeffs, mu)

    def rhs(self, mu):
        """[K, N] assembled rhs (<-> ``global_rhs.as_vector(mu)``)."""
        return jnp.einsum("q,qkn->kn", self.theta_f(mu), self.rhs_q)

    def assemble(self, mu):
        return self.op.assemble(self.theta(mu))

    def prepare_solver(self, mu=None, inverse_options=None,
                       background=False):
        """Build the frozen two-level preconditioner + the matrix-free
        solve compile AHEAD of the first FOM solve — otherwise the
        harvested-coarse build and the solve compiles land inside the
        first greedy snapshot (measured ~94 s at SPE10 scale).  Freezes
        the preconditioner at ``mu`` (default mu_bar, the design point of
        the spectral-equivalence argument, instead of whatever mu the
        first solve happens to see).  No-op for models that would not
        take the matrix-free path.  ``background=True`` runs it in a
        daemon thread (best-effort) and returns the thread so callers can
        join before their first solve."""
        from .config import validate_solver_options
        inverse_options = validate_solver_options(inverse_options,
                                                  "inverse_options")
        options = dict(inverse_options or self.solver_options or {})
        kind = options.get("type", "auto")
        if kind == "auto" and self.space.K * self.space.N > 32768 \
                and self.estimator is not None \
                and getattr(self.estimator.data, "lambda_funcs", None):
            kind = "mf_pcg"
        if kind != "mf_pcg":
            return None
        if mu is None:
            mu = (self.estimator.data.mu_bar or {}) if self.estimator \
                else {}
        theta = self.theta(self.parse_parameter(mu))
        # a zero-rhs solve exits the Krylov loop immediately but builds
        # the preconditioner cache entry and the solve compile
        b0 = jnp.zeros((self.space.K, self.space.N), self.rhs_q.dtype)
        opts = dict(options)
        opts["return_iters"] = True

        def work():
            try:
                U, _ = self._mf_solve(theta, b0, opts)
                jax.block_until_ready(U)
            except Exception:   # noqa: BLE001 — prefetch is best-effort
                pass

        if background:
            import threading
            t = threading.Thread(target=work, daemon=True,
                                 name="solver-prefetch")
            t.start()
            return t
        work()
        return None

    @hp
    def solve(self, mu, inverse_options=None):
        """Detailed (FOM) solve (<-> ``DuneDiscretization._solve``,
        ``discretize_elliptic_block_swipdg.py:219-225``).

        If the options carry ``post_check_solves_system`` (the ISTL
        self-verification knob, ``online_adaptive_lrbms.py:71`` — the
        reference's only failure-detection mechanism, SURVEY.md §5.3), the
        relative residual is checked on host; on violation the solve is
        retried once with the robust fallback (mixed-precision refined
        dense/pcg) before a SolverError is raised — failure detection WITH
        recovery, which the reference lacks (its check only aborts).
        ``fallback=False`` in the options restores raise-only behaviour."""
        from .config import validate_solver_options
        inverse_options = validate_solver_options(inverse_options,
                                                  "inverse_options")
        mu = self.parse_parameter(mu)
        cache = getattr(self, "_solution_cache", None)
        key = None
        if cache is not None:
            # key includes the effective solver options: a 1e-8 snapshot
            # solve must not be served to a later 1e-10 request
            opts_eff = inverse_options or self.solver_options or {}
            key = (tuple(sorted((k, tuple(np.asarray(v).ravel().tolist()))
                                for k, v in mu.items())),
                   tuple(sorted((k, repr(v)) for k, v in opts_eff.items())))
            if key in cache:
                # a cached solution carries no fresh Krylov count
                object.__setattr__(self, "last_solve_iters", None)
                return cache[key]
        options = inverse_options or self.solver_options
        b = self.rhs(mu)
        kind = (options or {}).get("type", "auto")
        if kind == "auto" and self.space.K * self.space.N > 32768 \
                and self.estimator is not None \
                and getattr(self.estimator.data, "lambda_funcs", None):
            # at scale the matrix-free two-level solve dominates everything
            # else (SPE10 98k dofs: 3.3 s block-Jacobi -> 1.1 s two-level)
            kind = "mf_pcg"
        A = None                 # assembled lazily: the mf path never needs
        if kind == "mf_pcg":     # the dense-block operator (eagerly
            # materializing it costs seconds of emulated-f64 einsums per
            # solve at SPE10 scale) unless a post-check is requested
            opts_it = dict(options or {})
            opts_it["return_iters"] = True
            U, it = self._mf_solve(self.theta(mu), b, opts_it)
            # device scalar, NOT blocked on here (async dispatch stays
            # intact); callers that already synchronized on U can read it
            # cheaply for solver-economics logging
            object.__setattr__(self, "last_solve_iters", it)
            # default divergence guard (one stencil matvec + one host
            # sync): a PCG that exhausted its budget or hit preconditioner
            # breakdown must NOT return silently — the 3D efficiency
            # study's 65k level came back with |r|/|b| = 3.5e+02 and
            # poisoned a whole study table before this check existed.
            # Threshold is 1e3x the requested precision (a loose
            # divergence gate, not an accuracy gate); opt out with
            # {'post_check': False}, tighten with post_check_solves_system
            # (checked against the dense operator below, as before).
            if ((options or {}).get("post_check", True)
                    and (options or {}).get(
                        "post_check_solves_system") is None):
                tol_eff = float((options or {}).get("precision", 1e-10))
                gate = max(1e3 * tol_eff, 1e-6)
                cj = self._mf_jit_cache
                fn = cj.get("post_check_relres")
                if fn is None:
                    @jax.jit
                    @hp
                    def fn(sop_, th, b_, U_):
                        r = sop_.assemble(th).apply(U_) - b_
                        return jnp.sqrt(
                            jnp.sum(r * r)
                            / jnp.maximum(jnp.sum(b_ * b_), 1e-300))
                    cj["post_check_relres"] = fn
                rel = float(fn(self.mf_operator(), self.theta(mu), b, U))
                if not np.isfinite(rel) or rel > gate:
                    raise SolverError(
                        f"mf solve diverged or stalled: |r|/|b| = "
                        f"{rel:.3e} > {gate:.1e} (requested precision "
                        f"{tol_eff:.1e}; iteration budget exhausted or "
                        f"preconditioner breakdown)")
        else:
            A = self.assemble(mu)
            U = A.solve(b, options)
            object.__setattr__(self, "last_solve_iters", None)

        def _relres(U_):
            nonlocal A
            if A is None:
                A = self.assemble(mu)
            r = float(jnp.linalg.norm((b - A.apply(U_)).reshape(-1)))
            bn = float(jnp.linalg.norm(b.reshape(-1)))
            return r / max(bn, 1e-300)

        check = (options or {}).get("post_check_solves_system")
        if check is not None:
            rel = _relres(U)
            if not np.isfinite(rel) or rel > check:
                if (options or {}).get("fallback", True):
                    U = (A.solve_refined(b) if self.space.K * self.space.N
                         > 6144 else A.solve_dense(b))
                    rel = _relres(U)
                if not np.isfinite(rel) or rel > check:
                    raise SolverError(
                        f"solver post-check failed: |r|/|b| = {rel:.3e} "
                        f"> {check:.1e}")
        if cache is not None:
            cache[key] = U
        return U

    def operator_apply(self, U, mu):
        return self.assemble(mu).apply(U)

    # ------------------------------------------------------------------
    def mf_operator(self):
        """The affine matrix-free stencil operator for this model (assembled
        once, as one jitted graph, and cached).  Dispatches to the 3D hex
        stencil on 3D spaces."""
        if getattr(self.space, "dim", 2) == 3:
            from .ops.matrixfree3d import (assemble_swipdg_stencil3 as mk,
                                           StencilOperator3 as Op)
        else:
            from .ops.matrixfree import (assemble_swipdg_stencil as mk,
                                         StencilOperator as Op)
        sop = getattr(self, "_mf_sop", None)
        if sop is None:
            # double-checked under a lock: the background prepare_solver
            # thread and the foreground residual_fom sweep both reach this
            # lazy init concurrently during the greedy's opening overlap
            with _MF_INIT_LOCK:
                sop = getattr(self, "_mf_sop", None)
                if sop is None:
                    if not hasattr(self, "_mf_pre_lock"):
                        import threading
                        object.__setattr__(self, "_mf_pre_lock",
                                           threading.Lock())
                    dtype = self.op.A_diag.dtype
                    sten = jax.jit(hp(lambda: tuple(
                        mk(self.space, lf, None, dtype=dtype)
                        for lf in self.estimator.data.lambda_funcs)))()
                    object.__setattr__(self, "_mf_jit_cache", {})
                    sop = Op(self.space, sten)
                    object.__setattr__(self, "_mf_sop", sop)  # publish LAST
        return sop

    def _mf_solve(self, theta, b, options):
        """Matrix-free two-level PCG FOM solve: fused stencil matvec +
        f32-applied subdomain-block-Jacobi + modal/geneo/harvested coarse
        level.  The stencil family is assembled once per model (one jitted
        graph) and the solve itself is one jitted call with all tensors as
        pytree arguments (remote-compile safe).

        The whole preconditioner (block factors + conditioned coarse space,
        :func:`~pylrbms_tpu.la.block.prepare_coarse`) is built ONCE at the
        first theta seen and reused for every later mu — A(mu) and
        A(theta_0) are spectrally equivalent over the compact parameter
        range (same argument as ``make_online_step``'s
        ``fixed_preconditioner``), and freezing it moves the per-solve
        coarse-matrix inversion offline entirely.  Options:
        ``coarse_space`` 'modal' (default) | 'geneo' | 'harvested' (the
        contrast-robust choice at SPE10-scale jumps), ``coarse_modes``."""
        from .la.block import prepare_coarse, harvested_coarse_basis, \
            geneo_coarse_basis, neumann_blocks, AssembledBlockOp as _ABO
        sop = self.mf_operator()
        tol = options.get("precision", 1e-10)
        maxiter = options.get("max_iter", 2000)
        two_level = options.get("two_level", True)
        # 'harvested' is the at-scale default: measured equal to modal at
        # low contrast and ~2x fewer iterations at contrast 1e6
        # (tests/test_geneo_bf16.py); the harvest runs once offline.
        coarse_modes = int(options.get("coarse_modes", 16))
        coarse_space = options.get("coarse_space", "harvested")
        return_iters = bool(options.get("return_iters", False))
        # mixed-precision iterative refinement (accelerator default for f64
        # models): the Krylov iteration runs entirely in f32 — native-speed
        # stencil matvecs instead of ~10x-slower f64-EMULATED ones — on the
        # symmetrically Jacobi-scaled system, with f64 residual recomputation
        # between restarts and an f64 PCG polish as the correctness anchor
        # (ops/ir.py).  The scaling is what makes it contrast-safe: round 2's
        # UNSCALED variant stalled at relres 6e-3 past contrast ~1e4 (the f32
        # matvec noise floor is ~eps_f32 * contrast without it); the scaled
        # inner's floor is relative per dof, and a stall at extreme
        # conditioning now just hands the iterate to the f64 polish instead
        # of failing.
        cache = self._mf_jit_cache
        mixed = options.get("mixed")
        if mixed is None:
            mixed = (self.op.A_diag.dtype == jnp.float64
                     and jax.default_backend() != "cpu")
        mixed = bool(mixed)
        key = (float(tol), int(maxiter), bool(two_level), coarse_modes,
               coarse_space, return_iters, mixed)
        if key not in cache:
            if mixed:
                from .ops.ir import solve_ir
                rounds = int(options.get("mixed_rounds", 20))
                inner_tol = float(options.get("mixed_inner_tol", 1e-4))
                inner_maxiter = int(options.get("mixed_inner_maxiter", 300))

                @jax.jit
                @hp
                def _solve(sop_, sop32_, theta, b, bf, C, ci, dq):
                    A64 = sop_.assemble(theta)
                    A32 = sop32_.assemble(theta.astype(jnp.float32))
                    dvec = jnp.einsum("q,qkn->kn", theta, dq)
                    x, it32, rd, it64 = solve_ir(
                        A64, A32, b, dvec, tol=tol, maxiter=maxiter,
                        block_factors=bf, coarse_inv=ci, coarse_basis=C,
                        inner_tol=inner_tol, inner_maxiter=inner_maxiter,
                        max_rounds=rounds, return_info=True)
                    return (x, it32 + it64) if return_iters else x
            else:
                @jax.jit
                @hp
                def _solve(sop_, sop32_, theta, b, bf, C, ci):
                    # coarse apply in f32 — safe with the prepare_coarse-
                    # conditioned space (measured +3% iterations at
                    # contrast 1e6) and avoids the f64-emulated [K*m, K*m]
                    # stream that was the wall-time bound of wide coarse
                    # spaces at scale
                    return sop_.assemble(theta).solve_pcg(
                        b, tol=tol, maxiter=maxiter, block_factors=bf,
                        coarse_inv=ci, coarse_basis=C,
                        return_iters=return_iters, coarse_f32=True)
            cache[key] = _solve
        # preconditioner frozen at the first theta (see docstring)
        Pkey = ("precond", bool(two_level), coarse_space, coarse_modes)
        # serialized: the frozen-preconditioner build takes ~60 s at SPE10
        # scale — without the lock a foreground solve racing the background
        # prepare_solver thread would duplicate it (and re-freeze at a
        # different theta)
        with getattr(self, "_mf_pre_lock", contextlib.nullcontext()):
            pre = cache.get(Pkey)
            if pre is None:
                A0 = jax.jit(hp(lambda op, th: op.assemble(th)))(self.op, theta)
                bf = jax.jit(hp(lambda A: A.block_jacobi_factors()))(A0)
                C = ci = None
                if two_level:
                    if coarse_space == "harvested":
                        C_np = harvested_coarse_basis(A0, bf, self.space,
                                                      n_harvest=coarse_modes,
                                                      extra_modal=3)
                    elif coarse_space == "geneo":
                        C_np = geneo_coarse_basis(neumann_blocks(self, theta),
                                                  self.products["l2"],
                                                  coarse_modes)
                    else:
                        C_np = _ABO.coarse_modes_basis(self.space, coarse_modes)
                    C, ci = prepare_coarse(A0, C_np)
                pre = (bf, C, ci)
                cache[Pkey] = pre
        bf, C, ci = pre
        if not mixed:
            return cache[key](sop, None, theta, b, bf, C, ci)
        sop32 = cache.get("sop32")
        if sop32 is None:
            sop32 = type(sop)(self.space, jax.tree.map(
                lambda a: a.astype(jnp.float32), sop.stencils))
            cache["sop32"] = sop32
        dq = cache.get("diag_q")
        if dq is None:
            dq = cache["diag_q"] = jnp.diagonal(self.op.A_diag,
                                                axis1=-2, axis2=-1)
        return cache[key](sop, sop32, theta, b, bf, C, ci, dq)

    @hp
    def estimate(self, U, mu, decompose: bool = False,
                 paper_convention: bool = False):
        mu = self.parse_parameter(mu)
        return self.estimator.estimate(U, mu, d=self, decompose=decompose,
                                       paper_convention=paper_convention)

    # ------------------------------------------------------------------
    def l2_solve(self, V):
        """Apply the inverse of the (block-diagonal) L2 product
        (backend-safe: mixed-precision refinement where f64 factorizations
        are unavailable, e.g. TPU)."""
        from .la.block import dense_solve_mixed
        return dense_solve_mixed(self.products["l2"], V)

    @property
    def l2_product(self):
        return self.products["l2"]

    def unblock(self, U):
        return unblock(U)

    def reblock(self, u):
        return reblock(u, self.space.K, self.space.N)

    @property
    def solution_shape(self):
        return (self.space.K, self.space.N)

    # ------------------------------------------------------------------
    def shape_functions(self, subdomain: int, order: int = 0):
        """Initial local RB functions (<-> ``DuneDiscretizationBase.
        shape_functions``, ``discretize_elliptic_block_swipdg.py:187-200``):
        order 0 = the constant; order 1 adds x, y, x*y.  With the nodal basis
        these are nodal interpolants (the reference's order-1 branch is
        broken — ``dune_project`` NameError at ``:197`` — so interpolation is
        our documented choice)."""
        assert 0 <= order <= 1
        sp = self.space
        vecs = [np.ones(sp.N)]
        if order == 1:
            dim = getattr(sp, "dim", 2)
            xn = sp.node_coords_phys()[subdomain].reshape(sp.N, dim)
            if dim == 3:
                # deliberate truncation to the P1 part {1, x, y, z}: the full
                # trilinear span (8 vectors incl. xy/xz/yz/xyz) doubles the
                # initial RB size per subdomain for marginal capture — the
                # cross terms arrive via enrichment where they matter
                vecs += [xn[:, 0], xn[:, 1], xn[:, 2]]
            else:
                vecs += [xn[:, 0], xn[:, 1], xn[:, 0] * xn[:, 1]]
        return jnp.asarray(np.stack(vecs), self.dtype)          # [n_vec, N]

    # ------------------------------------------------------------------
    def assemble_patch(self, subdomain: int, mu=None):
        """Assemble the oversampled-neighborhood corrector system
        (<-> ``solve_for_local_correction``'s fresh neighborhood SWIPDG
        assembly with local all-Dirichlet boundary info,
        ``discretize_elliptic_block_swipdg.py:241-276``).

        Returns (members, A [m*N, m*N] per affine component list, b [m*N]).
        Patch-boundary faces (interfaces leaving the patch) get the one-sided
        Dirichlet penalty blocks; intra-patch interfaces keep their coupling
        quadruples; physical-boundary faces keep the true Dirichlet terms.
        """
        if getattr(self.grid, "dim", 2) == 3:
            return self._assemble_patch3(subdomain, mu)
        grid, sp = self.grid, self.space
        members = grid.neighborhood_of(subdomain)
        m = len(members)
        pos = {ii: i for i, ii in enumerate(members)}
        N, s, nb = sp.N, sp.s, sp.nb
        kx = grid.kx
        left_k, right_k, low_k, up_k = edge_lists(grid)
        eR = {(int(l), int(r)): e for e, (l, r) in enumerate(zip(left_k, right_k))}
        eU = {(int(l), int(u)): e for e, (l, u) in enumerate(zip(low_k, up_k))}
        side_rows = {side: sp.side_dofs(side).reshape(s, nb)
                     for side in ("left", "right", "bottom", "top")}
        side_neighbor = {"left": -1, "right": +1, "bottom": -kx, "top": +kx}

        mats = []
        for comp in self.components:
            A = np.zeros((m * N, m * N))
            for ii in members:
                i = pos[ii]
                blk = np.array(comp.A_loc[ii], copy=True)
                sx, sy = grid.subdomain_coords(ii)
                for side in ("left", "right", "bottom", "top"):
                    on_bnd = ((side == "left" and sx == 0) or
                              (side == "right" and sx == kx - 1) or
                              (side == "bottom" and sy == 0) or
                              (side == "top" and sy == grid.ky - 1))
                    nb_sub = ii + side_neighbor[side]
                    if on_bnd or nb_sub not in pos:
                        rows = side_rows[side]
                        Ds = np.asarray(comp.D_side[side][ii])   # [s, nb, nb]
                        for f in range(s):
                            r = rows[f]
                            blk[np.ix_(r, r)] += Ds[f]
                A[i * N:(i + 1) * N, i * N:(i + 1) * N] += blk
            # intra-patch interface terms
            for ii in members:
                i = pos[ii]
                sx, sy = grid.subdomain_coords(ii)
                for side, quads in (("right", ("R_in_in", "R_in_out", "R_out_in", "R_out_out")),
                                    ("top", ("U_in_in", "U_in_out", "U_out_in", "U_out_out"))):
                    if side == "right" and sx >= kx - 1:
                        continue
                    if side == "top" and sy >= grid.ky - 1:
                        continue
                    jj = ii + side_neighbor[side]
                    if jj not in pos:
                        continue
                    j = pos[jj]
                    e = eR[(ii, jj)] if side == "right" else eU[(ii, jj)]
                    rm = side_rows["right" if side == "right" else "top"]
                    rp = side_rows["left" if side == "right" else "bottom"]
                    q_ii, q_io, q_oi, q_oo = (np.asarray(getattr(comp, q)[e]) for q in quads)
                    for f in range(s):
                        r_i = rm[f] + i * N
                        r_j = rp[f] + j * N
                        A[np.ix_(r_i, r_i)] += q_ii[f]
                        A[np.ix_(r_i, r_j)] += q_io[f]
                        A[np.ix_(r_j, r_i)] += q_oi[f]
                        A[np.ix_(r_j, r_j)] += q_oo[f]
            mats.append(jnp.asarray(A, self.dtype))

        b = jnp.einsum("q,qmn->mn", self.theta_f(mu or {}),
                       self.rhs_q[:, np.asarray(members)]).reshape(m * N)
        return members, mats, b

    def _assemble_patch3(self, subdomain: int, mu=None):
        """3D hex variant of :meth:`assemble_patch`: 3x3x3 oversampled patch,
        six one-sided Dirichlet strips, x/y/z interface quadruples."""
        from .ops.swipdg3d import edge_lists3
        grid, sp = self.grid, self.space
        members = grid.neighborhood_of(subdomain)
        m = len(members)
        pos = {ii: i for i, ii in enumerate(members)}
        N, nb = sp.N, sp.nb
        F = sp.s * sp.s
        kx, ky, kz = grid.kx, grid.ky, grid.kz
        xlo, xhi, ylo, yhi, zlo, zhi = edge_lists3(grid)
        eX = {(int(l), int(r)): e for e, (l, r) in enumerate(zip(xlo, xhi))}
        eY = {(int(l), int(u)): e for e, (l, u) in enumerate(zip(ylo, yhi))}
        eZ = {(int(l), int(u)): e for e, (l, u) in enumerate(zip(zlo, zhi))}
        sides = ("left", "right", "bottom", "top", "near", "far")
        side_rows = {side: sp.side_dofs(side).reshape(F, nb) for side in sides}
        side_neighbor = {"left": -1, "right": +1, "bottom": -kx, "top": +kx,
                         "near": -kx * ky, "far": +kx * ky}

        def on_domain_boundary(side, ii):
            sx, sy, sz = grid.subdomain_coords(ii)
            return {"left": sx == 0, "right": sx == kx - 1,
                    "bottom": sy == 0, "top": sy == ky - 1,
                    "near": sz == 0, "far": sz == kz - 1}[side]

        mats = []
        for comp in self.components:
            A = np.zeros((m * N, m * N))
            for ii in members:
                i = pos[ii]
                blk = np.array(comp.A_loc[ii], copy=True)
                for side in sides:
                    nb_sub = ii + side_neighbor[side]
                    if on_domain_boundary(side, ii) or nb_sub not in pos:
                        rows = side_rows[side]
                        Ds = np.asarray(comp.D_side[side][ii])   # [F, nb, nb]
                        for f in range(F):
                            r = rows[f]
                            blk[np.ix_(r, r)] += Ds[f]
                A[i * N:(i + 1) * N, i * N:(i + 1) * N] += blk
            # intra-patch interface terms (minus side = right/top/far)
            orients = (("right", "left", "X", eX), ("top", "bottom", "Y", eY),
                       ("far", "near", "Z", eZ))
            for ii in members:
                i = pos[ii]
                for hi_side, lo_side, fam, emap in orients:
                    if on_domain_boundary(hi_side, ii):
                        continue
                    jj = ii + side_neighbor[hi_side]
                    if jj not in pos:
                        continue
                    j = pos[jj]
                    e = emap[(ii, jj)]
                    rm, rp = side_rows[hi_side], side_rows[lo_side]
                    q_ii, q_io, q_oi, q_oo = (
                        np.asarray(getattr(comp, f"{fam}_{q}")[e])
                        for q in ("in_in", "in_out", "out_in", "out_out"))
                    for f in range(F):
                        r_i = rm[f] + i * N
                        r_j = rp[f] + j * N
                        A[np.ix_(r_i, r_i)] += q_ii[f]
                        A[np.ix_(r_i, r_j)] += q_io[f]
                        A[np.ix_(r_j, r_i)] += q_oi[f]
                        A[np.ix_(r_j, r_j)] += q_oo[f]
            mats.append(jnp.asarray(A, self.dtype))

        b = jnp.einsum("q,qmn->mn", self.theta_f(mu or {}),
                       self.rhs_q[:, np.asarray(members)]).reshape(m * N)
        return members, mats, b

    def solve_for_local_correction(self, subdomain: int, Us=None, mu=None,
                                   inverse_options=None, current_solution=None,
                                   mode: str = "residual"):
        """Local corrector solve on the oversampled patch
        (<-> ``discretize_elliptic_block_swipdg.py:227-316``).

        mode='reference': A_patch(mu) w = f with homogeneous Dirichlet on the
        patch boundary — the reference's behaviour (its Dirichlet lift from
        the current solution is explicitly disabled, comment at ``:252-262``).
        This corrector is mu-only: repeated enrichment at the same mu stalls.

        mode='residual' (default, the OS2015 paper's actual corrector /
        residual localization): A_patch(mu) w = (f - A(mu) u_current)|_patch
        with homogeneous Dirichlet on the patch boundary.  As the reduced
        solution improves the corrector shrinks, so adaptive enrichment
        converges; w = 0 exactly when u_current solves the FOM."""
        mu = self.parse_parameter(mu)
        members, mats, b = self.assemble_patch(subdomain, mu)
        if mode == "residual" and current_solution is not None:
            r = self.rhs(mu) - self.assemble(mu).apply(current_solution)
            b = r[np.asarray(members)].reshape(-1)
        theta = self.theta(mu)
        A = sum(t * M for t, M in zip(theta, mats))
        from .la.block import dense_solve_mixed
        w = dense_solve_mixed(A, b)
        i = members.index(subdomain)
        N = self.space.N
        return w[i * N:(i + 1) * N]

    # ------------------------------------------------------------------
    def visualize(self, U, filename: str):
        """VTU output of a solution (<-> ``DuneDiscretization.visualize`` /
        ``DuneGDTVisualizer``; content-asserted in
        tests/test_scripts.py::test_vtu_writer_and_model_visualize)."""
        if getattr(self.space, "dim", 2) == 3:
            from .utils.vtk import write_hex_vtu
            return write_hex_vtu(self.space, np.asarray(U), filename)
        from .utils.vtk import write_dg_vtu
        return write_dg_vtu(self.space, np.asarray(U), filename)


def _resolve_theta_bar(d):
    """theta at the model's reference parameter mu_bar (falling back to the
    estimator data's) — the frozen-preconditioner anchor shared by the
    stationary two-level build and the batched parabolic factors.  With no
    usable mu_bar: all-ones thetas (the component sum), still spectrally
    equivalent to every A(mu) over a compact mu range."""
    mu_bar = getattr(d, "mu_bar", None)
    if mu_bar is None and d.estimator is not None:
        mu_bar = getattr(d.estimator.data, "mu_bar", None)
    try:
        return d.theta(mu_bar or {})
    except KeyError:
        return jnp.ones((d.op.A_diag.shape[0],), d.op.A_diag.dtype)


def make_online_step(d: "StationaryBlockModel", tol: float = 1e-6,
                     maxiter: int = 400, with_estimate: bool = True,
                     positive_form: bool = True,
                     fixed_preconditioner: bool = True,
                     matrix_free=None, certify: bool = False,
                     refinements: int = 2, two_level: bool = True,
                     coarse_modes: int = 6, coarse_space: str = "modal",
                     jacobi_storage: str = None):
    """Jitted online step ``(theta, theta_f, mu) -> (U[, indicators])``.

    ``certify`` (off by default) is the certification-at-depth mode for f32
    model tensors (the TPU-resident regime): the PCG solution is polished by
    ``refinements`` rounds of mixed-precision iterative refinement (residual
    in the widest available dtype, correction solve in the base dtype) and
    the localized indicators are evaluated in the widest dtype.  This removes
    the f32 solve-noise floor that otherwise hides the true indicators at
    fine levels (STATUS.md round-1 finding); costs ``refinements`` extra
    solves + a wide-precision estimator pass per step.  With x64 disabled it
    degrades gracefully to the plain step.

    All large per-subdomain tensors are passed as jit *arguments* (donated
    via a pytree dict), never captured — captured arrays become constants
    embedded in the HLO, which breaks remote compilation and bloats caches.

    ``positive_form`` (default) evaluates the local quantities as manifestly
    non-negative integrals (float32/TPU-safe; the matrix form suffers
    catastrophic cancellation in eta_r/eta_df near convergence).

    ``fixed_preconditioner`` (default) builds the block-Jacobi factors ONCE
    at the reference parameter mu_bar and reuses them for every mu: A(mu) and
    A(mu_bar) are spectrally equivalent with constants given by the theta
    ratios, so CG iteration counts grow only mildly while the dominant
    per-step cost — a batched dense inversion of all subdomain blocks —
    moves offline entirely (measured ~15 ms/step on v5e at K=64, N=384,
    where one CG iteration costs ~16 us).

    ``matrix_free`` (None = auto above 16 384 dofs) replaces the dense-block
    matvec inside CG by the fused stencil apply (ops/matrixfree.py): each CG
    iteration then reads ~N*nb coefficients per subdomain instead of the
    full N*N block — the HBM-bandwidth-optimal inner loop.  The operator is
    algebraically identical; only float association differs.
    ``matrix_free='affine'`` selects the batched-serving apply instead
    (:class:`~pylrbms_tpu.la.block.AffineBlockApply`): the affine dense
    stacks stream once per CG iteration shared across a vmapped query
    batch — the fastest full online step at large B (measured 0.325 vs
    0.357 ms/query against the stencil at B=256, bench config on v5e;
    the assembled-dense apply OOMs there, [B, K, N, N]), while at B=1
    the stencil wins.

    ``coarse_space``: 'modal' (polynomial, :meth:`coarse_modes_basis`) or
    'geneo' (per-subdomain generalized eigenmodes of (A_kk(mu_bar), M_kk),
    :func:`~pylrbms_tpu.la.block.geneo_coarse_basis`) — contrast-robust at
    SPE10-scale coefficient jumps where polynomial modes saturate.

    ``jacobi_storage``: None (auto: 'bf16' on accelerators, native on CPU),
    'bf16' or 'native' — bf16-stored block-Jacobi factors halve the
    preconditioner's per-iteration HBM stream (the measured online-step
    bound, docs/ARCHITECTURE.md) at an iteration-count cost measured <10%
    (tests/test_geneo_bf16.py).
    """
    from .la.block import AssembledBlockOp
    st = d.op.static
    dim3 = getattr(d.space, "dim", 2) == 3
    arrays = {"A_diag": d.op.A_diag, "C_R_io": d.op.C_R_io,
              "C_R_oi": d.op.C_R_oi, "C_U_io": d.op.C_U_io,
              "C_U_oi": d.op.C_U_oi, "rhs_q": d.rhs_q}
    if dim3:
        arrays["C_W_io"] = d.op.C_W_io
        arrays["C_W_oi"] = d.op.C_W_oi
    if matrix_free is None:
        matrix_free = (d.space.K * d.space.N >= 16384
                       and d.estimator is not None
                       and getattr(d.estimator.data, "lambda_funcs", None)
                       is not None)
    if matrix_free is True:
        if dim3:
            from .ops.matrixfree3d import (
                assemble_swipdg_stencil3 as _mk_stencil)
        else:
            from .ops.matrixfree import (
                assemble_swipdg_stencil as _mk_stencil)
        dtype = d.op.A_diag.dtype
        # jitted: the stencil assembly is dozens of small einsums per affine
        # component — run as one compiled graph, not eager op-by-op (the
        # captured quadrature/tabulation tables are tiny)
        arrays["stencils"] = jax.jit(hp(lambda: tuple(
            _mk_stencil(d.space, lf, None, dtype=dtype)
            for lf in d.estimator.data.lambda_funcs)))()
    if fixed_preconditioner or two_level:
        theta_bar = _resolve_theta_bar(d)
    if jacobi_storage is None:
        jacobi_storage = ("bf16" if jax.default_backend() != "cpu"
                          else "native")
    Minv = None
    if fixed_preconditioner or (two_level and coarse_space == "harvested"):
        # one jitted call (eager op-by-op execution costs ~0.4 s *per op* on
        # the remote-TPU path); the operator rides in as a pytree argument so
        # its tensors never become HLO constants
        Minv = jax.jit(hp(
            lambda op, th: op.assemble(th).block_jacobi_factors()))(
                d.op, theta_bar)
    if fixed_preconditioner:
        arrays["Minv_bar"] = (Minv.astype(jnp.bfloat16)
                              if jacobi_storage == "bf16" else Minv)
    if two_level and d.space.K > 1:
        # coarse level fixed at mu_bar: one [K*m, K*m] inverse built
        # offline, one tiny matmul per CG iteration — the
        # global-information channel block-Jacobi lacks.  Modal
        # (constants+linears+quadratics) measured 91 -> 47 CG iterations at
        # the bench config; 'geneo' = local generalized eigenmodes of
        # (A^Neu_kk(mu_bar), M_kk); 'harvested' = Chebyshev-harvested slow
        # modes of the preconditioned operator — the contrast-robust choice
        # at SPE10-scale jumps (la/block.py harvested_coarse_basis).
        from .la.block import geneo_coarse_basis, neumann_blocks, \
            prepare_coarse, harvested_coarse_basis, AssembledBlockOp as _ABO
        A_bar = jax.jit(hp(lambda op, th: op.assemble(th)))(d.op, theta_bar)
        if coarse_space == "geneo":
            C_np = geneo_coarse_basis(neumann_blocks(d, theta_bar),
                                      d.products["l2"], coarse_modes)
        elif coarse_space == "harvested":
            C_np = harvested_coarse_basis(A_bar, Minv, d.space,
                                          n_harvest=coarse_modes,
                                          extra_modal=3)
        else:
            C_np = _ABO.coarse_modes_basis(d.space, coarse_modes)
        C_modes, Cinv = prepare_coarse(A_bar, C_np)
        arrays["C_coarse"] = C_modes
        arrays["Cinv_bar"] = Cinv
    est = d.estimator
    if with_estimate and est is not None:
        ed = est.data
        if positive_form:
            arrays.update(E_bar=ed.E_bar)
        else:
            arrays.update(E_bar=ed.E_bar, BB=ed.BB, M_aa=ed.M_aa, M_ab=ed.M_ab,
                          d_vec=ed.d_vec, R_dd=ed.R_dd, L2=ed.L2)

    wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    def _build_solver(arrays, theta):
        """(solve(rhs, **kw), apply_A) for the configured operator form —
        shared by the online step and the iteration-count probe."""
        if matrix_free is True:
            if dim3:
                from .ops.matrixfree3d import StencilOperator3 as _StOp
            else:
                from .ops.matrixfree import StencilOperator as _StOp
            A_mf = _StOp(d.space, arrays["stencils"]).assemble(theta)

            def solve(rhs, **kw):
                return A_mf.solve_pcg(rhs, tol=tol, maxiter=maxiter,
                                      block_factors=arrays.get("Minv_bar"),
                                      coarse_inv=arrays.get("Cinv_bar"),
                                      coarse_basis=arrays.get("C_coarse"),
                                      **kw)
            return solve, A_mf.apply
        if matrix_free == "affine":
            # batched-serving apply: never materializes A(theta); under the
            # vmapped step the affine stacks stream once per CG iteration
            # SHARED across the whole query batch (la/block.AffineBlockApply)
            from .la.block import AffineBlockApply
            A = AffineBlockApply(
                st, arrays["A_diag"],
                arrays["C_R_io"], arrays["C_R_oi"],
                arrays["C_U_io"], arrays["C_U_oi"], theta,
                arrays.get("C_W_io"), arrays.get("C_W_oi"))
        else:
            mixq = (lambda C: None if C is None
                    else jnp.einsum("q,qefij->efij", theta, C))
            A = AssembledBlockOp(
                st,
                jnp.einsum("q,qkij->kij", theta, arrays["A_diag"]),
                mixq(arrays["C_R_io"]), mixq(arrays["C_R_oi"]),
                mixq(arrays["C_U_io"]), mixq(arrays["C_U_oi"]),
                mixq(arrays.get("C_W_io")), mixq(arrays.get("C_W_oi")))

        def solve(rhs, **kw):
            return A.solve_pcg(rhs, tol=tol, maxiter=maxiter,
                               factors=arrays.get("Minv_bar"),
                               coarse_inv=arrays.get("Cinv_bar"),
                               coarse_basis=arrays.get("C_coarse"), **kw)
        return solve, A.apply

    @hp
    def _core(arrays, theta, theta_f, mu):
        b = jnp.einsum("q,qkn->kn", theta_f, arrays["rhs_q"])
        solve, apply_A = _build_solver(arrays, theta)
        U = solve(b)
        base = U.dtype
        if certify and wide != base:
            # mixed-precision refinement: wide residual, base correction
            Uw = U.astype(wide)
            bw = b.astype(wide)
            for _ in range(refinements):
                rw = bw - apply_A(Uw)
                Uw = Uw + solve(rw.astype(base)).astype(wide)
            U = Uw
        if not (with_estimate and est is not None):
            return U.astype(base)
        Ue = U if certify else U.astype(base)
        if positive_form:
            # with a wide Ue the einsums promote the f32 tensors internally;
            # no explicit widening needed
            nc, r, df = est.local_quantities_positive(Ue[None], mu, tensors=arrays)
            nc, r, df = nc[0], r[0], df[0]
        else:
            nc, r, df = est.local_quantities(Ue, mu, tensors=arrays)
        return U.astype(base), nc + r + df

    _step = jax.jit(_core)
    # batched-mu serving: ONE dispatch answers B parameter queries — the
    # while_loop runs lock-step until the slowest query converges, but all
    # per-query work (assemble/solve/estimate) batches onto the MXU and the
    # host round-trip amortizes B-fold (the measured single-query latency is
    # RTT-dominated on the remote chip)
    _step_batched = jax.jit(jax.vmap(_core, in_axes=(None, 0, 0, 0)))

    def step(theta, theta_f, mu=None):
        """Single query: (theta [Q], theta_f [Qf], mu dict) -> (U[, ind]).
        Batched: (thetas [B, Q], theta_fs [B, Qf], mu dict with [B, ...]
        leaves) -> batched outputs, one dispatch."""
        if mu is None:
            mu = {}
        if jnp.ndim(theta) == 2:
            return _step_batched(arrays, theta, theta_f, mu)
        return _step(arrays, theta, theta_f, mu)

    @jax.jit
    @hp
    def _iters(arrays, theta, theta_f):
        b = jnp.einsum("q,qkn->kn", theta_f, arrays["rhs_q"])
        solve, _ = _build_solver(arrays, theta)
        _, it = solve(b, return_iters=True)
        return it

    # iteration-count probe for roofline/MFU accounting (bench.py): the
    # SAME operator + preconditioner + tol/maxiter as the step itself
    step.iters_probe = lambda theta, theta_f: int(
        _iters(arrays, theta, theta_f))
    step.arrays = arrays        # shapes for analytic FLOP/byte counting
    return step


@dataclass
class InstationaryBlockModel:
    """Implicit-Euler time-stepping wrapper
    (<-> ``InstationaryDuneDiscretization`` +
    ``ImplicitEulerTimeStepper(nt, solver_options='operator')``,
    ``discretize_parabolic_block_swipdg.py:15-40``;
    per step: (M + dt A(mu)) u^{n+1} = M u^n + dt f(t_{n+1})).
    """
    stationary: StationaryBlockModel
    T: float
    nt: int
    mass: jnp.ndarray = None          # [K, N, N] global L2 mass (block diag)
    name: str = "InstationaryBlockModel"

    def __post_init__(self):
        if self.mass is None:
            self.mass = self.stationary.products["l2"]

    # passthroughs
    def parse_parameter(self, mu):
        return self.stationary.parse_parameter(mu)

    @property
    def parameter_space(self):
        return self.stationary.parameter_space

    @property
    def estimator(self):
        return self._estimator

    @hp
    def solve(self, mu):
        """Trajectory [nt+1, K, N] via lax.scan over implicit Euler steps.

        Time enters through the '_t' parameter in the rhs coefficients
        (``artificial_channels_problem.py:96-98``); the operator
        G = M + dt A(mu) is time-independent, so its factorization /
        preconditioner is built once and reused across all steps.  Small
        systems use a dense global LU; large ones block-Jacobi PCG on the
        block operator (no global matrix is ever materialized)."""
        from .la.block import AssembledBlockOp
        st = self.stationary
        mu = self.parse_parameter(mu)
        dt = self.T / self.nt
        K, N = st.space.K, st.space.N
        if (K * N > 32768 and st.estimator is not None
                and getattr(st.estimator.data, "lambda_funcs", None)):
            # at scale: matrix-free G = M + dt A (dense [K, N, N] blocks are
            # never coupled into the Krylov stream; same heuristic as the
            # stationary solve)
            return self._solve_mf(mu, dt)
        A = st.assemble(mu)
        sdt = (lambda C: None if C is None else dt * C)
        G_op = AssembledBlockOp(A.static, self.mass + dt * A.A_diag,
                                dt * A.C_R_io, dt * A.C_R_oi,
                                dt * A.C_U_io, dt * A.C_U_oi,
                                sdt(A.C_W_io), sdt(A.C_W_oi))
        use_dense = K * N <= 6144
        if use_dense:
            G_dense = G_op.to_dense()
            lu_dtype = G_dense.dtype
            if lu_dtype == jnp.float64 and jax.default_backend() != "cpu":
                # f64 LU unavailable (TPU): f32 LU + one f64 refinement step
                lu_dtype = jnp.float32
            lu, piv = jax.scipy.linalg.lu_factor(G_dense.astype(lu_dtype))

            def solve_step(rhs):
                r = rhs.reshape(-1)
                x = jax.scipy.linalg.lu_solve(
                    (lu, piv), r.astype(lu_dtype)).astype(r.dtype)
                if lu_dtype != G_dense.dtype:
                    res = r - G_dense @ x
                    x = x + jax.scipy.linalg.lu_solve(
                        (lu, piv), res.astype(lu_dtype)).astype(r.dtype)
                return x.reshape(K, N)
        else:
            factors = G_op.block_jacobi_factors()

            def solve_step(rhs):
                return G_op.solve_pcg(rhs, tol=1e-10, maxiter=500, factors=factors)

        rhs_q = st.rhs_q
        f_coeffs = st.f_coeffs

        def theta_f_at(t):
            mu_t = dict(mu)
            mu_t["_t"] = t
            return evaluate_coefficients(f_coeffs, mu_t)

        def step(u, n):
            t_next = (n + 1.0) * dt
            f = jnp.einsum("q,qkn->kn", theta_f_at(t_next), rhs_q)
            rhs = jnp.einsum("knm,km->kn", self.mass, u) + dt * f
            u_next = solve_step(rhs)
            return u_next, u_next

        u0 = jnp.zeros((K, N), st.dtype)
        _, traj = jax.lax.scan(step, u0, jnp.arange(self.nt))
        return jnp.concatenate([u0[None], traj], axis=0)

    @hp
    def _solve_mf(self, mu, dt, tol: float = 1e-10, maxiter: int = 500,
                  two_level: bool = None, coarse_modes: int = 16,
                  coarse_space: str = "harvested", precision: str = None,
                  extrapolate: bool = True, return_iters: bool = False,
                  inner: str = None):
        """Matrix-free implicit Euler at scale: the mass joins the affine
        stencil family as one extra component (G = M + dt A, see
        :func:`~pylrbms_tpu.ops.matrixfree.mass_stencil`), the per-mu
        subdomain-block-Jacobi factors of G are built once and reused
        across all steps, each step's PCG warm-starts from the previous
        step, and the WHOLE trajectory is one jitted ``lax.scan`` with all
        model tensors as arguments (remote-compile safe).

        ``two_level`` (default: on past 32k dofs) adds the harvested coarse
        level on G = M + dt A, FROZEN at the first mu seen per (dt, space)
        — the same spectral-equivalence freeze as the stationary solve.
        At SPE10-contrast coarse modes dominate block-Jacobi convergence
        even with the mass shift: measured 415 -> ~95 ms/step at the 98k
        north-star config (docs/results/spe10_parabolic_tpu.txt).

        ``precision`` 'f64' | 'mixed' (default: 'mixed' on accelerators for
        f64 models): 'mixed' runs each step's Krylov iteration in native f32
        on the Jacobi-scaled system with f64 residual restarts + an f64
        polish (ops/ir.py) — the emulated-f64 matvec is the measured
        per-step bound at the 131k-dof 3D config."""
        G_sop, bf_fn, cache = self._mf_parab_setup()
        st = self.stationary
        theta = st.theta(mu)
        one = jnp.ones((1,), theta.dtype)
        theta_G = jnp.concatenate([one, dt * theta])
        # per-mu preconditioner (frozen across the nt steps; G is
        # time-independent under implicit Euler with fixed dt)
        bf = bf_fn(st.op.A_diag, self.mass, dt * theta)
        K, N = st.space.K, st.space.N
        if two_level is None:
            two_level = K * N > 32768
        C = ci = None
        if two_level:
            C, ci = self._mf_parab_coarse(dt, theta, coarse_space,
                                          coarse_modes)
        precision = self._resolve_traj_precision(precision)
        inner = self._resolve_traj_inner(inner, precision)
        key = ("parab_mf_traj", K, N, self.nt, float(dt), float(tol),
               int(maxiter), bool(two_level), precision, bool(extrapolate),
               bool(return_iters), inner)
        fn = cache.get(key)
        if fn is None:
            fn = cache[key] = jax.jit(
                self._mf_traj_core(dt, tol, maxiter, precision,
                                   extrapolate=extrapolate,
                                   return_iters=return_iters, inner=inner))
        extra = ((st.op, self.mass) if inner == "halo" else (None, None))
        return fn(G_sop, theta_G, bf, C, ci, st.rhs_q, mu,
                  self._parab_diag_q(), *extra)

    def _resolve_traj_inner(self, inner, precision):
        """Auto policy for the mixed inner apply form: halo-dense at
        mid-scale 2D on accelerators (the measured op-overhead-bound
        regime — ops/halodense.py docstring), stencil elsewhere (its byte
        advantage wins at 3D scale)."""
        if inner is None:
            st = self.stationary
            dim2 = getattr(st.space, "dim", 2) == 2
            inner = ("halo" if (precision == "mixed" and dim2
                               and jax.default_backend() != "cpu"
                               and st.space.K * st.space.N <= 131072)
                     else "stencil")
        if inner not in ("stencil", "halo"):
            raise ValueError(f"unknown trajectory inner form {inner!r}")
        return inner

    def _resolve_traj_precision(self, precision):
        if precision is None:
            precision = ("mixed" if (self.stationary.dtype == jnp.float64
                                     and jax.default_backend() != "cpu")
                         else "f64")
        if precision not in ("f64", "mixed"):
            raise ValueError(f"unknown trajectory precision {precision!r}")
        return precision

    def _parab_diag_q(self):
        """[1+Q, K, N] diagonals of (mass, A_1..A_Q): combined with theta_G
        they give diag(G(theta)) — the IR Jacobi scaling vector."""
        st = self.stationary
        cache = st._mf_jit_cache
        dq = cache.get("parab_diag_q")
        if dq is None:
            dq = jnp.concatenate([
                jnp.diagonal(self.mass, axis1=-2, axis2=-1)[None],
                jnp.diagonal(st.op.A_diag, axis1=-2, axis2=-1)])
            cache["parab_diag_q"] = dq
        return dq

    def _mf_parab_setup(self):
        """Shared mf machinery: G = M + dt A as one stencil family (mass is
        the first component) + the jitted per-theta block-Jacobi factor
        builder.  Returns (G_sop, bf_fn, cache)."""
        if getattr(self.stationary.space, "dim", 2) == 3:
            from .ops.matrixfree3d import (
                mass_stencil3 as mass_stencil,
                StencilOperator3 as StencilOperator)
        else:
            from .ops.matrixfree import mass_stencil, StencilOperator
        from .la.block import block_jacobi_factors
        st = self.stationary
        sop = st.mf_operator()
        cache = st._mf_jit_cache
        m_st = cache.get("mass_stencil")
        if m_st is None:
            m_st = jax.jit(hp(lambda like: mass_stencil(st.space, like)))(
                sop.stencils[0])
            cache["mass_stencil"] = m_st
        G_sop = StencilOperator(st.space, (m_st,) + tuple(sop.stencils))
        bf_fn = cache.get("parab_bf_fn")
        if bf_fn is None:
            bf_fn = jax.jit(hp(lambda Ad, M, th: block_jacobi_factors(
                M + jnp.einsum("q,qkij->kij", th, Ad))))
            cache["parab_bf_fn"] = bf_fn
        return G_sop, bf_fn, cache

    def _mf_parab_coarse(self, dt, theta, coarse_space, coarse_modes):
        """Two-level coarse space on G = M + dt A, FROZEN at the first theta
        seen per (dt, space) — the same spectral-equivalence freeze as the
        stationary solve."""
        st = self.stationary
        cache = st._mf_jit_cache
        Pkey = ("parab_precond", float(dt), coarse_space, int(coarse_modes))
        pre = cache.get(Pkey)
        if pre is None:
            from .la.block import (AssembledBlockOp,
                                   harvested_coarse_basis,
                                   prepare_coarse)
            A = jax.jit(hp(lambda op, th: op.assemble(th)))(st.op, theta)
            sdt = (lambda Cc: None if Cc is None else dt * Cc)
            G0 = AssembledBlockOp(
                A.static, self.mass + dt * A.A_diag,
                dt * A.C_R_io, dt * A.C_R_oi,
                dt * A.C_U_io, dt * A.C_U_oi,
                sdt(A.C_W_io), sdt(A.C_W_oi))
            bf0 = jax.jit(hp(lambda g: g.block_jacobi_factors()))(G0)
            C_np = harvested_coarse_basis(G0, bf0, st.space,
                                          n_harvest=coarse_modes,
                                          extra_modal=3)
            pre = prepare_coarse(G0, C_np)
            cache[Pkey] = pre
        return pre

    def _mf_traj_core(self, dt, tol, maxiter, precision="f64",
                      extrapolate: bool = True, return_iters: bool = False,
                      inner: str = "stencil"):
        """The (unjitted) whole-trajectory core: one ``lax.scan`` of
        warm-started PCG solves with all model tensors as arguments.  Jitted
        directly for a single mu; ``jax.vmap`` over (theta_G, [bf,] mu) for
        the batched-serving path (:meth:`solve_batch`).

        ``precision='mixed'``: the per-step Krylov runs in native f32 on the
        Jacobi-scaled G (one f32 tree-cast of the assembled stencil, shared
        by all nt steps) with f64 residual restarts and an f64 polish
        (:func:`~pylrbms_tpu.ops.ir.solve_ir`) — same final residual
        guarantee, without the emulated-f64 matvec inside the iteration.

        ``extrapolate``: warm-start each step from the LINEAR prediction
        u + (u - u_prev) instead of the previous solution — for the smooth
        trajectories implicit Euler produces, the prediction error is
        O(dt^2) vs the O(dt) step increment, so the initial residual each
        PCG sees drops by ~dt and the iteration count with it (same
        converged answer; only the starting point changes).

        ``inner='halo'`` (mixed only): the f32 inner Krylov runs through the
        halo-dense form (ops/halodense.py — one gather + one batched MXU
        matmul per apply) built once per mu from the DENSE affine family;
        the f64 residual restarts/polish keep the byte-lean stencil.  The
        measured win regime is mid-scale 2D, where the stencil iteration
        body is op-overhead bound (module docstring)."""
        from .ops.ir import solve_ir, cast_f32
        st = self.stationary
        f_coeffs = st.f_coeffs
        K, N = st.space.K, st.space.N
        nt, dtype = self.nt, st.dtype
        mixed = precision == "mixed"
        if inner == "halo" and not mixed:
            raise ValueError("inner='halo' requires precision='mixed'")

        @hp
        def _traj(G_sop_, theta_G_, bf_, C_, ci_, rhs_q, mu_, dq_,
                  op_=None, mass_=None):
            G = G_sop_.assemble(theta_G_)
            # the mass apply = the family's first component assembled
            # alone (dimension-generic: works for 2D and 3D stencils)
            M_op = type(G_sop_)(G_sop_.space,
                                (G_sop_.stencils[0],)).assemble(
                jnp.ones((1,), theta_G_.dtype))
            if mixed:
                dvec = jnp.einsum("q,qkn->kn", theta_G_, dq_)
                if inner == "halo":
                    from .la.block import AssembledBlockOp
                    from .ops.halodense import halo_from_assembled
                    A_mu = op_.assemble(theta_G_[1:] / dt)
                    sdt = (lambda C: None if C is None else dt * C)
                    G_dense = AssembledBlockOp(
                        op_.static, mass_ + dt * A_mu.A_diag,
                        dt * A_mu.C_R_io, dt * A_mu.C_R_oi,
                        dt * A_mu.C_U_io, dt * A_mu.C_U_oi,
                        sdt(A_mu.C_W_io), sdt(A_mu.C_W_oi))
                    G32 = halo_from_assembled(G_dense, dtype=jnp.float32)
                else:
                    G32 = cast_f32(G)

            def theta_f_at(t):
                mu_t = dict(mu_)
                mu_t["_t"] = t
                return evaluate_coefficients(f_coeffs, mu_t)

            def step(carry, n):
                u_prev, u = carry
                t_next = (n + 1.0) * dt
                f = jnp.einsum("q,qkn->kn", theta_f_at(t_next), rhs_q)
                rhs = M_op.apply(u) + dt * f
                x0 = u + (u - u_prev) if extrapolate else u
                if mixed:
                    u_next, it32, _, it64 = solve_ir(
                        G, G32, rhs, dvec, tol=tol,
                        maxiter=maxiter, block_factors=bf_,
                        coarse_basis=C_, coarse_inv=ci_,
                        x0=x0, return_info=True)
                    its = it32 + it64
                else:
                    u_next, its = G.solve_pcg(rhs, tol=tol, maxiter=maxiter,
                                              block_factors=bf_,
                                              coarse_basis=C_,
                                              coarse_inv=ci_, coarse_f32=True,
                                              x0=x0, return_iters=True)
                return (u, u_next), (u_next, its)

            u0 = jnp.zeros((K, N), dtype)
            _, (traj, its) = jax.lax.scan(step, (u0, u0), jnp.arange(nt))
            traj = jnp.concatenate([u0[None], traj], axis=0)
            return (traj, its) if return_iters else traj

        return _traj

    @hp
    def solve_batch(self, mus, shared_preconditioner: bool = True,
                    tol: float = 1e-10, maxiter: int = 500,
                    two_level: bool = None, coarse_modes: int = 16,
                    coarse_space: str = "harvested", precision: str = None,
                    extrapolate: bool = True, inner: str = None):
        """Batched-mu parabolic serving: B implicit-Euler trajectories in ONE
        jitted dispatch — the parabolic analog of the elliptic batched online
        step (:func:`make_online_step`).  Returns [B, nt+1, K, N].

        The per-iteration HBM stream (affine stencils, coarse level and —
        with ``shared_preconditioner=True`` — the block-Jacobi factors built
        at mu_bar, spectrally equivalent across the parameter range) is
        shared across the whole batch; the scan's PCG solves run lock-step
        until the slowest lane converges.  ``shared_preconditioner=False``
        builds exact per-mu factors instead (B x [K, N, N] extra HBM).

        The reference's parabolic pipeline answers parameter queries one
        ISTL-factorize-per-mu at a time (``ImplicitEulerTimeStepper``,
        reference ``discretize_parabolic_block_swipdg.py:27-40``); this is
        the many-query production shape (POD-greedy training sweeps,
        parabolic serving)."""
        st = self.stationary
        if not (st.estimator is not None
                and getattr(st.estimator.data, "lambda_funcs", None)):
            raise NotImplementedError(
                "solve_batch needs the matrix-free stencil path "
                "(estimator data with lambda_funcs)")
        dt = self.T / self.nt
        mus = [self.parse_parameter(m) for m in mus]
        G_sop, bf_fn, cache = self._mf_parab_setup()
        thetas = jnp.stack([st.theta(m) for m in mus])          # [B, Q]
        ones = jnp.ones((thetas.shape[0], 1), thetas.dtype)
        theta_G = jnp.concatenate([ones, dt * thetas], axis=1)  # [B, 1+Q]
        K, N = st.space.K, st.space.N
        if two_level is None:
            two_level = K * N > 32768
        C = ci = None
        if two_level:
            C, ci = self._mf_parab_coarse(dt, thetas[0], coarse_space,
                                          coarse_modes)
        if shared_preconditioner:
            theta_bar = _resolve_theta_bar(st)
            bf = bf_fn(st.op.A_diag, self.mass, dt * theta_bar)
            bf_ax = None
        else:
            bf = jax.vmap(bf_fn, in_axes=(None, None, 0))(
                st.op.A_diag, self.mass, dt * thetas)
            bf_ax = 0
        precision = self._resolve_traj_precision(precision)
        # batched default stays on the stencil form: the lanes already
        # amortize the per-op overhead the halo form exists to remove,
        # while its extra bytes (and per-lane dense G) would multiply by B
        inner = ("stencil" if inner is None
                 else self._resolve_traj_inner(inner, precision))
        key = ("parab_mf_traj_batched", K, N, self.nt, float(dt),
               float(tol), int(maxiter), bool(two_level), bf_ax,
               thetas.shape[0], precision, bool(extrapolate), inner)
        fn = cache.get(key)
        if fn is None:
            core = self._mf_traj_core(dt, tol, maxiter, precision,
                                      extrapolate=extrapolate, inner=inner)
            fn = cache[key] = jax.jit(jax.vmap(
                core, in_axes=(None, 0, bf_ax, None, None, None, 0, None,
                               None, None)))
        mus_stacked = {k: jnp.stack([jnp.asarray(m[k]) for m in mus])
                       for k in mus[0]}
        extra = ((st.op, self.mass) if inner == "halo" else (None, None))
        return fn(G_sop, theta_G, bf, C, ci, st.rhs_q, mus_stacked,
                  self._parab_diag_q(), *extra)

    def operator_apply(self, U, mu):
        return self.stationary.operator_apply(U, mu)

    def rhs(self, mu):
        return self.stationary.rhs(mu)

    def l2_solve(self, V):
        return self.stationary.l2_solve(V)

    @property
    def products(self):
        return self.stationary.products

    def estimate(self, U, mu, decompose: bool = False):
        mu = self.parse_parameter(mu)
        est = ParabolicEstimator(self.stationary.estimator.data)
        return est.estimate(U, mu, d=self)

    def unblock(self, U):
        return unblock(U)
