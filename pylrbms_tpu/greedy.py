"""Offline weak-greedy basis construction, batched over the training set.

The BASELINE.json north-star pipeline ("offline greedy local basis
construction + online block reduced solve") — absent as an explicit algorithm
in the reference (its offline phase extends with uniform/random snapshots,
``scripts/linearelliptic_block_swipdg_decomp.py:46-59``), but the standard
LRBMS offline driver.

TPU-native design: the greedy's inner loop — "estimate the reduced error for
every training parameter" — is ONE jitted, vmapped evaluation over the whole
training set (reduced solves are dense [R,R] batched systems, the localized
estimator is batched einsums), instead of a Python loop over parameters.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .utils.precision import hp
from .reductor import LRBMSReductor, ExtensionError
from .utils.logging import getLogger


@dataclass
class GreedyResult:
    reductor: LRBMSReductor
    rd: object
    max_etas: List[float]
    chosen_mus: List[dict]
    fom_solves: int


def _stack_mus(mus):
    """list of parameter dicts -> dict of stacked arrays (leading axis B)."""
    keys = mus[0].keys()
    return {k: jnp.stack([jnp.asarray(mu[k]) for mu in mus]) for k in keys}


def _shard_batch(mesh, mus_stacked):
    """Pad the leading mu axis to a device-count multiple — by TILING, so
    batches smaller than the pad still land on an even split — and place
    each leaf with its batch axis on the mesh axis.  Returns
    (sharded dict, original B)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    B = next(iter(mus_stacked.values())).shape[0]
    pad = (-B) % n
    if pad:
        reps = 1 + (-(-pad // B))
        mus_stacked = {k: jnp.concatenate([v] * reps)[:B + pad]
                       for k, v in mus_stacked.items()}
    mus_stacked = {k: jax.device_put(v, NamedSharding(
        mesh, P(*((axis,) + (None,) * (v.ndim - 1)))))
        for k, v in mus_stacked.items()}
    return mus_stacked, B


def batched_estimates(rd, mus_stacked, criterion: str = "estimator", mesh=None):
    """Error surrogate for every training parameter in one jitted vmapped
    call.  criterion='residual' uses the algebraic-residual dual norm via
    the projected Gramians (N-independent; goes to 0 as ROM -> FOM);
    'residual_fom' evaluates ||b - A(mu) V c||_2 DIRECTLY through the
    matrix-free stencil operator — numerically exact where the expanded
    quadratic form cancels below floating-point noise (high-contrast
    problems at scale); 'estimator' uses the LRBMS total-error estimator
    (floored by the discretization error: the certification quantity).

    With ``mesh`` (a 1D jax.sharding.Mesh) the training batch is sharded over
    the devices — the greedy's inner loop is embarrassingly parallel in mu."""

    if criterion == "residual" and rd.G_AA is None:
        # the reductor skipped the algebraic-residual Gramians at scale
        criterion = "residual_fom"
    if criterion == "residual_fom":
        import dataclasses
        d = rd.d
        V = jnp.asarray(rd.reductor._padded_bases(rd.r_max))   # [K, r_max, N]
        sop = d.mf_operator()
        from .utils.precision import hp as _hp
        StencilOperator = type(sop)       # 2D or 3D stencil operator

        # the compiled sweep is cached by SHAPES with the mu-dependent
        # reduced tensors as ARGUMENTS (the online_step pattern): a fresh
        # jit per greedy iteration re-traced the whole FOM-residual graph
        # every time (~40 s/iteration at SPE10 scale vs a 4 s steady call)
        arrays = {"A_red": rd.A_red, "b_red": rd.b_red}
        # cache on the MODEL (the traced closure captures d's coefficient
        # functions — a module-global keyed by id(d) could both leak every
        # model for process lifetime and serve a stale closure after id
        # reuse)
        cache = getattr(d, "_sweep_jit_cache", None)
        if cache is None:
            cache = d._sweep_jit_cache = {}
        key = ("residual_fom",
               tuple(map(int, V.shape)), str(V.dtype),
               tuple((n, tuple(map(int, a.shape)), str(a.dtype))
                     for n, a in sorted(arrays.items())))
        fn = cache.get(key)
        if fn is None:
            skeleton = rd

            def one_direct(arrays, mu, V, stencils, rhs_q):
                rdt = dataclasses.replace(skeleton, **arrays)
                c = rdt.solve(mu)
                U = jnp.einsum("kr,krn->kn", c.astype(V.dtype), V)
                theta = d.theta(mu)
                b = jnp.einsum("q,qkn->kn", d.theta_f(mu), rhs_q)
                r = b - StencilOperator(d.space, stencils).assemble(
                    theta).apply(U)
                return jnp.linalg.norm(r.reshape(-1))

            fn = jax.jit(_hp(jax.vmap(
                one_direct, in_axes=(None, 0, None, None, None))))
            cache[key] = fn
        if mesh is not None:
            # shard the training batch over the device mesh (the sweep is
            # embarrassingly parallel in mu; model tensors replicate)
            mus_stacked, B = _shard_batch(mesh, mus_stacked)
            with mesh:
                out = fn(arrays, mus_stacked, V, sop.stencils, d.rhs_q)
            return out[:B]
        return fn(arrays, mus_stacked, V, sop.stencils, d.rhs_q)

    def one(mu):
        c = rd.solve(mu)
        if criterion == "residual":
            return rd.residual_norm(c, mu)
        return rd.estimate(c, mu)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        mus_stacked, B = _shard_batch(mesh, mus_stacked)
        out = jax.jit(hp(jax.vmap(one)), out_shardings=sh)(mus_stacked)
        return out[:B]
    return jax.jit(hp(jax.vmap(one)))(mus_stacked)


def weak_greedy(d, training_set, target_error: float = 1e-4,
                max_extensions: int = 50, products=None,
                reductor: Optional[LRBMSReductor] = None,
                order: int = 0, criterion: str = "residual",
                checkpoint_path: Optional[str] = None,
                resume: bool = False, mesh=None,
                snapshot_options: Optional[dict] = None) -> GreedyResult:
    """Weak greedy: until the worst surrogate error over the training set
    drops below target_error, pick the worst parameter, FOM-solve it, extend
    the local bases blockwise, re-project.  Parameters whose snapshot adds
    nothing are retired from the selection.

    With ``checkpoint_path`` the bases + selection state are written
    atomically after every extension; ``resume=True`` continues from that
    file (skipping the already-performed FOM snapshot solves).

    ``mesh`` (a 1D jax.sharding.Mesh) shards the surrogate sweep — the
    greedy's measured per-iteration bound at SPE10 scale
    (docs/results/spe10_greedy_tpu.txt) — over the device mesh; the sweep
    is embarrassingly parallel in mu (see :func:`batched_estimates`).

    ``snapshot_options`` are the ``inverse_options`` for the FOM snapshot
    solves.  Default precision is 1e-8: a snapshot only feeds the basis
    through Gram-Schmidt, so accuracy far below the greedy's own surrogate
    target buys nothing, while the default model precision (1e-10) makes
    the Krylov tail the dominant steady per-iteration cost at SPE10
    contrast (the preconditioner is frozen at mu_bar, so the tail flattens
    for far-away mus)."""
    logger = getLogger("pylrbms.greedy")
    # MERGE onto the model's own solver options (model.solve treats
    # inverse_options as a full replacement): a model constructed with
    # e.g. {'type': 'dense'} or a post-check keeps those for its snapshot
    # solves, with only the precision default relaxed on top
    snapshot_options = {**(d.solver_options or {}),
                        "precision": 1e-8,
                        **(snapshot_options or {})}
    if (criterion == "residual" and d.space.K * d.space.N > 32768
            and d.estimator is not None
            and getattr(d.estimator.data, "lambda_funcs", None)):
        # at scale (and high contrast) the Gramian form of the residual
        # cancels below floating-point noise; evaluate it directly
        criterion = "residual_fom"
        logger.info("greedy: using direct FOM-residual criterion at scale")
    mus = [d.parse_parameter(mu) for mu in training_set]
    max_etas, chosen_idx = [], []
    retired = np.zeros(len(mus), dtype=bool)
    it0 = 0
    red = None
    if resume and checkpoint_path is not None:
        import os
        from .utils.checkpoint import load_greedy_state
        p = checkpoint_path if checkpoint_path.endswith(".npz") \
            else checkpoint_path + ".npz"
        if os.path.exists(p):
            red, it0, retired, max_etas, chosen_idx = load_greedy_state(
                d, p, products=products)
            retired = retired.copy()
            logger.info(f"greedy: resumed from {p} at iteration {it0} "
                        f"(RB size {sum(b.shape[0] for b in red.bases)})")
    if red is None:
        red = reductor or LRBMSReductor(d, products=products, order=order)
    if criterion != "residual" and reductor is None:
        # the direct-residual criteria never read the algebraic-residual
        # Gramians (G_bb/G_Ab/G_AA): force the LEAN projection so every
        # (re-)reduction skips them AND runs the incremental image-cache
        # path regardless of the bucket-size heuristic.  Measured at SPE10
        # scale (r_max=4 bucket, where the heuristic keeps Gramians on):
        # 37.5 s -> ~2 s per steady greedy re-reduction.  Only applied to
        # reductors this function OWNS (created here or checkpoint-loaded)
        # — a caller-supplied reductor may read the Gramians afterwards.
        red.force_lean = True
    elif criterion != "residual" and not getattr(red, "force_lean", False):
        logger.info("greedy: caller-supplied reductor keeps Gramian "
                    "projections; set reductor.force_lean=True for the "
                    "lean/incremental re-reduction path")
    # overlap the frozen-preconditioner build + solve compile (the first
    # snapshot's one-time ~94 s at SPE10 scale) with the initial reduction
    # and the first surrogate sweep; joined before the first FOM solve
    prep_t = (d.prepare_solver(inverse_options=snapshot_options,
                               background=True)
              if hasattr(d, "prepare_solver") else None)
    from .utils.timers import GLOBAL_TIMINGS as _T0
    with _T0.span('greedy: initial reduction') as _s0:
        rd = red.reduce()
        _s0["sync"] = rd.A_red
    stacked = _stack_mus(mus)
    chosen = [mus[i] for i in chosen_idx]
    solves = 0
    from .utils.timers import GLOBAL_TIMINGS as _T
    for it in range(it0, max_extensions):
        with _T.span('greedy: surrogate sweep'):
            # np.asarray blocks: the span also absorbs any device work the
            # preceding (async-dispatched) re-reduction left in flight
            etas = np.asarray(batched_estimates(rd, stacked, criterion,
                                                mesh=mesh))
        sel = np.where(retired, -np.inf, etas)
        worst = int(np.argmax(sel))
        max_eta = float(etas[worst])
        max_etas.append(max_eta)
        logger.info(f"greedy iter {it}: max {criterion} {max_eta:.3e} at "
                    f"training index {worst} (RB size {rd.solution_dim})")
        if max_eta <= target_error or retired.all():
            break
        if prep_t is not None:
            prep_t.join()
            prep_t = None
        with _T.span('greedy: FOM snapshot solve') as _s:
            U = d.solve(mus[worst], inverse_options=snapshot_options)
            _s["sync"] = U
        it_n = getattr(d, "last_solve_iters", None)
        if it_n is not None:
            logger.info(f"greedy: snapshot solve {int(it_n)} Krylov "
                        f"iterations (precision "
                        f"{snapshot_options.get('precision', 1e-10):.0e})")
        solves += 1
        chosen.append(mus[worst])
        chosen_idx.append(worst)
        try:
            with _T.span('greedy: basis extension (GS)'):
                red.extend_basis(U)
        except ExtensionError:
            logger.info(f"greedy: snapshot at index {worst} added nothing; retiring it")
            retired[worst] = True
            continue
        with _T.span('greedy: re-reduction (projection)') as _s:
            rd = red.reduce()
            _s["sync"] = rd.A_red
        if checkpoint_path is not None:
            from .utils.checkpoint import save_greedy_state
            save_greedy_state(red, checkpoint_path, it=it + 1,
                              retired=retired, max_etas=max_etas,
                              chosen_idx=chosen_idx)
    return GreedyResult(reductor=red, rd=rd, max_etas=max_etas,
                        chosen_mus=chosen, fom_solves=solves)


def pod_greedy(im, training_set, target_error: float = 1e-4,
               max_extensions: int = 20, products=None, pod_modes: int = 1,
               order: int = 0, checkpoint_path: Optional[str] = None,
               resume: bool = False) -> GreedyResult:
    """POD-greedy (Haasdonk/Ohlberger-style) for the parabolic LRBMS FOM —
    offline basis construction the reference lacks entirely (its
    ``ParabolicLRBMSReductor`` is a ``pass`` stub, ``reductor.py:149-180``).

    Until the worst *parabolic* ROM estimate (fully projected,
    N-independent) over the training set drops below ``target_error``: pick
    the worst parameter, solve the FOM trajectory, subtract the current-ROM
    reconstruction, and extend each local basis with the leading POD modes
    of the local error trajectory w.r.t. the local energy product.

    NOTE the selection quantity is the *certification* estimator: like the
    online-enrichment loop it is floored by the FOM discretization error,
    so on coarse meshes it plateaus there while the ROM-vs-FOM trajectory
    error keeps converging (assert on reconstruction error in tests).

    ``checkpoint_path``/``resume``: same semantics as :func:`weak_greedy` —
    bases + selection state written atomically after every extension, an
    interrupted offline run continues without redoing FOM trajectory
    solves.
    """
    from .reductor import ParabolicLRBMSReductor
    logger = getLogger("pylrbms.pod_greedy")
    d = im.stationary
    mus = [d.parse_parameter(mu) for mu in training_set]
    max_ests: List[float] = []
    chosen_idx: List[int] = []
    it0 = 0
    red = None
    if resume and checkpoint_path is not None:
        import os
        from .utils.checkpoint import load_greedy_state
        p = checkpoint_path if checkpoint_path.endswith(".npz") \
            else checkpoint_path + ".npz"
        if os.path.exists(p):
            red, it0, _, max_ests, chosen_idx = load_greedy_state(
                d, p, products=products, cls=ParabolicLRBMSReductor)
            logger.info(f"pod-greedy: resumed from {p} at iteration {it0} "
                        f"(RB size {sum(b.shape[0] for b in red.bases)})")
    if red is None:
        red = ParabolicLRBMSReductor(d, products=products, order=order)
    rd = red.reduce().attach_instationary(im)
    chosen = [mus[i] for i in chosen_idx]
    fom_solves = 0

    def _save(it_next):
        if checkpoint_path is not None:
            from .utils.checkpoint import save_greedy_state
            save_greedy_state(red, checkpoint_path, it=it_next,
                              retired=np.zeros(len(mus), dtype=bool),
                              max_etas=max_ests, chosen_idx=chosen_idx)

    for it in range(it0, max_extensions):
        if rd.elliptic.parabolic is not None:
            # the whole training sweep (B reduced trajectories + B projected
            # estimates) runs as TWO jitted dispatches instead of ~4B eager
            # remote round-trips
            cs = rd.solve_batch(mus)
            ests = [float(e) for e in np.asarray(rd.estimate_batch(cs, mus))]
        else:
            cs = None
            ests = []
            for mu in mus:
                c = rd.solve(mu)
                e, _ = rd.estimate(c, mu, projected=True)
                ests.append(float(e))
        worst = int(np.argmax(ests))
        max_ests.append(ests[worst])
        logger.info(f"pod-greedy iter {it}: max estimate {ests[worst]:.3e} "
                    f"at training index {worst} "
                    f"(RB size {int(red.basis_sizes().sum())})")
        if ests[worst] <= target_error:
            _save(it + 1)      # keep the converged max_etas on disk
            break
        mu_w = mus[worst]
        U = np.asarray(im.solve(mu_w))                 # [nt+1, K, N]
        fom_solves += 1
        chosen.append(mu_w)
        chosen_idx.append(worst)
        # the sweep already holds the reduced trajectory for mu_w
        c_w = cs[worst] if cs is not None else rd.solve(mu_w)
        E = U - np.asarray(red.reconstruct(c_w))
        added = 0
        for k in range(d.space.K):
            Ek = E[:, k, :]
            C = Ek @ red.products[k] @ Ek.T            # [nt+1, nt+1]
            w, Vv = np.linalg.eigh(C)
            idx = np.argsort(w)[::-1][:pod_modes]
            idx = idx[w[idx] > max(float(w.max()), 0.0) * 1e-12]
            if idx.size == 0:
                continue
            modes = Vv[:, idx].T @ Ek                  # [m, N]
            try:
                added += red.extend_basis_local(k, modes)
            except ExtensionError:
                pass
        if added == 0:
            logger.info("pod-greedy: no local basis grew — stopping")
            _save(it + 1)
            break
        rd = red.reduce().attach_instationary(im)
        _save(it + 1)
    return GreedyResult(reductor=red, rd=rd, max_etas=max_ests,
                        chosen_mus=chosen, fom_solves=fom_solves)
