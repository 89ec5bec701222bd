"""Online adaptive enrichment: Doerfler marking + solve/estimate/enrich loop.

TPU-native counterpart of ``/root/reference/python/dune/pylrbms/
online_enrichment.py``:

* :func:`doerfler_marking` (``online_enrichment.py:9-22``): square the
  indicators (note: they are already squared quantities — the reference's
  double-squaring is replicated by feeding the same arrays), sort descending,
  return the smallest prefix whose cumulative sum exceeds theta * total.
* :class:`AdaptiveEnrichment` (``:25-93``): solve -> estimate -> mark
  (Doerfler + age-based, ``:43-45``) -> enrich marked subdomains
  (corrector solves) -> re-reduce; loop until eta <= target_error or
  enrichment_steps exhausted; metrics callback hook (``:76-80``).
"""
from __future__ import annotations

import numpy as np

from .utils.logging import getLogger


def doerfler_marking(indicators, theta: float):
    """<-> ``online_enrichment.doerfler_marking`` (``:9-22``)."""
    assert 0.0 < theta <= 1.0
    ind = np.asarray(indicators, dtype=float).reshape(-1) ** 2
    order = np.argsort(-ind, kind="stable")
    sorted_vals = ind[order]
    total = sorted_vals.sum()
    csum = np.cumsum(sorted_vals)
    over = csum > theta * total
    if over.any():
        cut = int(np.argmax(over)) + 1
        return [int(i) for i in order[:cut]]
    return [int(i) for i in order]


class AdaptiveEnrichment:
    """<-> ``online_enrichment.AdaptiveEnrichment`` (``:25-93``)."""

    def __init__(self, grid_and_problem_data, discretization, block_space,
                 reductor, rd, target_error: float,
                 marking_doerfler_theta: float = 0.33,
                 marking_max_age: int = 4,
                 batched_correctors: bool = True):
        self.grid_and_problem_data = grid_and_problem_data
        self.discretization = discretization
        self.block_space = block_space
        self.reductor = reductor
        self.rd = rd
        self.target_error = float(target_error)
        self.marking_doerfler_theta = float(marking_doerfler_theta)
        self.marking_max_age = int(marking_max_age)
        self.batched_correctors = batched_correctors
        self._corrector = None
        self.logger = getLogger("pylrbms.online_enrichment")

    def estimate(self, u, mu, decompose: bool = False):
        return self.rd.estimate(u, mu, decompose=decompose)

    def _enrich_once(self, u, mu, indicators, age_count):
        marked = set(doerfler_marking(indicators, self.marking_doerfler_theta))
        n_doerfler = len(marked)
        for ii in np.where(age_count > self.marking_max_age)[0]:
            marked.add(int(ii))
        self.logger.info3(
            f"marked {n_doerfler}/{self.block_space.K} subdomains (Doerfler) "
            f"+ {len(marked) - n_doerfler} (age)")
        # reconstruct once, before the bases change mid-round
        u_full = self.rd.reconstruct(u)
        if self.batched_correctors:
            # all marked patches in ONE on-device masked-PCG solve
            from .ops.corrector import BatchedCorrector
            from .reductor import ExtensionError
            if self._corrector is None:
                self._corrector = BatchedCorrector(self.discretization)
                # inherit the reductor's device mesh: the whole enrichment
                # loop (online step, corrector, re-reduce) then K-shards
                self._corrector.mesh = getattr(self.reductor, "mesh", None)
                # warm the common mark-count buckets in the background so
                # later rounds never stall on a corrector compile
                # (accelerators only — CPU compiles are cheap)
                import jax as _jax
                if (_jax.default_backend() != "cpu"
                        and self._corrector.mesh is None):
                    self._corrector.prefetch_buckets()
            marked_sorted = sorted(marked)
            from .utils.timers import GLOBAL_TIMINGS as _T
            with _T.span('enrich: corrector solve') as _s:
                W = self._corrector.solve(marked_sorted, mu,
                                          current_solution=u_full)
                _s["sync"] = W
            with _T.span('enrich: basis extension'):
                for i, ii in enumerate(marked_sorted):
                    try:
                        self.reductor.extend_basis_local(ii, np.asarray(W[i]))
                    except ExtensionError:
                        pass
        else:
            for ii in sorted(marked):
                self.reductor.enrich_local(ii, u, mu, current_solution=u_full)
        from .utils.timers import GLOBAL_TIMINGS as _T2
        with _T2.span('enrich: re-reduction') as _s:
            self.rd = self.reductor.reduce()
            _s["sync"] = self.rd.A_red
        for ii in range(self.block_space.K):
            age_count[ii] = 1 if ii in marked else age_count[ii] + 1
        return len(marked)

    def solve(self, mu, enrichment_steps=np.inf, callback=None):
        mu = self.discretization.parse_parameter(mu)
        enrichment_step = 1
        age_count = np.ones(self.block_space.K)
        local_problem_solves = 0
        rb_size = self.rd.solution_dim
        from .utils.timers import GLOBAL_TIMINGS as _T
        while True:
            with _T.span('enrich: ROM online step') as _s:
                if hasattr(self.rd, "online_step"):
                    # one jitted dispatch per round (solve + localized
                    # estimate); compiled code reused across rounds within
                    # an r_max bucket
                    u, eta, indicators = self.rd.online_step(mu)
                else:
                    u = self.rd.solve(mu)
                    eta, _, indicators = self.estimate(u, mu, decompose=True)
                _s["sync"] = eta
            eta = float(eta)
            if callback:
                callback(self.rd, u, mu, {
                    "eta": eta,
                    "local_problem_solves": local_problem_solves,
                    "global RB size": self.rd.solution_dim,
                    "local RB sizes": list(map(int, self.rd.sizes))})
            if eta <= self.target_error:
                self.logger.info3(f"eta {eta:.3e} <= target {self.target_error:.3e}")
                return u, self.rd, self.reductor
            if enrichment_step > enrichment_steps:
                self.logger.warning(
                    f"eta {eta:.3e} > target {self.target_error:.3e}, stopping "
                    f"after {enrichment_steps} enrichment steps")
                return u, self.rd, self.reductor
            enrichment_step += 1
            local_problem_solves = self._enrich_once(u, mu, indicators, age_count)
            self.logger.info3(
                f"RB size {rb_size} -> {self.rd.solution_dim}")
            rb_size = self.rd.solution_dim


class ParabolicAdaptiveEnrichment:
    """Online adaptive enrichment for the parabolic LRBMS ROM — beyond the
    reference: its ``ParabolicLRBMSReductor`` is a ``pass`` stub (reference
    ``reductor.py:149-180``) and its ``AdaptiveEnrichment`` is elliptic-only.

    Per round: ROM trajectory -> fully projected parabolic estimate
    (N-independent) -> localize (per-subdomain indicator = time-aggregated
    squared local parts eta_nc/eta_r/eta_df + time-derivative
    nonconformity) -> Doerfler + age marking -> batched corrector patch
    solves in residual mode against the reconstructed trajectory state at
    the worst time step -> local basis extension -> re-reduction."""

    def __init__(self, im, reductor, rd, target_error: float,
                 marking_doerfler_theta: float = 0.33,
                 marking_max_age: int = 4):
        self.im = im
        self.d = im.stationary
        self.reductor = reductor            # ParabolicLRBMSReductor
        self.rd = rd                        # ReducedParabolicModel (attached)
        self.target_error = float(target_error)
        self.marking_doerfler_theta = float(marking_doerfler_theta)
        self.marking_max_age = int(marking_max_age)
        self._corrector = None
        self.logger = getLogger("pylrbms.online_enrichment.parabolic")

    @staticmethod
    def _localize(parts):
        """[K]-indicator from the decomposed parts (squared aggregation over
        time, matching the squared-locals pipeline convention)."""
        nc, r, df, _time_res, tdnc = (np.asarray(p) for p in parts)
        return ((nc ** 2 + r ** 2 + df ** 2).sum(axis=1)
                + (tdnc ** 2).sum(axis=1))

    def _enrich_once(self, c, mu, parts, age_count):
        K = self.d.space.K
        indicators = self._localize(parts)
        marked = set(doerfler_marking(indicators, self.marking_doerfler_theta))
        n_doerfler = len(marked)
        for ii in np.where(age_count > self.marking_max_age)[0]:
            marked.add(int(ii))
        self.logger.info3(f"marked {n_doerfler}/{K} subdomains (Doerfler) "
                          f"+ {len(marked) - n_doerfler} (age)")
        # corrector rhs: the implicit-Euler defect at the worst time step
        # b* (the per-step elliptic residual f - A u is exhausted after one
        # extension; the parabolic defect M du/dt + A u - f keeps supplying
        # new directions as b* and the trajectory move round to round)
        import jax.numpy as jnp
        nc, r, df = (np.asarray(p) for p in parts[:3])
        per_step = (nc ** 2 + r ** 2 + df ** 2).sum(axis=0)      # [nt+1]
        b_star = 1 + int(np.argmax(per_step[1:]))
        dt = self.im.T / self.im.nt
        cb = np.asarray(c)
        u_b = self.reductor.reconstruct(cb[b_star])
        u_bm1 = self.reductor.reconstruct(cb[b_star - 1])
        mu_b = dict(mu)
        mu_b["_t"] = b_star * dt
        M = self.d.products["l2"]
        defect = (self.d.rhs(mu_b)
                  - jnp.einsum("knm,km->kn", M, (u_b - u_bm1) / dt)
                  - self.d.assemble(mu).apply(u_b))
        from .ops.corrector import BatchedCorrector
        from .reductor import ExtensionError
        if self._corrector is None:
            self._corrector = BatchedCorrector(self.d)
            self._corrector.mesh = getattr(self.reductor, "mesh", None)
        mu_t = dict(mu)
        mu_t.setdefault("_t", 0.0)
        marked_sorted = sorted(marked)
        W = self._corrector.solve(marked_sorted, mu_t, rhs_full=defect)
        for i, ii in enumerate(marked_sorted):
            try:
                self.reductor.extend_basis_local(ii, np.asarray(W[i]))
            except ExtensionError:
                pass
        self.rd = self.reductor.reduce().attach_instationary(self.im)
        for ii in range(K):
            age_count[ii] = 1 if ii in marked else age_count[ii] + 1
        return len(marked)

    def solve(self, mu, enrichment_steps=np.inf, callback=None):
        mu = self.d.parse_parameter(mu)
        enrichment_step = 1
        age_count = np.ones(self.d.space.K)
        rb_size = self.rd.solution_dim
        while True:
            c = self.rd.solve(mu)
            eta, parts = self.rd.estimate(c, mu, projected=True)
            eta = float(eta)
            if callback:
                callback(self.rd, c, mu, {
                    "eta": eta,
                    "global RB size": self.rd.solution_dim,
                    "local RB sizes": list(map(int, self.rd.sizes))})
            if eta <= self.target_error:
                self.logger.info3(
                    f"eta {eta:.3e} <= target {self.target_error:.3e}")
                return c, self.rd, self.reductor
            if enrichment_step > enrichment_steps:
                self.logger.warning(
                    f"eta {eta:.3e} > target {self.target_error:.3e}, "
                    f"stopping after {enrichment_steps} enrichment steps")
                return c, self.rd, self.reductor
            enrichment_step += 1
            self._enrich_once(c, mu, parts, age_count)
            self.logger.info3(f"RB size {rb_size} -> {self.rd.solution_dim}")
            rb_size = self.rd.solution_dim
