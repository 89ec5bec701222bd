"""SPE10 estimator-efficiency parity, small-scale regression of the study
in ``scripts/spe10_efficiency_study.py`` (artifact:
``docs/results/spe10_efficiency_study.txt``) — BASELINE.json's
"at estimator-efficiency parity" clause demonstrated ON SPE10 data:
true energy error vs a p=2 reference (nested prolongation, the reference's
own EOC methodology, ``/root/reference/python/dune/pylrbms/EOC.py:203-205``),
efficiency = error/estimate level-constant and < 1 (eta reliable), for two
parameters."""
import math

import pytest

from pylrbms_tpu.problems.spe10 import init_grid_and_problem, pool_log_mean
from pylrbms_tpu.EOC import StationaryEocStudy, default_refine


def _disc(gpd):
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    d, data = discretize(gpd)
    return d, {'block_space': data['block_space'], 'unblock': d.unblock}


def test_pool_modes():
    import numpy as np
    perm = np.exp(np.random.default_rng(0).normal(0, 2, (220, 60)))
    lm = pool_log_mean(perm, 8, 8)
    nn = pool_log_mean(perm, 8, 8, mode="nearest")
    assert lm.shape == nn.shape == (8, 8)
    # log-mean smooths: strictly smaller dynamic range than pointwise values
    assert lm.max() / lm.min() < nn.max() / nn.min() * 1.01
    # nearest values are actual field values
    assert all(v in perm for v in nn.ravel())


@pytest.mark.slow
@pytest.mark.parametrize("mu", [1.0, 0.3])
def test_spe10_efficiency_level_constant(mu):
    from functools import partial
    init = partial(init_grid_and_problem, raster=(8, 8),
                   raster_mode="nearest", max_contrast=1e3)
    study = StationaryEocStudy(
        init, _disc,
        # coarsest grid 16x16 cells = 2x the pooled raster (coefficient
        # exact on every level); the 8x8 level where h == the coefficient
        # scale is PRE-asymptotic (measured eff 3.7-4.0 there — the p=2
        # reference resolves the coefficient while the P1 level cannot);
        # from 16x16 on the efficiency is stabilized (0.21 -> 0.2x, the
        # same values the at-scale study shows)
        {'num_subdomains': [2, 2],
         'half_num_fine_elements_per_subdomain_and_dim': 2,
         'num_refinements': 1},
        default_refine, mu={'switch': mu}, p_ref=2, max_levels=1,
        paper_convention=True)
    data = study.run(("h", "elliptic_mu_bar", "eta"))
    effs = [data[lvl]["norm"]["elliptic_mu_bar"]
            / data[lvl]["estimate"]["eta"] for lvl in (0, 1)]
    # level-constant within a factor ~2 at these pre-asymptotic levels
    # (the at-scale study shows 0.19-0.25 stabilized; the full table is the
    # artifact); eta must dominate the true error (reliability)
    assert 0.5 < effs[1] / effs[0] < 2.0, f"efficiency jumped: {effs}"
    assert all(e < 1.0 for e in effs), f"eta must dominate: {effs}"
