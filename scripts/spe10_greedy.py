#!/usr/bin/env python
"""SPE10 model-2 offline greedy + online enrichment — the BASELINE.json
north-star pipeline ("SPE10 model-2 LRBMS offline greedy + online enrichment
on one TPU chip ... at estimator-efficiency parity").

Offline: weak greedy over a training set (each iteration: ONE batched
surrogate evaluation over all training parameters + one FOM solve).
Online: adaptive local enrichment at unseen parameters.
"""
import argparse
import time

import numpy as np
import jax.numpy as jnp

from pylrbms_tpu.problems.spe10 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.greedy import weak_greedy
from pylrbms_tpu.online_enrichment import AdaptiveEnrichment
from pylrbms_tpu.utils.logging import getLogger, set_log_levels
from pylrbms_tpu.utils.timers import GLOBAL_TIMINGS as T
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

set_log_levels({'pylrbms': 'INFO'})
logger = getLogger('spe10_greedy')


def main(num_subdomains=(8, 8), half=2, nref=1, training=8, target=1e-3,
         online_mus=3, dtype="float64", checkpoint=None, resume=False):
    if dtype == "float64":
        import jax
        jax.config.update("jax_enable_x64", True)   # env-independent
    cfg = {'num_subdomains': list(num_subdomains),
           'half_num_fine_elements_per_subdomain_and_dim': half,
           'num_refinements': nref}
    gpd = init_grid_and_problem(cfg)
    with T.span('discretize'):
        d, _ = discretize(gpd, dtype=getattr(jnp, dtype))
    logger.info(f'grid: {gpd["grid"].num_elements} elements, '
                f'{gpd["grid"].num_subdomains} subdomains, '
                f'{d.space.K * d.space.N} dofs')

    training_set = d.parameter_space.sample_uniformly(training)
    with T.span('offline greedy'):
        res = weak_greedy(d, training_set, target_error=target,
                          max_extensions=20, checkpoint_path=checkpoint,
                          resume=resume)
    logger.info(f'greedy: {len(res.max_etas)} iterations, '
                f'{res.fom_solves} FOM solves, final surrogate '
                f'{res.max_etas[-1]:.3e}, RB size {res.rd.solution_dim}')

    online = AdaptiveEnrichment(gpd, d, d.space, res.reductor, res.rd,
                                target_error=target,
                                marking_doerfler_theta=0.33, marking_max_age=4)
    for i, mu in enumerate(d.parameter_space.sample_randomly(online_mus, seed=3)):
        with T.span(f'online mu #{i}'):
            u, rd, _ = online.solve(mu, enrichment_steps=3)
        logger.info(f'online mu #{i}: eta {float(online.estimate(rd.solve(mu), mu)):.3e} '
                    f'RB size {rd.solution_dim}')
    print(T.report())
    return res


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--subdomains', type=int, nargs=2, default=[8, 8])
    p.add_argument('--half', type=int, default=2)
    p.add_argument('--nref', type=int, default=1)
    p.add_argument('--training', type=int, default=8)
    p.add_argument('--target', type=float, default=1e-3)
    p.add_argument('--online-mus', type=int, default=3)
    p.add_argument('--checkpoint', default=None,
                   help='path for per-iteration offline state (.npz)')
    p.add_argument('--resume', action='store_true')
    a = p.parse_args()
    main(tuple(a.subdomains), a.half, a.nref, a.training, a.target,
         online_mus=a.online_mus, checkpoint=a.checkpoint, resume=a.resume)
