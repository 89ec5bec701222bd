#!/usr/bin/env python
"""Main demo pipeline (<-> ``python/scripts/online_adaptive_lrbms.py``):

Phase 1: problem init; Phase 2: block discretize + detailed solve/estimate;
Phase 3: reduction with local energy products, snapshot extension, reduced vs
detailed estimate comparison; Phase 4: online AdaptiveEnrichment over random
parameters (the reference exits before its phase 4, ``:156-157`` — ours runs).
"""
import numpy as np

from pylrbms_tpu.utils.logging import getLogger, set_log_levels
from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.reductor import ParallelLRBMSReductor, ExtensionError
from pylrbms_tpu.online_enrichment import AdaptiveEnrichment
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

set_log_levels({'pylrbms': 'INFO'})
logger = getLogger('online_adaptive_lrbms')

# typed config (SURVEY.md §5.6): validated at construction — a typo'd key
# raises here instead of silently falling through dict.get defaults; the
# reference's flat dict spelling stays accepted via LRBMSConfig.from_dict
from pylrbms_tpu.config import LRBMSConfig, SolverConfig

CFG = LRBMSConfig.from_dict({
    'num_subdomains': [4, 4],
    'half_num_fine_elements_per_subdomain_and_dim': 2,
    'initial_RB_order': 0,
    'enrichment_target_error': 1e-2,
    'marking_doerfler_theta': 0.33,
    'marking_max_age': 4,
    'num_refinements': 1})
config = CFG.flat_dict()

solver_options = SolverConfig(type='pcg', max_iter=400, precision=1e-10,
                              post_check_solves_system=None).as_dict()


def main(num_online_mus: int = 5, enrichment_steps: int = 3):
    import jax
    # env-independent f64 (library policy for the parity/golden
    # flows; without x64 the TPU path silently truncates to f32)
    jax.config.update("jax_enable_x64", True)
    # Phase 1: problem
    grid_and_problem_data = init_grid_and_problem(config)

    # Phase 2: FOM + detailed solve & estimate
    d, d_data = discretize(grid_and_problem_data, solver_options)
    mu = d.parse_parameter(1.)
    with logger.block('detailed solve + estimate'):
        U = d.solve(mu)
        eta, _, _ = d.estimate(U, mu, decompose=True)
    logger.info(f'detailed eta = {float(eta):.3e}')

    # Phase 3: reduction
    reductor = ParallelLRBMSReductor(d, order=config['initial_RB_order'])
    try:
        reductor.extend_basis(U)
    except ExtensionError:
        pass
    rd = reductor.reduce()
    u = rd.solve(mu)
    eta_red = float(rd.estimate(u, mu))
    logger.info(f'reduced eta = {eta_red:.3e} (detailed {float(eta):.3e})')

    # Phase 4: online adaptive enrichment over random mus
    online = AdaptiveEnrichment(grid_and_problem_data, d, d.space, reductor, rd,
                                target_error=config['enrichment_target_error'],
                                marking_doerfler_theta=config['marking_doerfler_theta'],
                                marking_max_age=config['marking_max_age'])
    for i, mu_i in enumerate(d.parameter_space.sample_randomly(num_online_mus, seed=7)):
        u_i, rd_i, _ = online.solve(mu_i, enrichment_steps=enrichment_steps)
        logger.info(f'online mu #{i}: final eta '
                    f'{float(online.estimate(rd_i.solve(mu_i), mu_i)):.3e}, '
                    f'RB size {rd_i.solution_dim}')
    return online


if __name__ == '__main__':
    main()
