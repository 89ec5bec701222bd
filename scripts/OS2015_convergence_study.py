#!/usr/bin/env python
"""OS2015 paper-table reproduction (<-> ``python/scripts/
OS2015_convergence_study.py``): EOC study of the block SWIPDG P1
discretization (tables on pp. A2885-A2886 of the OS2015 paper).

Note: the reference's ``refine`` mutates config keys its own grid factory
ignores (``OS2015_convergence_study.py:9-13`` sets ``num_grid_refinements`` /
``num_grid_subdomains`` while ``make_grid`` reads ``num_subdomains`` /
``half_num_...``), so its levels never actually refine; we use a real
refinement (num_refinements += 1 per level).
"""
from functools import partial

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.EOC import StationaryEocStudy, default_refine
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def discretize(grid_and_problem_data):
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    d, data = discretize(grid_and_problem_data)
    return d, {'block_space': data['block_space'], 'unblock': d.unblock}


config = {'num_subdomains': [2, 2],
          'half_num_fine_elements_per_subdomain_and_dim': 2,
          'num_refinements': 0,
          'grid_type': 'tri'}

if '--crisscross' in __import__('sys').argv:
    # the ALU-conform bisection family the reference actually computed on
    config['grid_type'] = 'crisscross'


def main(max_levels=2, paper_convention=False):
    import jax
    # env-independent f64 (library policy for the parity/golden
    # flows; without x64 the TPU path silently truncates to f32)
    jax.config.update("jax_enable_x64", True)
    print('M. Ohlberger, F. Schindler, 2015, Error control for the Localized Reduced')
    print('Basis Multiscale method with adaptive on-line enrichment — Block SWIPDG P1')
    if paper_convention:
        print('(paper convention: unsquared locals -> first-order indicators,')
        print(' level-constant efficiency — shape-comparable to p. A2885 Table 1)')
    print()

    study = StationaryEocStudy(init_grid_and_problem, discretize, config,
                               default_refine, mu=1, max_levels=max_levels,
                               paper_convention=paper_convention)
    print("Table 1 columns (h, elliptic norm, eta_nc, eta_df):")
    study.run(('h', 'elliptic_mu_bar', 'eta_nc', 'eta_df'))
    print()
    print("Table 2 (mu_hat=1): eta_r and eta")
    study.run(('h', 'eta_r', 'eta'))
    print()
    print("Table 2 (mu_hat=0.1): eta_df and eta")
    StationaryEocStudy(partial(init_grid_and_problem, mu_bar=1, mu_hat=0.1),
                       discretize, config, default_refine, mu=1,
                       max_levels=max_levels,
                       paper_convention=paper_convention).run(('h', 'eta_df', 'eta'))
    print()
    print("Table 3 (mu_bar=mu_hat=0.1):")
    StationaryEocStudy(partial(init_grid_and_problem, mu_bar=0.1, mu_hat=0.1),
                       discretize, config, default_refine, mu=1,
                       max_levels=max_levels,
                       paper_convention=paper_convention).run(
                           ('h', 'elliptic_mu_bar', 'eta_nc', 'eta'))


if __name__ == '__main__':
    import sys
    main(paper_convention='--paper' in sys.argv)
