#!/usr/bin/env python
"""Artificial-channels parabolic demo (<-> ``python/scripts/parabolic.py``):
FOM trajectory solve, 1-snapshot reduction, FOM/ROM estimates with all 5
indicator groups."""
import numpy as np

from pylrbms_tpu.problems.artificial_channels import init_grid_and_problem
from pylrbms_tpu.discretize_parabolic_block_swipdg import discretize
from pylrbms_tpu.reductor import ParabolicLRBMSReductor
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

config = {'num_subdomains': [4, 4],
          'half_num_fine_elements_per_subdomain_and_dim': 1,
          'num_refinements': 1,
          'grid_type': 'tri'}


def main(T=1.0, nt=20):
    grid_and_problem_data = init_grid_and_problem(config)
    d, d_data = discretize(grid_and_problem_data, T, nt)

    mu = d.parameter_space.sample_randomly(1, seed=11)[0]
    U = d.solve(mu)

    reductor = ParabolicLRBMSReductor(d.stationary)
    reductor.extend_basis(np.asarray(U))
    rd = reductor.reduce().attach_instationary(d)

    u = rd.solve(mu)
    UU = reductor.reconstruct(u)
    print('Relative model reduction error:',
          float(np.linalg.norm(np.asarray(U - UU)) / np.linalg.norm(np.asarray(U))))

    def report(tag, est, parts):
        nc, r, df, rt, tdnc = parts
        print(f'Estimated error {tag}:')
        print('  total estimate:                    {:.6e}'.format(float(est)))
        print('  elliptic nonconformity indicator:  {:.6e}'.format(np.linalg.norm(nc)))
        print('  elliptic residual indicator:       {:.6e}'.format(np.linalg.norm(r)))
        print('  elliptic diffusive flux indicator: {:.6e}'.format(np.linalg.norm(df)))
        print('  time stepping residual:            {:.6e}'.format(np.linalg.norm(rt)))
        print('  time derivative nonconformity:     {:.6e}'.format(np.linalg.norm(tdnc)))

    est, parts = d.estimate(U, mu)
    report('FOM', est, parts)
    est, parts = rd.estimate(u, mu)
    report('ROM', est, parts)


if __name__ == '__main__':
    main()
