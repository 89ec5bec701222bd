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

def main(T=1.0, nt=20, subdomains=(4, 4), half=1, nref=1,
         pod=0, training=0):
    """Defaults mirror the repo's small CI config; the REFERENCE demo
    config (``python/scripts/parabolic.py:17-30``) is
    ``--subdomains 8 8 --nt 100``.  ``--pod N`` additionally runs the
    POD-greedy offline loop (greedy.pod_greedy) with N extensions over a
    ``--training``-sized uniform training set — the parabolic basis
    construction the reference lacks."""
    import time
    import jax
    # env-independent f64 (same policy as the spe10 scripts): the channel
    # contrast (switch down to 0.01) NaNs the f32 estimator path on TPU
    jax.config.update("jax_enable_x64", True)
    config = {'num_subdomains': list(subdomains),
              'half_num_fine_elements_per_subdomain_and_dim': half,
              'num_refinements': nref,
              'grid_type': 'tri'}
    grid_and_problem_data = init_grid_and_problem(config)
    t0 = time.perf_counter()
    d, d_data = discretize(grid_and_problem_data, T, nt)
    print(f'discretize: {time.perf_counter() - t0:.1f} s '
          f'(K={d.stationary.space.K}, N={d.stationary.space.N}, nt={nt})')

    mu = d.parameter_space.sample_randomly(1, seed=11)[0]
    t0 = time.perf_counter()
    U = d.solve(mu)
    U.block_until_ready()
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    d.solve(mu).block_until_ready()
    print(f'FOM trajectory solve: {time.perf_counter() - t0:.2f} s warm '
          f'({t_cold:.1f} s cold), {nt} implicit-Euler steps')

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
    t0 = time.perf_counter()
    est, parts = rd.estimate(u, mu)
    report('ROM', est, parts)
    print(f'ROM solve+estimate: {time.perf_counter() - t0:.2f} s')

    if pod:
        from pylrbms_tpu.greedy import pod_greedy
        train = d.parameter_space.sample_uniformly(training or 5)
        t0 = time.perf_counter()
        res = pod_greedy(d, train, target_error=1e-6, max_extensions=pod,
                         pod_modes=2)
        print(f'POD-greedy: {len(res.max_etas)} iterations, '
              f'{res.fom_solves} FOM trajectory solves, '
              f'max estimate {res.max_etas[0]:.3e} -> {res.max_etas[-1]:.3e}, '
              f'{time.perf_counter() - t0:.1f} s')


if __name__ == '__main__':
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--T', type=float, default=1.0)
    p.add_argument('--nt', type=int, default=20)
    p.add_argument('--subdomains', type=int, nargs=2, default=[4, 4])
    p.add_argument('--half', type=int, default=1)
    p.add_argument('--nref', type=int, default=1)
    p.add_argument('--pod', type=int, default=0,
                   help='run pod_greedy with this many extensions')
    p.add_argument('--training', type=int, default=0)
    a = p.parse_args()
    main(T=a.T, nt=a.nt, subdomains=tuple(a.subdomains), half=a.half,
         nref=a.nref, pod=a.pod, training=a.training)
