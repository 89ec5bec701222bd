#!/usr/bin/env python
"""Minimal detailed solve + VTU visualization (<-> ``python/scripts/
mpi_elliptic.py``): OS2015 at mu=0.5, tight solver tolerance.  Distribution
happens by sharding the subdomain axis (see pylrbms_tpu.parallel) rather
than MPI ranks."""
from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

config = {'num_subdomains': [4, 4],
          'half_num_fine_elements_per_subdomain_and_dim': 2,
          'num_refinements': 1}


def main():
    import jax
    # env-independent f64 (library policy for the parity/golden
    # flows; without x64 the TPU path silently truncates to f32)
    jax.config.update("jax_enable_x64", True)
    gpd = init_grid_and_problem(config)
    d, _ = discretize(gpd, solver_options={'type': 'pcg', 'precision': 1e-10,
                                           'max_iter': 400})
    mu = d.parse_parameter(0.5)
    U = d.solve(mu)
    out = d.visualize(U, 'mpi_elliptic_solution') or 'mpi_elliptic_solution.vtu'
    print('wrote', out)
    return U


if __name__ == '__main__':
    main()
