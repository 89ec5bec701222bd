#!/usr/bin/env python
"""EOC tables for the *reduced* model built from localized snapshots at mu=1
(<-> ``python/scripts/OS2015_convergence_study_as_reduced.py``; that script
has latent import breaks — ``LRBMSReductor`` from the wrong module and a
missing ``ExtensionError`` import — which of course we do not reproduce)."""
from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.EOC import StationaryEocStudy, default_refine
from pylrbms_tpu.reductor import LRBMSReductor, ExtensionError
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def discretize_reduced(grid_and_problem_data):
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    d, data = discretize(grid_and_problem_data)
    reductor = LRBMSReductor(d)
    try:
        reductor.extend_basis(d.solve(d.parse_parameter(1.)))
    except ExtensionError:
        pass
    rd = reductor.reduce()

    class _RdAdapter:
        """Expose the reduced model through the EOC-study interface."""
        space = d.space

        def parse_parameter(self, mu):
            return d.parse_parameter(mu)

        def solve(self, mu):
            return rd.solve(mu)

        def estimate(self, u, mu, decompose=False, paper_convention=False):
            return rd.estimate(u, mu, decompose=decompose,
                               paper_convention=paper_convention)

    return _RdAdapter(), {'block_space': d.space, 'reductor': reductor,
                          'unblock': d.unblock}


config = {'num_subdomains': [2, 2],
          'half_num_fine_elements_per_subdomain_and_dim': 2,
          'num_refinements': 0,
          'grid_type': 'tri'}


def main(max_levels=1, paper_convention=False):
    import jax
    # env-independent f64 (library policy for the parity/golden
    # flows; without x64 the TPU path silently truncates to f32)
    jax.config.update("jax_enable_x64", True)
    print('OS2015 tables for the reduced model (snapshots at mu=1)'
          + (' — paper convention' if paper_convention else ''))
    StationaryEocStudy(init_grid_and_problem, discretize_reduced, config,
                       default_refine, mu=1, max_levels=max_levels,
                       paper_convention=paper_convention).run(
        ('h', 'elliptic_mu_bar', 'eta_nc', 'eta_df', 'eta'))


if __name__ == '__main__':
    import sys
    main(paper_convention='--paper' in sys.argv)
