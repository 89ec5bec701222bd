#!/usr/bin/env python
"""Instationary EOC on the thermal block, dt = 0.1*h per level
(<-> ``python/scripts/parabolic_convergence_study.py``)."""
from pylrbms_tpu.problems.thermalblock import init_grid_and_problem
from pylrbms_tpu.EOC import InstationaryEocStudy
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def refine(cfg):
    out = dict(cfg)
    out['num_refinements'] = cfg.get('num_refinements', 2) + 1
    out['dt'] = 0.1 * init_grid_and_problem(out)['grid'].max_entity_diameter()
    return out


def discretize(grid_and_problem_data, T, nt):
    from pylrbms_tpu.discretize_parabolic_block_swipdg import discretize
    d, data = discretize(grid_and_problem_data, T, nt)
    return d, {'block_space': data['block_space'], 'unblock': d.unblock}


def main(max_levels=1):
    import jax
    # env-independent f64 (library policy for the parity/golden
    # flows; without x64 the TPU path silently truncates to f32)
    jax.config.update("jax_enable_x64", True)
    base_cfg = {'num_subdomains': [2, 2],
                'half_num_fine_elements_per_subdomain_and_dim': 1,
                'num_refinements': 0,
                'grid_type': 'tri',
                'T': 1}
    base_cfg['dt'] = 0.1 * init_grid_and_problem(base_cfg)['grid'].max_entity_diameter()
    reference_cfg = dict(base_cfg)
    for _ in range(max_levels + 1):
        reference_cfg = refine(reference_cfg)

    mu = (1, 1, 1, 1)
    print(f'Thermalblock, mu={mu}, Block SWIPDG P1, dt = 0.1*h')
    study = InstationaryEocStudy(init_grid_and_problem, discretize, base_cfg,
                                 refine, reference_cfg, mu=mu,
                                 max_levels=max_levels)
    study.run(('h', 'eta_nc', 'eta_r', 'eta_df', 'R_T', 'partial_t_nc'))


if __name__ == '__main__':
    main()
