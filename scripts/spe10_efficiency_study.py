#!/usr/bin/env python
"""SPE10 estimator-efficiency study — closes the BASELINE.json clause
"at estimator-efficiency parity" ON SPE10 with data (VERDICT r2 weak #4):
true energy error against a p=2 reference solve on the finest grid (nested
prolongation, the reference's own methodology — EOC.py:287-313), estimator
eta in the OS2015 paper convention, efficiency = error/estimate reported
over >= 3 levels and >= 2 parameters.

The permeability field is the SPE10 model-2 layer pooled to an 8x8
blockwise raster (problems/spe10.pool_log_mean) so every level's grid
resolves the SAME coefficient exactly — the measured efficiency is then the
estimator's, not coefficient-resampling noise.  Contrast after pooling and
clipping is reported.

Run (CPU f64): PYTHONPATH=/root/repo JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \\
                   python scripts/spe10_efficiency_study.py
"""
from functools import partial

import numpy as np

from pylrbms_tpu.problems.spe10 import init_grid_and_problem, pool_log_mean, \
    load_spe10_layer
from pylrbms_tpu.EOC import StationaryEocStudy, default_refine
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def discretize(grid_and_problem_data):
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    d, data = discretize(grid_and_problem_data)
    return d, {'block_space': data['block_space'], 'unblock': d.unblock}


# coarsest grid: 4x4 subdomains x s=4 -> 16x16 cells == the pooled raster;
# levels refine to 32x32, 64x64 cells (the coefficient stays exact).  The
# p=2 reference on the finest grid is a 49 152-dof monolithic SWIPDG solve
# (host splu inside the EOC harness at that size).
CONFIG = {'num_subdomains': [4, 4],
          'half_num_fine_elements_per_subdomain_and_dim': 2,
          'num_refinements': 0,
          'grid_type': 'tri'}
RASTER = (16, 16)
MAX_CONTRAST = 1e4


def main(max_levels=2, mus=(1.0, 0.3), layer=42):
    global CONFIG
    import sys
    if "--deep" in sys.argv:
        # 4 levels with smaller subdomains: coarsest 8x8 subdomains x s=2
        # -> 16x16 cells (the raster scale — half stays 2: with half=1 the
        # coarsest grid is 8x8 cells and does NOT resolve the raster),
        # refining to 128x128 cells (p=2 reference: 196 608 dofs, solved
        # via the EOC harness's block-layout splu path — the monolithic
        # view's dense [N, N] tensors are a measured host OOM there)
        CONFIG = dict(CONFIG, num_subdomains=[8, 8])
        max_levels = 3
    perm = pool_log_mean(load_spe10_layer(layer), *RASTER, mode="nearest")
    perm = perm / perm.max()
    perm = np.maximum(perm, 1.0 / MAX_CONTRAST)
    print("SPE10 model-2 estimator-efficiency study (paper convention)")
    print(f"field: layer {layer} pooled to {RASTER[0]}x{RASTER[1]} "
          f"(nearest — keeps the pointwise contrast), contrast after clip = {perm.max() / perm.min():.2e}")
    print("reference: p=2 monolithic SWIPDG on the finest grid, nested "
          "prolongation; norm = elliptic energy at mu_bar")
    print("efficiency column = ||u_ref - u_h||_energy / eta  (constant "
          "across levels <=> the estimator is reliable at a fixed factor "
          "on SPE10, the BASELINE 'estimator-efficiency parity' clause)")
    print()
    init = partial(init_grid_and_problem, raster=RASTER,
                   raster_mode="nearest", max_contrast=MAX_CONTRAST)
    for mu in mus:
        print(f"--- mu (switch) = {mu} ---")
        study = StationaryEocStudy(init, discretize, CONFIG, default_refine,
                                   mu={'switch': mu}, max_levels=max_levels,
                                   paper_convention=True)
        study.run(('h', 'elliptic_mu_bar', 'eta_nc', 'eta_r', 'eta_df',
                   'eta'))
        print()


if __name__ == '__main__':
    main()
