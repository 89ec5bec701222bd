"""EOC p=2 reference: block-layout path == monolithic path.

Above ``ref_block_threshold`` dofs the StationaryEocStudy reference
switches from the monolithic view (dense [N, N] products — measured host
OOM at the 196k-dof --deep reference) to a re-layouted lean block model
solved by host splu (EOC.py:_reference).  Same fine mesh, same p=2 space,
same volume-elliptic norm — the computed reference norms must agree to
linear-solver accuracy.  (Reference methodology: EOC.py:287-313.)
"""
from functools import partial

import numpy as np
import pytest

from pylrbms_tpu.problems.spe10 import init_grid_and_problem
from pylrbms_tpu.EOC import StationaryEocStudy, default_refine


def _disc(gpd):
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    d, data = discretize(gpd)
    return d, {'block_space': data['block_space'], 'unblock': d.unblock}


CONFIG = {'num_subdomains': [4, 4],
          'half_num_fine_elements_per_subdomain_and_dim': 2,
          'num_refinements': 0, 'grid_type': 'tri'}


@pytest.mark.slow
def test_block_reference_matches_monolithic():
    init = partial(init_grid_and_problem, raster=(16, 16),
                   raster_mode="nearest", max_contrast=1e4)
    vals = {}
    for name, thr in (("monolithic", 10 ** 9), ("block", 0)):
        study = StationaryEocStudy(init, _disc, CONFIG, default_refine,
                                   mu={'switch': 1.0}, max_levels=1,
                                   paper_convention=True)
        study.ref_block_threshold = thr
        for lvl in (0, 1):
            study.solve(lvl)
        vals[name] = [study.compute_norm(lvl, "elliptic_mu_bar")
                      for lvl in (0, 1)]
    a = np.asarray(vals["monolithic"])
    b = np.asarray(vals["block"])
    assert (np.abs(a - b) / np.abs(a)).max() < 1e-9
    # the block path actually engaged (relayout happened for thr=0)
    assert np.all(a > 0)
