"""Parabolic block SWIPDG discretizer.

<-> ``/root/reference/python/dune/pylrbms/discretize_parabolic_block_swipdg.py``:
elliptic block FOM + L2 mass + implicit Euler time stepping + the parabolic
estimator (``:43-95``).  The per-subdomain ``r_ud``/``r_l2`` operators of the
elliptic-reconstruction branch (``:64-73``) are realized inside
``ParabolicEstimator`` directly from L2/A_div tensors.
"""
from __future__ import annotations

from .discretize_elliptic_block_swipdg import discretize as discretize_ell
from .model import InstationaryBlockModel


from .utils.precision import hp

@hp
def discretize(grid_and_problem_data, T: float, nt: int, **kw):
    d, data = discretize_ell(grid_and_problem_data, **kw)
    im = InstationaryBlockModel(stationary=d, T=float(T), nt=int(nt))
    data = dict(data)
    data["stationary"] = d
    return im, data
