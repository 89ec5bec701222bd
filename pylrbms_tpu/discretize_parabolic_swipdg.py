"""Monolithic parabolic SWIPDG discretizer (EOC reference in time).

<-> ``/root/reference/python/dune/pylrbms/discretize_parabolic_swipdg.py``:
wraps the monolithic elliptic discretizer into implicit Euler
(``discretize_parabolic_swipdg.py:9-27``).
"""
from __future__ import annotations

from .discretize_elliptic_swipdg import discretize as discretize_stationary
from .model import InstationaryBlockModel


from .utils.precision import hp

@hp
def discretize(grid_and_problem_data, T: float, nt: int, polorder: int = 1, **kw):
    d, data = discretize_stationary(grid_and_problem_data, polorder, **kw)
    im = InstationaryBlockModel(stationary=d, T=float(T), nt=int(nt))
    return im, data
