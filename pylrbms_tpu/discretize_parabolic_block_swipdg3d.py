"""Parabolic block SWIPDG discretizer on the 3D hex family.

3D counterpart of ``discretize_parabolic_block_swipdg.py`` (beyond the
2D-only reference): elliptic 3D block FOM + L2 mass + implicit Euler
(``InstationaryBlockModel``, whose dense and matrix-free G = M + dt*A paths
both carry the z-coupling family) + the parabolic estimator.
"""
from __future__ import annotations

from .discretize_elliptic_block_swipdg3d import discretize as discretize_ell
from .model import InstationaryBlockModel
from .utils.precision import hp


@hp
def discretize(grid_and_problem_data, T: float, nt: int, **kw):
    d, data = discretize_ell(grid_and_problem_data, **kw)
    im = InstationaryBlockModel(stationary=d, T=float(T), nt=int(nt))
    data = dict(data)
    data["stationary"] = d
    return im, data
