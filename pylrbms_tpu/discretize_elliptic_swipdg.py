"""Monolithic (non-block) SWIPDG discretizer — the EOC reference solver.

<-> ``/root/reference/python/dune/pylrbms/discretize_elliptic_swipdg.py``:
one DG space of order ``polorder`` over the whole fine mesh, affine system +
'l2' / 'elliptic' / 'elliptic_mu_bar' product operators, assembled in one
pass (``discretize_elliptic_swipdg.py:24-85``).  Used with polorder=2 as the
EOC reference discretization (``EOC.py:287-297``).

Implementation: the block machinery with a single 1x1 'subdomain' covering
the full mesh — the monolithic view is the K=1 special case of the batched
design.
"""
from __future__ import annotations

import jax.numpy as jnp

from .grid import Grid
from .ops.spaces import BlockDGSpace
from .ops import assembly as asm
from .ops.swipdg import assemble_swipdg_component
from .la.block import AffineBlockOp
from .model import StationaryBlockModel
from .parameters import CubicParameterSpace, parse_parameter, as_functional, \
    evaluate_coefficients
from .ops.assembly import IPDGParams, DEFAULT_IPDG


from .utils.precision import hp

def monolithic_grid(grid: Grid) -> Grid:
    assert grid.global_nx == grid.global_ny, "monolithic view needs a square mesh"
    return Grid(lower_left=grid.lower_left, upper_right=grid.upper_right,
                kx=1, ky=1, s=grid.global_nx, grid_type=grid.grid_type)


@hp
def discretize(grid_and_problem_data: dict, polorder: int = 1, solver_options=None,
               ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64):
    from .config import validate_solver_options
    solver_options = validate_solver_options(solver_options)
    gpd = grid_and_problem_data
    grid = monolithic_grid(gpd["grid"])
    space = BlockDGSpace(grid, order=polorder)

    lam = gpd["lambda"]
    if isinstance(lam, dict):
        lambda_funcs, lambda_coeffs = list(lam["functions"]), list(lam["coefficients"])
    else:
        lambda_funcs, lambda_coeffs = [lam], [1.0]
    f = gpd["f"]
    if isinstance(f, dict):
        f_funcs, f_coeffs = list(f["functions"]), list(f["coefficients"])
    else:
        f_funcs, f_coeffs = [f], [1.0]
    kappa = gpd.get("kappa")
    parameter_type = gpd.get("parameter_type")
    mu_bar = parse_parameter(parameter_type, gpd.get("mu_bar")) \
        if gpd.get("mu_bar") is not None else {}

    comps = [assemble_swipdg_component(space, lf, kappa, ipdg, dtype)
             for lf in lambda_funcs]
    op = AffineBlockOp.from_components(space, comps, dtype)
    rhs_q = jnp.stack([asm.volume_functional(space, ff, dtype) for ff in f_funcs])

    L2 = asm.volume_mass(space, None, dtype)
    elliptic_q = [asm.volume_elliptic(space, lf, kappa, dtype) for lf in lambda_funcs]
    import numpy as np
    th_bar = (np.asarray(evaluate_coefficients(
        [as_functional(c) for c in lambda_coeffs], mu_bar))
        if mu_bar else np.ones(len(lambda_funcs)))
    elliptic_mu_bar = sum(float(c) * E for c, E in zip(th_bar, elliptic_q))

    parameter_range = gpd.get("parameter_range")
    pspace = (CubicParameterSpace(parameter_type, parameter_range[0], parameter_range[1])
              if parameter_type else None)

    model = StationaryBlockModel(
        grid=grid, space=space, op=op,
        lambda_coeffs=[as_functional(c) for c in lambda_coeffs],
        rhs_q=rhs_q, f_coeffs=[as_functional(c) for c in f_coeffs],
        estimator=None, parameter_space=pspace, parameter_type=parameter_type,
        components=comps,
        products={"l2": L2, "elliptic_mu_bar": elliptic_mu_bar,
                  "elliptic_q": elliptic_q},
        solver_options=solver_options, dtype=dtype,
        name="MonolithicSwipdg")
    return model, {"space": space, "grid": grid}
