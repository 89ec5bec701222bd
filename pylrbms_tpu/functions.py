"""Coefficient / data functions evaluated at quadrature points.

TPU-native replacement for the ``dune.xt.functions`` surface the reference
consumes (SURVEY.md §2.3 "Function objects"):

- ``make_expression_function_1x1``   (``OS2015_academic_problem.py:36-50``)
- ``make_checkerboard_function_1x1`` (``thermalblock_problem.py:39-44``)
- ``make_constant_function_1x1/2x2`` (``thermalblock_problem.py:52``)
- ``make_indicator_function_1x1``    (``artificial_channels_problem.py:54-95``)
- function algebra (+, -) used by ``artificial_channels_problem.py:66-70``

Design: in the reference these are C++ objects evaluated inside C++ quadrature
loops.  Here a function is a jax-traceable callable ``f(x)`` with
``x.shape == (..., 2)`` returning values of shape ``(...,)`` (scalar) or
``(..., 2, 2)`` (matrix).  Assembly tabulates them once at the (static)
physical quadrature points, so everything stays a batched array program.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np
import jax.numpy as jnp


class ScalarFunction:
    """Scalar field on the domain; supports +, -, * with scalars/functions."""

    def __init__(self, fn: Callable, name: str = "function", order: int = 2):
        self._fn = fn
        self.name = name
        self.order = order  # polynomial-degree hint (quadrature sizing)

    def __call__(self, x):
        return self._fn(x)

    # ---- algebra (used by artificial_channels_problem.py:66-70) ----
    def __add__(self, other):
        other = as_scalar_function(other)
        return ScalarFunction(lambda x: self(x) + other(x),
                              name=f"({self.name}+{other.name})",
                              order=max(self.order, other.order))

    def __sub__(self, other):
        other = as_scalar_function(other)
        return ScalarFunction(lambda x: self(x) - other(x),
                              name=f"({self.name}-{other.name})",
                              order=max(self.order, other.order))

    def __rsub__(self, other):
        other = as_scalar_function(other)
        return other - self

    def __mul__(self, other):
        other = as_scalar_function(other)
        return ScalarFunction(lambda x: self(x) * other(x),
                              name=f"({self.name}*{other.name})",
                              order=self.order + other.order)

    __radd__ = __add__
    __rmul__ = __mul__

    def __neg__(self):
        return ScalarFunction(lambda x: -self(x), name=f"(-{self.name})", order=self.order)

    def __repr__(self):
        return f"ScalarFunction({self.name})"


class MatrixFunction:
    """2x2 matrix field (the diffusion tensor kappa)."""

    def __init__(self, fn: Callable, name: str = "matrix_function", order: int = 0):
        self._fn = fn
        self.name = name
        self.order = order

    def __call__(self, x):
        return self._fn(x)

    def __repr__(self):
        return f"MatrixFunction({self.name})"


def as_scalar_function(obj) -> ScalarFunction:
    if isinstance(obj, ScalarFunction):
        return obj
    if isinstance(obj, (int, float)):
        return make_constant_function_1x1(float(obj))
    raise TypeError(f"cannot interpret {obj!r} as scalar function")


# ---------------------------------------------------------------------------
# factories mirroring the dune.xt.functions surface
# ---------------------------------------------------------------------------

_EXPR_NS = {
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan, "exp": jnp.exp,
    "log": jnp.log, "sqrt": jnp.sqrt, "abs": jnp.abs, "pi": math.pi,
}


def make_expression_function_1x1(variable_or_expr, expr=None, order: int = 2,
                                 name: str = "expression") -> ScalarFunction:
    """Expression function over 'x', e.g. '1+(cos(0.5*pi*x[0])*cos(0.5*pi*x[1]))'.

    Signature is deliberately grid-free (the dune version takes a grid first,
    ``OS2015_academic_problem.py:36``); callers may pass
    (expr,) or ('x', expr) positionally.
    """
    if expr is None:
        expr = variable_or_expr
    code = compile(expr, "<expr_function>", "eval")

    def fn(x):
        ns = dict(_EXPR_NS)
        ns["x"] = [x[..., i] for i in range(x.shape[-1])]   # 2D or 3D points
        return jnp.asarray(eval(code, {"__builtins__": {}}, ns)) + jnp.zeros_like(x[..., 0])

    return ScalarFunction(fn, name=name, order=order)


def make_constant_function_1x1(value: float, name: str = "constant") -> ScalarFunction:
    value = float(value)
    return ScalarFunction(lambda x: jnp.full(x.shape[:-1], value), name=name, order=0)


def make_constant_function_2x2(matrix, name: str = "constant_matrix") -> MatrixFunction:
    mat = np.asarray(matrix, dtype=float)
    assert mat.shape == (2, 2)

    def fn(x):
        return jnp.broadcast_to(jnp.asarray(mat), x.shape[:-1] + (2, 2))

    return MatrixFunction(fn, name=name, order=0)


def make_checkerboard_function_1x1(lower_left, upper_right, num_elements,
                                   values, name: str = "checkerboard") -> ScalarFunction:
    """Checkerboard with dune-xt cell ordering: index = ix + nx*iy
    (``thermalblock_problem.py:36-44`` fills ``values[ix + XBLOCKS*iy]``).

    `values` may be a flat list or a list of 1-element lists (dune style).
    """
    ll = np.asarray(lower_left, dtype=float)
    ur = np.asarray(upper_right, dtype=float)
    nx, ny = int(num_elements[0]), int(num_elements[1])
    vals = np.asarray([v[0] if isinstance(v, (list, tuple)) else v for v in values],
                      dtype=float).reshape(ny, nx)  # vals[iy, ix]

    def fn(x):
        fx = (x[..., 0] - ll[0]) / (ur[0] - ll[0]) * nx
        fy = (x[..., 1] - ll[1]) / (ur[1] - ll[1]) * ny
        ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 1)
        iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 1)
        return jnp.asarray(vals)[iy, ix]

    return ScalarFunction(fn, name=name, order=0)


def make_indicator_function_1x1(boxes_and_values: Sequence,
                                name: str = "indicator") -> ScalarFunction:
    """Sum of box indicators: [[ [ll, ur], value ], ...]
    (``artificial_channels_problem.py:54-65,87-95``).
    """
    parsed = []
    for box, value in boxes_and_values:
        ll = np.asarray(box[0], dtype=float)
        ur = np.asarray(box[1], dtype=float)
        parsed.append((ll, ur, float(value)))

    def fn(x):
        out = jnp.zeros(x.shape[:-1])
        for ll, ur, value in parsed:
            inside = ((x[..., 0] >= ll[0]) & (x[..., 0] <= ur[0]) &
                      (x[..., 1] >= ll[1]) & (x[..., 1] <= ur[1]))
            out = out + value * inside
        return out

    return ScalarFunction(fn, name=name, order=0)


def make_cellwise_function_1x1(grid, cell_values, name: str = "cellwise") -> ScalarFunction:
    """Piecewise-constant per fine cell (SPE10-style data fields).

    `cell_values[Sy, Sx]` on the grid's global quad-cell raster.  This has no
    dune counterpart in the reference repo (SPE10 is the BASELINE.json
    north-star config) but mirrors dune-xt's Spe10::Model* functions.
    """
    vals = np.asarray(cell_values, dtype=float)

    def fn(x):
        fx = (x[..., 0] - grid.lower_left[0]) / grid.hx
        fy = (x[..., 1] - grid.lower_left[1]) / grid.hy
        ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, grid.global_nx - 1)
        iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, grid.global_ny - 1)
        return jnp.asarray(vals)[iy, ix]

    return ScalarFunction(fn, name=name, order=0)


def make_cellwise_function3d(grid, cell_values, name: str = "cellwise3d") -> ScalarFunction:
    """Piecewise-constant per fine hex cell (SPE10 model-2 3D data blocks).

    ``cell_values[Sz, Sy, Sx]`` on the 3D grid's global cell raster
    (mirrors dune-xt's Spe10::Model2 function, which the 2D-only reference
    never instantiates)."""
    vals = np.asarray(cell_values, dtype=float)

    def fn(x):
        fx = (x[..., 0] - grid.lower_left[0]) / grid.hx
        fy = (x[..., 1] - grid.lower_left[1]) / grid.hy
        fz = (x[..., 2] - grid.lower_left[2]) / grid.hz
        ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, grid.global_nx - 1)
        iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, grid.global_ny - 1)
        iz = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, grid.global_nz - 1)
        return jnp.asarray(vals)[iz, iy, ix]

    return ScalarFunction(fn, name=name, order=0)
