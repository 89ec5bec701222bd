"""Parameter system: parameter types, parameter functionals, parameter spaces.

TPU-native re-implementation of the pyMOR-0.5 parameter surface consumed by the
reference (see SURVEY.md §2.4):

- ``ExpressionParameterFunctional`` / ``ProjectionParameterFunctional`` /
  ``ProductParameterFunctional`` (reference uses at
  ``/root/reference/python/dune/pylrbms/OS2015_academic_problem.py:43-44``,
  ``thermalblock_problem.py:47-50``, ``artificial_channels_problem.py:78-98``,
  ``discretize_elliptic_block_swipdg.py:59,757``).
- ``CubicParameterSpace`` with ``sample_uniformly`` / ``sample_randomly``
  (``discretize_elliptic_block_swipdg.py:60,809``,
  ``scripts/online_adaptive_lrbms.py:166``).

Design: a parameter ("mu") is a plain dict ``{component_name: jnp/np array}``.
Functionals evaluate with jax.numpy so they can be traced under ``jit`` /
``lax.scan`` (needed for the time parameter ``'_t'`` in the parabolic path,
``artificial_channels_problem.py:97``).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp


Mu = Dict[str, "np.ndarray"]
ParameterType = Optional[Dict[str, Tuple[int, ...]]]


def _normalize_shape(shape) -> Tuple[int, ...]:
    if shape is None:
        return ()
    if isinstance(shape, int):
        return (shape,)
    return tuple(int(s) for s in shape)


def parse_parameter(parameter_type: ParameterType, mu) -> Mu:
    """Turn a scalar / tuple / dict into a canonical parameter dict.

    Mirrors pyMOR's ``Parametric.parse_parameter`` behaviour used all over the
    reference scripts (e.g. ``d.parse_parameter(1.)`` in
    ``scripts/linearelliptic_block_swipdg_decomp.py:31``,
    ``d.parse_parameter([1, 1., 1., 1.])``).
    """
    if parameter_type is None or len(parameter_type) == 0:
        return {}
    if isinstance(mu, dict):
        out = {}
        for k, shape in parameter_type.items():
            shape = _normalize_shape(shape)
            if k not in mu:
                raise ValueError(f"missing parameter component {k!r}")
            out[k] = jnp.reshape(jnp.asarray(mu[k]), shape)
        # keep extra keys (e.g. '_t') around
        for k, v in mu.items():
            if k not in out:
                out[k] = jnp.asarray(v)
        return out
    # scalar or flat sequence: distribute over the (sorted) parameter type
    keys = sorted(parameter_type.keys())
    flat = np.atleast_1d(np.asarray(mu, dtype=float)).ravel()
    total = sum(int(np.prod(_normalize_shape(parameter_type[k])) or 1) for k in keys)
    if flat.size == 1 and total > 1:
        flat = np.full(total, flat[0])
    if flat.size != total:
        raise ValueError(f"cannot parse parameter of size {flat.size} for type {parameter_type}")
    out = {}
    off = 0
    for k in keys:
        shape = _normalize_shape(parameter_type[k])
        n = int(np.prod(shape) or 1)
        out[k] = jnp.asarray(flat[off:off + n].reshape(shape))
        off += n
    return out


class ParameterFunctional:
    """Base class: callable mu -> scalar (jax-traceable)."""

    parameter_type: ParameterType = None

    def evaluate(self, mu: Mu):
        raise NotImplementedError

    def __call__(self, mu: Mu):
        return self.evaluate(mu)


class ConstantParameterFunctional(ParameterFunctional):
    def __init__(self, value: float):
        self.value = float(value)
        self.parameter_type = None

    def evaluate(self, mu: Mu):
        return jnp.asarray(self.value)

    def __repr__(self):
        return f"Const({self.value})"


_EXPR_NAMESPACE = {
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan, "exp": jnp.exp,
    "log": jnp.log, "sqrt": jnp.sqrt, "abs": jnp.abs, "pi": math.pi,
    "min": jnp.minimum, "max": jnp.maximum,
}


class ExpressionParameterFunctional(ParameterFunctional):
    """theta(mu) given as a python/numpy expression string.

    Matches the expression dialect the reference feeds to pyMOR:
    ``'1.'``, ``'diffusion'`` (``OS2015_academic_problem.py:43-44``),
    ``'1.1 + sin(diffusion)'`` (``local_thermalblock_problem.py:50-51``),
    ``'sin(2 * 2 * pi * _t) > 0'`` (``artificial_channels_problem.py:97``),
    ``'-1'`` (``artificial_channels_problem.py:98``).

    Boolean results are cast to float (0/1) so they remain jax-traceable.
    """

    def __init__(self, expression: str, parameter_type: ParameterType = None):
        self.expression = expression
        self.parameter_type = parameter_type
        self._code = compile(expression, "<theta>", "eval")

    def evaluate(self, mu: Mu):
        ns = dict(_EXPR_NAMESPACE)
        if self.parameter_type:
            for k, shape in self.parameter_type.items():
                v = mu[k]
                shape = _normalize_shape(shape)
                v = jnp.reshape(jnp.asarray(v), shape)
                # scalar-like components are exposed as scalars
                ns[k] = v.reshape(()) if int(np.prod(shape) or 1) == 1 else v
        # always expose extra components that are present (time '_t' etc.)
        for k, v in (mu or {}).items():
            if k not in ns:
                va = jnp.asarray(v)
                ns[k] = va.reshape(()) if va.size == 1 else va
        val = eval(self._code, {"__builtins__": {}}, ns)
        val = jnp.asarray(val)
        if val.dtype == jnp.bool_:
            val = val.astype(jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32)
        return val.reshape(())

    def __repr__(self):
        return f"Expr({self.expression!r})"


class ProjectionParameterFunctional(ParameterFunctional):
    """theta(mu) = mu[component_name][coordinates].

    Reference: ``thermalblock_problem.py:47-50``,
    ``artificial_channels_problem.py:82-84``.
    """

    def __init__(self, component_name: str, component_shape, coordinates: Tuple[int, ...]):
        self.component_name = component_name
        self.component_shape = _normalize_shape(component_shape)
        self.coordinates = tuple(int(c) for c in coordinates)
        self.parameter_type = {component_name: self.component_shape}

    def evaluate(self, mu: Mu):
        v = jnp.reshape(jnp.asarray(mu[self.component_name]), self.component_shape)
        return v[self.coordinates].reshape(())

    def __repr__(self):
        return f"Proj({self.component_name}{list(self.coordinates)})"


class ProductParameterFunctional(ParameterFunctional):
    """Product of functionals and/or numbers.

    Reference: ``discretize_elliptic_block_swipdg.py:757-759`` builds
    ``ProductParameterFunctional([c1, c2])`` for the df_aa double affine sum.
    """

    def __init__(self, factors: Sequence[Union[ParameterFunctional, float, int]]):
        self.factors = list(factors)
        pt: Dict[str, Tuple[int, ...]] = {}
        for f in self.factors:
            if isinstance(f, ParameterFunctional) and f.parameter_type:
                pt.update(f.parameter_type)
        self.parameter_type = pt or None

    def evaluate(self, mu: Mu):
        val = jnp.asarray(1.0)
        for f in self.factors:
            val = val * (f.evaluate(mu) if isinstance(f, ParameterFunctional) else jnp.asarray(float(f)))
        return val.reshape(())

    def __repr__(self):
        return "Prod(" + ", ".join(map(repr, self.factors)) + ")"


def as_functional(coeff) -> ParameterFunctional:
    if isinstance(coeff, ParameterFunctional):
        return coeff
    return ConstantParameterFunctional(float(coeff))


def evaluate_coefficients(coeffs: Sequence, mu: Mu):
    """Stack theta_q(mu) into a jnp vector [Q] (jax-traceable)."""
    return jnp.stack([as_functional(c).evaluate(mu) for c in coeffs])


def merge_parameter_types(*pts: ParameterType) -> ParameterType:
    out: Dict[str, Tuple[int, ...]] = {}
    for pt in pts:
        if pt:
            for k, v in pt.items():
                out[k] = _normalize_shape(v)
    return out or None


class CubicParameterSpace:
    """Hypercube parameter space with uniform/random sampling.

    Reference: ``CubicParameterSpace(parameter_type, range[0], range[1])``
    (``discretize_elliptic_block_swipdg.py:809``); sampling used at
    ``scripts/online_adaptive_lrbms.py:166`` (``sample_randomly``) and
    ``scripts/linearelliptic_block_swipdg_decomp.py:51`` (``sample_uniformly``).
    """

    def __init__(self, parameter_type: ParameterType, minimum: float, maximum: float):
        self.parameter_type = {k: _normalize_shape(v) for k, v in (parameter_type or {}).items()}
        self.minimum = float(minimum)
        self.maximum = float(maximum)

    @property
    def _keys(self):
        return sorted(self.parameter_type.keys())

    @property
    def dim(self) -> int:
        return sum(int(np.prod(s) or 1) for s in self.parameter_type.values())

    def sample_uniformly(self, counts: int):
        """Cartesian grid of `counts` points per scalar component (pyMOR semantics)."""
        import itertools
        pts = np.linspace(self.minimum, self.maximum, counts)
        dims = self.dim
        mus = []
        for combo in itertools.product(pts, repeat=dims):
            mus.append(self._from_flat(np.asarray(combo)))
        return mus

    def sample_randomly(self, count: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        return [self._from_flat(rng.uniform(self.minimum, self.maximum, self.dim))
                for _ in range(count)]

    def _from_flat(self, flat: np.ndarray) -> Mu:
        out = {}
        off = 0
        for k in self._keys:
            shape = self.parameter_type[k]
            n = int(np.prod(shape) or 1)
            out[k] = jnp.asarray(flat[off:off + n].reshape(shape))
            off += n
        return out

    def parse_parameter(self, mu) -> Mu:
        return parse_parameter(self.parameter_type, mu)
