"""Block SWIPDG discretizer — builds the full LRBMS FOM.

TPU-native re-design of ``/root/reference/python/dune/pylrbms/
discretize_elliptic_block_swipdg.py:530-811``: where the reference builds an
object soup of per-subdomain ISTL matrices, walkers and pyMOR operator
wrappers, we assemble a handful of batched tensors with a leading subdomain
axis (SURVEY.md §7 design stance):

* affine operator components (diag blocks + interface quadruples)   (:581-587)
* affine rhs functionals                                            (:596-598)
* local products: energy-DG (elliptic+penalty @ mu_bar), L2, elliptic @
  lambda_bar                                                        (:644-691)
* estimator operators: nc / r_fd / r_dd / df_aa / df_bb / df_ab     (:731-770)
* estimator constants: min diffusion eigenvalues, subdomain diameters,
  int f^2                                                           (:776-785)
* Oswald + flux-reconstruction operators                            (:606-618)

Returns ``(model, data)`` like the reference's ``discretize`` (:530).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from .grid import Grid
from .ops.spaces import BlockDGSpace
from .ops import assembly as asm
from .ops import products as prod
from .ops.swipdg import assemble_swipdg_component
from .ops.oswald import OswaldOperator
from .ops.fluxreco import FluxReconstructor
from .ops.assembly import IPDGParams, DEFAULT_IPDG
from .la.block import AffineBlockOp
from .estimators import EstimatorData, EllipticEstimator
from .model import StationaryBlockModel
from .parameters import (CubicParameterSpace, parse_parameter,
                         evaluate_coefficients, as_functional,
                         ProductParameterFunctional)


def _affine(obj):
    """Normalize 'lambda'/'f' entries: dict-or-single -> (functions, coeffs)
    (<-> ``discretize_elliptic_block_swipdg.py:572-578,589-595``)."""
    if isinstance(obj, dict):
        return list(obj["functions"]), list(obj["coefficients"])
    return [obj], [1.0]


def discretize(grid_and_problem_data: dict, solver_options=None, mpi_comm=None,
               ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64):
    gpd = grid_and_problem_data
    grid: Grid = gpd["grid"]
    space = BlockDGSpace(grid, order=1)

    lambda_funcs, lambda_coeffs = _affine(gpd["lambda"])
    f_funcs, f_coeffs = _affine(gpd["f"])
    kappa = gpd.get("kappa")
    lambda_bar, lambda_hat = gpd["lambda_bar"], gpd["lambda_hat"]
    parameter_type = gpd.get("parameter_type")
    mu_bar = parse_parameter(parameter_type, gpd.get("mu_bar")) \
        if gpd.get("mu_bar") is not None else {}
    mu_hat = parse_parameter(parameter_type, gpd.get("mu_hat")) \
        if gpd.get("mu_hat") is not None else {}

    # ---------------- operator + rhs ----------------
    comps = [assemble_swipdg_component(space, lf, kappa, ipdg, dtype)
             for lf in lambda_funcs]
    op = AffineBlockOp.from_components(space, comps, dtype)
    rhs_q = jnp.stack([asm.volume_functional(space, ff, dtype) for ff in f_funcs])

    # ---------------- products ----------------
    L2 = asm.volume_mass(space, None, dtype)
    E_bar = asm.volume_elliptic(space, lambda_bar, kappa, dtype)
    # local energy DG product assembled at mu_bar (:651-677)
    th_bar = np.asarray(evaluate_coefficients(lambda_coeffs, mu_bar)) \
        if mu_bar else np.ones(len(lambda_funcs))
    energy = jnp.zeros_like(L2)
    for lf, c in zip(lambda_funcs, th_bar):
        energy = energy + float(c) * (asm.volume_elliptic(space, lf, kappa, dtype)
                                      + prod.penalty_product(space, lf, kappa, ipdg, dtype))

    # ---------------- estimator operators ----------------
    Q = len(lambda_funcs)
    M_aa = jnp.stack([
        jnp.stack([prod.df_aa(space, lu, lv, lambda_hat, kappa, dtype)
                   for lv in lambda_funcs])
        for lu in lambda_funcs])                                  # [Q, Q, K, N, N]
    BB = prod.df_bb(space, lambda_hat, kappa, dtype)
    M_ab = jnp.stack([prod.df_ab(space, lv, lambda_hat, kappa, dtype)
                      for lv in lambda_funcs])
    A_div = prod.divergence_matrix(space, dtype)
    R_dd = jnp.einsum("nr,knm,ms->krs", A_div, L2, A_div)
    d_vec = jnp.einsum("nr,qkn->qkr", A_div, rhs_q)
    rf_qq = jnp.stack([
        jnp.stack([asm.volume_scalar(space, lambda x, fu=fu, fv=fv: fu(x) * fv(x), dtype)
                   for fv in f_funcs])
        for fu in f_funcs])                                       # [Qf, Qf, K]

    min_ev = prod.min_diffusion_ev(space, lambda_hat, kappa, dtype)
    diam = jnp.full((space.K,), grid.subdomain_diameter(), dtype)

    oswald = OswaldOperator(space)
    flux = FluxReconstructor(space, kappa, ipdg, dtype)

    est_data = EstimatorData(
        E_bar=E_bar, L2=L2, M_aa=M_aa, BB=BB, M_ab=M_ab, A_div=A_div,
        R_dd=R_dd, d_vec=d_vec, rf_qq=rf_qq, min_ev=min_ev, diam=diam,
        oswald=oswald, flux=flux, lambda_funcs=lambda_funcs,
        lambda_coeffs=[as_functional(c) for c in lambda_coeffs],
        f_coeffs=[as_functional(c) for c in f_coeffs],
        mu_bar=mu_bar, mu_hat=mu_hat, parameter_type=parameter_type)
    estimator = EllipticEstimator(est_data)

    parameter_range = gpd.get("parameter_range")
    pspace = (CubicParameterSpace(parameter_type, parameter_range[0], parameter_range[1])
              if parameter_type else None)

    model = StationaryBlockModel(
        grid=grid, space=space, op=op,
        lambda_coeffs=[as_functional(c) for c in lambda_coeffs],
        rhs_q=rhs_q, f_coeffs=[as_functional(c) for c in f_coeffs],
        estimator=estimator, parameter_space=pspace,
        parameter_type=parameter_type, components=comps,
        products={"l2": L2, "energy_mu_bar": energy, "elliptic_bar": E_bar},
        solver_options=solver_options, dtype=dtype)

    data = {
        "space": space,
        "block_space": space,
        "grid": grid,
        "local_energy_dg_product": energy,     # [K, N, N]
        "estimator_data": est_data,
        "unblock": model.unblock,
    }
    return model, data
