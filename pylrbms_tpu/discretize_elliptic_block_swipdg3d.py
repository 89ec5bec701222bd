"""Block SWIPDG discretizer on the 3D hex family — the full LRBMS FOM in 3D.

3D counterpart of ``discretize_elliptic_block_swipdg.py`` (same batched
design: one jitted assembly graph for operator components, rhs, products and
estimator tensors), extending the framework beyond the 2D-only reference —
the BASELINE north-star data set (SPE10 model 2) is natively a 3D
60 x 220 x 85 permeability tensor.

Returns ``(model, data)`` with the same :class:`StationaryBlockModel` /
:class:`EstimatorData` containers as 2D, so the estimator (matrix form),
solvers and MOR reduction run unchanged on the 3D tensors.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .grid3d import Grid3D
from .utils.precision import hp
from .ops.spaces3d import BlockDGSpace3D
from .ops import assembly3d as asm3
from .ops import products3d as prod3
from .ops.swipdg3d import assemble_swipdg_component3, fold_diag3
from .ops.oswald3d import Oswald3D
from .ops.fluxreco3d import FluxReconstructor3D
from .ops.assembly import IPDGParams, DEFAULT_IPDG
from .la.block import AffineBlockOp, BlockOpStatic
from .estimators import EstimatorData, EllipticEstimator
from .model import StationaryBlockModel
from .parameters import (CubicParameterSpace, parse_parameter,
                         evaluate_coefficients, as_functional)
from .discretize_elliptic_block_swipdg import _affine


def discretize(grid_and_problem_data: dict, solver_options=None, mpi_comm=None,
               ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64,
               lean: bool = False, order: int = 1):
    """``lean=True`` skips the O(Q^2 K N^2) matrix-form estimator tensors
    (for large-scale FOM runs; the MOR path needs the full tensors).

    ``order=2`` builds the full pipeline on the Q2 block space with the
    degree-matched RT_[1] hex flux reconstruction and order-2 Oswald
    interpolation (``ops/rt1hex.py`` — beyond-reference 3D Q2 estimation;
    the 2D analog is ``discretize(..., order=2)`` on the 2D families)."""
    from .config import validate_solver_options
    solver_options = validate_solver_options(solver_options)
    gpd = grid_and_problem_data
    grid: Grid3D = gpd["grid"]
    from .utils.timers import GLOBAL_TIMINGS as _T
    with _T.span("discretize3d: tabulate space"):
        space = BlockDGSpace3D(grid, order=order)

    lambda_funcs, lambda_coeffs = _affine(gpd["lambda"])
    f_funcs, f_coeffs = _affine(gpd["f"])
    kappa = gpd.get("kappa")
    lambda_bar, lambda_hat = gpd["lambda_bar"], gpd["lambda_hat"]
    parameter_type = gpd.get("parameter_type")
    mu_bar = parse_parameter(parameter_type, gpd.get("mu_bar")) \
        if gpd.get("mu_bar") is not None else {}
    mu_hat = parse_parameter(parameter_type, gpd.get("mu_hat")) \
        if gpd.get("mu_hat") is not None else {}

    import jax

    def _build():
        comps = [assemble_swipdg_component3(space, lf, kappa, ipdg, dtype)
                 for lf in lambda_funcs]
        rhs_q = jnp.stack([asm3.volume_functional(space, ff, dtype)
                           for ff in f_funcs])
        L2 = asm3.volume_mass(space, None, dtype)
        E_bar = asm3.volume_elliptic(space, lambda_bar, kappa, dtype)
        th_bar = (evaluate_coefficients(lambda_coeffs, mu_bar) if mu_bar
                  else jnp.ones(len(lambda_funcs), dtype))
        energy = jnp.zeros_like(L2)
        for lf, c in zip(lambda_funcs, th_bar):
            energy = energy + c * (
                asm3.volume_elliptic(space, lf, kappa, dtype)
                + prod3.penalty_product(space, lf, kappa, ipdg, dtype))
        # assemble the estimator matrix tensors directly in f32 at scale
        # (same policy + rationale as the 2D discretizer: the emulated-f64
        # quadrature einsums of the O(Q^2 K N^2) forms dominated the
        # discretize cost, while their consumers already live at the f32
        # data floor via the downstream cast below)
        est_f32 = (dtype == jnp.float64 and jax.default_backend() != "cpu"
                   and space.K * space.N > 32768)
        est_dtype = jnp.float32 if est_f32 else dtype
        if lean:
            M_aa = BB = M_ab = R_dd = None
        else:
            M_aa = jnp.stack([
                jnp.stack([prod3.df_aa(space, lu, lv, lambda_hat, kappa,
                                       est_dtype)
                           for lv in lambda_funcs])
                for lu in lambda_funcs])                      # [Q, Q, K, N, N]
            BB = prod3.df_bb(space, lambda_hat, kappa, est_dtype)
            M_ab = jnp.stack([prod3.df_ab(space, lv, lambda_hat, kappa,
                                          est_dtype)
                              for lv in lambda_funcs])
        A_div = prod3.divergence_matrix(space, dtype)
        if not lean:
            R_dd = jnp.einsum("nr,knm,ms->krs", A_div.astype(est_dtype),
                              L2.astype(est_dtype), A_div.astype(est_dtype))
        dv_dt = dtype if lean else est_dtype   # lean estimate path keeps f64
        d_vec = jnp.einsum("nr,qkn->qkr", A_div.astype(dv_dt),
                           rhs_q.astype(dv_dt))
        rf_qq = jnp.stack([
            jnp.stack([asm3.volume_scalar(
                space, lambda x, fu=fu, fv=fv: fu(x) * fv(x), dtype)
                for fv in f_funcs])
            for fu in f_funcs])                               # [Qf, Qf, K]
        min_ev = prod3.min_diffusion_ev(space, lambda_hat, kappa, dtype)
        comp_dicts = [dict(A_loc=c.A_loc, D_side=c.D_side,
                           X_in_in=c.X_in_in, X_in_out=c.X_in_out,
                           X_out_in=c.X_out_in, X_out_out=c.X_out_out,
                           Y_in_in=c.Y_in_in, Y_in_out=c.Y_in_out,
                           Y_out_in=c.Y_out_in, Y_out_out=c.Y_out_out,
                           Z_in_in=c.Z_in_in, Z_in_out=c.Z_in_out,
                           Z_out_in=c.Z_out_in, Z_out_out=c.Z_out_out)
                      for c in comps]
        folded = dict(
            A_diag=jnp.stack([fold_diag3(space, c, dtype) for c in comps]),
            C_R_io=jnp.stack([c.X_in_out for c in comps]),
            C_R_oi=jnp.stack([c.X_out_in for c in comps]),
            C_U_io=jnp.stack([c.Y_in_out for c in comps]),
            C_U_oi=jnp.stack([c.Y_out_in for c in comps]),
            C_W_io=jnp.stack([c.Z_in_out for c in comps]),
            C_W_oi=jnp.stack([c.Z_out_in for c in comps]))
        return dict(comps=comp_dicts, folded=folded, rhs_q=rhs_q, L2=L2,
                    E_bar=E_bar, energy=energy, M_aa=M_aa, BB=BB, M_ab=M_ab,
                    A_div=A_div, R_dd=R_dd, d_vec=d_vec, rf_qq=rf_qq,
                    min_ev=min_ev)

    # split trace / compile / execute so the cold-compile budget is
    # attributable (VERDICT r4 #9: discretize was a 210-670 s opaque span)
    with _T.span("discretize3d: build trace"):
        _lowered = jax.jit(hp(_build)).lower()
    with _T.span("discretize3d: build compile"):
        _compiled = _lowered.compile()
    with _T.span("discretize3d: build execute") as _s:
        built = _compiled()
        _s["sync"] = built["rhs_q"]
    del _lowered, _compiled
    from .ops.swipdg3d import SwipdgComponent3
    comps = [SwipdgComponent3(**cd) for cd in built["comps"]]
    op = AffineBlockOp(static=BlockOpStatic.from_space(space),
                       **built["folded"])
    rhs_q = built["rhs_q"]
    L2, E_bar, energy = built["L2"], built["E_bar"], built["energy"]
    M_aa, BB, M_ab = built["M_aa"], built["BB"], built["M_ab"]
    A_div, R_dd, d_vec = built["A_div"], built["R_dd"], built["d_vec"]
    rf_qq, min_ev = built["rf_qq"], built["min_ev"]
    if (dtype == jnp.float64 and jax.default_backend() != "cpu"
            and space.K * space.N > 32768 and M_aa is not None):
        f32 = jnp.float32
        E_bar_est = E_bar.astype(f32)
        M_aa, BB, M_ab = M_aa.astype(f32), BB.astype(f32), M_ab.astype(f32)
        R_dd, d_vec = R_dd.astype(f32), d_vec.astype(f32)
    else:
        E_bar_est = E_bar
    diam = jnp.full((space.K,), grid.subdomain_diameter(), dtype)

    with _T.span("discretize3d: oswald+flux tables"):
        oswald = Oswald3D(space)
        if order == 1:
            flux = FluxReconstructor3D(space, kappa, ipdg, dtype)
        else:
            from .ops.rt1hex import FluxReconstructorRT1Hex
            flux = FluxReconstructorRT1Hex(space, kappa, ipdg, dtype)

    est_data = EstimatorData(
        E_bar=E_bar_est, L2=L2, M_aa=M_aa, BB=BB, M_ab=M_ab, A_div=A_div,
        R_dd=R_dd, d_vec=d_vec, rf_qq=rf_qq, min_ev=min_ev, diam=diam,
        oswald=oswald, flux=flux, lambda_funcs=lambda_funcs,
        lambda_coeffs=[as_functional(c) for c in lambda_coeffs],
        f_coeffs=[as_functional(c) for c in f_coeffs],
        mu_bar=mu_bar, mu_hat=mu_hat, parameter_type=parameter_type,
        f_funcs=f_funcs, lambda_hat=lambda_hat)
    estimator = EllipticEstimator(est_data)

    parameter_range = gpd.get("parameter_range")
    pspace = (CubicParameterSpace(parameter_type, parameter_range[0],
                                  parameter_range[1])
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
        "local_energy_dg_product": energy,
        "estimator_data": est_data,
        "unblock": model.unblock,
    }
    return model, data
