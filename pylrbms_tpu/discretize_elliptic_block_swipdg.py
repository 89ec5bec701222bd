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

import numpy as np
import jax.numpy as jnp

from .grid import Grid
from .utils.precision import hp
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
                         evaluate_coefficients, as_functional)


def _affine(obj):
    """Normalize 'lambda'/'f' entries: dict-or-single -> (functions, coeffs)
    (<-> ``discretize_elliptic_block_swipdg.py:572-578,589-595``)."""
    if isinstance(obj, dict):
        return list(obj["functions"]), list(obj["coefficients"])
    return [obj], [1.0]


def discretize(grid_and_problem_data: dict, solver_options=None, mpi_comm=None,
               ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64,
               lean: bool = False, order: int = 1):
    """``lean=True`` skips the O(Q^2 K N^2) matrix-form estimator tensors
    (M_aa / M_ab / BB / R_dd); the positive-form estimator path
    (``local_quantities_positive`` / ``make_online_step``) stays fully
    functional.  Use for large-scale FOM runs; the MOR reduction path needs
    the full tensors.

    ``order=2`` builds the full pipeline on the P2 block space with the
    degree-matched RT1 flux reconstruction and order-2 Oswald interpolation
    (``ops/rt1.py`` — beyond the reference, whose estimator is P1-only)."""
    from .config import validate_solver_options
    solver_options = validate_solver_options(solver_options)
    gpd = grid_and_problem_data
    grid: Grid = gpd["grid"]
    space = BlockDGSpace(grid, order=order)

    lambda_funcs, lambda_coeffs = _affine(gpd["lambda"])
    f_funcs, f_coeffs = _affine(gpd["f"])
    kappa = gpd.get("kappa")
    lambda_bar, lambda_hat = gpd["lambda_bar"], gpd["lambda_hat"]
    parameter_type = gpd.get("parameter_type")
    mu_bar = parse_parameter(parameter_type, gpd.get("mu_bar")) \
        if gpd.get("mu_bar") is not None else {}
    mu_hat = parse_parameter(parameter_type, gpd.get("mu_hat")) \
        if gpd.get("mu_hat") is not None else {}

    # ---------------- one jitted assembly graph ----------------
    # All offline assembly (operator components, rhs, products, estimator
    # tensors) is traced into a single XLA computation: on the remote-compile
    # TPU path one compile replaces ~100 per-op compiles, and on-device the
    # whole offline phase is fused (SURVEY.md §3.1 "one grid walk").
    import jax

    # At scale on accelerators, ASSEMBLE the estimator matrix tensors (the
    # O(Q^2 K N^2) eta_df/eta_r forms) directly in f32 instead of
    # assembling in emulated f64 and casting afterwards: the emulated-f64
    # quadrature einsums were the dominant discretize cost at SPE10 scale
    # (~10x native f32), while the f32 quadrature accumulation error
    # (~1e-6 relative) sits far below what the estimator/ROM-projection
    # consumers of these tensors resolve (same rationale as the
    # downstream cast, below).  Solve-path tensors (op, rhs, products)
    # stay f64.
    est_f32 = (dtype == jnp.float64 and jax.default_backend() != "cpu"
               and space.K * space.N > 32768)
    est_dtype = jnp.float32 if est_f32 else dtype

    def _build():
        comps = [assemble_swipdg_component(space, lf, kappa, ipdg, dtype)
                 for lf in lambda_funcs]
        rhs_q = jnp.stack([asm.volume_functional(space, ff, dtype) for ff in f_funcs])
        L2 = asm.volume_mass(space, None, dtype)
        E_bar = asm.volume_elliptic(space, lambda_bar, kappa, dtype)
        # local energy DG product assembled at mu_bar (:651-677)
        th_bar = (evaluate_coefficients(lambda_coeffs, mu_bar) if mu_bar
                  else jnp.ones(len(lambda_funcs), dtype))
        energy = jnp.zeros_like(L2)
        for lf, c in zip(lambda_funcs, th_bar):
            energy = energy + c * (asm.volume_elliptic(space, lf, kappa, dtype)
                                   + prod.penalty_product(space, lf, kappa, ipdg, dtype))
        if lean:
            M_aa = BB = M_ab = R_dd = None
        else:
            M_aa = jnp.stack([
                jnp.stack([prod.df_aa(space, lu, lv, lambda_hat, kappa,
                                      est_dtype)
                           for lv in lambda_funcs])
                for lu in lambda_funcs])                          # [Q, Q, K, N, N]
            BB = prod.df_bb(space, lambda_hat, kappa, est_dtype)
            M_ab = jnp.stack([prod.df_ab(space, lv, lambda_hat, kappa,
                                         est_dtype)
                              for lv in lambda_funcs])
        A_div = prod.divergence_matrix(space, dtype)
        if not lean:
            R_dd = jnp.einsum("nr,knm,ms->krs", A_div.astype(est_dtype),
                              L2.astype(est_dtype), A_div.astype(est_dtype))
        dv_dt = dtype if lean else est_dtype   # lean estimate path keeps f64
        d_vec = jnp.einsum("nr,qkn->qkr", A_div.astype(dv_dt),
                           rhs_q.astype(dv_dt))
        rf_qq = jnp.stack([
            jnp.stack([asm.volume_scalar(space, lambda x, fu=fu, fv=fv: fu(x) * fv(x),
                                         dtype)
                       for fv in f_funcs])
            for fu in f_funcs])                                   # [Qf, Qf, K]
        min_ev = prod.min_diffusion_ev(space, lambda_hat, kappa, dtype)
        comp_dicts = [dict(A_loc=c.A_loc, D_side=c.D_side,
                           R_in_in=c.R_in_in, R_in_out=c.R_in_out,
                           R_out_in=c.R_out_in, R_out_out=c.R_out_out,
                           U_in_in=c.U_in_in, U_in_out=c.U_in_out,
                           U_out_in=c.U_out_in, U_out_out=c.U_out_out)
                      for c in comps]
        from .ops.swipdg import fold_diag
        folded = dict(
            A_diag=jnp.stack([fold_diag(space, c, dtype) for c in comps]),
            C_R_io=jnp.stack([c.R_in_out for c in comps]),
            C_R_oi=jnp.stack([c.R_out_in for c in comps]),
            C_U_io=jnp.stack([c.U_in_out for c in comps]),
            C_U_oi=jnp.stack([c.U_out_in for c in comps]))
        return dict(comps=comp_dicts, folded=folded, rhs_q=rhs_q, L2=L2,
                    E_bar=E_bar, energy=energy, M_aa=M_aa, BB=BB, M_ab=M_ab,
                    A_div=A_div, R_dd=R_dd, d_vec=d_vec, rf_qq=rf_qq,
                    min_ev=min_ev)

    # split trace / compile / execute so the cold-compile budget is
    # attributable (VERDICT r4 #9; the 3D discretizer does the same)
    from .utils.timers import GLOBAL_TIMINGS as _T
    with _T.span("discretize: build trace"):
        _lowered = jax.jit(hp(_build)).lower()
    with _T.span("discretize: build compile"):
        _compiled = _lowered.compile()
    with _T.span("discretize: build execute") as _s:
        built = _compiled()
        _s["sync"] = built["rhs_q"]
    del _lowered, _compiled
    from .ops.swipdg import SwipdgComponent
    from .la.block import BlockOpStatic
    comps = [SwipdgComponent(**cd) for cd in built["comps"]]
    op = AffineBlockOp(static=BlockOpStatic.from_space(space), **built["folded"])
    rhs_q = built["rhs_q"]
    L2, E_bar, energy = built["L2"], built["E_bar"], built["energy"]
    M_aa, BB, M_ab = built["M_aa"], built["BB"], built["M_ab"]
    A_div, R_dd, d_vec = built["A_div"], built["R_dd"], built["d_vec"]
    rf_qq, min_ev = built["rf_qq"], built["min_ev"]
    # at scale on accelerators, keep the estimator MATRIX tensors (the
    # O(Q^2 K Nrt^2) eta_df/eta_r forms) in f32: they only enter estimator
    # quadratic forms / ROM projections where 1e-7 relative is ample, and
    # in f64 they cost multiple GB of HBM as x64 split pairs (the solve
    # path — op, rhs, products — stays f64)
    if (dtype == jnp.float64 and jax.default_backend() != "cpu"
            and space.K * space.N > 32768 and M_aa is not None):
        f32 = jnp.float32
        E_bar_est = E_bar.astype(f32)
        M_aa, BB, M_ab = M_aa.astype(f32), BB.astype(f32), M_ab.astype(f32)
        R_dd, d_vec = R_dd.astype(f32), d_vec.astype(f32)
    else:
        E_bar_est = E_bar
    diam = jnp.full((space.K,), grid.subdomain_diameter(), dtype)

    oswald = OswaldOperator(space)
    if order == 1:
        flux = FluxReconstructor(space, kappa, ipdg, dtype)
    else:
        from .ops.rt1 import FluxReconstructorRT1
        flux = FluxReconstructorRT1(space, kappa, ipdg, dtype)

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
