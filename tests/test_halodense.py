"""Halo-dense operator form (ops/halodense.py): gather + one batched matmul
apply must equal the assembled block apply exactly (same coefficients, one
float association change), in 2D and 3D, and drive solve_pcg."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.ops.halodense import halo_from_assembled


def _check(d, tol=1e-12):
    mu = d.parse_parameter([1.0] if d.parameter_type else [])
    A = d.assemble(mu)
    H = halo_from_assembled(A)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(d.space.K, d.space.N)))
    y_ref = np.asarray(A.apply(x))
    y_h = np.asarray(H.apply(x))
    rel = np.abs(y_h - y_ref).max() / max(np.abs(y_ref).max(), 1e-300)
    assert rel < tol, rel
    # batched leading axis
    xb = jnp.asarray(rng.normal(size=(3, d.space.K, d.space.N)))
    rel_b = float(np.abs(np.asarray(H.apply(xb)) - np.asarray(A.apply(xb)))
                  .max())
    assert rel_b < tol * max(np.abs(np.asarray(A.apply(xb))).max(), 1.0)
    # solve_pcg through the halo form == through the assembled form
    b = jnp.asarray(rng.normal(size=(d.space.K, d.space.N)))
    u_ref = np.asarray(A.solve_pcg(b, tol=1e-12, maxiter=2000))
    u_h = np.asarray(H.solve_pcg(b, tol=1e-12, maxiter=2000))
    rel_s = np.abs(u_h - u_ref).max() / max(np.abs(u_ref).max(), 1e-300)
    assert rel_s < 1e-8, rel_s


def test_halo_2d_tri():
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    gpd = init_grid_and_problem(
        {'num_subdomains': [3, 2],
         'half_num_fine_elements_per_subdomain_and_dim': 1,
         'num_refinements': 1})
    d, _ = discretize(gpd, dtype=jnp.float64)
    _check(d)


def test_halo_ir_trajectory_parity():
    """The implicit-Euler trajectory with the halo-dense IR inner form
    equals the stencil-inner trajectory at solver tolerance."""
    from pylrbms_tpu.problems.spe10 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    from pylrbms_tpu.discretize_parabolic_block_swipdg import (
        discretize as discretize_parabolic)
    cfg = {'num_subdomains': [4, 4],
           'half_num_fine_elements_per_subdomain_and_dim': 1,
           'num_refinements': 1}
    gpd = init_grid_and_problem(cfg, raster=(4, 4), raster_mode="nearest",
                                max_contrast=1e3)
    d, _ = discretize(gpd, dtype=jnp.float64)
    im, _ = discretize_parabolic(gpd, T=0.5, nt=4)
    mu = d.parse_parameter([0.7])
    t_st = np.asarray(im._solve_mf(mu, 0.125, tol=1e-11, two_level=False,
                                   precision="mixed", inner="stencil"))
    t_ha = np.asarray(im._solve_mf(mu, 0.125, tol=1e-11, two_level=False,
                                   precision="mixed", inner="halo"))
    sc = max(np.abs(t_st).max(), 1e-300)
    assert np.abs(t_ha - t_st).max() < 1e-7 * sc


def test_halo_3d_hex():
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    gpd = init_grid_and_problem(
        {'num_subdomains': [2, 2, 2],
         'half_num_fine_elements_per_subdomain_and_dim': 1,
         'num_refinements': 0})
    d, _ = discretize(gpd)
    _check(d)
