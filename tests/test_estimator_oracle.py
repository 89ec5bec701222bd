"""Batched Oswald / flux-reconstruction == independent numpy oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.reference_impl.estimator_np import (oswald_error_np,
                                                     flux_reconstruction_np)


@pytest.fixture(scope="module")
def fom():
    gpd = init_grid_and_problem({'num_subdomains': [3, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    return d


def test_oswald_matches_numpy_oracle(fom):
    d = fom
    rng = np.random.default_rng(2)
    U = rng.normal(size=(d.space.K, d.space.N))
    w_jax = np.asarray(d.estimator.data.oswald.apply(jnp.asarray(U)))
    w_np = oswald_error_np(d.grid, U)
    assert np.abs(w_jax - w_np).max() < 1e-12


def test_flux_reconstruction_matches_numpy_oracle(fom):
    d = fom
    rng = np.random.default_rng(4)
    U = rng.normal(size=(d.space.K, d.space.N))
    lam = d.estimator.data.lambda_funcs[0]
    t_jax = np.asarray(d.estimator.data.flux.apply_global(lam, jnp.asarray(U)))
    t_np = flux_reconstruction_np(d.grid, lam, U)
    scale = max(np.abs(t_np).max(), 1e-300)
    assert np.abs(t_jax - t_np).max() / scale < 1e-12


def test_vectorized_numpy_flux_matches_loop_oracle(fom):
    from pylrbms_tpu.reference_impl.estimator_np import flux_reconstruction_np_vec
    d = fom
    rng = np.random.default_rng(6)
    U = rng.normal(size=(d.space.K, d.space.N))
    lam = d.estimator.data.lambda_funcs[1]
    t_loop = flux_reconstruction_np(d.grid, lam, U)
    t_vec = flux_reconstruction_np_vec(d.grid, lam, U)
    assert np.abs(t_loop - t_vec).max() / max(np.abs(t_loop).max(), 1e-300) < 1e-12
