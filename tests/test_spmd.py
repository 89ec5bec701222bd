"""Explicit shard_map SPMD online solve == unsharded solve."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.parallel.spmd import SpmdOnlineSolver
from jax.sharding import Mesh


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_spmd_pcg_matches_unsharded():
    gpd = init_grid_and_problem({'num_subdomains': [2, 4],   # kx=2, ky=4
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    theta = jnp.asarray([1.0, 0.5])
    theta_f = jnp.asarray([1.0])

    A = d.op.assemble(theta)
    b = jnp.einsum("q,qkn->kn", theta_f, d.rhs_q)
    U_ref = A.solve_pcg(b, tol=1e-10, maxiter=500)

    mesh = Mesh(np.array(jax.devices()[:4]), ("k",))
    solver = SpmdOnlineSolver(d, mesh)
    run = solver.make_step(tol=1e-10, maxiter=500)
    U = run(theta, theta_f)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref),
                               rtol=1e-8, atol=1e-11)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_spmd_pcg_multiple_rows_per_shard():
    """ky=8 over 4 devices: 2 subdomain rows per shard — exercises the
    intra-shard vertical couplings together with the cross-shard halo."""
    gpd = init_grid_and_problem({'num_subdomains': [1, 8],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    theta = jnp.asarray([1.0, 0.8])
    theta_f = jnp.asarray([1.0])
    U_ref = d.op.assemble(theta).solve_pcg(
        jnp.einsum("q,qkn->kn", theta_f, d.rhs_q), tol=1e-10, maxiter=500)
    mesh = Mesh(np.array(jax.devices()[:4]), ("k",))
    run = SpmdOnlineSolver(d, mesh).make_step(tol=1e-10, maxiter=500)
    U = run(theta, theta_f)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref),
                               rtol=1e-8, atol=1e-11)
