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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_matrixfree_solve_gspmd_sharded_matches_unsharded():
    """Matrix-free two-level solve with the stencil arrays GSPMD-sharded
    over the K axis == unsharded (XLA inserts the halo collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pylrbms_tpu.ops.matrixfree import (assemble_swipdg_stencil,
                                            StencilOperator, SwipdgStencil)
    from pylrbms_tpu.la.block import dense_inv_mixed

    gpd = init_grid_and_problem({'num_subdomains': [4, 4],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    theta = jnp.asarray([1.0, 0.5])
    stencils = tuple(assemble_swipdg_stencil(d.space, lf, None)
                     for lf in d.estimator.data.lambda_funcs)
    A_dense = d.op.assemble(theta)
    b = d.rhs_q[0]
    bf = A_dense.block_jacobi_factors()
    ci = dense_inv_mixed(A_dense.coarse_matrix())

    @jax.jit
    def solve(stencils, b, bf, ci):
        sop = StencilOperator(d.space, stencils)
        return sop.assemble(theta).solve_pcg(b, tol=1e-10, maxiter=2000,
                                             block_factors=bf, coarse_inv=ci)

    U_ref = solve(stencils, b, bf, ci)

    mesh = Mesh(np.array(jax.devices()[:8]), ("k",))

    def shard_leading_k(x):
        # shard any leading axis that equals K (vol / D_side are [K, ...];
        # edge-indexed strips and small tables stay replicated)
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == d.space.K:
            return jax.device_put(
                x, NamedSharding(mesh, P("k", *(None,) * (x.ndim - 1))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    stencils_sh = jax.tree_util.tree_map(shard_leading_k, stencils)
    b_sh = jax.device_put(b, NamedSharding(mesh, P("k", None)))
    bf_sh = jax.device_put(bf, NamedSharding(mesh, P("k", None, None)))
    U = solve(stencils_sh, b_sh, bf_sh, ci)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref),
                               rtol=1e-9, atol=1e-11)
