"""Sharded execution on the virtual 8-device CPU mesh: results must equal
the unsharded reference bit-for-bit-ish (mirrors the reference's strategy of
testing MPI semantics on a small real world, ``python/test/mpitest.py``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.parallel.mesh import SubdomainMesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_online_step_matches_unsharded():
    gpd = init_grid_and_problem({'num_subdomains': [2, 4],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    theta = jnp.asarray([1.0, 0.5])
    theta_f = jnp.asarray([1.0])
    mu = d.parse_parameter(0.5)

    # unsharded reference
    A = d.op.assemble(theta)
    b = jnp.einsum("q,qkn->kn", theta_f, d.rhs_q)
    U_ref = A.solve_pcg(b, tol=1e-8, maxiter=500)
    nc, r, df = d.estimator.local_quantities(U_ref, mu)
    ind_ref = np.asarray(nc + r + df)

    # sharded over 8 devices (K = 8)
    sm = SubdomainMesh.create(8)
    sm.distribute_model(d)
    step = sm.jit_online_step(d, tol=1e-8, maxiter=500)
    U, ind = step(theta, theta_f, mu)
    assert len(set(x.device for x in U.addressable_shards)) == 8
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ind), ind_ref, rtol=1e-8, atol=1e-12)
