"""Native C++ assembler == batched JAX assembler (kappa = I path)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu import native
from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_assembler_matches_jax():
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    lam0 = d.estimator.data.lambda_funcs[0]
    A_native = native.assemble_swipdg_p1_csr(d.space, lam0).toarray()
    A_jax = np.asarray(d.op.assemble(jnp.asarray([1.0, 0.0])).to_dense())
    err = np.abs(A_native - A_jax).max()
    assert err < 1e-12 * max(1.0, np.abs(A_jax).max()), err


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_assembler_3d_matches_jax():
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem as igp3
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import (
        discretize as discretize3)
    gpd = igp3({'num_subdomains': [2, 1, 2],
                'half_num_fine_elements_per_subdomain_and_dim': 1,
                'num_refinements': 0})
    d, _ = discretize3(gpd)
    for q, theta in ((0, [1.0, 0.0]), (1, [0.0, 1.0])):
        lam = d.estimator.data.lambda_funcs[q]
        A_native = native.assemble_swipdg_q1_3d_csr(d.space, lam).toarray()
        A_jax = np.asarray(d.op.assemble(jnp.asarray(theta)).to_dense())
        err = np.abs(A_native - A_jax).max()
        assert err < 1e-12 * max(1.0, np.abs(A_jax).max()), (q, err)
