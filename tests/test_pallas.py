"""Pallas block-matvec kernel == XLA einsum (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from pylrbms_tpu.ops.pallas_kernels import block_matvec_pallas


def test_block_matvec_pallas_matches_einsum():
    rng = np.random.default_rng(5)
    K, N = 8, 128
    A = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    y_ref = jnp.einsum("kij,kj->ki", A, x)
    y = block_matvec_pallas(A, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-4)
