"""Pallas block-matvec kernel == XLA einsum (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from pylrbms_tpu.ops.pallas_kernels import (block_matvec_pallas,
                                            precond_dot_pallas)


def test_block_matvec_pallas_matches_einsum():
    rng = np.random.default_rng(5)
    K, N = 8, 128
    A = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    y_ref = jnp.einsum("kij,kj->ki", A, x)
    y = block_matvec_pallas(A, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-4)


def test_fused_precond_dot_matches_einsum():
    rng = np.random.default_rng(7)
    K, N = 8, 128
    F = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    z_ref = jnp.einsum("kij,kj->ki", F, r)
    rz_ref = np.asarray(jnp.sum(r * z_ref, axis=1))
    z, rz = precond_dot_pallas(F, r, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rz), rz_ref,
                               rtol=2e-4, atol=2e-3)
