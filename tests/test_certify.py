"""Certification-at-depth mode of the online step.

With f32 model tensors (the TPU-resident regime) the solve noise floor hides
the true indicators at fine levels (STATUS.md round-1 finding #1/#4).
``make_online_step(certify=True)`` polishes the solve by mixed-precision
iterative refinement and evaluates the indicators in the widest dtype; this
asserts it actually recovers accuracy an f32 step loses.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.model import make_online_step


def _indicators(model, theta_dtype, mu, **step_kw):
    th = model.theta(mu).astype(theta_dtype)
    thf = model.theta_f(mu).astype(theta_dtype)
    step = make_online_step(model, **step_kw)
    U, ind = step(th, thf, mu)
    return np.asarray(ind)


@pytest.mark.slow
def test_certify_recovers_f32_indicator_accuracy():
    cfg = {"num_subdomains": [4, 4],
           "half_num_fine_elements_per_subdomain_and_dim": 4}
    gpd = init_grid_and_problem(cfg, mu_bar=1.0, mu_hat=1.0)
    m64, _ = discretize(gpd, dtype=jnp.float64)
    m32, _ = discretize(gpd, dtype=jnp.float32)
    mu = {"diffusion": 0.9}
    ref = _indicators(m64, jnp.float64, mu, tol=1e-12, maxiter=2000)
    plain = _indicators(m32, jnp.float32, mu, tol=1e-7, maxiter=2000)
    cert = _indicators(m32, jnp.float32, mu, tol=1e-7, maxiter=2000,
                       certify=True)
    e_plain = np.abs(plain - ref).max() / ref.max()
    e_cert = np.abs(cert - ref).max() / ref.max()
    # certified indicators must be much closer to the f64 reference
    assert e_cert < e_plain / 5, (e_plain, e_cert)
    assert e_cert < 1e-4, e_cert


@pytest.mark.slow
def test_certify_noop_at_f64():
    cfg = {"num_subdomains": [2, 2],
           "half_num_fine_elements_per_subdomain_and_dim": 2}
    gpd = init_grid_and_problem(cfg, mu_bar=1.0, mu_hat=1.0)
    m64, _ = discretize(gpd, dtype=jnp.float64)
    mu = {"diffusion": 0.5}
    plain = _indicators(m64, jnp.float64, mu, tol=1e-12)
    cert = _indicators(m64, jnp.float64, mu, tol=1e-12, certify=True)
    np.testing.assert_allclose(cert, plain, rtol=1e-9)
