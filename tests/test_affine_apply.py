"""Affine-contracted batched-serving apply (la/block.AffineBlockApply).

y = sum_q theta_q (A_q x) without materializing A(theta): under a vmapped
online step the affine stacks stream ONCE per CG iteration shared across the
whole query batch — the serving-shape apply (bench.py B=256).  Must be
algebraically identical to the theta-assembled operator.
"""
import numpy as np
import jax.numpy as jnp

from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.la.block import AffineBlockApply
from pylrbms_tpu.model import make_online_step


def _model(ns=4):
    gpd = os2015({'num_subdomains': [ns, ns],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 1})
    d, _ = discretize(gpd)
    return d


def _affine_of(d, theta):
    op = d.op
    return AffineBlockApply(op.static, op.A_diag,
                            op.C_R_io, op.C_R_oi,
                            op.C_U_io, op.C_U_oi, theta,
                            op.C_W_io, op.C_W_oi)


def test_affine_apply_equals_assembled():
    """apply == theta-assembled apply, single [K, N] and batched [B, K, N]."""
    d = _model()
    mu = d.parse_parameter(0.37)
    theta = d.theta(mu)
    A = d.assemble(mu)
    Aaff = _affine_of(d, theta)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((d.space.K, d.space.N)))
    xB = jnp.asarray(rng.standard_normal((5, d.space.K, d.space.N)))
    np.testing.assert_allclose(np.asarray(Aaff.apply(x1)),
                               np.asarray(A.apply(x1)),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(Aaff.apply(xB)),
                               np.asarray(A.apply(xB)),
                               rtol=1e-12, atol=1e-13)


def test_affine_solve_pcg_no_prebuilt_factors():
    """solve_pcg without prebuilt factors uses the theta-contracted
    block-Jacobi fallback and converges to the dense solution."""
    d = _model()
    mu = d.parse_parameter(0.6)
    theta = d.theta(mu)
    b = d.rhs(mu)
    Aaff = _affine_of(d, theta)
    x = Aaff.solve_pcg(b, tol=1e-12, maxiter=2000)
    x_ref = d.assemble(mu).solve_dense(b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-11)


def test_online_step_affine_matches_dense_single_and_batched():
    """make_online_step(matrix_free='affine') reproduces the dense path,
    both single-query and in one batched dispatch."""
    d = _model()
    dense = make_online_step(d, tol=1e-10, maxiter=1000, matrix_free=False)
    aff = make_online_step(d, tol=1e-10, maxiter=1000, matrix_free='affine')
    mus = [0.2, 0.55, 0.9]
    for m in mus:
        args = (jnp.asarray([1.0, m]), jnp.asarray([1.0]),
                {"diffusion": jnp.asarray([m])})
        U0, ind0 = dense(*args)
        U1, ind1 = aff(*args)
        np.testing.assert_allclose(np.asarray(U1), np.asarray(U0),
                                   rtol=1e-7, atol=1e-11)
        np.testing.assert_allclose(np.asarray(ind1), np.asarray(ind0),
                                   rtol=1e-6, atol=1e-12)
    Ub, indb = aff(jnp.asarray([[1.0, m] for m in mus]),
                   jnp.asarray([[1.0]] * len(mus)),
                   {"diffusion": jnp.asarray([[m] for m in mus])})
    for i, m in enumerate(mus):
        U0, ind0 = dense(jnp.asarray([1.0, m]), jnp.asarray([1.0]),
                         {"diffusion": jnp.asarray([m])})
        np.testing.assert_allclose(np.asarray(Ub[i]), np.asarray(U0),
                                   rtol=1e-7, atol=1e-11)
        np.testing.assert_allclose(np.asarray(indb[i]), np.asarray(ind0),
                                   rtol=1e-6, atol=1e-12)
