"""Mixed-precision iterative refinement (ops/ir.py).

The f32 inner PCG on the symmetrically Jacobi-scaled system + f64 residual
restarts + f64 polish must reproduce the emulated-f64 solves across a
coefficient-contrast ladder INCLUDING the SPE10-grade jumps that defeated
the round-2 unscaled scheme (it stalled past contrast ~1e4), and the stall
fallback must guarantee the tolerance even when the inner solver is starved.
Solver regime mirrored: reference BiCGStab+ILUT precision 1e-10
(/root/reference/python/scripts/online_adaptive_lrbms.py:71-72).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.spe10 import init_grid_and_problem
from pylrbms_tpu.problems.artificial_channels import (
    init_grid_and_problem as channels)
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.discretize_parabolic_block_swipdg import (
    discretize as discretize_parabolic)
from pylrbms_tpu.ops.ir import solve_ir, cast_f32, pcg


def _spe10_model(contrast):
    gpd = init_grid_and_problem(
        {'num_subdomains': [3, 3],
         'half_num_fine_elements_per_subdomain_and_dim': 2,
         'num_refinements': 1},
        raster=(6, 6), raster_mode="nearest", max_contrast=contrast)
    d, _ = discretize(gpd)
    return d


def _relres(A, x, b):
    r = jnp.linalg.norm((b - A.apply(x)).reshape(-1))
    return float(r / jnp.linalg.norm(b.reshape(-1)))


@pytest.mark.parametrize("contrast", [1e2, 1e6])
def test_solve_ir_matches_f64_pcg(contrast):
    d = _spe10_model(contrast)
    mu = d.parse_parameter([1.0])
    theta = d.theta(mu)
    sop = d.mf_operator()
    A = jax.jit(lambda s, t: s.assemble(t))(sop, theta)
    A32 = cast_f32(A)
    Ad = jax.jit(lambda op, t: op.assemble(t))(d.op, theta)
    bf = jax.jit(lambda a: a.block_jacobi_factors())(Ad)
    b = d.rhs(mu)
    dvec = jnp.einsum("q,qkn->kn", theta,
                      jnp.diagonal(d.op.A_diag, axis1=-2, axis2=-1))

    x_ref = A.solve_pcg(b, tol=1e-12, maxiter=4000, block_factors=bf)
    x, it32, rounds, it64 = solve_ir(A, A32, b, dvec, tol=1e-12,
                                     maxiter=4000, block_factors=bf,
                                     return_info=True)
    # parity standard: the TRUE residual floor at high contrast is
    # cond-limited for the f64 recurrence too — match what IT achieves
    assert _relres(A, x, b) <= max(2 * _relres(A, x_ref, b), 1e-11)
    err = float(jnp.abs(x - x_ref).max() / jnp.abs(x_ref).max())
    assert err < 1e-8, (err, int(rounds), int(it32), int(it64))
    # the refinement actually did f32 work (it is not a fallback-only path)
    assert int(it32) > 0


def test_solve_ir_starved_inner_falls_back():
    """With the inner solver starved (1 iteration, 2 rounds) the stall
    detection hands the iterate to the f64 polish — tolerance still met."""
    d = _spe10_model(1e6)
    mu = d.parse_parameter([1.0])
    theta = d.theta(mu)
    A = jax.jit(lambda s, t: s.assemble(t))(d.mf_operator(), theta)
    Ad = jax.jit(lambda op, t: op.assemble(t))(d.op, theta)
    bf = jax.jit(lambda a: a.block_jacobi_factors())(Ad)
    b = d.rhs(mu)
    dvec = jnp.einsum("q,qkn->kn", theta,
                      jnp.diagonal(d.op.A_diag, axis1=-2, axis2=-1))
    x, it32, rounds, it64 = solve_ir(A, cast_f32(A), b, dvec, tol=1e-11,
                                     maxiter=4000, block_factors=bf,
                                     inner_maxiter=1, max_rounds=2,
                                     return_info=True)
    assert _relres(A, x, b) < 1e-10
    assert int(it64) > 0          # the polish finished the solve


def test_solve_ir_warm_start():
    d = _spe10_model(1e4)
    mu = d.parse_parameter([1.0])
    theta = d.theta(mu)
    A = jax.jit(lambda s, t: s.assemble(t))(d.mf_operator(), theta)
    Ad = jax.jit(lambda op, t: op.assemble(t))(d.op, theta)
    bf = jax.jit(lambda a: a.block_jacobi_factors())(Ad)
    b = d.rhs(mu)
    dvec = jnp.einsum("q,qkn->kn", theta,
                      jnp.diagonal(d.op.A_diag, axis1=-2, axis2=-1))
    x1 = solve_ir(A, cast_f32(A), b, dvec, tol=1e-12, block_factors=bf)
    # restarting FROM the solution converges immediately (0 f32 rounds)
    x2, it32, rounds, it64 = solve_ir(A, cast_f32(A), b, dvec, tol=1e-10,
                                      block_factors=bf, x0=x1,
                                      return_info=True)
    assert int(rounds) == 0
    assert float(jnp.abs(x2 - x1).max()) == 0.0


def test_mf_solve_mixed_option_matches_f64():
    """model._mf_solve with mixed=True == mixed=False at 1e-9, high contrast
    (the scaled scheme; the unscaled round-2 one was gated off above 1e4)."""
    d = _spe10_model(1e6)
    mu = d.parse_parameter([1.0])
    b = d.rhs(mu)
    opts = {"precision": 1e-11, "max_iter": 4000, "two_level": True,
            "coarse_modes": 6}
    x64 = d._mf_solve(d.theta(mu), b, dict(opts, mixed=False))
    xmx = d._mf_solve(d.theta(mu), b, dict(opts, mixed=True))
    err = float(jnp.abs(xmx - x64).max() / jnp.abs(x64).max())
    assert err < 1e-8, err


def test_parabolic_trajectory_mixed_matches_f64():
    """The mixed-precision implicit-Euler trajectory == the f64 one (the
    flagship at-scale perf path, VERDICT r3 item 1)."""
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=0.5, nt=6)
    mu = im.parse_parameter({'switch': 0.4})
    ref = np.asarray(im._solve_mf(mu, 0.5 / 6, precision="f64"))
    mx = np.asarray(im._solve_mf(mu, 0.5 / 6, precision="mixed"))
    err = np.abs(ref - mx).max() / max(np.abs(ref).max(), 1e-300)
    assert err < 1e-8, err
    # two-level variant
    mx2 = np.asarray(im._solve_mf(mu, 0.5 / 6, two_level=True,
                                  coarse_modes=4, precision="mixed"))
    err2 = np.abs(ref - mx2).max() / max(np.abs(ref).max(), 1e-300)
    assert err2 < 1e-8, err2


def test_parabolic_solve_batch_mixed_matches_per_mu():
    """Batched-mu mixed trajectories (vmapped IR: nested masked while loops)
    == the per-mu f64 solves."""
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=0.5, nt=5)
    mus = [im.parse_parameter({'switch': s}) for s in (0.3, 0.7, 1.0)]
    batch = np.asarray(im.solve_batch(mus, precision="mixed"))
    for i, mu in enumerate(mus):
        ref = np.asarray(im._solve_mf(mu, 0.5 / 5, precision="f64"))
        err = np.abs(batch[i] - ref).max() / max(np.abs(ref).max(), 1e-300)
        assert err < 1e-8, (i, err)


def test_generic_pcg_identity_preconditioner():
    rng = np.random.default_rng(3)
    n = 40
    Q = rng.normal(size=(n, n))
    A = jnp.asarray(Q @ Q.T + n * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))
    x, it = pcg(lambda v: A @ v, lambda r: r, b, 1e-12, 500)
    assert float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b)) < 1e-11
    assert int(it) > 0
