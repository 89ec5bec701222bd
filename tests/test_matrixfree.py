"""Matrix-free stencil apply == dense block-operator apply."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.ops.matrixfree import assemble_swipdg_stencil, StencilOperator


@pytest.mark.parametrize("kx,ky,grid_type", [(2, 2, 'tri'), (3, 2, 'tri'),
                                             (2, 2, 'crisscross'),
                                             (3, 2, 'crisscross')])
def test_stencil_apply_matches_dense(kx, ky, grid_type):
    gpd = init_grid_and_problem({'num_subdomains': [kx, ky],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1, 'grid_type': grid_type})
    d, _ = discretize(gpd)
    stencils = tuple(assemble_swipdg_stencil(d.space, lf, None)
                     for lf in d.estimator.data.lambda_funcs)
    sop = StencilOperator(d.space, stencils)
    theta = jnp.asarray([1.0, 0.4])
    A_dense = d.op.assemble(theta)
    A_mf = sop.assemble(theta)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(d.space.K, d.space.N)))
    y_ref = A_dense.apply(x)
    y = A_mf.apply(x)
    err = float(jnp.abs(y - y_ref).max() / jnp.abs(y_ref).max())
    assert err < 1e-13, err
    # batched apply
    X = jnp.asarray(rng.normal(size=(3, d.space.K, d.space.N)))
    np.testing.assert_allclose(np.asarray(A_mf.apply(X)),
                               np.asarray(A_dense.apply(X)), rtol=1e-10, atol=1e-12)


def test_matrixfree_pcg_matches_dense_solve():
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    stencils = tuple(assemble_swipdg_stencil(d.space, lf, None)
                     for lf in d.estimator.data.lambda_funcs)
    sop = StencilOperator(d.space, stencils)
    theta = jnp.asarray([1.0, 0.6])
    A_mf = sop.assemble(theta)
    b = d.rhs_q[0]
    x_ref = d.op.assemble(theta).solve_dense(b)
    x_mf = A_mf.solve_pcg(b, tol=1e-12, maxiter=3000)
    err = float(jnp.abs(x_mf - x_ref).max() / jnp.abs(x_ref).max())
    assert err < 1e-8, err


def test_matrixfree_pcg_block_preconditioner():
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    stencils = tuple(assemble_swipdg_stencil(d.space, lf, None)
                     for lf in d.estimator.data.lambda_funcs)
    sop = StencilOperator(d.space, stencils)
    theta = jnp.asarray([1.0, 0.6])
    A_dense = d.op.assemble(theta)
    b = d.rhs_q[0]
    x_ref = A_dense.solve_dense(b)
    x = sop.assemble(theta).solve_pcg(
        b, tol=1e-12, maxiter=2000,
        block_factors=A_dense.block_jacobi_factors())
    err = float(jnp.abs(x - x_ref).max() / jnp.abs(x_ref).max())
    assert err < 1e-8, err


def test_matrixfree_model_solve_crisscross():
    """The model-level matrix-free two-level solve (cell-Jacobi/block-Jacobi
    + modal/harvested coarse) runs on the crisscross family and matches the
    dense solve — the at-scale FOM path is family-complete."""
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1,
                                 'grid_type': 'crisscross'})
    d, _ = discretize(gpd)
    mu = d.parse_parameter(0.7)
    U_ref = np.asarray(d.op.assemble(d.theta(mu)).solve_dense(d.rhs(mu)))
    for cs in ("modal", "harvested"):
        U = np.asarray(d.solve(mu, inverse_options={
            "type": "mf_pcg", "precision": 1e-12,
            "coarse_space": cs, "coarse_modes": 3}))
        err = np.abs(U - U_ref).max() / np.abs(U_ref).max()
        assert err < 1e-8, (cs, err)
        if getattr(d, "_solution_cache", None):
            d._solution_cache.clear()       # force a fresh solve per variant


def test_matrixfree_pcg_two_level_coarse():
    """Additive subdomain-constant coarse level: same limit, fewer
    iterations (two-level preconditioner stays symmetric positive)."""
    from pylrbms_tpu.la.block import dense_inv_mixed
    gpd = init_grid_and_problem({'num_subdomains': [4, 4],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    stencils = tuple(assemble_swipdg_stencil(d.space, lf, None)
                     for lf in d.estimator.data.lambda_funcs)
    sop = StencilOperator(d.space, stencils)
    theta = jnp.asarray([1.0, 0.6])
    A_dense = d.op.assemble(theta)
    b = d.rhs_q[0]
    x_ref = A_dense.solve_dense(b)
    x = sop.assemble(theta).solve_pcg(
        b, tol=1e-12, maxiter=2000,
        block_factors=A_dense.block_jacobi_factors(),
        coarse_inv=dense_inv_mixed(A_dense.coarse_matrix()))
    err = float(jnp.abs(x - x_ref).max() / jnp.abs(x_ref).max())
    assert err < 1e-8, err


def test_prepare_solver_background_freeze():
    """prepare_solver(background=True) builds the frozen two-level
    preconditioner off-thread (joined before the first solve, as
    weak_greedy does); a concurrent foreground solve must not duplicate or
    corrupt the preconditioner cache (model._mf_pre_lock), and the solve
    after the join must match the dense reference."""
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    opts = {"type": "mf_pcg", "precision": 1e-12,
            "coarse_space": "modal", "coarse_modes": 3}
    t = d.prepare_solver(mu=0.5, inverse_options=opts, background=True)
    assert t is not None
    # race a foreground solve against the background freeze
    mu = d.parse_parameter(0.7)
    U = np.asarray(d.solve(mu, inverse_options=opts))
    t.join()
    U_ref = np.asarray(d.op.assemble(d.theta(mu)).solve_dense(d.rhs(mu)))
    assert np.abs(U - U_ref).max() / np.abs(U_ref).max() < 1e-8
    # exactly one preconditioner entry (no duplicate freeze keys)
    pkeys = [k for k in d._mf_jit_cache if isinstance(k, tuple)
             and k and k[0] == "precond"]
    assert len(pkeys) == 1


def test_solution_cache_keyed_by_options():
    """The solve memoization must not serve a loose-tolerance snapshot
    solve to a later tight-tolerance request (cache key includes the
    effective inverse_options)."""
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    d.enable_caching()
    mu = 0.7
    U1 = d.solve(mu, inverse_options={"type": "mf_pcg", "precision": 1e-2,
                                      "coarse_modes": 3})
    U2 = d.solve(mu, inverse_options={"type": "mf_pcg", "precision": 1e-12,
                                      "coarse_modes": 3})
    r1 = np.asarray(U1 - U2)
    assert np.abs(r1).max() > 0.0          # distinct solves, not a cache hit
    U3 = d.solve(mu, inverse_options={"type": "mf_pcg", "precision": 1e-12,
                                      "coarse_modes": 3})
    assert U3 is U2                        # same options DO hit the cache
    d.disable_caching()


def test_mf_solve_divergence_guard():
    # a silently non-converged mf solve poisoned the 3D efficiency study
    # (65k level came back with |r|/|b| = 3.5e+02); model.solve's default
    # post-check must raise SolverError instead of returning garbage
    from pylrbms_tpu.model import SolverError
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    mu = d.parse_parameter(0.7)
    opts = {"type": "mf_pcg", "precision": 1e-12, "max_iter": 1,
            "two_level": False}
    with pytest.raises(SolverError, match="diverged or stalled"):
        d.solve(mu, inverse_options=opts)
    # opt-out restores the old silent behaviour
    opts_off = dict(opts, post_check=False)
    U = d.solve(mu, inverse_options=opts_off)
    assert np.all(np.isfinite(np.asarray(U)))
