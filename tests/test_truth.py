"""Self-hosted truth solver (pylrbms_tpu/truth.py): the stencil-only
mixed-precision path must reproduce the direct solve to solver tolerance,
and the colored-apply coarse Galerkin matrix must equal the dense-algebra
one exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylrbms_tpu.utils.precision import hp


@pytest.fixture(scope="module")
def model3d():
    from pylrbms_tpu.problems.spe10 import init_grid_and_problem_3d
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    gpd = init_grid_and_problem_3d(
        {"num_subdomains": [4, 4, 2],
         "half_num_fine_elements_per_subdomain_and_dim": 1,
         "num_refinements": 1},
        raster=(2, 4, 4), raster_mode="nearest", max_contrast=1e3)
    d, _ = discretize(gpd)
    return d


def test_colored_coarse_galerkin_matches_dense(model3d):
    from pylrbms_tpu.truth import coarse_galerkin_mf
    from pylrbms_tpu.la.block import AssembledBlockOp
    d = model3d
    mu = d.parse_parameter({"switch": 1.0})
    theta = d.theta(mu)
    A = jax.jit(hp(lambda op, th: op.assemble(th)))(d.op, theta)
    S = jax.jit(hp(lambda s, th: s.assemble(th)))(d.mf_operator(), theta)
    C = AssembledBlockOp.coarse_modes_basis(d.space, 4)
    Ac_dense = np.asarray(
        jax.jit(hp(lambda A_, C_: A_.coarse_matrix_general(C_)))(
            A, jnp.asarray(C)), np.float64)
    Ac_mf = coarse_galerkin_mf(S, C)
    rel = (np.abs(Ac_mf - Ac_dense).max()
           / max(np.abs(Ac_dense).max(), 1e-300))
    assert rel < 1e-10, rel


def test_dense_subdomain_blocks_single_subdomain():
    """On a 1-subdomain grid the stencil's dense subdomain block IS the
    full operator matrix (no interfaces -> no in_in approximation)."""
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    from pylrbms_tpu.la.block import to_scipy_csr
    gpd = init_grid_and_problem(
        {'num_subdomains': [1, 1, 1],
         'half_num_fine_elements_per_subdomain_and_dim': 1,
         'num_refinements': 1})
    d, _ = discretize(gpd)
    mu = d.parse_parameter([1.0] if d.parameter_type else [])
    theta = d.theta(mu)
    S = jax.jit(hp(lambda s, th: s.assemble(th)))(d.mf_operator(), theta)
    D = np.asarray(jax.jit(hp(
        lambda s_: s_.dense_subdomain_blocks()))(S), np.float64)[0]
    A = to_scipy_csr(d.assemble(mu)).toarray()
    rel = np.abs(D - A).max() / max(np.abs(A).max(), 1e-300)
    assert rel < 1e-12, rel


def test_dense_subdomain_blocks_match_folded(model3d):
    """Multi-subdomain: the stencil-extracted dense diagonal blocks equal
    fold_diag3's assembled A_diag exactly (interface in_in/out_out strips
    + boundary-only Dirichlet strips)."""
    d = model3d
    mu = d.parse_parameter({"switch": 0.8})
    theta = d.theta(mu)
    S = jax.jit(hp(lambda s, th: s.assemble(th)))(d.mf_operator(), theta)
    D = np.asarray(jax.jit(hp(
        lambda s_: s_.dense_subdomain_blocks()))(S), np.float64)
    A = jax.jit(hp(lambda op, th: op.assemble(th)))(d.op, theta)
    Ad = np.asarray(A.A_diag, np.float64)
    rel = np.abs(D - Ad).max() / max(np.abs(Ad).max(), 1e-300)
    assert rel < 1e-12, rel


def test_truth_solve_matches_splu(model3d):
    from pylrbms_tpu.truth import truth_solve
    from pylrbms_tpu.la.block import to_scipy_csr
    import scipy.sparse.linalg as spla
    d = model3d
    mu = d.parse_parameter({"switch": 0.6})
    U, info = truth_solve(d, mu, tol=1e-10, n_harvest=8, extra_modal=3,
                          rounds=2)
    assert info["relres"] < 1e-7
    A = to_scipy_csr(d.assemble(mu)).tocsc()
    b = np.asarray(d.rhs(mu), np.float64).ravel()
    u_ref = spla.splu(A).solve(b)
    rel = (np.abs(U.reshape(-1) - u_ref).max()
           / max(np.abs(u_ref).max(), 1e-300))
    assert rel < 1e-6, rel
