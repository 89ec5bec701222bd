"""Batched on-device corrector == host dense patch solver."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.ops.corrector import BatchedCorrector


@pytest.fixture(scope="module")
def fom():
    gpd = init_grid_and_problem({'num_subdomains': [3, 3],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    return d


def test_batched_corrector_matches_host_patch_solver(fom):
    d = fom
    mu = d.parse_parameter(0.4)
    U = d.solve(mu)
    bc = BatchedCorrector(d)
    # mix of interior (4), edge (1, 3), corner (0) patches in one batch
    marked = [0, 1, 3, 4]
    W = np.asarray(bc.solve(marked, mu, current_solution=U, mode="residual",
                            tol=1e-12, maxiter=500))
    for i, k in enumerate(marked):
        w_ref = np.asarray(d.solve_for_local_correction(
            k, None, mu, current_solution=U, mode="residual"))
        scale = max(np.abs(w_ref).max(), 1e-300)
        err = np.abs(W[i] - w_ref).max() / scale
        assert err < 1e-7, (k, err)


def test_batched_corrector_f_mode(fom):
    d = fom
    mu = d.parse_parameter(1.0)
    bc = BatchedCorrector(d)
    W = np.asarray(bc.solve([4], mu, mode="reference", tol=1e-12, maxiter=500))
    w_ref = np.asarray(d.solve_for_local_correction(4, None, mu, mode="reference"))
    assert np.abs(W[0] - w_ref).max() / np.abs(w_ref).max() < 1e-7


def test_patch_coarse_matrix_exact(fom):
    """The two-level patch preconditioner's coarse matrix is the EXACT
    Galerkin coarse matrix of the masked patch operator (regression: a
    previous version kept the global in_in/out_out coupling contribution
    on patch-crossing faces AND added the Dirichlet penalty — valid as a
    preconditioner but double-counted against the host patch assembly)."""
    from pylrbms_tpu.ops.corrector import patch_coarse_matrix
    d = fom
    mu = d.parse_parameter(0.7)
    theta = np.asarray(d.theta(mu))
    bc = BatchedCorrector(d)
    st = d.op.static
    D = {sd: jnp.einsum("q,qkfij->kfij", theta, bc.D_side[sd])
         for sd in bc.SIDES}
    Rq = {nm: jnp.einsum("q,qefij->efij", theta, v)
          for nm, v in bc.R.items()}
    Uq = {nm: jnp.einsum("q,qefij->efij", theta, v)
          for nm, v in bc.U.items()}
    A0c = jnp.einsum("q,qkl->kl", theta, bc.A0c_q)
    marked = [0, 1, 4]
    pmask = bc.patch_mask_table[np.asarray(marked)]
    fams = [(Rq, D["right"], D["left"], jnp.asarray(st.left_k),
             jnp.asarray(st.right_k)),
            (Uq, D["top"], D["bottom"], jnp.asarray(st.low_k),
             jnp.asarray(st.up_k))]
    Ac = np.asarray(patch_coarse_matrix(A0c, pmask, fams))
    N = d.space.N
    for b, k in enumerate(marked):
        members, A_q, _ = d.assemble_patch(k, mu)
        A_patch = sum(float(t) * np.asarray(A)
                      for t, A in zip(theta, A_q))
        m = len(members)
        ref = A_patch.reshape(m, N, m, N).sum(axis=(1, 3))     # [m, m]
        got = Ac[b][np.ix_(members, members)]
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)
        # rows/cols outside the patch are zero
        outside = np.setdiff1d(np.arange(d.space.K), members)
        if outside.size:
            assert np.abs(Ac[b][np.ix_(outside, outside)]).max() == 0.0


@pytest.mark.parametrize("grid_type", ["tri", "crisscross"])
def test_stencil_patch_apply_matches_dense(grid_type):
    """The matrix-free patch apply (global stencil on the masked field +
    strip corrections for patch-crossing faces) equals the dense-block
    patch apply — the at-scale corrector path, ~10x cheaper per CG
    iteration."""
    import numpy as np
    import jax.numpy as jnp
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    from pylrbms_tpu.ops.corrector import BatchedCorrector
    gpd = init_grid_and_problem({'num_subdomains': [4, 3],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1, 'grid_type': grid_type})
    d, _ = discretize(gpd)
    mu = d.parse_parameter(0.6)
    U0 = 0.4 * d.solve(mu)
    marked = [0, 5, 11]
    W_d = BatchedCorrector(d).solve(marked, mu, current_solution=U0,
                                    tol=1e-12, maxiter=2000)
    W_s = BatchedCorrector(d).enable_stencil().solve(
        marked, mu, current_solution=U0, tol=1e-12, maxiter=2000)
    assert float(jnp.abs(W_d).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(W_s), np.asarray(W_d),
                               rtol=1e-9, atol=1e-12)


def test_stencil_patch_apply_matches_dense_3d():
    """The 3D masked-stencil patch apply (dimension-generic since round 4;
    the dense patch apply was the measured 3D online-enrichment bound,
    corrector 3.9 s steady at the 16k-3D config) equals the dense-block
    patch apply."""
    import numpy as np
    import jax.numpy as jnp
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    from pylrbms_tpu.ops.corrector import BatchedCorrector
    gpd = init_grid_and_problem({'num_subdomains': [3, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    mu = d.parse_parameter(0.6)
    U0 = 0.4 * d.solve(mu)
    marked = [0, 5, 11]
    W_d = BatchedCorrector(d).solve(marked, mu, current_solution=U0,
                                    tol=1e-12, maxiter=2000)
    W_s = BatchedCorrector(d).enable_stencil().solve(
        marked, mu, current_solution=U0, tol=1e-12, maxiter=2000)
    assert float(jnp.abs(W_d).max()) > 1e-5
    np.testing.assert_allclose(np.asarray(W_s), np.asarray(W_d),
                               rtol=1e-9, atol=1e-12)
