"""3D hex MOR: reduction parity, ROM estimator, online adaptive enrichment."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.academic3d import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
from pylrbms_tpu.reductor import LRBMSReductor


@pytest.fixture(scope="module")
def model3d():
    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, data = discretize(gpd)
    return gpd, d


def test_hex3d_rom_estimator_parity(model3d):
    """ROM estimator == FOM estimator of the reconstruction (exact Galerkin
    projection through the 27-neighborhood-padded projected tensors)."""
    _, d = model3d
    red = LRBMSReductor(d, order=0)
    for m in (0.3, 1.0):
        red.extend_basis(np.asarray(d.solve({'diffusion': m}), np.float64))
    rd = red.reduce()
    mu = {'diffusion': 0.6}
    c = rd.solve(mu)
    Urec = rd.reconstruct(c)
    eta_rom, _, ind_rom = rd.estimate(c, mu, decompose=True)
    eta_fom, _, ind_fom = d.estimate(Urec, mu, decompose=True)
    assert abs(float(eta_rom) - float(eta_fom)) / float(eta_fom) < 1e-10
    rel = (np.abs(np.asarray(ind_rom) - np.asarray(ind_fom)).max()
           / np.abs(np.asarray(ind_fom)).max())
    assert rel < 1e-10, rel


def test_hex3d_snapshot_reproduction(model3d):
    """The ROM reproduces its snapshots to solver precision."""
    _, d = model3d
    red = LRBMSReductor(d, order=0)
    mus = (0.25, 0.7, 1.0)
    snaps = {m: np.asarray(d.solve({'diffusion': m}), np.float64) for m in mus}
    for m in mus:
        red.extend_basis(snaps[m])
    rd = red.reduce()
    for m in mus:
        c = rd.solve({'diffusion': m})
        rec = np.asarray(rd.reconstruct(c))
        err = np.abs(rec - snaps[m]).max() / np.abs(snaps[m]).max()
        assert err < 1e-8, (m, err)


def test_hex3d_patch_corrector_residual_zero_at_fom(model3d):
    """The 3x3x3-patch residual corrector vanishes when the current solution
    is the FOM solution (patch assembly exactness in 3D)."""
    _, d = model3d
    mu = {'diffusion': 0.8}
    U = d.solve(mu)
    w = d.solve_for_local_correction(4, mu=mu, current_solution=U,
                                     mode="residual")
    assert np.abs(np.asarray(w)).max() < 1e-9 * np.abs(np.asarray(U)).max()


def test_hex3d_online_adaptive_enrichment(model3d):
    """Starting from order-0 local bases, online enrichment drives the ROM
    estimate down to the FOM floor (dense patch correctors)."""
    from pylrbms_tpu.online_enrichment import AdaptiveEnrichment
    gpd, d = model3d
    red = LRBMSReductor(d, order=0)
    rd = red.reduce()
    mu = {'diffusion': 0.55}
    eta_fom = float(d.estimate(d.solve(mu), mu))
    eta0 = float(rd.estimate(rd.solve(mu), mu))
    assert eta0 > 1.2 * eta_fom          # order-0 ROM is far from the floor
    ae = AdaptiveEnrichment(gpd, d, d.space, red, rd,
                            target_error=eta_fom * 1.05,
                            marking_doerfler_theta=0.5)   # batched correctors
    out = ae.solve(mu, enrichment_steps=10)
    u = out[0] if isinstance(out, tuple) else out
    eta_final = float(ae.rd.estimate(u, mu))
    assert eta_final < 1.1 * eta_fom, (eta_final, eta_fom)


def test_spe10_3d_smoke():
    """SPE10 model-2 native-3D problem: discretize (lean), two-level PCG
    solve, finite positive indicators."""
    from pylrbms_tpu.problems.spe10 import init_grid_and_problem_3d
    gpd = init_grid_and_problem_3d(
        {'num_subdomains': [2, 2, 2],
         'half_num_fine_elements_per_subdomain_and_dim': 1,
         'num_refinements': 1}, max_contrast=1e4)
    d, _ = discretize(gpd, lean=True)
    mu = {'switch': 1.0}
    A = d.op.assemble(d.theta(mu))
    b = d.rhs(mu)
    U, it = A.solve_pcg(b, tol=1e-10, maxiter=3000, two_level=True,
                        return_iters=True)
    r = float(jnp.abs(A.apply(U) - b).max() / jnp.abs(b).max())
    assert r < 1e-8
    assert int(it) < 200


def test_hex3d_online_step_paths(model3d):
    """make_online_step on 3D: dense and matrix-free paths reproduce the
    model solve + local quantities; batched-mu serving equals single."""
    from pylrbms_tpu.model import make_online_step
    _, d = model3d
    mu = 0.6
    U2 = d.solve({'diffusion': mu})
    nc, r, df = d.estimator.local_quantities(U2[None], {'diffusion': mu})
    ref_ind = np.asarray((nc + r + df)[0])
    for mf in (False, True):
        fn = make_online_step(d, tol=1e-10, maxiter=500, coarse_modes=4,
                              matrix_free=mf)
        U, ind = fn(jnp.asarray([1.0, mu]), jnp.asarray([1.0]),
                    {'diffusion': jnp.asarray([mu])})
        e1 = np.abs(np.asarray(U) - np.asarray(U2)).max() \
            / np.abs(np.asarray(U2)).max()
        e2 = np.abs(np.asarray(ind) - ref_ind).max() / np.abs(ref_ind).max()
        assert e1 < 1e-8 and e2 < 1e-9, (mf, e1, e2)
    fn = make_online_step(d, tol=1e-10, maxiter=500, coarse_modes=4)
    mus = np.asarray([0.3, 0.6, 1.0])
    thetas = jnp.asarray(np.stack([np.ones(3), mus], 1))
    Ub, _ = fn(thetas, jnp.ones((3, 1)), {'diffusion': jnp.asarray(mus[:, None])})
    U1, _ = fn(thetas[1], jnp.ones(1), {'diffusion': jnp.asarray([0.6])})
    assert np.abs(np.asarray(Ub[1]) - np.asarray(U1)).max() < 1e-11


def test_hex3d_mixed_precision_mf_solve():
    """The mixed-precision (f32 Krylov + f64 residual restarts) matrix-free
    path on 3D at moderate contrast."""
    from pylrbms_tpu.problems.spe10 import init_grid_and_problem_3d
    gpd = init_grid_and_problem_3d(
        {'num_subdomains': [2, 2, 2],
         'half_num_fine_elements_per_subdomain_and_dim': 1,
         'num_refinements': 1}, max_contrast=1e3)
    d, _ = discretize(gpd, lean=True)
    mu = {'switch': 1.0}
    U = d.solve(mu, inverse_options={'type': 'mf_pcg', 'precision': 1e-9,
                                     'mixed': True, 'coarse_space': 'modal',
                                     'coarse_modes': 4})
    A = d.op.assemble(d.theta(mu))
    b = d.rhs(mu)
    rr = float(jnp.abs(A.apply(U) - b).max() / jnp.abs(b).max())
    assert rr < 1e-7, rr


def test_hex3d_parabolic_vs_scipy_oracle():
    """3D implicit Euler (dense G = M + dt*A path incl. z-couplings) matches
    a step-by-step scipy splu oracle on the unblocked global matrix; the
    parabolic estimator runs on the trajectory."""
    import scipy.sparse as sp_
    import scipy.sparse.linalg as spla
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_parabolic_block_swipdg3d import (
        discretize as discretize_par)
    from pylrbms_tpu.la.block import to_scipy_csr
    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    nt = 10
    im, _ = discretize_par(gpd, T=1.0, nt=nt)
    mu = {'diffusion': 0.7}
    traj = im.solve(mu)
    st = im.stationary
    K, N = st.space.K, st.space.N
    A = to_scipy_csr(st.assemble(mu))
    Mm = np.asarray(im.mass)
    M = sp_.block_diag([sp_.csr_matrix(Mm[k]) for k in range(K)], format="csr")
    dt = 1.0 / nt
    lu = spla.splu((M + dt * A).tocsc())
    b = np.asarray(st.rhs(mu)).reshape(-1)
    u = np.zeros(K * N)
    for _n in range(nt):
        u = lu.solve(M @ u + dt * b)
    err = np.abs(np.asarray(traj[-1]).reshape(-1) - u).max() / np.abs(u).max()
    assert err < 1e-10, err
    out = im.estimate(traj, mu)
    eta = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(float(eta)) and float(eta) > 0


def test_hex3d_batched_corrector_matches_dense_patch(model3d):
    """The one-dispatch masked-PCG union patch solve (BatchedCorrector)
    equals the host dense 3x3x3-patch solver on 3D."""
    from pylrbms_tpu.ops.corrector import BatchedCorrector
    _, d = model3d
    mu = {'diffusion': 0.55}
    U0 = 0.3 * d.solve({'diffusion': 1.0})
    corr = BatchedCorrector(d)
    marked = [0, 3, 7]
    W = corr.solve(marked, mu, current_solution=U0, tol=1e-12, maxiter=2000)
    for i, ii in enumerate(marked):
        w_ref = d.solve_for_local_correction(ii, mu=mu, current_solution=U0,
                                             mode="residual")
        err = (np.abs(np.asarray(W[i]) - np.asarray(w_ref)).max()
               / max(np.abs(np.asarray(w_ref)).max(), 1e-300))
        assert err < 1e-8, (ii, err)


def test_hex3d_weak_greedy_and_residual_fom(model3d):
    """Weak greedy converges on 3D; the direct FOM-residual sweep criterion
    (the at-scale path, now dispatching to the 3D stencil) equals the
    Gramian form away from its noise floor."""
    from pylrbms_tpu.greedy import weak_greedy, batched_estimates, _stack_mus
    from pylrbms_tpu.reductor import LRBMSReductor
    _, d = model3d
    train = [{'diffusion': m} for m in np.linspace(0.1, 1.0, 6)]
    res = weak_greedy(d, train, target_error=1e-8, max_extensions=3)
    # measured: 1.08 -> 0.0129 in 3 extensions (84x)
    assert res.max_etas[-1] < 0.05 * res.max_etas[0], res.max_etas

    red = LRBMSReductor(d, order=0)
    red.extend_basis(np.asarray(d.solve({'diffusion': 1.0}), np.float64))
    rd = red.reduce()
    st = _stack_mus([d.parse_parameter(m) for m in (0.2, 0.6)])
    direct = np.asarray(batched_estimates(rd, st, criterion='residual_fom'))
    gram = np.asarray(batched_estimates(rd, st, criterion='residual'))
    np.testing.assert_allclose(direct, gram, rtol=1e-8)


def test_hex3d_certify_mode(model3d):
    """make_online_step(certify=True) on an f32 3D model: mixed-precision
    refinement polishes the solve to ~f64 accuracy."""
    from pylrbms_tpu.model import make_online_step
    gpd, d64 = model3d
    d32, _ = discretize(gpd, dtype=jnp.float32)
    fn = make_online_step(d32, tol=1e-6, maxiter=300, coarse_modes=4,
                          certify=True)
    mu = 0.6
    U, _ = fn(jnp.asarray([1.0, mu], jnp.float32),
              jnp.asarray([1.0], jnp.float32),
              {'diffusion': jnp.asarray([mu], jnp.float32)})
    Uref = d64.solve({'diffusion': mu})
    err = (np.abs(np.asarray(U, np.float64) - np.asarray(Uref)).max()
           / np.abs(np.asarray(Uref)).max())
    assert err < 1e-6, err


def test_hex3d_thermalblock_multiparameter():
    """3D thermal block (2x2x2 checkerboard, 8 independent parameters —
    Q = 8 affine components): solve, estimate, and ROM/FOM estimator parity
    on a random-parameter training set."""
    from pylrbms_tpu.problems.thermalblock3d import (
        init_grid_and_problem as init_tb3)
    gpd = init_tb3({'num_subdomains': [2, 2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    d, _ = discretize(gpd)
    assert d.op.Q == 8
    rng = np.random.default_rng(0)
    mu = {'diffusion': 0.1 + 0.9 * rng.random(8)}
    U = d.solve(mu)
    A = d.op.assemble(d.theta(mu))
    b = d.rhs(mu)
    assert float(jnp.abs(A.apply(U) - b).max() / jnp.abs(b).max()) < 1e-9
    red = LRBMSReductor(d, order=0)
    for _ in range(3):
        red.extend_basis(np.asarray(
            d.solve({'diffusion': 0.1 + 0.9 * rng.random(8)}), np.float64))
    rd = red.reduce()
    mu_t = {'diffusion': 0.1 + 0.9 * rng.random(8)}
    c = rd.solve(mu_t)
    e_rom = float(rd.estimate(c, mu_t))
    e_fom = float(d.estimate(rd.reconstruct(c), mu_t))
    assert abs(e_rom - e_fom) / e_fom < 1e-9


def test_hex3d_parabolic_solve_batch_matches_per_mu():
    """3D batched-mu trajectories (vmapped stencil scan with the z-coupling
    family; mass as the stencil family's first component) == per-mu
    solves."""
    from pylrbms_tpu.discretize_parabolic_block_swipdg3d import (
        discretize as discretize_par)
    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    im, _ = discretize_par(gpd, T=1.0, nt=5)
    mus = [im.parse_parameter({'diffusion': s}) for s in (0.3, 0.7, 1.0)]
    batch = np.asarray(im.solve_batch(mus))
    assert batch.shape[0] == 3
    for i, mu in enumerate(mus):
        ref = np.asarray(im.solve(mu))
        err = np.abs(batch[i] - ref).max() / max(np.abs(ref).max(), 1e-300)
        assert err < 1e-8, (i, err)
