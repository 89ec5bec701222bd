"""Parabolic path, prolongation exactness, EOC harness smoke."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.grid import make_grid
from pylrbms_tpu.ops.spaces import BlockDGSpace
from pylrbms_tpu.ops.prolong import prolong
from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
from pylrbms_tpu.problems.artificial_channels import init_grid_and_problem as channels
from pylrbms_tpu.discretize_parabolic_block_swipdg import discretize as discretize_parabolic
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize as discretize_elliptic


def test_prolongation_is_exact_embedding():
    coarse_grid = make_grid(((-1, -1), (1, 1)), [2, 2], 1, num_refinements=0)
    fine_grid = make_grid(((-1, -1), (1, 1)), [2, 2], 1, num_refinements=2)
    coarse = BlockDGSpace(coarse_grid, order=1)
    fine = BlockDGSpace(fine_grid, order=2)
    rng = np.random.default_rng(3)
    Uc = jnp.asarray(rng.normal(size=(coarse.K, coarse.N)))
    Uf = prolong(coarse, Uc, fine)
    # exact embedding => L2 norms agree across levels
    from pylrbms_tpu.ops import assembly as asm
    Mc = asm.volume_mass(coarse)
    Mf = asm.volume_mass(fine)
    nc = float(jnp.einsum("kn,knm,km->", Uc, Mc, Uc))
    nf = float(jnp.einsum("kn,knm,km->", Uf, Mf, Uf))
    assert abs(nc - nf) < 1e-12 * max(abs(nc), 1.0)


def test_implicit_euler_matches_numpy_reference():
    gpd = os2015({'num_subdomains': [2, 2],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 1})
    im, data = discretize_parabolic(gpd, T=0.5, nt=8)
    mu = im.parse_parameter(0.7)
    traj = np.asarray(im.solve(mu))
    # independent numpy implicit Euler on the dense global system
    st = im.stationary
    A = np.asarray(st.assemble(mu).to_dense())
    b = np.asarray(st.rhs(mu)).reshape(-1)
    import scipy.linalg as sla
    K, N = st.space.K, st.space.N
    M = sla.block_diag(*[np.asarray(st.products['l2'][k]) for k in range(K)])
    dt = 0.5 / 8
    u = np.zeros(K * N)
    G = M + dt * A
    for n in range(8):
        u = np.linalg.solve(G, M @ u + dt * b)
        err = np.abs(traj[n + 1].reshape(-1) - u).max()
        assert err < 1e-10, f"step {n}: implicit Euler mismatch {err}"


def test_parabolic_mf_trajectory_matches_dense():
    """The matrix-free at-scale path (mass as an extra affine stencil
    component, warm-started per-step PCG in one jitted scan) reproduces the
    dense implicit-Euler trajectory, including a time-dependent rhs."""
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=0.5, nt=6)
    mu = im.parse_parameter({'switch': 0.4})
    ref = np.asarray(im.solve(mu))
    mf = np.asarray(im._solve_mf(mu, 0.5 / 6))
    err = np.abs(ref - mf).max() / max(np.abs(ref).max(), 1e-300)
    assert err < 1e-8, err


def test_parabolic_mf_two_level_matches_dense():
    """The frozen two-level coarse on G = M + dt A (the at-scale parabolic
    preconditioner; measured 415 -> ~95 ms/step at the 98k SPE10 config)
    changes only the iteration path, not the trajectory."""
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=0.5, nt=6)
    mu = im.parse_parameter({'switch': 0.4})
    ref = np.asarray(im.solve(mu))
    mf = np.asarray(im._solve_mf(mu, 0.5 / 6, two_level=True,
                                 coarse_modes=4))
    err = np.abs(ref - mf).max() / max(np.abs(ref).max(), 1e-300)
    assert err < 1e-8, err
    # frozen at the first mu: a second parameter reuses the coarse pair
    assert ("parab_precond", 0.5 / 6, "harvested", 4) in \
        im.stationary._mf_jit_cache
    mu2 = im.parse_parameter({'switch': 0.9})
    ref2 = np.asarray(im.solve(mu2))
    mf2 = np.asarray(im._solve_mf(mu2, 0.5 / 6, two_level=True,
                                  coarse_modes=4))
    err2 = np.abs(ref2 - mf2).max() / max(np.abs(ref2).max(), 1e-300)
    assert err2 < 1e-8, err2


@pytest.mark.parametrize("gt", ["quad", "crisscross"])
def test_parabolic_mf_other_grid_families(gt):
    """mass_stencil (and hence the mf parabolic path) is grid-family
    generic: Q1 rectangles and the parity-split crisscross triangulation."""
    gpd = os2015({'num_subdomains': [2, 2],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 1, 'grid_type': gt})
    im, _ = discretize_parabolic(gpd, T=0.4, nt=4)
    mu = im.parse_parameter(0.7)
    ref = np.asarray(im.solve(mu))
    mf = np.asarray(im._solve_mf(mu, 0.4 / 4))
    err = np.abs(ref - mf).max() / max(np.abs(ref).max(), 1e-300)
    assert err < 1e-8, err


def test_parabolic_reaches_steady_state():
    gpd = os2015({'num_subdomains': [2, 2],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=50.0, nt=60)
    mu = im.parse_parameter(1.0)
    traj = im.solve(mu)
    U_stat = im.stationary.solve(mu)
    rel = float(jnp.abs(traj[-1] - U_stat).max() / jnp.abs(U_stat).max())
    assert rel < 1e-5, f"parabolic solution must approach the elliptic one, rel={rel}"


@pytest.mark.slow
def test_parabolic_estimator_runs_on_channels():
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=1.0, nt=5)
    mu = im.parse_parameter(0.5)
    traj = im.solve(mu)
    assert bool(jnp.isfinite(traj).all())
    est, (nc, r, df, rt, tdnc) = im.estimate(traj, mu)
    for name, v in (("est", est), ("nc", nc), ("r", r), ("df", df),
                    ("rt", rt), ("tdnc", tdnc)):
        assert bool(jnp.isfinite(jnp.asarray(v)).all()), f"{name} not finite"
    assert float(est) > 0


@pytest.mark.slow
def test_stationary_eoc_study_smoke(capsys):
    from pylrbms_tpu.EOC import StationaryEocStudy, default_refine
    study = StationaryEocStudy(
        os2015,
        lambda gpd: discretize_elliptic(gpd),
        {'num_subdomains': [2, 2],
         'half_num_fine_elements_per_subdomain_and_dim': 1,
         'num_refinements': 0},
        default_refine, mu=1, p_ref=2, max_levels=1)
    data = study.run(("h", "elliptic_mu_bar", "eta_nc", "eta_df", "eta"))
    out = capsys.readouterr().out
    assert "EOC" in out
    # elliptic-norm EOC ~ 1 (first order in the energy norm for P1)
    n0 = data[0]["norm"]["elliptic_mu_bar"]
    n1 = data[1]["norm"]["elliptic_mu_bar"]
    rate = math.log(n1 / n0) / math.log(0.5)
    assert 0.7 < rate < 1.5, f"elliptic norm EOC {rate}"


def test_paper_convention_eoc_first_order_and_constant_efficiency():
    """OS2015 paper-table shape (VERDICT round-1 item 3): with
    ``paper_convention`` (unsquared locals) the indicators are first order
    in h and the estimator efficiency is level-constant — the shape of
    OS2015 p. A2885 Table 1 (full table:
    docs/results/OS2015_convergence_study_paper.txt)."""
    from pylrbms_tpu.EOC import StationaryEocStudy, default_refine
    study = StationaryEocStudy(
        os2015,
        lambda gpd: discretize_elliptic(gpd),
        # start at s=2 — the s=1 level is pre-asymptotic for eta_nc
        # (EOC 0.56; from s=2 on the measured slopes are 0.96-1.03,
        # docs/results/OS2015_convergence_study_paper.txt)
        {'num_subdomains': [2, 2],
         'half_num_fine_elements_per_subdomain_and_dim': 1,
         'num_refinements': 1},
        default_refine, mu=1, p_ref=2, max_levels=1,
        paper_convention=True)
    data = study.run(("h", "elliptic_mu_bar", "eta_nc", "eta_r", "eta_df",
                      "eta"))
    for ind in ("eta_nc", "eta_r", "eta_df"):
        rate = math.log(data[1]["indicator"][ind]
                        / data[0]["indicator"][ind]) / math.log(0.5)
        assert 0.7 < rate < 1.4, f"{ind} paper-mode EOC {rate} not ~1"
    effs = [data[lvl]["norm"]["elliptic_mu_bar"]
            / data[lvl]["estimate"]["eta"] for lvl in (0, 1)]
    assert abs(effs[1] / effs[0] - 1.0) < 0.25, f"efficiency not constant: {effs}"
    assert all(e < 1.0 for e in effs), "eta must dominate the energy error"


@pytest.mark.slow
def test_projected_parabolic_rom_estimate_matches_reconstruction():
    from pylrbms_tpu.reductor import ParabolicLRBMSReductor
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=1.0, nt=4)
    mu = im.parse_parameter(0.5)
    U = im.solve(mu)
    red = ParabolicLRBMSReductor(im.stationary)
    red.extend_basis(np.asarray(U))
    rd = red.reduce().attach_instationary(im)
    c = rd.solve(mu)
    est_p, parts_p = rd.estimate(c, mu, projected=True)
    est_r, parts_r = rd.estimate(c, mu, projected=False)
    assert float(est_p) == pytest.approx(float(est_r), rel=1e-8)
    for a, b in zip(parts_p, parts_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-12)


@pytest.mark.slow
def test_parabolic_adaptive_enrichment_converges_to_fom():
    """Online adaptive enrichment on the parabolic ROM (beyond the
    reference): starting from the order-0 basis, implicit-Euler-defect
    corrector extensions drive the ROM trajectory to the FOM one, and the
    projected parabolic estimate converges to the FOM certification floor
    (the estimator is floored by the discretization error — it does NOT go
    to zero; for the constants-only start it under-reports, so it
    approaches the floor from below)."""
    from pylrbms_tpu.reductor import ParabolicLRBMSReductor
    from pylrbms_tpu.online_enrichment import ParabolicAdaptiveEnrichment
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=1.0, nt=4)
    mu = im.parse_parameter(0.5)
    U = np.asarray(im.solve(mu))
    eta_fom = float(im.estimate(U, mu)[0])
    red = ParabolicLRBMSReductor(im.stationary)     # order-0 initial basis
    rd = red.reduce().attach_instationary(im)
    etas, errs = [], []
    loop = ParabolicAdaptiveEnrichment(
        im, red, rd, target_error=0.0, marking_doerfler_theta=0.9)

    def cb(rd_, c_, mu_, m):
        etas.append(m["eta"])
        errs.append(float(np.abs(np.asarray(loop.reductor.reconstruct(c_))
                                 - U).max() / np.abs(U).max()))

    c, rd, red = loop.solve(mu, enrichment_steps=6, callback=cb)
    assert len(etas) >= 5
    # the ROM trajectory converges to the FOM trajectory
    assert errs[-1] < 0.2 * errs[0], errs
    assert errs[-1] < 0.15, errs
    # the estimate converges to the FOM certification floor
    assert abs(etas[-1] / eta_fom - 1.0) < 0.3, (etas, eta_fom)


def test_parabolic_fom_solve_batch_matches_per_mu():
    """Batched-mu parabolic trajectories (B implicit-Euler scans in ONE
    vmapped dispatch, preconditioner stream shared across the batch) == the
    per-mu solves — the parabolic serving / POD-greedy training-sweep shape
    (the reference factorizes per mu, ``ImplicitEulerTimeStepper``)."""
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=0.5, nt=6)
    mus = [im.parse_parameter({'switch': s}) for s in (0.2, 0.5, 0.9)]
    batch = np.asarray(im.solve_batch(mus))
    assert batch.shape[0] == 3
    for i, mu in enumerate(mus):
        ref = np.asarray(im.solve(mu))
        err = np.abs(batch[i] - ref).max() / max(np.abs(ref).max(), 1e-300)
        assert err < 1e-8, (i, err)
    # exact per-mu block-Jacobi factors: same trajectories, different
    # iteration paths
    exact = np.asarray(im.solve_batch(mus, shared_preconditioner=False))
    err = np.abs(exact - batch).max() / np.abs(batch).max()
    assert err < 1e-8, err


def test_parabolic_rom_batch_matches_per_mu():
    """Reduced batched trajectories + batched projected estimates == the
    per-mu reduced solve/estimate: the POD-greedy sweep runs as TWO jitted
    dispatches."""
    from pylrbms_tpu.reductor import ParabolicLRBMSReductor
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=0.5, nt=6)
    mu0 = im.parse_parameter({'switch': 0.5})
    traj = np.asarray(im.solve(mu0))
    red = ParabolicLRBMSReductor(im.stationary)
    red.extend_basis(traj[1::2])
    rd = red.reduce().attach_instationary(im)
    mus = [im.parse_parameter({'switch': s}) for s in (0.3, 0.5, 0.8)]
    cs = rd.solve_batch(mus)
    etas = np.asarray(rd.estimate_batch(cs, mus))
    cs = np.asarray(cs)
    for i, mu in enumerate(mus):
        c = np.asarray(rd.solve(mu))
        assert np.abs(cs[i] - c).max() < 1e-10 * max(1.0, np.abs(c).max())
        e, _ = rd.estimate(jnp.asarray(c), mu, projected=True)
        assert abs(etas[i] - float(e)) < 1e-8 * max(1.0, abs(float(e))), \
            (i, etas[i], float(e))
