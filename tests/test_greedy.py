"""Weak greedy: monotone-ish error decay, certified stop, batched estimates
match per-parameter estimates."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.greedy import weak_greedy, batched_estimates, _stack_mus
from pylrbms_tpu.reductor import LRBMSReductor


@pytest.fixture(scope="module")
def fom():
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    return d


def test_batched_estimates_match_sequential(fom):
    d = fom
    red = LRBMSReductor(d, order=0)
    red.extend_basis(d.solve(d.parse_parameter(1.0)))
    rd = red.reduce()
    mus = [d.parse_parameter(m) for m in (0.1, 0.4, 0.9)]
    etas = np.asarray(batched_estimates(rd, _stack_mus(mus)))
    for mu, eta in zip(mus, etas):
        ref = float(rd.estimate(rd.solve(mu), mu))
        assert eta == pytest.approx(ref, rel=1e-10)


def test_residual_norm_matches_true_residual(fom):
    d = fom
    red = LRBMSReductor(d, order=0)
    red.extend_basis(d.solve(d.parse_parameter(1.0)))
    rd = red.reduce()
    mu = d.parse_parameter(0.35)
    c = rd.solve(mu)
    r_proj = float(rd.residual_norm(c, mu))
    U = red.reconstruct(c)
    r_true = float(jnp.linalg.norm(
        (d.rhs(mu) - d.assemble(mu).apply(U)).reshape(-1)))
    assert r_proj == pytest.approx(r_true, rel=1e-8)


def test_weak_greedy_converges(fom):
    d = fom
    training = d.parameter_space.sample_uniformly(7)
    res = weak_greedy(d, training, target_error=1e-8, max_extensions=10,
                      criterion="residual")
    # residual surrogate decays hard (smooth 1-parameter problem)
    assert res.max_etas[-1] < 1e-6 * res.max_etas[0], res.max_etas
    # and the ROM reproduces the FOM at an unseen parameter
    mu = d.parse_parameter(0.55)
    U_rom = res.reductor.reconstruct(res.rd.solve(mu))
    U_fom = d.solve(mu)
    rel = float(jnp.abs(U_rom - U_fom).max() / jnp.abs(U_fom).max())
    assert rel < 1e-6, rel


def test_batched_estimates_sharded_over_training_set(fom):
    import jax
    from jax.sharding import Mesh
    d = fom
    red = LRBMSReductor(d, order=0)
    red.extend_basis(d.solve(d.parse_parameter(1.0)))
    rd = red.reduce()
    mus = [d.parse_parameter(m) for m in (0.1, 0.25, 0.4, 0.6, 0.8)]  # B=5, pad to 8
    stacked = _stack_mus(mus)
    ref = np.asarray(batched_estimates(rd, stacked, "residual"))
    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
    out = np.asarray(batched_estimates(rd, stacked, "residual", mesh=mesh))
    np.testing.assert_allclose(out, ref, rtol=1e-10)
    # the at-scale direct FOM-residual sweep shards the same way
    ref_fom = np.asarray(batched_estimates(rd, stacked, "residual_fom"))
    out_fom = np.asarray(batched_estimates(rd, stacked, "residual_fom",
                                           mesh=mesh))
    np.testing.assert_allclose(out_fom, ref_fom, rtol=1e-10)
    # batch SMALLER than the device count: the pad must tile, not slice
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("b",))
    small = _stack_mus([d.parse_parameter(m) for m in (0.15, 0.5, 0.95)])
    ref_s = np.asarray(batched_estimates(rd, small, "residual"))
    for crit in ("residual", "residual_fom"):
        out_s = np.asarray(batched_estimates(rd, small, crit, mesh=mesh8))
        ref_c = ref_s if crit == "residual" else np.asarray(
            batched_estimates(rd, small, crit))
        np.testing.assert_allclose(out_s, ref_c, rtol=1e-10)


def test_initial_rb_order_one(fom):
    d = fom
    red = LRBMSReductor(d, order=1)
    assert all(s == 4 for s in red.basis_sizes())   # 1, x, y, xy per subdomain
    rd = red.reduce()
    mu = d.parse_parameter(0.5)
    eta1 = float(rd.estimate(rd.solve(mu), mu))
    red0 = LRBMSReductor(d, order=0)
    eta0 = float(red0.reduce().estimate(red0.reduce().solve(mu), mu))
    assert eta1 < eta0   # richer initial basis -> smaller estimate


def test_greedy_checkpoint_resume(tmp_path):
    """Interrupt-and-resume reproduces the uninterrupted run exactly."""
    import numpy as np
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    training = d.parameter_space.sample_uniformly(4)
    ref = weak_greedy(d, training, target_error=1e-10, max_extensions=4)
    ckpt = str(tmp_path / "greedy_ckpt")
    # "interrupted" run: stop after 2 extensions, checkpointing each
    part = weak_greedy(d, training, target_error=1e-10, max_extensions=2,
                       checkpoint_path=ckpt)
    # resume to the full budget
    res = weak_greedy(d, training, target_error=1e-10, max_extensions=4,
                      checkpoint_path=ckpt, resume=True)
    assert res.rd.solution_dim == ref.rd.solution_dim
    assert np.allclose(res.max_etas[-1], ref.max_etas[-1], rtol=1e-8)
    for b1, b2 in zip(res.reductor.bases, ref.reductor.bases):
        assert b1.shape == b2.shape
        assert np.allclose(b1, b2, atol=1e-10)


@pytest.mark.slow
def test_pod_greedy_parabolic():
    """POD-greedy for the parabolic family (no reference counterpart — its
    ParabolicLRBMSReductor is a pass stub): the ROM trajectory converges to
    the FOM at unseen parameters."""
    from pylrbms_tpu.problems.artificial_channels import \
        init_grid_and_problem as channels
    from pylrbms_tpu.discretize_parabolic_block_swipdg import \
        discretize as discretize_parabolic
    from pylrbms_tpu.greedy import pod_greedy
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=1.0, nt=6)
    training = im.stationary.parameter_space.sample_uniformly(3)
    res = pod_greedy(im, training, target_error=1e-6, max_extensions=4,
                     pod_modes=2)
    assert res.fom_solves >= 3
    mu = im.parse_parameter(0.33)          # unseen
    U = np.asarray(im.solve(mu))
    Ur = np.asarray(res.reductor.reconstruct(res.rd.solve(mu)))
    rel = np.linalg.norm(U - Ur) / np.linalg.norm(U)
    assert rel < 0.02, rel


def test_weak_greedy_sweep_sharded_matches_unsharded(fom):
    """weak_greedy(mesh=...) shards the surrogate sweep (the measured
    per-iteration bound at SPE10 scale) over the device mesh; the greedy
    trajectory must be identical."""
    import jax
    from jax.sharding import Mesh
    d = fom
    training = d.parameter_space.sample_uniformly(7)
    ref = weak_greedy(d, training, target_error=1e-8, max_extensions=4,
                      criterion="residual")
    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
    out = weak_greedy(d, training, target_error=1e-8, max_extensions=4,
                      criterion="residual", mesh=mesh)
    assert [tuple(np.asarray(m["diffusion"]).ravel()) for m in out.chosen_mus] \
        == [tuple(np.asarray(m["diffusion"]).ravel()) for m in ref.chosen_mus]
    np.testing.assert_allclose(out.max_etas, ref.max_etas, rtol=1e-9)


def test_pod_greedy_checkpoint_resume(tmp_path):
    """pod_greedy checkpoint/resume: an interrupted run continues from the
    saved bases without redoing FOM trajectory solves, ending bit-identical
    to the uninterrupted run."""
    from pylrbms_tpu.problems.artificial_channels import \
        init_grid_and_problem as channels
    from pylrbms_tpu.discretize_parabolic_block_swipdg import \
        discretize as discretize_parabolic
    from pylrbms_tpu.greedy import pod_greedy
    gpd = channels({'num_subdomains': [2, 2],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    im, _ = discretize_parabolic(gpd, T=0.5, nt=4)
    training = im.stationary.parameter_space.sample_uniformly(3)
    p = str(tmp_path / "podck")
    ref = pod_greedy(im, training, target_error=1e-12, max_extensions=2,
                     pod_modes=1)
    part = pod_greedy(im, training, target_error=1e-12, max_extensions=1,
                      pod_modes=1, checkpoint_path=p)
    assert part.fom_solves == 1
    full = pod_greedy(im, training, target_error=1e-12, max_extensions=2,
                      pod_modes=1, checkpoint_path=p, resume=True)
    assert full.fom_solves == 1          # only the second extension re-ran
    for b1, b2 in zip(full.reductor.bases, ref.reductor.bases):
        assert b1.shape == b2.shape
        assert np.allclose(b1, b2, atol=1e-12)
    assert np.allclose(full.max_etas, ref.max_etas, rtol=1e-10)
