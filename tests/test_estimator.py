"""Estimator properties: exactness limits, convergence rates, reliability.

Mirrors the reference's validation strategy (SURVEY.md §4): golden-value
magnitudes + EOC behaviour of the OS2015 indicators
(``scripts/linearelliptic_block_swipdg_decomp.py:41-43``,
``scripts/OS2015_convergence_study.py``).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.ops.spaces import BlockDGSpace
from pylrbms_tpu.ops.oswald import OswaldOperator
from pylrbms_tpu.grid import make_grid


def _solve_and_estimate(nref):
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': nref})
    d, _ = discretize(gpd)
    mu = d.parse_parameter(1.)
    U = d.solve(mu)
    eta, (nc, r, df), ind = d.estimate(U, mu, decompose=True)
    # error vs exact solution u = cos(pi x/2) cos(pi y/2) in broken H1-ish L2
    xn = d.space.node_coords_phys()
    exact = np.cos(0.5 * np.pi * xn[..., 0]) * np.cos(0.5 * np.pi * xn[..., 1])
    err = np.asarray(U).reshape(exact.shape) - exact
    l2_err = np.sqrt(np.einsum("kn,knm,km->", err.reshape(d.space.K, -1),
                               np.asarray(d.products['l2']),
                               err.reshape(d.space.K, -1)))
    return d, float(eta), (np.linalg.norm(nc), np.linalg.norm(r), np.linalg.norm(df)), l2_err


@pytest.mark.slow
def test_indicators_converge_at_expected_rate():
    # squared local quantities must scale ~h^2 (eta_* themselves O(h))
    _, eta1, (nc1, r1, df1), e1 = _solve_and_estimate(1)
    _, eta2, (nc2, r2, df2), e2 = _solve_and_estimate(2)
    for a, b in ((nc1, nc2), (r1, r2), (df1, df2)):
        ratio = a / b
        assert 3.0 < ratio < 5.5, f"squared-indicator ratio {ratio} not ~4"
    # 'eta' as-executed by the reference aggregates *squared* local
    # quantities (estimators.py:99-102), hence ~h^2:
    assert 3.0 < eta1 / eta2 < 5.5, "eta (as-executed) not ~h^2"
    assert 3.0 < e1 / e2 < 5.0, "L2 error not second order"


def test_estimator_reliability():
    d, eta, _, l2_err = _solve_and_estimate(1)
    # eta must dominate the (scaled) true error
    assert eta > l2_err
    assert eta / max(l2_err, 1e-300) < 200.0   # and not be absurdly pessimistic


def test_oswald_projection_and_zero_bc():
    grid = make_grid(((-1, -1), (1, 1)), [2, 2], 1, num_refinements=1)
    space = BlockDGSpace(grid, order=1)
    osw = OswaldOperator(space)
    # a conforming function vanishing on the boundary: nodal interp of coscos
    xn = space.node_coords_phys()
    u = jnp.asarray(np.cos(0.5 * np.pi * xn[..., 0]) * np.cos(0.5 * np.pi * xn[..., 1]))
    u = u.reshape(space.K, space.N)
    w = osw.apply(u)
    assert float(jnp.abs(w).max()) < 1e-13, "conforming zero-BC function must have zero witness"
    # idempotence: I_os of a conforming function is itself
    v = osw.interpolate(u)
    assert float(jnp.abs(v - u).max()) < 1e-13
    # a random DG function: the interpolant must be conforming (witness of
    # interpolant is zero)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(space.K, space.N)))
    iz = osw.interpolate(z)
    assert float(jnp.abs(osw.interpolate(iz) - iz).max()) < 1e-12


def test_flux_reconstruction_divergence_identity():
    """div(t) is elementwise constant; A_div must reproduce it exactly:
    for any RT vector, the DG representation of div equals the direct
    face-sum formula."""
    from pylrbms_tpu.ops.products import divergence_matrix
    grid = make_grid(((-1, -1), (1, 1)), [2, 2], 1, num_refinements=1)
    space = BlockDGSpace(grid, order=1)
    A_div = np.asarray(divergence_matrix(space))
    idx, sign, _ = space.tri_face_dofs()
    rng = np.random.default_rng(1)
    t = rng.normal(size=space.N_rt)
    div_dg = (A_div @ t).reshape(space.s, space.s, space.T, space.nb)
    area_T = space.hx * space.hy / 2
    expected = np.einsum("yxte,te->yxt", t[idx], sign) / area_T
    assert np.max(np.abs(div_dg - expected[..., None])) < 1e-12


def test_positive_form_quantities_match_matrix_form():
    import jax.numpy as jnp
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    mu = d.parse_parameter(0.7)
    U = d.solve(mu)[None]
    est = d.estimator
    nc_m, r_m, df_m = est.local_quantities(U, mu)
    nc_p, r_p, df_p = est.local_quantities_positive(U, mu)
    for a, b, name in ((nc_m, nc_p, "nc"), (r_m, r_p, "r"), (df_m, df_p, "df")):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-300))
        assert rel < 1e-9, (name, rel)
    # all positive-form values are non-negative by construction
    assert float(jnp.minimum(jnp.minimum(nc_p.min(), r_p.min()), df_p.min())) >= 0


def test_alpha_gamma_quirk_flag():
    """alpha: reference early-return quirk (first component only,
    estimators.py:121) vs the corrected min-over-components variant."""
    from pylrbms_tpu.estimators import EllipticEstimator
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 0}, mu_bar=0.5, mu_hat=0.5)
    d, _ = discretize(gpd)
    est = d.estimator
    mu = d.parse_parameter(0.25)
    # OS2015 coefficients: theta = (1, mu); mu_bar = 0.5
    # ratios = (1/1, 0.25/0.5) = (1.0, 0.5)
    assert float(est.alpha(mu, est.data.mu_bar)) == pytest.approx(1.0)   # quirk
    est_fixed = EllipticEstimator(est.data, alpha_first_component_only=False)
    assert float(est_fixed.alpha(mu, est.data.mu_bar)) == pytest.approx(0.5)
    assert float(est.gamma(mu, est.data.mu_bar)) == pytest.approx(1.0)


def test_positive_form_f32_matches_f64():
    # the at-scale accelerator policy (estimate() casts lean-model U to f32
    # before the positive-form integrals, estimators.py) relies on the
    # positive forms being cancellation-free: the f32 evaluation must agree
    # with f64 to f32 quadrature accuracy, including the f32-rebuilt flux
    # reconstruction tables (_flux_for)
    import jax.numpy as jnp
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd, lean=True)
    mu = d.parse_parameter(0.7)
    U = d.solve(mu)[None]
    est = d.estimator
    q64 = est.local_quantities_positive(U, mu)
    q32 = est.local_quantities_positive(U.astype(jnp.float32), mu)
    assert est._flux32 is not None          # the f32 tables were rebuilt
    assert all(q.dtype == jnp.float32 for q in q32)
    for a, b, name in zip(q64, q32, ("nc", "r", "df")):
        rel = float(jnp.abs(a - b.astype(jnp.float64)).max()
                    / (jnp.abs(a).max() + 1e-300))
        assert rel < 5e-5, (name, rel)
