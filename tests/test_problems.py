"""Solve + estimate smoke across every problem family (SURVEY §2.1 L9)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize

CFG = {'num_subdomains': [2, 2],
       'half_num_fine_elements_per_subdomain_and_dim': 1,
       'num_refinements': 1}


def _run(gpd, mu_val):
    d, _ = discretize(gpd)
    mu = d.parse_parameter(mu_val)
    U = d.solve(mu)
    assert bool(jnp.isfinite(U).all())
    eta, (nc, r, df), ind = d.estimate(U, mu, decompose=True)
    for v in (eta, nc, r, df, ind):
        assert bool(jnp.isfinite(jnp.asarray(v)).all())
    assert float(eta) > 0
    return d, U, float(eta)


def test_thermalblock():
    from pylrbms_tpu.problems.thermalblock import init_grid_and_problem
    gpd = init_grid_and_problem(CFG)
    d, U, eta = _run(gpd, [1.0, 0.5, 2.0, 0.8])
    # checkerboard coefficient layout: evaluating lambda at the four block
    # centers must pick out exactly one component each
    lam = gpd["lambda"]["functions"]
    centers = np.array([[-0.5, -0.5], [0.5, -0.5], [-0.5, 0.5], [0.5, 0.5]])
    vals = np.array([[float(np.asarray(lf(centers[i:i + 1]))[0]) for lf in lam]
                     for i in range(4)])
    assert np.allclose(vals.sum(axis=1), 1.0)
    assert np.allclose(sorted(vals.max(axis=0)), [1, 1, 1, 1])


def test_local_thermalblock():
    from pylrbms_tpu.problems.local_thermalblock import init_grid_and_problem
    gpd = init_grid_and_problem(CFG)
    _run(gpd, 1.2)


@pytest.mark.slow
def test_artificial_channels_elliptic():
    from pylrbms_tpu.problems.artificial_channels import init_grid_and_problem
    gpd = init_grid_and_problem(CFG)
    d, _ = discretize(gpd)
    mu = d.parse_parameter(0.3)
    mu["_t"] = 0.1
    U = d.solve(mu)
    assert bool(jnp.isfinite(U).all())


def test_non_parametric():
    from pylrbms_tpu.problems.non_parametric import init_grid_and_problem
    gpd = init_grid_and_problem(CFG)
    d, _ = discretize(gpd)
    U = d.solve({})
    # lambda == 1 => exact solution cos(pi x/2) cos(pi y/2)
    xn = d.space.node_coords_phys()
    exact = np.cos(0.5 * np.pi * xn[..., 0]) * np.cos(0.5 * np.pi * xn[..., 1])
    err = np.abs(np.asarray(U).reshape(exact.shape) - exact).max()
    assert err < 0.1


def test_spe10():
    from pylrbms_tpu.problems.spe10 import init_grid_and_problem, load_spe10_layer
    layer = load_spe10_layer(42)
    assert layer.shape == (220, 60)
    assert layer.min() > 0 and layer.max() / layer.min() > 1e3  # high contrast
    gpd = init_grid_and_problem(CFG)
    _run(gpd, 0.5)
