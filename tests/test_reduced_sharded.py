"""Block-row-sharded reduced solve (the TP analog, VERDICT r4 #9):
``ReducedModel.solve_sharded`` over the virtual 8-device mesh must equal the
replicated dense solve at solver tolerance (<-> SURVEY §2.5 "block-row
sharding of the coupled reduced system")."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.reductor import LRBMSReductor


@pytest.fixture(scope="module")
def rd():
    cfg = {'num_subdomains': [4, 4],
           'half_num_fine_elements_per_subdomain_and_dim': 1,
           'num_refinements': 1}
    gpd = init_grid_and_problem(cfg)
    d, _ = discretize(gpd, dtype=jnp.float64)
    red = LRBMSReductor(d)
    # grow the bases past order-0 so the reduced system is non-trivial
    for m in (0.2, 0.7, 1.0):
        red.extend_basis(d.solve(d.parse_parameter([m])))
    return red.reduce()


def test_sharded_reduced_solve_matches_dense(rd):
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("k",))
    for m in (0.1, 0.55, 1.0):
        mu = rd.parse_parameter([m])
        c_ref = np.asarray(rd.solve(mu))
        c_sh = np.asarray(rd.solve_sharded(mu, mesh))
        rel = np.abs(c_sh - c_ref).max() / max(np.abs(c_ref).max(), 1e-300)
        assert rel < 1e-8, (m, rel)


def test_sharded_solve_feeds_estimator(rd):
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("k",))
    mu = rd.parse_parameter([0.4])
    c = rd.solve_sharded(mu, mesh)
    eta_sh = float(rd.estimate(c, mu))
    eta_ref = float(rd.estimate(rd.solve(mu), mu))
    assert abs(eta_sh - eta_ref) < 1e-8 * max(abs(eta_ref), 1e-300)
