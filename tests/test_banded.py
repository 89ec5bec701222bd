"""Banded (static-diagonal) operator: algebraic equality with the block views.

The structured mesh makes every SWIPDG coupling a fixed flattened-index
diagonal (ops/banded.py) — the monolithic-CSR-view analog of the reference
(``discretize_elliptic_block_swipdg.py:439-473``) in TPU-friendly layout.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.ops.banded import banded_operator


@pytest.mark.parametrize("gt,subs,half", [
    ("alu", [3, 2], 1),
    ("yasp", [3, 2], 1),
    ("alu", [1, 1], 2),     # monolithic: no interface strips
])
def test_banded_apply_equals_dense(gt, subs, half):
    cfg = {"num_subdomains": subs,
           "half_num_fine_elements_per_subdomain_and_dim": half,
           "grid_type": gt}
    gpd = init_grid_and_problem(cfg, mu_bar=1.0, mu_hat=1.0)
    m, data = discretize(gpd)
    sp = data["space"]
    bop = banded_operator(sp, m.op)
    for mu_v in (0.3, 1.0):
        mu = {"diffusion": mu_v}
        A = m.assemble(mu)
        bands = bop.assemble(m.theta(mu))
        x = jnp.asarray(np.random.RandomState(7).randn(2, sp.K, sp.N))
        y_d = A.apply(x)
        y_b = bop.apply(bands, x)
        assert float(jnp.abs(y_d - y_b).max()) <= 1e-12 * float(jnp.abs(y_d).max())
