"""The measured full host greedy iteration (reference_impl/greedy_np.py)
runs the IDENTICAL weak-greedy algorithm as the device path: surrogate
maxima and selected parameters must agree (<-> bench.py's
greedy_vs_host_full leg; reference pipeline
/root/reference/python/scripts/online_adaptive_lrbms.py phases 2-3)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.spe10 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.la.block import to_scipy_csr
from pylrbms_tpu.greedy import weak_greedy
from pylrbms_tpu.reference_impl.greedy_np import host_weak_greedy


@pytest.fixture(scope="module")
def model():
    cfg = {'num_subdomains': [4, 4],
           'half_num_fine_elements_per_subdomain_and_dim': 2,
           'num_refinements': 1}
    gpd = init_grid_and_problem(cfg, raster=(4, 4), raster_mode="nearest",
                                max_contrast=1e3)
    d, _ = discretize(gpd, dtype=jnp.float64)
    Q = d.op.A_diag.shape[0]
    A_q = [to_scipy_csr(d.op.assemble(jnp.asarray(np.eye(Q)[q])))
           .astype(np.float64) for q in range(Q)]
    b0 = np.asarray(d.rhs(d.parse_parameter([1.0])), np.float64).reshape(-1)
    return d, A_q, b0


def test_host_greedy_matches_device(model):
    d, A_q, b0 = model
    training = d.parameter_space.sample_uniformly(6)
    res = weak_greedy(d, training, target_error=1e-12, max_extensions=3)
    host = host_weak_greedy(d, A_q, training, n_iter=3, b0=b0)
    dev = np.asarray(res.max_etas[:3])
    hst = np.asarray(host.max_etas[:3])
    rel = np.abs(dev - hst) / np.maximum(np.abs(dev), 1e-300)
    assert (rel < 1e-6).all(), rel
    # same parameters selected, all four phases timed
    dev_chosen = [float(next(iter(m.values()))[0]) for m in res.chosen_mus]
    hst_chosen = [float(next(iter(d.parse_parameter(training[i]).values()))[0])
                  for i in host.chosen_idx]
    assert dev_chosen[:len(hst_chosen)] == pytest.approx(hst_chosen)
    for ph in host.phase_s:
        assert set(ph) == {"sweep", "snapshot", "gs", "projection"}
        assert all(v >= 0 for v in ph.values())
    assert host.extras["symmetric"]
