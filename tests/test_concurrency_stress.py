"""Concurrency stress (SURVEY.md §5.2 race detection — beyond the
reference, whose only concurrency evidence is one threadpool matvec
comparison, ``threadpool_test.py:60-65``): many threads hammer the shared
mutable surfaces at once — solve + solution cache, lazy mf-operator init,
background prepare_solver, reduce + incremental image cache — and every
result must equal the single-threaded answer bit-for-bit.  Known past races
(prepare_solver freeze, mf lazy init) have targeted tests in
tests/test_mor.py / tests/test_matrixfree.py; this one is the broadband
version."""
import threading

import numpy as np
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize


@pytest.fixture(scope="module")
def model():
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, data = discretize(gpd)
    return d, data


def _run_threads(n, fn):
    errors = []

    def wrap(i):
        try:
            fn(i)
        except BaseException as e:          # noqa: BLE001
            errors.append((i, repr(e)))

    ts = [threading.Thread(target=wrap, args=(i,)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors


def test_concurrent_solves_with_cache_match_serial(model):
    d, _ = model
    mus = [0.2, 0.4, 0.6, 0.8, 1.0]
    expect = {m: np.asarray(d.solve({'diffusion': m})) for m in mus}
    d.enable_caching()
    try:
        results = {}
        lock = threading.Lock()

        def work(i):
            m = mus[i % len(mus)]
            U = np.asarray(d.solve({'diffusion': m}))
            with lock:
                results.setdefault(m, []).append(U)

        _run_threads(10, work)
        for m, Us in results.items():
            for U in Us:
                np.testing.assert_allclose(U, expect[m], rtol=1e-12,
                                           atol=1e-14)
    finally:
        d.disable_caching()


def test_concurrent_estimates_and_mf_init(model):
    """The lazy mf-operator init and the estimator share the model across
    threads; estimates must be identical and the stencil operator a single
    object."""
    d, _ = model
    mu = d.parse_parameter(0.5)
    U = d.solve(mu)
    ref = float(d.estimate(U, mu))
    vals, sops = [None] * 8, [None] * 8

    def work(i):
        sops[i] = d.mf_operator()           # lazy init race (lock-guarded)
        vals[i] = float(d.estimate(U, mu))

    _run_threads(8, work)
    assert all(v == ref for v in vals), (vals, ref)
    assert all(s is sops[0] for s in sops), "mf_operator must init once"


def test_concurrent_reduce_extend_serialized(model):
    """Reductor: concurrent reduce() calls (as the enrichment loop's
    prefetch thread and the foreground both issue) must produce the
    single-threaded reduced operators."""
    from pylrbms_tpu.reductor import LRBMSReductor
    d, data = model
    red = LRBMSReductor(d, products=data['local_energy_dg_product'], order=0)
    for v in (0.3, 1.0):
        red.extend_basis(d.solve({'diffusion': v}))
    rd_ref = red.reduce()
    outs = [None] * 6

    def work(i):
        outs[i] = red.reduce()

    _run_threads(6, work)
    for rd in outs:
        np.testing.assert_allclose(np.asarray(rd.A_red),
                                   np.asarray(rd_ref.A_red),
                                   rtol=1e-13, atol=1e-15)
        c1 = rd.solve({'diffusion': 0.55})
        c2 = rd_ref.solve({'diffusion': 0.55})
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=1e-12, atol=1e-14)
