"""Chunked-CG control flow (la/krylov.py): chunk>1 must reproduce the
plain while-loop CG bitwise (select-frozen tail) and report the same
iteration count."""
import numpy as np
import jax.numpy as jnp

from pylrbms_tpu.la.krylov import pcg_chunked


def _sys(n=300, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    lam = np.linspace(1.0, 50.0, n)
    A = jnp.asarray((Q * lam) @ Q.T)
    b = jnp.asarray(rng.normal(size=n))
    d = jnp.asarray(1.0 / np.diag(np.asarray(A)))
    return A, b, d


def test_chunked_equals_plain():
    A, b, d = _sys()
    mv = lambda v: A @ v
    M = lambda r: d * r
    x1, it1 = pcg_chunked(mv, M, b, 1e-10, 500, chunk=1)
    for ch in (4, 16, 64):
        x2, it2 = pcg_chunked(mv, M, b, 1e-10, 500, chunk=ch)
        assert int(it2) == int(it1)
        np.testing.assert_array_equal(np.asarray(x2), np.asarray(x1))


def test_chunked_warm_start_and_maxiter():
    A, b, d = _sys(seed=3)
    mv = lambda v: A @ v
    M = lambda r: d * r
    x_full, _ = pcg_chunked(mv, M, b, 1e-12, 1000, chunk=8)
    # warm start from the solution: 0 iterations
    x0, it0 = pcg_chunked(mv, M, b, 1e-10, 500, x0=x_full, chunk=8)
    assert int(it0) == 0
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x_full))
    # maxiter cap respected
    _, itc = pcg_chunked(mv, M, b, 1e-14, 7, chunk=4)
    assert int(itc) <= 8          # one chunk may overshoot by < chunk
