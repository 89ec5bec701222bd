#!/usr/bin/env python
"""Thread-pool dispatch test (<-> ``python/scripts/threadpool_test.py``,
which benchmarks GIL-released ISTL matvecs under a ``ThreadPoolExecutor``
and asserts thread-parallel results match, ``threadpool_test.py:54-65``).

Two TPU-native answers to the same question ("does intra-rank concurrency
work and agree with sequential execution?"):

1. *Thread-pool dispatch* — the literal analog: W Python threads each
   dispatch jitted matvecs through JAX concurrently (JAX dispatch is
   thread-safe and releases the GIL while the device computes); results
   must equal the sequential ones bit-for-bit.
2. *Batch width* — the idiomatic analog: one fused batched matvec
   (see ``batched_matvec_test.py``); on an accelerator this is the form
   that actually uses the chip, and the thread pool above mainly overlaps
   host work with device work.

CLI: N (vectors) S (subdomains/dim) M (half cells/subdomain) W (threads).
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def main(N=16, S=2, M=1, W=4):
    gpd = init_grid_and_problem({'num_subdomains': [S, S],
                                 'half_num_fine_elements_per_subdomain_and_dim': M,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    A = d.op.assemble(jnp.asarray([1.0, 0.5], d.dtype))
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=(d.space.K, d.space.N)), d.dtype)
          for _ in range(N)]

    mv = jax.jit(lambda A_, x: A_.apply(x))
    mv(A, xs[0]).block_until_ready()            # compile once

    t0 = time.perf_counter()
    seq = [np.asarray(mv(A, x)) for x in xs]
    t_seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=W) as pool:
        par = list(pool.map(lambda x: np.asarray(mv(A, x)), xs))
    t_par = time.perf_counter() - t0

    for a, b in zip(seq, par):                  # the reference's invariant
        assert np.array_equal(a, b), "thread-parallel result differs"
    print(f"threadpool_test: N={N} S={S} M={M} W={W}: sequential "
          f"{t_seq * 1e3:.1f} ms, {W}-thread pool {t_par * 1e3:.1f} ms, "
          "results identical")
    return t_seq, t_par


if __name__ == '__main__':
    main(*[int(a) for a in sys.argv[1:]])
