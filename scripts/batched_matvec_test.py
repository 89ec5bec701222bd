#!/usr/bin/env python
"""Throughput test of the block operator apply (<-> ``python/scripts/
threadpool_test.py``, which benchmarks GIL-released ISTL matvecs under a
thread pool and asserts thread-parallel results match).

On TPU the analog of intra-rank threading is *batch width*: we apply the
assembled block operator to a batch of vectors (one fused batched matvec)
and assert batched results equal per-vector results — same invariant, the
XLA way.  CLI: N (batch) S (subdomains/dim) M (cells/subdomain) W (warmup).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def main(N=8, S=2, M=1, W=1):
    gpd = init_grid_and_problem({'num_subdomains': [S, S],
                                 'half_num_fine_elements_per_subdomain_and_dim': M,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    A = d.op.assemble(jnp.asarray([1.0, 0.5], d.dtype))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(N, d.space.K, d.space.N)))

    apply_batched = jax.jit(A.apply)
    Y = apply_batched(X).block_until_ready()
    for _ in range(W):
        apply_batched(X).block_until_ready()
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        Y = apply_batched(X).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * N * d.space.K * d.space.N ** 2
    print(f'batched matvec: batch={N} dofs={d.space.K * d.space.N} '
          f'{dt * 1e3:.3f} ms/apply  {flops / dt / 1e9:.2f} GFLOP/s')

    # correctness: batched == per-vector
    for i in range(N):
        yi = A.apply(X[i])
        assert float(jnp.abs(yi - Y[i]).max()) < 1e-10 * float(jnp.abs(Y[i]).max() + 1e-30), \
            "batched apply must match per-vector apply"
    print('batched == per-vector: OK')


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
