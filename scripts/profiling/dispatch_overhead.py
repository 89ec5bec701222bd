#!/usr/bin/env python
"""Single-query latency decomposition (VERDICT r3 weak #6): the headline
``single_query_ms`` (~35 ms, flat r01->r03) is wall = host->chip round-trip
+ device compute on the remote-tunnel chip.  This probe measures each part:

  1. null-dispatch RTT: a jitted 1-element identity — no meaningful device
     work, so its wall IS the per-dispatch round-trip floor of the tunnel.
  2. pipelined online-step throughput: N online-step dispatches issued
     back-to-back with ONE final block — the RTT overlaps with device work,
     so wall/N approximates the device-side cost per dispatch (this is what
     `streamed_query_ms` measures in bench.py).
  3. single online-step latency: one dispatch, one block (bench.py's
     `single_query_ms`).

If (3) ~= RTT + (2), the interactive latency is tunnel-bound, not
compute-bound — batching/streaming (the production serving shapes) are the
fix, and a locally-attached chip would serve (3) at ~RTT_local + (2).

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
         scripts/profiling/dispatch_overhead.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def med_ms(f, n=20):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), float(np.min(ts)), float(np.max(ts))


def main():
    import jax
    import jax.numpy as jnp
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # --- 1. null-dispatch RTT floor -------------------------------------
    one = jnp.ones((1,), jnp.float32)
    nul = jax.jit(lambda x: x + 1.0)
    nul(one).block_until_ready()
    rtt, rtt_min, rtt_max = med_ms(lambda: nul(one).block_until_ready())
    print(f"null dispatch (1-elem jit, block each): median {rtt:.2f} ms "
          f"[{rtt_min:.2f}, {rtt_max:.2f}] <- per-dispatch round-trip floor")

    # a bare host->device->host transfer of the same size, for reference
    xfer, *_ = med_ms(lambda: np.asarray(jax.device_put(np.ones(1, np.float32))))
    print(f"put+get 1 elem: median {xfer:.2f} ms")

    # --- bench.py's online step at the bench config (same construction:
    # bench.py:180-219) --------------------------------------------------
    on_tpu = any(dev.platform != "cpu" for dev in jax.devices())
    dtype = jnp.float32 if on_tpu else jnp.float64
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    from pylrbms_tpu.model import make_online_step
    cfg = {'num_subdomains': [8, 8],
           'half_num_fine_elements_per_subdomain_and_dim': 2,
           'num_refinements': 2}
    d, _ = discretize(init_grid_and_problem(cfg), dtype=dtype)
    fn = make_online_step(d, tol=1e-6, maxiter=400,
                          coarse_space="harvested", coarse_modes=12,
                          matrix_free="affine")
    args = []
    for m_ in np.linspace(0.1, 1.0, 8):
        mu_d = {"diffusion": jnp.asarray([m_], dtype)}
        args.append((jnp.asarray([1.0, float(m_)], dtype),
                     jnp.asarray([1.0], dtype), mu_d))
    U, ind = fn(*args[0])
    ind.block_until_ready()

    # --- 3. single-dispatch latency (bench.py's single_query_ms) --------
    def single():
        U, ind = fn(*args[0])
        ind.block_until_ready()
    lat, lat_min, lat_max = med_ms(single, n=10)
    print(f"online step, single dispatch + block: median {lat:.2f} ms "
          f"[{lat_min:.2f}, {lat_max:.2f}]")

    # --- 2. pipelined dispatches, one block: device-side cost -----------
    for n in (8, 32):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in (args * ((n // len(args)) + 1))[:n]]
        outs[-1][1].block_until_ready()
        per = (time.perf_counter() - t0) * 1e3 / n
        print(f"online step, {n} pipelined dispatches, one block: "
              f"{per:.2f} ms/dispatch <- device-side cost (RTT overlapped)")

    print(f"\ndecomposition: single {lat:.1f} ms ~= blocking-sync/fetch "
          f"round-trip {xfer:.1f} ms + device {per:.2f} ms  (residual "
          f"{lat - xfer - per:.1f} ms = host arg staging + tunnel jitter; "
          f"note the async execute path itself syncs in {rtt:.2f} ms — the "
          "tunnel pipelines execute requests, it is the BLOCKING readiness/"
          "data round-trip that costs ~25 ms)")
    print("reading: the interactive single-query latency is round-trip-"
          "bound on the remote tunnel; streamed/batched serving overlaps or "
          "amortizes the RTT (bench.py streamed_query_ms / headline).  On a "
          "locally-attached chip the same query would be ~device cost.")


if __name__ == "__main__":
    main()
