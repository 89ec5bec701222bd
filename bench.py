"""Benchmark: LRBMS online step (FOM solve + localized estimate) on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: OS2015 block SWIPDG, 8x8 subdomains, s=8 fine cells/subdomain/dim
(K=64 blocks, N=384 dofs/block, 24 576 dofs) — the reference's headline flow
(detailed solve + estimate, scripts/online_adaptive_lrbms.py phases 1-2).

value       = median wall-clock of one jitted online step on the jax default
              device (the TPU under the driver), float32, block-Jacobi PCG.
vs_baseline = (scipy CSR spsolve + numpy estimator einsums on host CPU, f64 —
              the stand-in for the reference's sequential DUNE/ISTL CPU
              pipeline, which is not runnable in this environment)
              divided by `value`;  >1 means faster than baseline.
"""
import json
import time

import numpy as np


def main(cfg=None):
    import jax
    import jax.numpy as jnp

    from pylrbms_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.float32 if on_tpu else jnp.float64

    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize

    cfg = cfg or {'num_subdomains': [8, 8],
                  'half_num_fine_elements_per_subdomain_and_dim': 2,
                  'num_refinements': 2}
    gpd = init_grid_and_problem(cfg)
    d, _ = discretize(gpd, dtype=dtype)
    K, N = d.space.K, d.space.N

    # One full online step: assemble theta(mu) + block-Jacobi-PCG detailed
    # solve + localized error estimate (<-> the reference's phase 2:
    # LincombOperator.assemble + ISTL bicgstab solve + d.estimate,
    # scripts/online_adaptive_lrbms.py:81-95).  Timed as a STREAM of
    # distinct-mu queries (the production online-serving shape: many
    # parameter queries in flight), reported per query; each query does the
    # full work — assemble, solve, estimate — no cross-query reuse.
    from pylrbms_tpu.model import make_online_step
    # harvested coarse space (spectral, offline-built at mu_bar): measured
    # 2.43 vs 2.61 ms/query over the modal space at this config.
    # matrix_free='affine' (AffineBlockApply) is the batched-serving inner
    # loop: the affine stacks stream once per CG iteration shared across the
    # whole query batch — measured 0.325 vs 0.357 (stencil) ms/query at
    # B=256 on v5e; the assembled-dense apply OOMs at this B ([B, K, N, N]).
    fn = make_online_step(d, tol=1e-6, maxiter=400,
                          coarse_space="harvested", coarse_modes=12,
                          matrix_free="affine")
    # serving batch: per-query time amortizes with B (measured 2.5 / 1.5 /
    # 1.0 / 0.56 / 0.39 / 0.39 ms at B=16/32/64/128/256/512 — the
    # preconditioner HBM stream and dispatch are shared across the batch and
    # saturate at B=256); B=256 is a realistic parameter-study batch
    B = 256
    mus = np.linspace(0.1, 1.0, B)
    args = []
    for m_ in mus:
        mu_d = {"diffusion": jnp.asarray([m_], dtype)}
        args.append((jnp.asarray([1.0, float(m_)], dtype),
                     jnp.asarray([1.0], dtype), mu_d))
    U, ind = fn(*args[0])   # compile (single-query graph)
    U.block_until_ready()

    # batched-mu serving: ONE dispatch answers all B queries (vmapped step);
    # this is the headline serving shape — per-query device work batches on
    # the MXU and the host<->chip round-trip amortizes B-fold
    thetas = jnp.asarray(np.stack([np.asarray(a[0]) for a in args]), dtype)
    theta_fs = jnp.asarray(np.stack([np.asarray(a[1]) for a in args]), dtype)
    mus_b = {"diffusion": jnp.asarray(mus[:, None], dtype)}
    Ub, indb = fn(thetas, theta_fs, mus_b)      # compile (batched graph)
    Ub.block_until_ready()
    bt = []
    for _ in range(5):
        t0 = time.perf_counter()
        Ub, indb = fn(thetas, theta_fs, mus_b)
        indb.block_until_ready()
        bt.append((time.perf_counter() - t0) / B)
    tpu_s = float(np.median(bt))

    # streamed single-query dispatches, for comparison
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args]
        outs[-1][0].block_until_ready()
        outs[-1][1].block_until_ready()
        times.append((time.perf_counter() - t0) / B)
    stream_s = float(np.median(times))
    # single-query latency (round-trip to the remote chip included), for info
    t0 = time.perf_counter()
    U, ind = fn(*args[0])
    ind.block_until_ready()
    lat_s = time.perf_counter() - t0

    # ---- CPU baseline: the SAME streaming-mu queries on the host CPU —
    # per query: assemble A(mu) from the affine components, scipy sparse LU,
    # solve, numpy estimator (independent Oswald/flux oracles + quadratic
    # forms).  Stand-in for the reference's sequential DUNE/ISTL pipeline.
    # Cross-query reuse policy: both sides reuse mu-INdependent offline
    # artifacts (CPU: assembled affine-component CSRs; TPU: those same
    # tensors + the mu_bar-fixed preconditioner factors, an offline artifact
    # of the method — spectral equivalence over the parameter range).  All
    # mu-DEPENDENT work (assemble A(mu), factorize/iterate, estimate) is
    # inside the timed region on both sides; the CPU's direct solver has no
    # mu-independent factorization to hoist (ISTL's ilut is rebuilt per mu
    # too, online_adaptive_lrbms.py:71-72).
    from pylrbms_tpu.reference_impl.estimator_np import make_cpu_online_query
    cpu_query = make_cpu_online_query(d)
    th_np = [(np.asarray([1.0, float(m_)]), np.asarray([1.0])) for m_ in mus]
    u_cpu, ind_cpu = cpu_query(*th_np[0])   # warm
    Bc = 4                                   # CPU queries are slow; sample
    t0 = time.perf_counter()
    for tq, tf in th_np[:Bc]:
        cpu_query(tq, tf)
    cpu_s = (time.perf_counter() - t0) / Bc

    # sanity: solutions agree across the two paths; indicators must be finite
    # and (positive form) non-negative.  At fine levels the true indicators
    # drop below the f32 solve/arithmetic noise floor, so f32-vs-f64 indicator
    # values are not comparable — exact agreement is asserted in the f64 test
    # suite (tests/test_estimator*.py); the ratio is reported for information.
    import sys
    rel = float(np.abs(np.asarray(U, np.float64) - u_cpu).max()
                / max(np.abs(u_cpu).max(), 1e-300))
    assert rel < 1e-3, f"TPU/CPU solution mismatch: {rel}"
    relb = float(np.abs(np.asarray(Ub[0], np.float64)
                        - np.asarray(U, np.float64)).max()
                 / max(np.abs(u_cpu).max(), 1e-300))
    assert relb < 1e-3, f"batched/single mismatch: {relb}"
    ind64 = np.asarray(ind, np.float64)
    assert np.isfinite(ind64).all(), "non-finite indicators"
    mag, mag_cpu = float(np.abs(ind64).sum()), float(np.abs(ind_cpu).sum())
    print(f"bench info: indicator magnitude device/host = "
          f"{mag / max(mag_cpu, 1e-300):.2e} (f32 noise floor above true "
          f"indicators is expected at fine levels)", file=sys.stderr)

    kx, ky = cfg['num_subdomains']
    print(f"bench info: single-query latency {lat_s * 1e3:.1f} ms "
          "(remote-chip round-trip included); per-query streamed "
          f"{stream_s * 1e3:.2f} ms; per-query one-dispatch batched "
          f"{tpu_s * 1e3:.2f} ms (B={B}); CPU per-query {cpu_s * 1e3:.1f} ms",
          file=sys.stderr)
    result = {
        "metric": (f"OS2015 {kx}x{ky}-subdomain online step "
                   "(assemble + detailed solve + localized estimate) per "
                   f"parameter query, {K * N} dofs, B={B} distinct mu served "
                   "in ONE batched dispatch; baseline = same queries on host "
                   "CPU (scipy splu per mu + numpy estimator)"),
        "value": round(tpu_s * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_s / tpu_s, 3),
        # the interactive shape, so the batched headline can't be read as
        # the single-request latency: one query, one dispatch, including the
        # host<->chip round-trip (RTT-dominated on the remote-tunnel chip)
        "single_query_ms": round(lat_s * 1e3, 3),
        # streamed distinct-mu dispatches (no batching), per query
        "streamed_query_ms": round(stream_s * 1e3, 3),
        "cpu_baseline_query_ms": round(cpu_s * 1e3, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    try:
        main()
    except Exception as e:                       # noqa: BLE001
        import sys, traceback
        traceback.print_exc(file=sys.stderr)
        print("bench: full config failed, falling back to 4x4", file=sys.stderr)
        main({'num_subdomains': [4, 4],
              'half_num_fine_elements_per_subdomain_and_dim': 2,
              'num_refinements': 1})
