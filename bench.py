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


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.float32 if on_tpu else jnp.float64

    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize

    cfg = {'num_subdomains': [8, 8],
           'half_num_fine_elements_per_subdomain_and_dim': 2,
           'num_refinements': 2}
    gpd = init_grid_and_problem(cfg)
    d, _ = discretize(gpd, dtype=dtype)
    K, N = d.space.K, d.space.N

    # One full online step: assemble theta(mu) + block-Jacobi-PCG detailed
    # solve + localized error estimate (<-> the reference's phase 2:
    # LincombOperator.assemble + ISTL bicgstab solve + d.estimate,
    # scripts/online_adaptive_lrbms.py:81-95).
    from pylrbms_tpu.model import make_online_step
    fn = make_online_step(d, tol=1e-6, maxiter=400)
    theta = jnp.asarray([1.0, 0.5], dtype)
    theta_f = jnp.asarray([1.0], dtype)
    mu = {"diffusion": jnp.asarray([0.5], dtype)}
    U, ind = fn(theta, theta_f, mu)   # compile
    U.block_until_ready()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        U, ind = fn(theta, theta_f, mu)
        U.block_until_ready()
        ind.block_until_ready()
        times.append(time.perf_counter() - t0)
    tpu_s = float(np.median(times))

    # ---- CPU baseline: scipy sparse direct solve of the same system (f64),
    # the stand-in for the reference's sequential ISTL pipeline.  The affine
    # assembly is done once outside the timed region (generous to baseline).
    from scipy.sparse.linalg import spsolve
    from pylrbms_tpu.la.block import to_scipy_csr
    A_csr = to_scipy_csr(d.op.assemble(theta)).astype(np.float64)
    b_np = np.asarray(jnp.einsum("q,qkn->kn", theta_f, d.rhs_q),
                      np.float64).reshape(-1)
    spsolve(A_csr, b_np)   # warm
    cpu_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        spsolve(A_csr, b_np)
        cpu_times.append(time.perf_counter() - t0)
    cpu_s = float(np.median(cpu_times))

    # sanity: both solutions agree
    u_cpu = spsolve(A_csr, b_np).reshape(K, N)
    rel = float(np.abs(np.asarray(U, np.float64) - u_cpu).max()
                / max(np.abs(u_cpu).max(), 1e-300))
    assert rel < 1e-3, f"TPU/CPU solution mismatch: {rel}"

    result = {
        "metric": ("OS2015 8x8-subdomain online step "
                   "(assemble + PCG detailed solve + localized estimate), "
                   "24576 dofs; baseline = scipy CSR spsolve of the same system"),
        "value": round(tpu_s * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_s / tpu_s, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
