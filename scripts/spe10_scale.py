#!/usr/bin/env python
"""SPE10 scale demonstration: high-subdomain-count FOM online steps
(the BASELINE.json "high subdomain count (batched assembly)" config).

Uses the lean discretizer (positive-form estimator only) so the footprint is
dominated by the operator blocks; reports discretize / solve / estimate
timings and PCG convergence at scale.
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from pylrbms_tpu.problems.spe10 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.model import make_online_step


def main(kx=16, ky=16, half=2, nref=2, dtype="float32"):
    dt = getattr(jnp, dtype)
    cfg = {'num_subdomains': [kx, ky],
           'half_num_fine_elements_per_subdomain_and_dim': half,
           'num_refinements': nref}
    t0 = time.perf_counter()
    gpd = init_grid_and_problem(cfg)
    d, _ = discretize(gpd, dtype=dt, lean=True)
    jax.block_until_ready(d.op.A_diag)
    t_disc = time.perf_counter() - t0
    ndof = d.space.K * d.space.N
    print(f"grid: {gpd['grid'].num_elements} elements, {d.space.K} subdomains, "
          f"{ndof} dofs; discretize {t_disc:.1f}s")

    fn = make_online_step(d, tol=1e-6, maxiter=600)
    theta = jnp.asarray([1.0, 0.5], dt)
    theta_f = jnp.asarray([1.0], dt)
    mu = {"switch": jnp.asarray([0.5], dt)}
    t0 = time.perf_counter()
    U, ind = fn(theta, theta_f, mu)
    U.block_until_ready()
    t_compile = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        U, ind = fn(theta, theta_f, mu)
        U.block_until_ready()
        ind.block_until_ready()
        times.append(time.perf_counter() - t0)
    # residual check
    A = d.op.assemble(theta)
    b = jnp.einsum("q,qkn->kn", theta_f, d.rhs_q)
    rel = float(jnp.linalg.norm((b - A.apply(U)).reshape(-1))
                / jnp.linalg.norm(b.reshape(-1)))
    print(f"online step: compile {t_compile:.1f}s, "
          f"median {np.median(times) * 1e3:.1f} ms, relres {rel:.2e}, "
          f"indicators finite: {bool(jnp.isfinite(ind).all())}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--subdomains", type=int, nargs=2, default=[16, 16])
    p.add_argument("--half", type=int, default=2)
    p.add_argument("--nref", type=int, default=2)
    p.add_argument("--dtype", default="float32")
    a = p.parse_args()
    main(a.subdomains[0], a.subdomains[1], a.half, a.nref, a.dtype)
