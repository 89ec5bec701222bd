#!/usr/bin/env python
"""Roofline probe (VERDICT r4 #3): measure the four hot kernels in isolation
on the chip and report achieved TFLOP/s and HBM GB/s against the v5e peaks
(197 TFLOP/s bf16 MXU, 819 GB/s HBM; counting rules in
pylrbms_tpu/utils/roofline.py).

Kernels (the framework's per-iteration cost centers, SURVEY.md §7 hard
parts 5-6):
  1. dense block matvec        — AssembledBlockOp.apply, serving config f32
  2. batched affine apply      — AffineBlockApply under vmap at B=256 (the
                                 serving inner loop; the affine stacks
                                 stream ONCE shared across the batch)
  3. stencil matvec            — fused matrix-free SWIPDG apply, f32 and
                                 f64-emulated (the at-scale inner loop)
  4. block-Jacobi apply        — [K,N,N] factor matvec f32 (the
                                 preconditioner stream)
  5. online projection einsum  — V^T A V blockwise Galerkin GEMM (the
                                 re-reduction hot op)

To amortize the ~25 ms tunnel RTT, each timed call chains CHAIN=32
applications inside one jitted dispatch (y <- op(y) repeated), so wall =
RTT + CHAIN * t_kernel and t_kernel = (wall - RTT_est)/CHAIN with the
measured null-dispatch RTT subtracted.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_ENABLE_X64=1 python \
         scripts/profiling/roofline_probe.py [--out docs/results/roofline_v5e.txt]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp

from pylrbms_tpu.utils.precision import hp
from pylrbms_tpu.utils.roofline import (
    KernelCost, matvec_cost, roofline, V5E_PEAK_BF16_FLOPS, V5E_PEAK_HBM_BPS)

CHAIN = 256     # small-config kernels run ~20-200 us — a short chain
#                 drowns in the ~25 ms tunnel RTT jitter


def med_s(f, n=7):
    f()                                    # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    lines = []

    def emit(s):
        print(s)
        lines.append(s)

    emit(f"# Roofline probe on {jax.devices()[0].platform} "
         f"({jax.devices()[0]})")
    emit(f"# v5e peaks: {V5E_PEAK_BF16_FLOPS/1e12:.0f} TFLOP/s bf16, "
         f"{V5E_PEAK_HBM_BPS/1e9:.0f} GB/s HBM; CHAIN={CHAIN} "
         "applications per dispatch; RTT-corrected")

    # null-dispatch RTT floor
    one = jnp.zeros((8,), jnp.float32)
    ident = jax.jit(lambda x: x + 1.0)
    np.asarray(ident(one))
    rtt = med_s(lambda: np.asarray(ident(one)), n=15)
    emit(f"null-dispatch RTT: {rtt*1e3:.1f} ms")

    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize

    cfg = {'num_subdomains': [8, 8],
           'half_num_fine_elements_per_subdomain_and_dim': 2,
           'num_refinements': 2}
    gpd = init_grid_and_problem(cfg)
    d32, _ = discretize(gpd, dtype=jnp.float32)
    K, N = d32.space.K, d32.space.N
    emit(f"serving config: K={K}, N={N}, dofs={K*N}")

    def chained(apply_fn):
        @jax.jit
        @hp
        def f(op, x):
            def body(i, y):
                return apply_fn(op, y)
            return jax.lax.fori_loop(0, CHAIN, body, x)
        return f

    def run_kernel(name, op, x, apply_fn, lanes=1):
        f = chained(apply_fn)
        np.asarray(f(op, x))
        t = med_s(lambda: np.asarray(f(op, x)))
        t_k = max((t - rtt) / CHAIN, 1e-9)
        cost = matvec_cost(op)
        cost = KernelCost(cost.flops * lanes, cost.bytes)
        r = roofline(cost, t_k)
        emit(f"{name}: {t_k*1e3:.3f} ms/apply  "
             f"{r['tflops']:.2f} TFLOP/s ({100*r['mfu_vs_bf16_peak']:.1f}% "
             f"bf16 peak, {100*r['mfu_vs_f32_highest']:.1f}% f32-highest)  "
             f"{r['hbm_gbs']:.0f} GB/s ({100*r['hbm_util']:.1f}% HBM peak)")
        return r

    # ---- 1. dense block matvec (serving config, f32) --------------------
    theta = jnp.asarray([1.0, 0.5], jnp.float32)
    A = jax.jit(hp(lambda op, th: op.assemble(th)))(d32.op, theta)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(K, N)), jnp.float32)
    run_kernel("dense block matvec f32 [K,N,N]", A, x,
               lambda op, y: op.apply(y))

    # ---- 2. batched affine apply (B=256 serving inner loop) -------------
    from pylrbms_tpu.la.block import AffineBlockApply
    B = 256
    aff = AffineBlockApply(d32.op.static, d32.op.A_diag, d32.op.C_R_io,
                           d32.op.C_R_oi, d32.op.C_U_io, d32.op.C_U_oi,
                           theta)
    xb = jnp.asarray(np.random.default_rng(1).normal(size=(B, K, N)),
                     jnp.float32)
    run_kernel(f"batched affine apply f32 (B={B}, per-batch)", aff, xb,
               lambda op, y: op.apply(y), lanes=B)

    # ---- 3. stencil matvec at the 98k SPE10 config, f32 + f64 -----------
    from pylrbms_tpu.problems.spe10 import init_grid_and_problem as spe10_init
    cfg98 = {'num_subdomains': [16, 16],
             'half_num_fine_elements_per_subdomain_and_dim': 2,
             'num_refinements': 2}
    gpd98 = spe10_init(cfg98, raster=(8, 8), raster_mode="nearest",
                       max_contrast=1e4)
    for dt_, tag in ((jnp.float32, "f32"), (jnp.float64, "f64-emulated")):
        d98, _ = discretize(gpd98, dtype=dt_)
        sop = d98.mf_operator()
        th98 = jnp.asarray(np.asarray(d98.theta(d98.parse_parameter([1.0]))),
                           dt_)
        S = jax.jit(hp(lambda op, th: op.assemble(th)))(sop, th98)
        x98 = jnp.asarray(np.random.default_rng(2).normal(
            size=(d98.space.K, d98.space.N)), dt_)
        run_kernel(f"stencil matvec {tag} (98k dofs)", S, x98,
                   lambda op, y: op.apply(y))
        if tag == "f32":
            # ---- 4. block-Jacobi factor apply f32 -----------------------
            bf = jax.jit(hp(lambda o: o.block_jacobi_factors()))(
                jax.jit(hp(lambda op, th: op.assemble(th)))(d98.op, th98))
            run_kernel("block-Jacobi apply f32 (98k dofs)", bf, x98,
                       lambda f_, y: jnp.einsum("kij,kj->ki", f_, y))
            # ---- 4b. Pallas A/B on the SAME stream (VERDICT r4 #6): the
            # hand-written VMEM kernel vs the XLA einsum, plus the fused
            # preconditioner-apply + r.z reduction (the only PCG-body
            # traffic fusable beyond the factor stream itself) ------------
            from pylrbms_tpu.ops.pallas_kernels import (
                block_matvec_pallas, precond_dot_pallas)
            try:
                run_kernel("block-Jacobi apply f32 PALLAS (98k dofs)", bf,
                           x98, lambda f_, y: block_matvec_pallas(f_, y))
            except Exception as e:                       # noqa: BLE001
                emit(f"  pallas block matvec failed: {type(e).__name__}: "
                     f"{str(e)[:200]}")
            try:
                run_kernel("fused precond+dot f32 PALLAS (98k dofs)", bf,
                           x98, lambda f_, y: precond_dot_pallas(f_, y)[0])
                # parity of the fused kernel against the XLA reference
                z_ref = jnp.einsum("kij,kj->ki", bf, x98)
                z_p, rz_p = precond_dot_pallas(bf, x98)
                rel = float(jnp.abs(z_p - z_ref).max()
                            / jnp.abs(z_ref).max())
                rel_d = float(jnp.abs(rz_p.sum() - (x98 * z_ref).sum())
                              / jnp.abs((x98 * z_ref).sum()))
                emit(f"  pallas parity: |z - z_xla| rel {rel:.1e}, "
                     f"r.z rel {rel_d:.1e}")
            except Exception as e:                       # noqa: BLE001
                emit(f"  fused precond+dot failed: {type(e).__name__}: "
                     f"{str(e)[:200]}")
        del d98, sop, S

    # ---- 5. online projection einsum (re-reduction GEMM) ----------------
    r_max = 8
    V = jnp.asarray(np.random.default_rng(3).normal(size=(K, r_max, N)),
                    jnp.float32)

    Q = d32.op.A_diag.shape[0]

    # chained like the other kernels: a single projection runs under the
    # tunnel RTT, so an unchained timing is pure noise (a run measured
    # "308281 TFLOP/s").  The i-dependent scale on V defeats loop CSE at
    # the cost of one O(K r N) scalar multiply per pass (<1% of the GEMM).
    @jax.jit
    @hp
    def proj(Aq, V_):
        def body(i, acc):
            Vi = V_ * (1.0 + i * 1e-9)
            return acc + jnp.einsum("kri,qkij,ksj->qkrs", Vi, Aq, Vi)
        return jax.lax.fori_loop(
            0, CHAIN, body, jnp.zeros((Q, K, r_max, r_max), V_.dtype))

    np.asarray(proj(d32.op.A_diag, V))
    t = med_s(lambda: np.asarray(proj(d32.op.A_diag, V)))
    t_k = max((t - rtt) / CHAIN, 1e-9)
    flops = 2.0 * Q * K * (r_max * N * N + r_max * r_max * N)
    bytes_ = (d32.op.A_diag.size + V.size) * 4
    r = roofline(KernelCost(flops, bytes_), t_k)
    emit(f"projection einsum V^T A V f32 (Q={Q}, r={r_max}): "
         f"{t_k*1e3:.3f} ms  {r['tflops']:.2f} TFLOP/s "
         f"({100*r['mfu_vs_bf16_peak']:.1f}% bf16 peak, "
         f"{100*r['mfu_vs_f32_highest']:.1f}% f32-highest)  "
         f"{r['hbm_gbs']:.0f} GB/s ({100*r['hbm_util']:.1f}% HBM peak)")

    if args.out:
        with open(args.out, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
