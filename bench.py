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


def aux_main():
    """North-star metrics (run in an x64 subprocess — the serving section
    needs f32 defaults, these need f64): a small-but-real SPE10 weak-greedy
    iteration and an implicit-Euler parabolic trajectory, each against its
    host-CPU floor.  Prints ONE JSON line consumed by :func:`main`.

    Config = the 2D north-star scale itself (98 304 dofs, contrast-clipped
    1e4 pooled field — BASELINE.json's "faster wall-clock per greedy
    iteration" sentence is about this configuration); the at-scale
    artifact numbers live in docs/results/spe10_greedy_tpu.txt /
    spe10_parabolic_tpu.txt.  The host floor stays deliberately
    CONSERVATIVE (one splu FOM solve per greedy iteration; the real host
    iteration also pays sweep + GS + re-projection)."""
    import sys
    import jax
    import jax.numpy as jnp
    from scipy.sparse.linalg import splu

    from pylrbms_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    assert jax.config.jax_enable_x64, "aux bench requires JAX_ENABLE_X64=1"

    from pylrbms_tpu.problems.spe10 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    from pylrbms_tpu.discretize_parabolic_block_swipdg import (
        discretize as discretize_parabolic)
    from pylrbms_tpu.la.block import AssembledBlockOp, to_scipy_csr
    from pylrbms_tpu.greedy import weak_greedy
    from pylrbms_tpu.utils.timers import GLOBAL_TIMINGS as T

    def build(cfg):
        gpd = init_grid_and_problem(cfg, raster=(8, 8), raster_mode="nearest",
                                    max_contrast=1e4)
        d, _ = discretize(gpd, dtype=jnp.float64)
        Q = d.op.A_diag.shape[0]
        # mu-independent offline artifacts for the host floors (same reuse
        # policy as the serving baseline: affine-component CSRs built once)
        A_q = [to_scipy_csr(d.op.assemble(jnp.asarray(np.eye(Q)[q])))
               .astype(np.float64) for q in range(Q)]
        mu0 = d.parse_parameter([1.0])
        th0 = np.asarray(d.theta(mu0), np.float64)
        b0 = np.asarray(d.rhs(mu0), np.float64).reshape(-1)
        return gpd, d, A_q, mu0, th0, b0

    def greedy_leg(cfg):
        # ---- offline greedy: steady per-iteration wall-clock on device ---
        out = {}
        gpd, d, A_q, mu0, th0, b0 = build(cfg)
        training = d.parameter_space.sample_uniformly(6)
        names = ['greedy: surrogate sweep', 'greedy: FOM snapshot solve',
                 'greedy: basis extension (GS)',
                 'greedy: re-reduction (projection)']
        # GLOBAL_TIMINGS is cumulative across legs: a failed 98k attempt may
        # already have logged spans, which must not leak into the fallback
        # leg's totals — slice from this leg's starting offsets
        offs = {n: len(T.spans.get(n, [])) for n in names}
        res = weak_greedy(d, training, target_error=1e-12, max_extensions=4)
        lists = [T.spans.get(n, [])[offs[n]:] for n in names]
        n_it = min(len(li) for li in lists)
        totals = [sum(li[i] for li in lists) for i in range(n_it)]
        steady = float(np.median(totals[1:]) if n_it > 1 else totals[0])
        out["greedy_iteration_s"] = round(steady, 4)
        out["greedy_iterations_timed"] = n_it
        out["greedy_dofs"] = d.space.K * d.space.N
        # host floor: ONE scipy-splu FOM snapshot solve (theta-weighted CSR
        # assemble + factorize + solve) — every host greedy iteration pays
        # at least this (the reference's ISTL pipeline re-factorizes per
        # mu); CONSERVATIVE: the host iteration also pays sweep + GS +
        # re-projection
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            A_mu = sum(float(t) * Aq for t, Aq in zip(th0, A_q))
            lu = splu(A_mu.tocsc())
            lu.solve(b0)
            ts.append(time.perf_counter() - t0)
        host_fom = float(np.median(ts))
        out["greedy_host_fom_solve_s"] = round(host_fom, 4)
        out["greedy_vs_host"] = round(host_fom / steady, 3)
        # ---- the MEASURED full host iteration (VERDICT r4 #5): the same
        # four phases (sweep + snapshot + GS + incremental re-projection)
        # on the scipy/numpy path, every fairness lever pulled FOR the
        # host (reference_impl/greedy_np.py docstring); median of the
        # steady iterations.  Parity: surrogate maxima == device greedy.
        from pylrbms_tpu.reference_impl.greedy_np import host_weak_greedy
        n_host = max(int(len(res.max_etas)) - 1, 2)
        host = host_weak_greedy(d, A_q, training, n_iter=n_host, b0=b0)
        dev_etas = np.asarray(res.max_etas[:n_host])
        hst_etas = np.asarray(host.max_etas[:n_host])
        sur_rel = float(np.max(np.abs(dev_etas - hst_etas)
                               / np.maximum(np.abs(dev_etas), 1e-300)))
        # 1e-3: the device snapshots solve at precision 1e-8 (mixed IR),
        # the host at splu-exact — the surrogate (the residual norm of
        # the grown basis) legitimately drifts ~1e-5 at SPE10 scale; the
        # assert checks same-algorithm/same-selection, not bitwise bases
        assert sur_rel < 1e-3, f"host/device greedy surrogate drift {sur_rel}"
        host_steady = float(np.median(host.iteration_s[1:])
                            if n_host > 1 else host.iteration_s[0])
        out["greedy_host_iteration_s"] = round(host_steady, 4)
        out["greedy_vs_host_full"] = round(host_steady / steady, 3)
        # ---- roofline for the snapshot-solve span (VERDICT r4 #3): the
        # counted kernels are the IR inner loop's f32 stencil matvec +
        # f32 block-Jacobi + f32 coarse apply + vector traffic, times the
        # solver-reported inner-iteration count; rates over the median
        # snapshot span.  Assembly/estimate work is not counted (lower
        # bounds; counting rules in pylrbms_tpu/utils/roofline.py).
        try:
            from pylrbms_tpu.utils.roofline import (
                pcg_iteration_cost, roofline)
            its = d.last_solve_iters
            snap_list = T.spans.get('greedy: FOM snapshot solve', [])
            if its is not None and snap_list:
                its = int(its)
                snap_s = float(np.median(snap_list[offs[names[1]]:]))
                cache = d._mf_jit_cache
                sop32 = cache.get("sop32")
                pre = next((v for k, v in cache.items()
                            if isinstance(k, tuple) and k
                            and k[0] == "precond"), None)
                if sop32 is not None and pre is not None:
                    bf, C, ci = pre
                    A32 = jax.eval_shape(
                        lambda s: s.assemble(
                            jnp.zeros((len(A_q),), jnp.float32)), sop32)
                    it_cost = pcg_iteration_cost(
                        A32,
                        factors=jax.eval_shape(
                            lambda x: x.astype(jnp.float32), bf),
                        coarse_basis=C, coarse_inv=ci)
                    r = roofline(its * it_cost, snap_s)
                    out["greedy_snapshot_iters"] = its
                    out["greedy_snapshot_tflops"] = r["tflops"]
                    out["greedy_snapshot_hbm_gbs"] = r["hbm_gbs"]
                    out["greedy_mfu"] = r["mfu_vs_bf16_peak"]
                    out["greedy_hbm_util"] = r["hbm_util"]
                    print(f"aux roofline: snapshot solve {r['tflops']:.3f} "
                          f"TFLOP/s, {r['hbm_gbs']:.0f} GB/s "
                          f"({100 * r['hbm_util']:.1f}% HBM peak), "
                          f"{its} inner iterations over {snap_s:.3f} s",
                          file=sys.stderr)
        except Exception:                            # noqa: BLE001
            traceback.print_exc(file=sys.stderr)
        print(f"aux bench: greedy steady iteration {steady:.3f} s "
              f"({n_it} iterations, surrogate {res.max_etas[-1]:.2e}); host "
              f"splu FOM-solve floor {host_fom:.3f} s; MEASURED full host "
              f"iteration {host_steady:.3f} s (phases "
              f"{ {k: round(v, 3) for k, v in host.phase_s[-1].items()} }, "
              f"surrogate parity {sur_rel:.1e})", file=sys.stderr)
        return out

    def parabolic_leg(cfg):
        # ---- parabolic trajectory: warm ms/step (mixed-precision IR on
        # accelerators — ops/ir.py) vs the host factorize-per-mu floor.
        # Config = the 98k NORTH-STAR grid itself (round 5; measured 95
        # ms/step device vs 170 ms/step host there): at the old bounded
        # 24k config the host's splu factorize amortizes to ~24 ms/step
        # and the leg sat at ~1x — a genuinely host-favorable small-size
        # regime, reported as the fallback with its own fields ----
        out = {}
        gpd, d, A_q, mu0, th0, b0 = build(cfg)
        K, N = d.space.K, d.space.N
        nt = 10
        im, _ = discretize_parabolic(gpd, T=1.0, nt=nt)
        dt = 1.0 / nt
        traj = im._solve_mf(mu0, dt, two_level=True, coarse_modes=12)
        np.asarray(traj)                       # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            traj = im._solve_mf(mu0, dt, two_level=True, coarse_modes=12)
            np.asarray(traj)
            ts.append(time.perf_counter() - t0)
        step_ms = float(np.median(ts)) / nt * 1e3
        out["parabolic_step_ms"] = round(step_ms, 3)
        out["parabolic_dofs"] = K * N
        # host floor: per-mu splu factorize of G = M + dt A(mu) + nt steps
        M_np = np.asarray(im.mass, np.float64)
        import scipy.sparse as sp
        M_csr = sp.block_diag([sp.csr_matrix(M_np[k]) for k in range(K)],
                              format="csr")
        t0 = time.perf_counter()
        G_mu = M_csr + dt * sum(float(t) * Aq for t, Aq in zip(th0, A_q))
        lu = splu(G_mu.tocsc())
        u = np.zeros(K * N)
        for _ in range(nt):
            u = lu.solve(M_csr @ u + dt * b0)
        host_step_ms = (time.perf_counter() - t0) / nt * 1e3
        out["parabolic_host_step_ms"] = round(host_step_ms, 3)
        out["parabolic_vs_host"] = round(host_step_ms / step_ms, 3)
        # ---- roofline for the trajectory step (VERDICT r4 #3): counted
        # kernels = f32 G-stencil matvec + f32 block-Jacobi + f32 coarse
        # + vector traffic, per solver-reported inner iteration
        try:
            from pylrbms_tpu.utils.roofline import (
                pcg_iteration_cost, roofline)
            _, its_t = im._solve_mf(mu0, dt, two_level=True,
                                    coarse_modes=12, return_iters=True)
            its_step = float(np.mean(np.asarray(its_t)))
            G_sop, _, cache = im._mf_parab_setup()
            G32 = jax.eval_shape(
                lambda s: s.assemble(jnp.zeros((len(A_q) + 1,),
                                               jnp.float32)), G_sop)
            pre = next((v for k, v in cache.items()
                        if isinstance(k, tuple) and k
                        and k[0] == "parab_precond"), None)
            bf_shape = jax.ShapeDtypeStruct((K, N, N), jnp.float32)
            it_cost = pcg_iteration_cost(
                G32, factors=bf_shape,
                coarse_basis=pre[0] if pre else None,
                coarse_inv=pre[1] if pre else None)
            r = roofline(its_step * it_cost, step_ms / 1e3)
            out["parabolic_step_iters"] = round(its_step, 1)
            out["parabolic_tflops"] = r["tflops"]
            out["parabolic_hbm_gbs"] = r["hbm_gbs"]
            out["parabolic_mfu"] = r["mfu_vs_bf16_peak"]
            out["parabolic_hbm_util"] = r["hbm_util"]
            print(f"aux roofline: parabolic step {r['tflops']:.3f} TFLOP/s, "
                  f"{r['hbm_gbs']:.0f} GB/s ({100 * r['hbm_util']:.1f}% HBM "
                  f"peak), {its_step:.1f} inner iterations/step",
                  file=sys.stderr)
        except Exception:                            # noqa: BLE001
            traceback.print_exc(file=sys.stderr)
        # sanity: device trajectory final step == host implicit Euler
        rel = float(np.abs(np.asarray(traj[-1]).reshape(-1) - u).max()
                    / max(np.abs(u).max(), 1e-300))
        assert rel < 1e-5, f"device/host trajectory mismatch: {rel}"
        print(f"aux bench: parabolic {step_ms:.1f} ms/step warm (nt={nt}, "
              f"{K * N} dofs); host splu factorize-per-mu floor "
              f"{host_step_ms:.1f} ms/step; final-step match {rel:.1e}",
              file=sys.stderr)
        return out

    # the EXACT north-star artifact config (spe10_greedy_tpu.txt): 16x16
    # subdomains, s=8 -> K=256, N=384, 98 304 dofs.  NOT [8,8]+nref=3
    # (same dofs, N=1536): the dense per-block tensors scale with N^2 and
    # that layout is a measured RESOURCE_EXHAUSTED on the 16 GB chip.
    CFG_98K = {'num_subdomains': [16, 16],
               'half_num_fine_elements_per_subdomain_and_dim': 2,
               'num_refinements': 2}
    CFG_24K = {'num_subdomains': [8, 8],
               'half_num_fine_elements_per_subdomain_and_dim': 2,
               'num_refinements': 2}

    # each leg is fault-isolated (a transient remote-compile/service error
    # in one must not drop the other's fields), and the greedy leg falls
    # back from the 98k artifact config to the bounded 24k one
    import gc
    import traceback
    out = {}
    for leg_cfg in (CFG_98K, CFG_24K):
        try:
            out.update(greedy_leg(leg_cfg))
            break
        except Exception:                            # noqa: BLE001
            traceback.print_exc(file=sys.stderr)
            if leg_cfg is CFG_98K:
                msg = f"aux bench: greedy leg failed at {leg_cfg}, falling back"
            else:
                msg = "aux bench: greedy leg failed at fallback config"
            print(msg, file=sys.stderr)
        finally:
            gc.collect()                 # free the leg's device buffers
    # the 98k greedy model + a second parabolic model do not fit one 16 GB
    # chip together (measured RESOURCE_EXHAUSTED), so the parabolic leg
    # runs AFTER the greedy model is collected; round 5 moves it to the
    # 98k north-star config (fault-isolated, 24k fallback — see the leg's
    # comment; at-scale 3D numbers: docs/results/spe10_3d_parabolic_tpu.txt)
    # drop the module-global online-step jit cache: its compiled closures
    # capture the ReducedModel skeleton -> the reductor -> the WHOLE 98k
    # greedy model, which otherwise stays in HBM through the parabolic leg
    # (measured RESOURCE_EXHAUSTED at both parabolic configs)
    from pylrbms_tpu import reductor as _red
    _red._ONLINE_JIT_CACHE.clear()
    import jax as _jax
    _jax.clear_caches()       # compiled executables + their held constants
    gc.collect()
    for leg_cfg in (CFG_98K, CFG_24K):
        try:
            out.update(parabolic_leg(leg_cfg))
            break
        except Exception:                            # noqa: BLE001
            traceback.print_exc(file=sys.stderr)
            if leg_cfg is CFG_98K:
                msg = "aux bench: parabolic leg failed at 98k, falling back"
            else:
                msg = "aux bench: parabolic leg failed at fallback config"
            print(msg, file=sys.stderr)
        finally:
            gc.collect()
    print(json.dumps(out))
    return out


def run_aux():
    """Run :func:`aux_main` in a fresh x64 subprocess BEFORE the parent
    initializes its own device client (the remote-TPU tunnel serves one
    client at a time), with a wall-clock bound; on any failure the serving
    metrics still ship (aux fields are merely absent)."""
    import os
    import subprocess
    import sys
    env = dict(os.environ, JAX_ENABLE_X64="1")
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--aux"], capture_output=True, text=True,
                           timeout=3000, env=env)
        sys.stderr.write(p.stderr[-4000:])
        for line in reversed(p.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        print("bench: aux subprocess produced no JSON "
              f"(rc={p.returncode})", file=sys.stderr)
    except Exception:                                # noqa: BLE001
        import traceback
        traceback.print_exc(file=sys.stderr)
    return {}


def main(cfg=None, aux=None):
    # north-star metrics first, in their own x64 subprocess — BEFORE this
    # process initializes its device client (one client at a time on the
    # remote-tunnel chip)
    if aux is None:
        aux = run_aux()

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

    # ---- roofline / MFU accounting (VERDICT r4 #3): analytic FLOPs and
    # HBM bytes of the COUNTED kernels (lock-step PCG: affine matvec +
    # block-Jacobi + coarse apply + vector traffic; counting rules in
    # utils/roofline.py) over the measured per-query batched wall.  The
    # assemble/estimate einsums are NOT counted, so the achieved rates are
    # lower bounds of the hardware utilization of the full step.
    roofl = {}
    try:
        import sys
        from pylrbms_tpu.utils.roofline import (
            KernelCost, pcg_iteration_cost, roofline)
        its = fn.iters_probe(*args[B // 2][:2])
        arr = fn.arrays
        op_coeffs = {k: arr[k] for k in ("A_diag", "C_R_io", "C_R_oi",
                                         "C_U_io", "C_U_oi")
                     if arr.get(k) is not None}
        it_cost = pcg_iteration_cost(op_coeffs, factors=arr.get("Minv_bar"),
                                     coarse_basis=arr.get("C_coarse"),
                                     coarse_inv=arr.get("Cinv_bar"),
                                     lanes=B)
        per_query = KernelCost((its + 1) * it_cost.flops / B,
                               (its + 1) * it_cost.bytes / B)
        r = roofline(per_query, tpu_s)
        roofl = {"serving_pcg_iters": int(its),
                 "serving_tflops": r["tflops"],
                 "serving_hbm_gbs": r["hbm_gbs"],
                 "serving_mfu": r["mfu_vs_bf16_peak"],
                 "serving_hbm_util": r["hbm_util"]}
        print(f"bench roofline: serving solve kernels {r['tflops']:.2f} "
              f"TFLOP/s ({100 * r['mfu_vs_bf16_peak']:.1f}% bf16 peak), "
              f"{r['hbm_gbs']:.0f} GB/s ({100 * r['hbm_util']:.1f}% HBM "
              f"peak), {int(its)} lock-step PCG iterations",
              file=sys.stderr)
    except Exception:                                # noqa: BLE001
        import traceback
        traceback.print_exc(file=sys.stderr)

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
    result.update(roofl)
    # north-star metrics from the x64 aux subprocess (BASELINE.json claims):
    # SPE10 weak-greedy steady iteration vs the host splu FOM-solve floor,
    # and the implicit-Euler parabolic ms/step vs the host
    # factorize-per-mu floor (reduced 24 576-dof configs — at-scale numbers
    # in docs/results/)
    result.update(aux or {})
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    import sys
    if "--aux" in sys.argv[1:]:
        aux_main()
        sys.exit(0)
    try:
        main()
    except Exception as e:                       # noqa: BLE001
        import traceback
        traceback.print_exc(file=sys.stderr)
        print("bench: full config failed, falling back to 4x4", file=sys.stderr)
        main({'num_subdomains': [4, 4],
              'half_num_fine_elements_per_subdomain_and_dim': 2,
              'num_refinements': 1}, aux={})
