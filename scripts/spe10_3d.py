"""SPE10 model-2 in native 3D: FOM solve + estimate + snapshot ROM.

Beyond the 2D-only reference: the BASELINE.json north-star data set is the
3D 60 x 220 x 85 permeability tensor; this script runs the LRBMS pipeline on
a z-block of it using the 3D hex family (grid3d / spaces3d / swipdg3d):

  phase 1: problem init (z-layers -> cellwise-constant diffusion)
  phase 2: block SWIPDG discretize + detailed solve (two-level PCG) + estimate
  phase 3: snapshot reduction + ROM solve + N-independent ROM estimate

Usage:  python scripts/spe10_3d.py [--subdomains 4 4 2] [--half 1]
        [--nref 1] [--contrast 1e4] [--layers 40 44]

Memory guidance (single v5e chip, 16 GB): the full MOR tensor set fits to
~16k dofs in 3D (the 4x4x2 default); at ~131k dofs run --lean --mf (FOM +
positive-form estimator), and past that --xl (stencil-only, no dense
blocks anywhere).
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdomains", type=int, nargs=3, default=[4, 4, 2])
    ap.add_argument("--half", type=int, default=1)
    ap.add_argument("--nref", type=int, default=1)
    ap.add_argument("--contrast", type=float, default=1e4)
    ap.add_argument("--layers", type=int, nargs=2, default=[40, 44])
    ap.add_argument("--lean", action="store_true",
                    help="skip the MOR estimator tensors (FOM-only)")
    ap.add_argument("--order", type=int, default=1, choices=(1, 2),
                    help="polynomial order: 1 (trilinear Q1) or 2 (Q2 with "
                         "the RT_[1] hex estimator, ops/rt1hex.py)")
    ap.add_argument("--mf", action="store_true",
                    help="matrix-free two-level FOM solve (the at-scale "
                         "path: O(K s^3 nb^2) stencil matvecs)")
    ap.add_argument("--greedy", type=int, default=0,
                    help="run the weak greedy (this many max extensions) "
                         "over a --training-sized uniform training set — "
                         "the 2D north-star offline pipeline in native 3D")
    ap.add_argument("--training", type=int, default=6)
    ap.add_argument("--online-mus", type=int, default=0,
                    help="after --greedy: run this many online adaptive "
                         "enrichment parameters (3 rounds each) — the full "
                         "north-star pipeline (offline greedy + online "
                         "enrichment) in native 3D")
    ap.add_argument("--online-target-rel", type=float, default=0.0,
                    help="run each online enrichment to ITS OWN termination "
                         "at target = REL * eta_FOM(mu) instead of a fixed "
                         "3 rounds (closes the certification loop — "
                         "reference online_enrichment.py:81-87)")
    ap.add_argument("--skip-estimate", action="store_true",
                    help="skip the FOM estimate (at --lean scale the "
                         "positive-form f64 integrals are an offline-grade "
                         "op; use when timing the solve/parabolic legs)")
    ap.add_argument("--parabolic", type=int, default=0, metavar="NT",
                    help="also run the native-3D implicit-Euler trajectory "
                         "with this many steps (T=1.0, "
                         "discretize_parabolic_block_swipdg3d semantics: "
                         "one jitted lax.scan; matrix-free G = M + dt*A "
                         "at scale)")
    ap.add_argument("--parabolic-batch", type=int, default=0,
                    help="additionally run B batched-mu 3D trajectories in "
                         "one vmapped dispatch (solve_batch)")
    ap.add_argument("--xl", action="store_true",
                    help="stencil-ONLY build + solve (no dense per-subdomain "
                         "blocks anywhere): cell-Jacobi + subdomain-constant "
                         "coarse level — the only representation feasible at "
                         "s >= 8 in 3D (dense blocks are O(K s^6))")
    args = ap.parse_args()
    if args.parabolic_batch and not args.parabolic:
        ap.error("--parabolic-batch requires --parabolic NT")

    import jax
    import jax.numpy as jnp
    from pylrbms_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    # SPE10 contrast needs f64 operators everywhere (same policy as the 2D
    # north-star, scripts/spe10_greedy.py): on TPU f64 is emulated but the
    # preconditioner/factorizations stay f32 (la/block.py handles v5e's
    # missing f64 LU); in plain f32 CG stalls at ~eps*contrast and the
    # estimator quadratic forms lose all digits.
    jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64

    from pylrbms_tpu.problems.spe10 import init_grid_and_problem_3d
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    from pylrbms_tpu.reductor import LRBMSReductor

    t0 = time.perf_counter()
    gpd = init_grid_and_problem_3d(
        {"num_subdomains": args.subdomains,
         "half_num_fine_elements_per_subdomain_and_dim": args.half,
         "num_refinements": args.nref},
        layers=tuple(args.layers), max_contrast=args.contrast)
    g = gpd["grid"]
    print(f"grid: {g.kx}x{g.ky}x{g.kz} subdomains, s={g.s} "
          f"({g.num_elements} hexes)")

    if args.xl:
        return main_xl(gpd, dtype, t0)

    d, _ = discretize(gpd, dtype=dtype, lean=args.lean, order=args.order)
    sp = d.space
    print(f"discretize: {time.perf_counter()-t0:.1f} s  "
          f"(K={sp.K}, N={sp.N}, {sp.K*sp.N} dofs)")

    mu = {"switch": 1.0}
    t0 = time.perf_counter()
    if args.mf:
        opts = {"type": "mf_pcg", "precision": 1e-8, "max_iter": 4000,
                "coarse_space": "harvested", "coarse_modes": 12,
                "return_iters": True}
        mup = d.parse_parameter(mu)
        U, it = d._mf_solve(d.theta(mup), d.rhs(mup), opts)
        U.block_until_ready()
        t_solve = time.perf_counter() - t0
        t1 = time.perf_counter()
        U2, _ = d._mf_solve(d.theta(mup), d.rhs(mup), opts)
        U2.block_until_ready()
        print(f"  (warm repeat solve: {(time.perf_counter()-t1)*1e3:.0f} ms)")
        A = d.op.assemble(d.theta(mu))
        b = d.rhs(mu)
    else:
        A = d.op.assemble(d.theta(mu))
        b = d.rhs(mu)
        U, it = A.solve_pcg(b, tol=1e-8, maxiter=4000, two_level=True,
                            return_iters=True)
        U.block_until_ready()
        t_solve = time.perf_counter() - t0
    r = float(jnp.abs(A.apply(U) - b).max() / jnp.abs(b).max())
    print(f"FOM solve: {t_solve*1e3:.0f} ms, {int(it)} CG iterations, "
          f"rel residual {r:.1e}")

    if not args.skip_estimate:
        t0 = time.perf_counter()
        eta = float(d.estimate(U, mu, paper_convention=True))
        print(f"FOM estimate: eta = {eta:.4e}  "
              f"({time.perf_counter()-t0:.1f} s)")
        t0 = time.perf_counter()
        float(d.estimate(U, mu, paper_convention=True))
        print(f"  (warm repeat estimate: {time.perf_counter()-t0:.1f} s)")

    if args.parabolic:
        # the parabolic north-star leg in its native 3D form (<-> the 2D
        # scripts/spe10_parabolic.py; reference pipeline is 2D-only,
        # discretize_parabolic_block_swipdg.py:27-40)
        from pylrbms_tpu.model import InstationaryBlockModel
        nt = args.parabolic
        im = InstationaryBlockModel(stationary=d, T=1.0, nt=nt)
        dt = im.T / nt
        mup = d.parse_parameter(mu)
        t0 = time.perf_counter()
        traj = im.solve(mup)
        traj.block_until_ready()
        t_cold = time.perf_counter() - t0
        mup2 = d.parse_parameter({"switch": 0.8})
        t0 = time.perf_counter()
        traj2 = im.solve(mup2)
        traj2.block_until_ready()
        t_pwarm = time.perf_counter() - t0
        print(f"3D trajectory [{nt} implicit-Euler steps]: cold "
              f"{t_cold:.1f} s (incl. compile), warm {t_pwarm:.2f} s "
              f"({t_pwarm / nt * 1e3:.0f} ms/step)")
        # self-check: the final step satisfies its implicit-Euler equation
        A2 = d.op.assemble(d.theta(mup2))
        M = im.mass
        u_prev, u_last = traj2[-2], traj2[-1]
        f2 = d.rhs(mup2)
        lhs = jnp.einsum("knm,km->kn", M, u_last) + dt * A2.apply(u_last)
        rhs2 = jnp.einsum("knm,km->kn", M, u_prev) + dt * f2
        rel = float(jnp.linalg.norm((lhs - rhs2).reshape(-1))
                    / jnp.linalg.norm(rhs2.reshape(-1)))
        print(f"3D final-step implicit-Euler residual: {rel:.2e}")
        assert rel < 1e-6, rel
        if args.parabolic_batch:
            B = args.parabolic_batch
            mus_b = [d.parse_parameter({"switch": m})
                     for m in np.linspace(0.3, 0.95, B)]
            t0 = time.perf_counter()
            Ub = im.solve_batch(mus_b)
            Ub.block_until_ready()
            t_bcold = time.perf_counter() - t0
            mus_b2 = [d.parse_parameter({"switch": m})
                      for m in np.linspace(0.35, 0.9, B)]
            t0 = time.perf_counter()
            Ub2 = im.solve_batch(mus_b2)
            Ub2.block_until_ready()
            t_bwarm = time.perf_counter() - t0
            lane = B // 2
            ref = im.solve(mus_b2[lane])
            rel_b = float(jnp.abs(Ub2[lane] - ref).max()
                          / jnp.abs(ref).max())
            print(f"3D batched trajectories [B={B}]: cold {t_bcold:.1f} s, "
                  f"warm {t_bwarm:.2f} s = "
                  f"{t_bwarm / nt * 1e3 / B:.1f} ms/step/mu "
                  f"({t_pwarm / (t_bwarm / B):.1f}x the single-mu "
                  f"trajectory per query); lane vs single-mu: {rel_b:.2e}")
            assert rel_b < 1e-8, rel_b
        if not args.lean:
            t0 = time.perf_counter()
            eta_p, _parts = im.estimate(traj2, mup2)
            print(f"3D parabolic estimate: {time.perf_counter()-t0:.1f} s, "
                  f"eta = {float(eta_p):.6e}")

    if args.lean:
        return

    if args.greedy:
        from pylrbms_tpu.greedy import weak_greedy
        from pylrbms_tpu.utils.timers import GLOBAL_TIMINGS as T
        train = [{"switch": m}
                 for m in np.linspace(0.1, 1.0, args.training)]
        t0 = time.perf_counter()
        with T.span("offline greedy"):
            res = weak_greedy(d, train, target_error=1e-3,
                              max_extensions=args.greedy)
        print(f"3D weak greedy: {len(res.max_etas)} iterations, "
              f"{res.fom_solves} FOM solves, surrogate "
              f"{res.max_etas[0]:.3e} -> {res.max_etas[-1]:.3e}, "
              f"RB size {int(res.rd.sizes.sum())}, "
              f"{time.perf_counter()-t0:.1f} s")
        mu_t = d.parse_parameter({"switch": 0.7})
        c = res.rd.solve(mu_t)
        eta_rom = float(res.rd.estimate(c, mu_t))
        eta_rec = float(d.estimate(res.reductor.reconstruct(c), mu_t))
        print(f"ROM vs FOM(reconstruction) estimate: {eta_rom:.4e} vs "
              f"{eta_rec:.4e} (rel diff {abs(eta_rom-eta_rec)/eta_rec:.1e})")
        if args.online_mus:
            # the online leg of the north-star pipeline (<-> the 2D
            # scripts/spe10_greedy.py): adaptive local enrichment at unseen
            # parameters, 3 rounds each.  With --online-target-rel the loop
            # instead runs to ITS OWN termination (reference
            # online_enrichment.py:81-87): target = rel * eta_FOM(mu) — the
            # ROM is certified within rel of the FOM's own estimator value,
            # a target the continuity-factor-scaled absolute eta cannot
            # poison (the model-reduction part of eta goes to zero under
            # enrichment; the discretization part eta_FOM does not)
            from pylrbms_tpu.online_enrichment import AdaptiveEnrichment
            rng = np.random.default_rng(3)
            rd_cur = res.rd
            for i, m in enumerate(rng.uniform(0.1, 1.0, args.online_mus)):
                mu_i = {"switch": float(m)}
                if args.online_target_rel:
                    mu_p = d.parse_parameter(mu_i)
                    eta_fom = float(d.estimate(d.solve(mu_p), mu_p))
                    target = args.online_target_rel * eta_fom
                    steps = 20
                    print(f"online mu #{i} (switch={m:.3f}): eta_FOM = "
                          f"{eta_fom:.4e}, target = {target:.4e}")
                else:
                    target, steps = 1e-3, 3
                online = AdaptiveEnrichment(gpd, d, d.space, res.reductor,
                                            rd_cur, target_error=target,
                                            marking_doerfler_theta=0.33,
                                            marking_max_age=4)
                rounds = []
                cb = lambda rd_, u_, mu_, st: rounds.append(
                    (st["eta"], st["global RB size"]))
                with T.span(f"online mu #{i}"):
                    u, rd_cur, _ = online.solve(mu_i, enrichment_steps=steps,
                                                callback=cb)
                print(f"online mu #{i} (switch={m:.3f}): "
                      f"eta {rounds[-1][0]:.3e} RB size "
                      f"{rd_cur.solution_dim} "
                      f"({len(rounds) - 1} enrichment rounds: "
                      + " -> ".join(f"{e:.3e}" for e, _ in rounds) + ")")
        print(T.report())
        return

    red = LRBMSReductor(d, order=0)
    for m in (0.1, 0.4, 1.0):
        red.extend_basis(np.asarray(d.solve({"switch": m}), np.float64))
    t0 = time.perf_counter()
    rd = red.reduce()
    print(f"reduce: {time.perf_counter()-t0:.1f} s "
          f"(RB size {int(rd.sizes.sum())})")

    mu_t = {"switch": 0.7}
    t0 = time.perf_counter()
    c = rd.solve(mu_t)
    eta_rom = float(rd.estimate(c, mu_t, paper_convention=True))
    t_rom = time.perf_counter() - t0
    Urec = rd.reconstruct(c)
    eta_rec = float(d.estimate(Urec, mu_t, paper_convention=True))
    print(f"ROM online step: {t_rom*1e3:.1f} ms, eta_rom = {eta_rom:.4e} "
          f"(FOM-of-reconstruction {eta_rec:.4e}, "
          f"rel diff {abs(eta_rom-eta_rec)/eta_rec:.1e})")


def main_xl(gpd, dtype, t0):
    """Stencil-only FOM at XL scale: never materializes dense [K, N, N]
    blocks (O(K s^6) — 17 GB already at K=256, s=8), so memory stays
    O(K s^3 nb^2).  Preconditioner: per-hex-cell Jacobi + the
    subdomain-constant coarse level built from the stencil itself."""
    import time as _time
    import jax
    import jax.numpy as jnp
    from pylrbms_tpu.ops.spaces3d import BlockDGSpace3D
    from pylrbms_tpu.ops import assembly3d as asm3
    from pylrbms_tpu.ops.matrixfree3d import (assemble_swipdg_stencil3,
                                              StencilOperator3,
                                              stencil_coarse_matrix)
    from pylrbms_tpu.la.block import dense_inv_mixed
    from pylrbms_tpu.utils.precision import hp
    from pylrbms_tpu.parameters import evaluate_coefficients

    sp = BlockDGSpace3D(gpd["grid"])
    lam_funcs = gpd["lambda"]["functions"]
    print(f"XL: K={sp.K}, N={sp.N}, {sp.K * sp.N} dofs (stencil-only)")

    built = jax.jit(hp(lambda: (
        tuple(assemble_swipdg_stencil3(sp, lf, None, dtype=dtype)
              for lf in lam_funcs),
        asm3.volume_functional(sp, gpd["f"], dtype))))()
    stencils, rhs = built
    jax.block_until_ready(rhs)
    print(f"stencil assembly: {_time.perf_counter() - t0:.1f} s")

    from pylrbms_tpu.parameters import as_functional
    mu = {"switch": 1.0}
    theta = jnp.asarray(evaluate_coefficients(
        [as_functional(c) for c in gpd["lambda"]["coefficients"]], mu), dtype)

    t0 = _time.perf_counter()
    from pylrbms_tpu.ops.matrixfree3d import stencil_diag_blocks
    sop = StencilOperator3(sp, stencils)
    A = jax.jit(hp(lambda s, th: s.assemble(th)))(sop, theta)
    # contrast-robust subdomain-block Jacobi, built from the stencil's own
    # diagonal blocks (the XL memory bound: 3 GB at N=1728 as f32; the
    # affine dense family, 4x that per component in f64, never exists)
    Dblk = jax.jit(hp(lambda A_: stencil_diag_blocks(A_)))(A)
    # invert the [K, N, N] blocks on HOST (device batched LU materializes
    # ~8x N^2-sized temporaries — measured 24.6 GB OOM at this size) with
    # the same symmetric Jacobi scaling as la/block.block_jacobi_factors;
    # f32 factors: bf16's 8-bit mantissa is not enough at these block
    # condition numbers (measured CG divergence)
    Dnp = np.asarray(Dblk, np.float64)
    Dblk.delete()
    dvec = np.abs(np.einsum("kii->ki", Dnp))
    sca = 1.0 / np.sqrt(np.maximum(dvec, 1e-300))
    Dnp *= sca[:, :, None]
    Dnp *= sca[:, None, :]
    inv = np.linalg.inv(Dnp)
    del Dnp
    inv *= sca[:, :, None]
    inv *= sca[:, None, :]
    factors = jax.device_put(inv.astype(np.float32))
    jax.block_until_ready(factors)
    del inv
    A0 = stencil_coarse_matrix(A)
    ci = dense_inv_mixed(A0.astype(jnp.float64)).astype(dtype)
    jax.block_until_ready(ci)
    # the per-component stencil family is no longer needed once mixed at
    # theta — free ~1 GB before the solve
    del sop, stencils, built
    print(f"preconditioner (host-inverted f32 block-Jacobi + constant "
          f"coarse): {_time.perf_counter() - t0:.1f} s")

    # restartable CG: bounded dispatches (a single multi-minute while_loop
    # dispatch can hit the remote-chip RPC deadline at XL scale), warm-
    # started from the previous chunk's iterate
    solve = jax.jit(hp(lambda A_, b_, f_, ci_, x0_: A_.solve_pcg(
        b_, tol=1e-8, maxiter=300, block_factors=f_, coarse_inv=ci_,
        coarse_f32=True, return_iters=True, x0=x0_)))
    bn = float(jnp.linalg.norm(rhs.reshape(-1)))
    relres = jax.jit(hp(lambda A_, U_, b_: jnp.linalg.norm(
        (b_ - A_.apply(U_)).reshape(-1))))     # jitted: eager applies cost
    t0 = _time.perf_counter()                  # ~0.4 s/op on the remote path
    U = jnp.zeros_like(rhs)
    total_it = 0
    for rnd in range(67):                      # <= ~20000 iterations
        U, it = solve(A, rhs, factors, ci, U)
        total_it += int(it)
        r = float(relres(A, U, rhs)) / bn
        if r < 1e-8 or int(it) == 0:
            break
    t_solve = _time.perf_counter() - t0
    print(f"XL solve: {t_solve:.1f} s (incl. compile; {rnd + 1} bounded "
          f"dispatches), {total_it} CG iterations, rel residual {r:.1e}, "
          f"{t_solve / max(total_it, 1) * 1e3:.1f} ms/iteration")


if __name__ == "__main__":
    main()
