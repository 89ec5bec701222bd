"""SPE10 parabolic north-star: implicit-Euler heat flow through the SPE10
model-2 permeability slice at the 98k-dof greedy config, matrix-free on TPU.

The reference's parabolic pipeline (``discretize_parabolic_block_swipdg.py``
+ ``parabolic.py`` script) runs per-step ISTL solves on M + dt*A; here the
whole trajectory is ONE jitted ``lax.scan`` whose steps are warm-started
matrix-free PCG solves (mass as an extra affine stencil component,
``ops/matrixfree.mass_stencil``).  The host baseline is the same implicit
Euler with a scipy splu factorization of G = M + dt*A (factorize once,
back-substitute per step — the strongest CPU formulation of this flow).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/spe10_parabolic.py
    (CPU): PYTHONPATH=/root/repo JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
               python scripts/spe10_parabolic.py --subdomains 4 4 --nref 1
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdomains", type=int, nargs=2, default=(16, 16))
    ap.add_argument("--half", type=int, default=2)
    ap.add_argument("--nref", type=int, default=2)
    ap.add_argument("--T", type=float, default=1.0)
    ap.add_argument("--nt", type=int, default=20)
    ap.add_argument("--mu", type=float, default=0.5)
    ap.add_argument("--skip-host", action="store_true",
                    help="skip the scipy splu baseline")
    ap.add_argument("--rom", action="store_true",
                    help="snapshot-reduce the parabolic model and run the "
                         "certified ROM (projected N-independent estimate)")
    ap.add_argument("--rom-snapshots", type=int, default=8,
                    help="trajectory snapshots kept for the reduced basis "
                         "(evenly strided; GS truncates dependents)")
    ap.add_argument("--batch", type=int, default=0,
                    help="also run B batched-mu FOM trajectories in one "
                         "vmapped dispatch (solve_batch) and report "
                         "ms/step/mu vs the single-mu trajectory")
    ap.add_argument("--batch-exact-precond", action="store_true",
                    help="per-mu block-Jacobi factors in the batched run "
                         "(default: one frozen factor set shared across "
                         "the batch)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)       # env-independent (f64
    import jax.numpy as jnp                         # FOM, like spe10_greedy)
    from pylrbms_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from pylrbms_tpu.problems.spe10 import init_grid_and_problem
    from pylrbms_tpu.discretize_parabolic_block_swipdg import discretize
    from pylrbms_tpu.utils.logging import getLogger

    log = getLogger("pylrbms.spe10_parabolic")
    cfg = {"num_subdomains": list(args.subdomains),
           "half_num_fine_elements_per_subdomain_and_dim": args.half,
           "num_refinements": args.nref}
    t0 = time.perf_counter()
    im, data = discretize(init_grid_and_problem(cfg), T=args.T, nt=args.nt)
    st = im.stationary
    K, N = st.space.K, st.space.N
    log.info(f"discretize: {time.perf_counter() - t0:.1f} s — {K} subdomains,"
             f" {K * N} dofs, nt={args.nt}, dt={args.T / args.nt:g}")

    mu = im.parse_parameter({"switch": args.mu})
    t0 = time.perf_counter()
    traj = im.solve(mu)
    traj.block_until_ready()
    t_cold = time.perf_counter() - t0
    # warm run at a different parameter (the jitted scan + preconditioner
    # builder are cached; only the per-mu assemble/factorize re-runs)
    mu2 = im.parse_parameter({"switch": 0.9 * args.mu})
    t0 = time.perf_counter()
    traj2 = im.solve(mu2)
    traj2.block_until_ready()
    t_warm = time.perf_counter() - t0
    log.info(f"trajectory [{args.nt} implicit-Euler steps]: cold "
             f"{t_cold:.1f} s (incl. compile), warm {t_warm:.2f} s "
             f"({t_warm / args.nt * 1e3:.0f} ms/step)")

    # self-check: the final step satisfies its implicit-Euler equation
    dt = args.T / args.nt
    A = st.assemble(mu2)
    M = st.products["l2"]
    u_prev, u_last = traj2[-2], traj2[-1]
    f = st.rhs(mu2)
    lhs = jnp.einsum("knm,km->kn", M, u_last) + dt * A.apply(u_last)
    rhs = jnp.einsum("knm,km->kn", M, u_prev) + dt * f
    rel = float(jnp.linalg.norm((lhs - rhs).reshape(-1))
                / jnp.linalg.norm(rhs.reshape(-1)))
    log.info(f"final-step implicit-Euler residual: {rel:.2e}")
    assert rel < 1e-6, rel

    # parabolic estimator over the trajectory (the certification quantity)
    t0 = time.perf_counter()
    eta, _parts = im.estimate(traj2, mu2)
    log.info(f"parabolic estimate: {time.perf_counter() - t0:.1f} s, "
             f"eta = {float(eta):.6e}")

    if not args.skip_host:
        from pylrbms_tpu.la.block import to_scipy_csr
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        t0 = time.perf_counter()
        A_csr = to_scipy_csr(A)
        M_np = np.asarray(M, np.float64)
        M_csr = sp.block_diag([M_np[k] for k in range(K)], format="csc")
        G = (M_csr + dt * A_csr).tocsc()
        t_asm = time.perf_counter() - t0
        t0 = time.perf_counter()
        lu = spla.splu(G)
        t_fac = time.perf_counter() - t0
        b_np = np.asarray(f, np.float64).reshape(-1)
        u = np.zeros(K * N)
        t0 = time.perf_counter()
        for _ in range(args.nt):
            u = lu.solve(M_csr @ u + dt * b_np)
        t_steps = time.perf_counter() - t0
        err = np.abs(u - np.asarray(traj2[-1]).reshape(-1)).max() / max(
            np.abs(u).max(), 1e-300)
        log.info(f"host splu baseline: assemble {t_asm:.1f} s + factorize "
                 f"{t_fac:.1f} s + {args.nt} steps {t_steps:.1f} s = "
                 f"{t_asm + t_fac + t_steps:.1f} s; final-state agreement "
                 f"{err:.2e}")
        log.info(f"device vs host (factorize+steps): "
                 f"{(t_fac + t_steps) / t_warm:.1f}x")

    if args.batch:
        # batched-mu parabolic serving: B trajectories in ONE vmapped scan —
        # the affine stencil + coarse (+ shared block-Jacobi) HBM stream is
        # read once per CG iteration for the WHOLE batch
        B = args.batch
        shared = not args.batch_exact_precond
        mus_b = [im.parse_parameter({"switch": m})
                 for m in np.linspace(0.3, 0.95, B)]
        t0 = time.perf_counter()
        Ub = im.solve_batch(mus_b, shared_preconditioner=shared)
        Ub.block_until_ready()
        t_cold = time.perf_counter() - t0
        mus_b2 = [im.parse_parameter({"switch": m})
                  for m in np.linspace(0.35, 0.9, B)]
        t0 = time.perf_counter()
        Ub2 = im.solve_batch(mus_b2, shared_preconditioner=shared)
        Ub2.block_until_ready()
        t_bwarm = time.perf_counter() - t0
        # one lane cross-checked against the single-mu path
        lane = B // 2
        ref = im.solve(mus_b2[lane])
        rel = float(jnp.abs(Ub2[lane] - ref).max() / jnp.abs(ref).max())
        log.info(
            f"batched trajectories [B={B}, "
            f"{'shared' if shared else 'per-mu'} block-Jacobi]: cold "
            f"{t_cold:.1f} s, warm {t_bwarm:.2f} s = "
            f"{t_bwarm / args.nt * 1e3 / B:.1f} ms/step/mu "
            f"({t_warm / (t_bwarm / B):.1f}x the single-mu trajectory per "
            f"query); lane vs single-mu solve: {rel:.2e}")
        assert rel < 1e-8, rel

    if args.rom:
        # certified parabolic ROM: snapshot basis from the mu-trajectory,
        # implicit Euler on the reduced system, N-independent projected
        # estimate (<-> the reference's ParabolicLRBMSReductor stub,
        # reference reductor.py:149-180, here a real reduction)
        from pylrbms_tpu.reductor import ParabolicLRBMSReductor
        nsnap = min(args.rom_snapshots, args.nt + 1)
        sel = np.unique(np.linspace(0, args.nt, nsnap).astype(int))
        t0 = time.perf_counter()
        red = ParabolicLRBMSReductor(st)
        red.extend_basis(np.vstack([np.asarray(traj[sel]),
                                    np.asarray(traj2[sel])]))
        rd = red.reduce().attach_instationary(im)
        t_red = time.perf_counter() - t0
        r_max = int(rd.r_max)
        log.info(f"reduce: {t_red:.1f} s — {len(sel)} snapshots, "
                 f"r_max={r_max} ({K * r_max} reduced dofs)")
        c = rd.solve(mu2)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c = rd.solve(mu2)
        jax.block_until_ready(c)
        t_rom = time.perf_counter() - t0
        eta_rom, _ = rd.estimate(c, mu2, projected=True)
        t0 = time.perf_counter()
        eta_rom, _ = rd.estimate(c, mu2, projected=True)
        eta_rom = float(eta_rom)
        t_est = time.perf_counter() - t0
        U_rec = red.reconstruct(c)
        err = float(jnp.abs(U_rec[-1] - traj2[-1]).max()
                    / jnp.abs(traj2[-1]).max())
        log.info(f"ROM trajectory [{args.nt} steps]: warm {t_rom * 1e3:.1f} ms"
                 f" ({t_rom / args.nt * 1e3:.2f} ms/step, "
                 f"{t_warm / t_rom:.0f}x the FOM trajectory); projected "
                 f"estimate {t_est * 1e3:.1f} ms, eta = {eta_rom:.6e} "
                 f"(FOM eta = {float(eta):.6e}); final-state rel err "
                 f"(training-mu reconstruction) {err:.2e}")


if __name__ == "__main__":
    main()
