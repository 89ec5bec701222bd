#!/usr/bin/env python
"""On-chip truth references past the SuperLU ceiling (VERDICT r4 #1/#7).

Solves 3D SPE10 configurations f64-accurately through the stencil-only
mixed-precision path (pylrbms_tpu/truth.py) — cell-Jacobi + harvested
coarse (colored-apply Galerkin) + f32-inner IR with f64 restarts — and
records wall/residual.  The configurations ladder up to and past the two
recorded single-host walls:

- 442k Q2 (--finer-ref reference): scipy SuperLU dies inside gstrf after
  ~2 h of fill (round-4 artifact) — the smallest config with NO direct-
  solver alternative on this host;
- >= 1M dofs: the round-3 remote-AOT ceiling for fully f64-emulated solve
  programs; the IR path keeps the hot loop native-f32.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site JAX_ENABLE_X64=1 \\
               python scripts/spe10_3d_truth.py --config 221k-q2
Configs: 65k (z-thin Q1, the adversarial efficiency-study level),
         221k-q2 (the default study's Q2 reference — splu took 2893 s),
         442k-q2 (the measured SuperLU wall),
         1m-q1 (1.05M-dof Q1, 64x64x32 cells),
         1.8m-q2 (1.77M-dof Q2 on the 4th-level grid 64x64x16).
"""
import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

CONFIGS = {
    # name: (raster, subdomains, nref, order, harvest, rounds, solve_only,
    #        recurrence)
    # subdomain layouts keep K modest so the coarse inverse [K*m, K*m]
    # stays host-eigh-able; solve_only=True uses truth.SolveOnlyModel
    # (stencils + rhs only — no dense [K,N,N] tensors at >= 400k dofs).
    # recurrence: 'f64' (emulated-f64 Krylov — REQUIRED on the z-thin
    # adversarial configs, where the f32 inner diverges) | 'f32ir'
    # (native-f32 inner + f64 restarts — the near-isotropic configs; the
    # f64 chunk program crashes the TPU worker at >= 442k Q2)
    "65k": ((2, 8, 8), [8, 8, 2], 2, 1, 32, 2, False, "f64"),
    "131k-q1": ((4, 8, 8), [8, 8, 4], 2, 1, 32, 2, False, "f64"),
    "221k-q2": ((2, 8, 8), [16, 16, 4], 1, 2, 32, 2, False, "f64"),
    "442k-q2": ((4, 8, 8), [8, 8, 4], 2, 2, 32, 2, True, "f64"),
    "524k-q1": ((2, 8, 8), [8, 8, 2], 3, 1, 32, 2, True, "f64"),
    "1m-q1": ((4, 8, 8), [8, 8, 4], 3, 1, 32, 2, True, "f64"),
    "1.8m-q2": ((2, 8, 8), [8, 8, 2], 3, 2, 24, 2, True, "f64"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="221k-q2", choices=sorted(CONFIGS))
    ap.add_argument("--mu", type=float, default=1.0)
    ap.add_argument("--mus", type=str, default=None,
                    help="comma-separated list of mus to solve+save "
                         "(overrides --mu; used with --save)")
    ap.add_argument("--max-contrast", type=float, default=1e4)
    ap.add_argument("--save", type=str, default=None,
                    help="save the solutions as NPZ (key u_<mu>) for the "
                         "efficiency study's --truth-file")
    ap.add_argument("--check-splu", action="store_true",
                    help="also solve via host splu and compare (only "
                         "feasible below the SuperLU wall)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="override the per-dispatch Krylov chunk size")
    ap.add_argument("--harvest", type=int, default=None,
                    help="override the config's n_harvest (0 = modal-only "
                         "coarse)")
    ap.add_argument("--recurrence", choices=("f64", "f32ir"), default=None,
                    help="override the config's Krylov recurrence (f32ir "
                         "is valid on the near-isotropic Q1 configs — "
                         "truth_solver.txt finding 4)")
    ap.add_argument("--tol", type=float, default=1e-10)
    args = ap.parse_args()
    (raster, subs, nref, order, nh, rounds, solve_only,
     recurrence) = CONFIGS[args.config]
    if args.harvest is not None:
        nh = args.harvest
    if args.recurrence is not None:
        recurrence = args.recurrence

    import jax
    import jax.numpy as jnp
    from pylrbms_tpu.problems.spe10 import init_grid_and_problem_3d
    from pylrbms_tpu.truth import truth_solve, SolveOnlyModel

    print(f"# truth-solve {args.config} on {jax.devices()[0]}")
    t0 = time.perf_counter()
    gpd = init_grid_and_problem_3d(
        {"num_subdomains": subs,
         "half_num_fine_elements_per_subdomain_and_dim": 1,
         "num_refinements": nref},
        raster=raster, raster_mode="nearest",
        max_contrast=args.max_contrast)
    if solve_only:
        d = SolveOnlyModel(gpd, order=order)
    else:
        from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
        d, _ = discretize(gpd, order=order, lean=True)
    K, N = d.space.K, d.space.N
    print(f"{'solve-only assembly' if solve_only else 'discretize'}: "
          f"{K * N} dofs (K={K}, N={N}, order={order}), "
          f"{time.perf_counter() - t0:.1f} s")
    mus = ([float(m) for m in args.mus.split(",")] if args.mus
           else [args.mu])
    saved = {}
    U = None
    for i, mv in enumerate(mus):
        mu = {"switch": mv}
        t0 = time.perf_counter()
        U, info = truth_solve(d, mu, tol=args.tol, n_harvest=nh,
                              rounds=rounds, verbose=True,
                              recurrence=recurrence,
                              chunk_iters=args.chunk)
        print(f"mu={mv}: relres {info['relres']:.2e}; f32 its "
              f"{info['it32']} ({info['rounds']} rounds, f64 polish "
              f"{info['it64']}); assemble {info['t_assemble']:.1f} s, "
              f"coarse {info['t_coarse']:.1f} s, solve "
              f"{info['t_solve']:.1f} s, total "
              f"{time.perf_counter() - t0:.1f} s")
        saved[f"u_{mv}"] = U
    if len(mus) == 1:
        # warm repeat (the steady economics once the graph is compiled)
        t0 = time.perf_counter()
        _, info2 = truth_solve(d, {"switch": mus[0] * 0.999}, tol=args.tol,
                               n_harvest=nh, rounds=rounds, verbose=False,
                               recurrence=recurrence)
        print(f"warm second mu: solve {info2['t_solve']:.1f} s (+ coarse "
              f"{info2['t_coarse']:.1f} s), relres {info2['relres']:.2e}, "
              f"total {time.perf_counter() - t0:.1f} s")
    if args.save:
        np.savez_compressed(args.save, config=args.config,
                            max_contrast=args.max_contrast,
                            subs=np.asarray(subs), nref=nref, order=order,
                            raster=np.asarray(raster), **saved)
        print(f"saved {args.save}")
    if args.check_splu:
        from pylrbms_tpu.la.block import to_scipy_csr
        import scipy.sparse.linalg as spla
        t0 = time.perf_counter()
        A = to_scipy_csr(d.assemble(d.parse_parameter(mu))).tocsc()
        lu = spla.splu(A)
        b = np.asarray(d.rhs(d.parse_parameter(mu)), np.float64).ravel()
        u_ref = lu.solve(b)
        t_splu = time.perf_counter() - t0
        rel = (np.abs(U.reshape(-1) - u_ref).max()
               / max(np.abs(u_ref).max(), 1e-300))
        print(f"splu check: factorize+solve {t_splu:.1f} s; "
              f"|U - U_splu|_inf rel {rel:.2e}")


if __name__ == "__main__":
    main()
