#!/usr/bin/env python
"""Cold-compile budget probe (VERDICT r3 #9): where does the at-scale 3D
``discretize`` wall go — host tabulation, jaxpr trace, XLA compile, or
device execute?

The discretizers are instrumented with ``Timings`` spans
(``discretize3d: tabulate space / build trace / build compile / build
execute / oswald+flux tables``, discretize_elliptic_block_swipdg3d.py:49-175
and the 2D analogue).  This script runs one discretize at a chosen config
and prints the span table, so a cold run (``--cold``: a FRESH throwaway
compile-cache dir, forcing real XLA compilation) and a warm run (default:
the persistent cache) can be diffed line by line.

Typical use (on the chip):

    JAX_ENABLE_X64=1 python scripts/profiling/discretize_budget.py \
        --subdomains 8 8 4 --nref 1 --lean          # warm (persistent cache)
    JAX_ENABLE_X64=1 python scripts/profiling/discretize_budget.py \
        --subdomains 8 8 4 --nref 1 --lean --cold   # cold (fresh cache)

Findings land in docs/results/spe10_3d_tpu.txt (cold-compile budget
section).
"""
import argparse
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=3, choices=(2, 3))
    ap.add_argument("--subdomains", type=int, nargs="+", default=None,
                    help="subdomain grid (2 or 3 ints; default 8 8 4 in 3D, "
                         "8 8 in 2D)")
    ap.add_argument("--half", type=int, default=1)
    ap.add_argument("--nref", type=int, default=1)
    ap.add_argument("--contrast", type=float, default=1e4)
    ap.add_argument("--order", type=int, default=1, choices=(1, 2))
    ap.add_argument("--lean", action="store_true",
                    help="lean model (no MOR estimator tensors) — the "
                         "at-scale configuration")
    ap.add_argument("--cold", action="store_true",
                    help="use a FRESH throwaway compile-cache dir so every "
                         "XLA compile is real (cold-start budget)")
    args = ap.parse_args()

    from pylrbms_tpu.utils.cache import enable_compile_cache
    if args.cold:
        cache_dir = tempfile.mkdtemp(prefix="pylrbms-coldprobe-")
        print(f"[cold probe: fresh compile cache at {cache_dir}]")
        enable_compile_cache(cache_dir)
    else:
        print(f"[warm probe: persistent cache at {enable_compile_cache()}]")

    import jax
    jax.config.update("jax_enable_x64", True)
    from pylrbms_tpu.utils.timers import GLOBAL_TIMINGS

    t0 = time.perf_counter()
    if args.dim == 3:
        from pylrbms_tpu.problems.spe10 import init_grid_and_problem_3d
        from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
        sub = args.subdomains or [8, 8, 4]
        cfg = {"num_subdomains": list(sub),
               "half_num_fine_elements_per_subdomain_and_dim": args.half,
               "num_refinements": args.nref}
        gpd = init_grid_and_problem_3d(cfg, max_contrast=args.contrast)
        with GLOBAL_TIMINGS.span("discretize3d: TOTAL"):
            d, _ = discretize(gpd, order=args.order, lean=args.lean)
    else:
        from pylrbms_tpu.problems.spe10 import init_grid_and_problem
        from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
        sub = args.subdomains or [8, 8]
        cfg = {"num_subdomains": list(sub),
               "half_num_fine_elements_per_subdomain_and_dim": args.half,
               "num_refinements": args.nref,
               "grid_type": "tri"}
        gpd = init_grid_and_problem(cfg, max_contrast=args.contrast)
        with GLOBAL_TIMINGS.span("discretize: TOTAL"):
            d, _ = discretize(gpd, lean=args.lean)
    wall = time.perf_counter() - t0

    K, N = d.space.K, d.space.N
    print(f"\nconfig: dim={args.dim} sub={sub} half={args.half} "
          f"nref={args.nref} order={args.order} lean={args.lean} "
          f"-> {K * N} dofs ({K} x {N})")
    print(f"mode: {'COLD (fresh cache)' if args.cold else 'warm'}; "
          f"problem init + discretize wall {wall:.1f} s\n")
    print(GLOBAL_TIMINGS.report())


if __name__ == "__main__":
    main()
