"""K-sharded matrix-free XL solve: the scale-out route past one chip.

The 1M-dof 3D configuration is infeasible on a single chip today (the
f64-emulated solve program crashes the remote AOT compile helper — the
documented single-chip ceiling, STATUS.md "XL ladder"; f32 lacks the digits
at this conditioning).  The SAME stencil representation runs K-SHARDED over
a device mesh (``SubdomainMesh.shard_stencil`` + ``jit_mf_solve`` /
``solve_pcg`` under the mesh): per-subdomain stencil leaves sharded along
K, interface strips replicated, GSPMD halo collectives at the apply's
shifted-slice adds.  This demo executes it on the virtual 8-CPU-device mesh
(the same mechanism the tests and the driver dryrun verify == unsharded);
on real hardware the identical program spans 8 chips with the collectives
riding ICI.

Measured (virtual 8-device CPU mesh, f64): 1 048 576 dofs (K=256 hex
subdomains, s=8, academic 3D problem at mu=0.5), cell-Jacobi + constant
coarse: 177 PCG iterations to relres 8.9e-9, solve 51 s on host CPU
(assembly 20 s; see docs/results/xl_sharded_virtual.txt).

Run:  PYTHONPATH=. python scripts/mf_sharded_xl_demo.py [--dofs-scale small]
"""
import argparse
import os
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dofs-scale", choices=("small", "xl"), default="xl",
                    help="small: 131k dofs (s=4); xl: 1M dofs (s=8)")
    args = ap.parse_args()

    import jax
    from pylrbms_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.ops.spaces3d import BlockDGSpace3D
    from pylrbms_tpu.ops import assembly3d as asm3
    from pylrbms_tpu.ops.matrixfree3d import (assemble_swipdg_stencil3,
                                              StencilOperator3,
                                              stencil_coarse_matrix)
    from pylrbms_tpu.la.block import dense_inv_mixed
    from pylrbms_tpu.utils.precision import hp
    from pylrbms_tpu.parallel.mesh import SubdomainMesh

    half = 8 if args.dofs_scale == "xl" else 4
    t0 = time.perf_counter()
    gpd = init_grid_and_problem(
        {'num_subdomains': [8, 8, 4],
         'half_num_fine_elements_per_subdomain_and_dim': half,
         'num_refinements': 0})
    sp = BlockDGSpace3D(gpd["grid"])
    print(f"K={sp.K}, N={sp.N}, {sp.K * sp.N} dofs f64, "
          f"devices={len(jax.devices())}")
    lam_funcs = gpd["lambda"]["functions"]
    built = jax.jit(hp(lambda: (
        tuple(assemble_swipdg_stencil3(sp, lf, None, dtype=jnp.float64)
              for lf in lam_funcs),
        asm3.volume_functional(sp, gpd["f"], jnp.float64))))()
    stencils, rhs = built
    jax.block_until_ready(rhs)
    print(f"assembly: {time.perf_counter() - t0:.1f} s")

    theta = jnp.asarray([1.0, 0.5])
    sop = StencilOperator3(sp, stencils)
    sm = SubdomainMesh.create(8)
    t0 = time.perf_counter()
    sop_sh = sm.shard_stencil(sop)
    with sm.mesh:
        A = jax.jit(hp(lambda s, th: s.assemble(th)))(sop_sh, theta)
        cf = jax.jit(hp(lambda A_: A_.cell_jacobi_factors()))(A)
        A0 = stencil_coarse_matrix(A)
    ci = dense_inv_mixed(jnp.asarray(np.asarray(A0, np.float64)))
    print(f"sharded preconditioner (cell-Jacobi + constant coarse): "
          f"{time.perf_counter() - t0:.1f} s")

    b_sh = jax.device_put(rhs, sm.shard_k(0))
    with sm.mesh:
        solve = jax.jit(hp(lambda A_, b_, f_, ci_, x0_: A_.solve_pcg(
            b_, tol=1e-8, maxiter=500, factors=f_, coarse_inv=ci_,
            return_iters=True, x0=x0_)), out_shardings=(sm.shard_k(0), None))
        relres = jax.jit(hp(lambda A_, U_, b_: jnp.linalg.norm(
            (b_ - A_.apply(U_)).reshape(-1))
            / jnp.linalg.norm(b_.reshape(-1))))
        t0 = time.perf_counter()
        U = jnp.zeros_like(b_sh)
        total = 0
        for rnd in range(20):
            U, it = solve(A, b_sh, cf, ci, U)
            total += int(it)
            r = float(relres(A, U, b_sh))
            if r < 1e-8 or int(it) == 0:
                break
    print(f"sharded XL solve: {time.perf_counter() - t0:.1f} s, "
          f"{total} PCG iterations, relres {r:.1e}")
    nsh = len(set(s.device for s in U.addressable_shards))
    print(f"solution sharded over {nsh} devices; OK")


if __name__ == "__main__":
    main()
