#!/usr/bin/env python
"""131k-dof 3D estimate: TPU at-scale f32 positive-form vs CPU f64 oracle.

Stage 'tpu' (run with the axon shim on PYTHONPATH): discretize the 131k
config, solve (mixed IR), estimate (the at-scale f32 path), save U and the
eta triple to /tmp/est131k_tpu.npz.

Stage 'cpu' (run with JAX_PLATFORMS=cpu JAX_ENABLE_X64=1): discretize the
same config, load U, run the SAME positive-form estimate in f64 (the
at-scale gate is accelerator-only), print both etas and the relative
difference — the scale-level parity evidence for the round-4 f32 estimate
policy (estimators.py; VERDICT r3 #7).
"""
import sys

import numpy as np

from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

CFG = {"num_subdomains": [8, 8, 4],
       "half_num_fine_elements_per_subdomain_and_dim": 2,
       "num_refinements": 1}
PATH = "/tmp/est131k_tpu.npz"


def build():
    import jax
    jax.config.update("jax_enable_x64", True)
    from pylrbms_tpu.problems.spe10 import init_grid_and_problem_3d
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    gpd = init_grid_and_problem_3d(CFG, max_contrast=1e4)
    d, _ = discretize(gpd, lean=True)
    return d


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    import jax.numpy as jnp
    d = build()
    mu = d.parse_parameter({"switch": 1.0})
    if stage == "tpu":
        opts = {"type": "mf_pcg", "precision": 1e-8, "max_iter": 4000}
        U = d.solve(mu, inverse_options=opts)
        eta, (nc, r, df), _ = d.estimate(U, mu, decompose=True,
                                         paper_convention=True)
        n2 = lambda v: float(jnp.sqrt(jnp.sum(jnp.asarray(v) ** 2)))
        np.savez(PATH, U=np.asarray(U, np.float64), eta=float(eta),
                 nc=n2(nc), r=n2(r), df=n2(df))
        print(f"tpu f32-path eta = {float(eta):.6e}  "
              f"(nc {n2(nc):.4e}, r {n2(r):.4e}, df {n2(df):.4e}) — saved")
    else:
        dat = np.load(PATH)
        U = jnp.asarray(dat["U"])
        eta, (nc, r, df), _ = d.estimate(U, mu, decompose=True,
                                         paper_convention=True)
        n2 = lambda v: float(jnp.sqrt(jnp.sum(jnp.asarray(v) ** 2)))
        eta64 = float(eta)
        eta32 = float(dat["eta"])
        print(f"cpu f64 eta = {eta64:.6e}  (nc {n2(nc):.4e}, "
              f"r {n2(r):.4e}, df {n2(df):.4e})")
        print(f"tpu f32 eta = {eta32:.6e}")
        print(f"rel diff = {abs(eta64 - eta32) / abs(eta64):.3e}")


if __name__ == "__main__":
    main()
