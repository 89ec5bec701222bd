"""Order-2 (P2/Q2) estimator convergence study — beyond-reference capability.

The reference has no order-2 estimator (its P2 space is EOC-reference only,
``/root/reference/python/dune/pylrbms/discretize_elliptic_swipdg.py:26-71``).
This study validates the degree-matched RT1/RT_[1] reconstruction
(``pylrbms_tpu/ops/rt1.py``) on all three grid families against the
manufactured solution u = cos(pi x/2) cos(pi y/2) on [-1, 1]^2 (lambda = 1,
the non-parametric problem): true energy error and the paper-convention
eta with its three indicators must all decay at order 2, with
level-constant efficiency.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
        python scripts/p2_convergence_study.py
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def true_energy_err(sp, U):
    from pylrbms_tpu.ops import assembly as asm
    xq = np.asarray(asm._vol_points(sp))
    w = np.asarray(sp.vol_w)
    dphi = np.asarray(sp.vol_dphi)
    Uc = np.asarray(U).reshape(sp.K, sp.s, sp.s, sp.T, sp.nb)
    gs = "kyxtj,yxtqja->kyxtqa" if sp.percell else "kyxtj,tqja->kyxtqa"
    gu = np.einsum(gs, Uc, dphi)
    gex = np.stack(
        [-0.5 * np.pi * np.sin(0.5 * np.pi * xq[..., 0]) * np.cos(0.5 * np.pi * xq[..., 1]),
         -0.5 * np.pi * np.cos(0.5 * np.pi * xq[..., 0]) * np.sin(0.5 * np.pi * xq[..., 1])],
        -1)
    d = gu - gex
    ws = "yxtq,kyxtqa,kyxtqa->" if sp.percell else "tq,kyxtqa,kyxtqa->"
    return float(np.sqrt(sp.hx * sp.hy * np.einsum(ws, w, d, d)))


def main():
    import jax
    from pylrbms_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_enable_x64", True)

    from pylrbms_tpu.problems.non_parametric import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize

    for family, nrefs in (("tri", (0, 1, 2)), ("crisscross", (1, 2, 3)),
                          ("quad", (0, 1, 2))):
        print(f"\n== {family} family, order 2 "
              f"(eta/indicators: paper convention) ==")
        print(f"{'h':>8} {'energy err':>11} {'EOC':>5} {'eta':>11} {'EOC':>5}"
              f" {'eff':>5} {'eta_nc':>10} {'eta_r':>10} {'eta_df':>10}")
        prev = None
        for nref in nrefs:
            cfg = dict(num_subdomains=[2, 2],
                       half_num_fine_elements_per_subdomain_and_dim=2
                       if family != "crisscross" else 1,
                       num_refinements=nref, grid_type=family)
            m, data = discretize(init_grid_and_problem(cfg), order=2)
            sp = data["space"]
            U = m.solve({})
            eta, (nc, r, df), _ = m.estimator.estimate(
                U, {}, decompose=True, paper_convention=True)
            err = true_energy_err(sp, U)
            eta = float(eta)
            nrm = lambda v: float(np.sqrt(np.sum(np.asarray(v) ** 2)))
            eoc_e = np.log2(prev[0] / err) if prev else float("nan")
            eoc_n = np.log2(prev[1] / eta) if prev else float("nan")
            print(f"{sp.hx:8.4f} {err:11.4e} {eoc_e:5.2f} {eta:11.4e}"
                  f" {eoc_n:5.2f} {eta / err:5.2f}"
                  f" {nrm(nc):10.3e} {nrm(r):10.3e} {nrm(df):10.3e}")
            prev = (err, eta)


if __name__ == "__main__":
    sys.exit(main())
