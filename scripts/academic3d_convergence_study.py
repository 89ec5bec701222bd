"""Convergence study for the 3D hex family on the academic 3D problem.

Mirrors the 2D OS2015 study scripts for the beyond-reference 3D pipeline:
per refinement level, the Q1 SWIPDG solve at mu = 1 (exact solution
u = cos(pi x/2) cos(pi y/2) cos(pi z/2)), the localized error estimator in
the paper convention, the true energy error by quadrature, and the
efficiency eta/|||e|||.  Expected: first-order indicators, EOC(energy) = 1,
level-near-constant efficiency.

Usage: python scripts/academic3d_convergence_study.py [levels]
"""
import sys

import numpy as np


def main(levels=3):
    import jax
    from pylrbms_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_enable_x64", True)
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    from pylrbms_tpu.ops import assembly3d as asm3

    mu = {"diffusion": 1.0}
    rows = []
    for nref in range(levels):
        gpd = init_grid_and_problem(
            {"num_subdomains": [2, 2, 2],
             "half_num_fine_elements_per_subdomain_and_dim": 1,
             "num_refinements": nref})
        d, _ = discretize(gpd)
        sp = d.space
        U = d.solve(mu)
        eta, (nc, r, df), _ = d.estimate(U, mu, decompose=True,
                                         paper_convention=True)
        # true energy error by quadrature (lambda == 1 at mu = 1)
        xq = np.asarray(asm3.vol_points(sp))
        dphi = np.asarray(sp.vol_dphi)
        Uc = np.asarray(U).reshape(sp.K, sp.s ** 3, sp.nb)
        gu = np.einsum("kci,qia->kcqa", Uc, dphi)
        p2 = np.pi / 2
        cx, sx = np.cos(p2 * xq[..., 0]), np.sin(p2 * xq[..., 0])
        cy, sy = np.cos(p2 * xq[..., 1]), np.sin(p2 * xq[..., 1])
        cz, sz = np.cos(p2 * xq[..., 2]), np.sin(p2 * xq[..., 2])
        gex = -p2 * np.stack([sx * cy * cz, cx * sy * cz, cx * cy * sz], -1)
        diff = gu - gex
        err = np.sqrt(sp.volume * np.einsum("q,kcqa,kcqa->",
                                            np.asarray(sp.vol_w), diff, diff))
        h = gpd["grid"].max_entity_diameter()
        norm2 = lambda v: float(np.sqrt(np.sum(np.asarray(v) ** 2)))
        rows.append((h, float(eta), err, norm2(nc), norm2(r), norm2(df)))

    print(f"{'h':>9} {'|||e|||':>10} {'eoc':>5} {'eta':>10} {'eoc':>5} "
          f"{'eff':>6} {'eta_nc':>10} {'eta_r':>10} {'eta_df':>10}")
    for i, (h, eta, err, nc, r, df) in enumerate(rows):
        if i == 0:
            e1 = e2 = "  --"
        else:
            hp_, etap, errp = rows[i - 1][:3]
            e1 = f"{np.log(errp / err) / np.log(hp_ / h):5.2f}"
            e2 = f"{np.log(etap / eta) / np.log(hp_ / h):5.2f}"
        print(f"{h:9.3e} {err:10.4e} {e1:>5} {eta:10.4e} {e2:>5} "
              f"{eta / err:6.2f} {nc:10.4e} {r:10.4e} {df:10.4e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
