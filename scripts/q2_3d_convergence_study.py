"""Q2 (order-2) estimator convergence study on the 3D hex family.

Beyond-reference capability twice over (the reference is 2D-only AND
P1/RT0-only): the degree-matched RT_[1] hex reconstruction
(``pylrbms_tpu/ops/rt1hex.py``) validated against the manufactured 3D
solution u = cos(pi x/2) cos(pi y/2) cos(pi z/2) on [-1, 1]^3 (lambda = 1
at mu = 1, the 3D academic problem): the true energy error and the
paper-convention eta with its three indicators must all decay at order ~2
with bounded efficiency.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
        python scripts/q2_3d_convergence_study.py
"""
import numpy as np


def true_energy_err(sp, U):
    import jax.numpy as jnp
    from pylrbms_tpu.ops import assembly3d as asm3
    xq = np.asarray(asm3.vol_points(sp, jnp.float64))
    w = np.asarray(sp.vol_w)
    dphi = np.asarray(sp.vol_dphi)
    Uc = np.asarray(U).reshape(sp.K, sp.s ** 3, sp.nb)
    gu = np.einsum("kcj,qja->kcqa", Uc, dphi)
    px = 0.5 * np.pi
    c, s = np.cos, np.sin
    gex = np.stack([
        -px * s(px * xq[..., 0]) * c(px * xq[..., 1]) * c(px * xq[..., 2]),
        -px * c(px * xq[..., 0]) * s(px * xq[..., 1]) * c(px * xq[..., 2]),
        -px * c(px * xq[..., 0]) * c(px * xq[..., 1]) * s(px * xq[..., 2])],
        -1)
    d = gu - gex
    return float(np.sqrt(sp.volume * np.einsum("q,kcqa,kcqa->", w, d, d)))


def main():
    import jax.numpy as jnp
    from pylrbms_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize

    mu = {"diffusion": 1.0}
    rows = []
    print("Q2 hex (RT_[1] flux) on the 3D academic problem, mu = 1")
    print(f"{'h':>8} {'dofs':>8} {'|e|_E':>10} {'eta':>10} {'eta_nc':>10} "
          f"{'eta_r':>10} {'eta_df':>10} {'eff':>6}")
    for ns, nref, lean in ((2, 0, False), (2, 1, False), (4, 1, True)):
        gpd = init_grid_and_problem(
            {'num_subdomains': [ns] * 3,
             'half_num_fine_elements_per_subdomain_and_dim': 1,
             'num_refinements': nref})
        d, _ = discretize(gpd, order=2, lean=lean)
        U = d.solve(mu)
        eta, (nc, r, df), _ = d.estimator.estimate(U, mu, decompose=True,
                                                   paper_convention=True)
        parts = [float(jnp.sqrt(jnp.sum(v ** 2))) for v in (nc, r, df)]
        err = true_energy_err(d.space, U)
        h = gpd["grid"].hx
        rows.append((h, float(eta), err) + tuple(parts))
        print(f"{h:8.4f} {d.space.K * d.space.N:8d} {err:10.3e} "
              f"{float(eta):10.3e} {parts[0]:10.3e} {parts[1]:10.3e} "
              f"{parts[2]:10.3e} {float(eta) / err:6.2f}")
    rows = np.array(rows)
    hr = np.log(rows[:-1, 0] / rows[1:, 0])
    names = ("eta", "|e|_E", "eta_nc", "eta_r", "eta_df")
    print("\nEOC per refinement step:")
    for j, name in enumerate(names, start=1):
        eoc = np.log(rows[:-1, j] / rows[1:, j]) / hr
        print(f"  {name:>7}: " + "  ".join(f"{v:.2f}" for v in eoc))


if __name__ == "__main__":
    main()
