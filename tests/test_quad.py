"""Quad ('yasp'/cube) element path: assembly, estimator, MOR, enrichment.

The reference supports both grid families through its compile-time
``GDT_BINDINGS_GRID`` token (simplex ALU grids in the scripts, Yasp cube
grids in ``python/test/mpitest.py:23-28``).  These tests exercise our Q1
SWIPDG path end-to-end the same way the tri tests do: independent
exact-solution convergence, operator SPD-ness, flux-reconstruction local
conservation, Oswald projection property, ROM==FOM estimator parity, and
online enrichment down to the FOM floor.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.ops import assembly as asm


def _setup(half=2, subs=(2, 2)):
    cfg = {"num_subdomains": list(subs),
           "half_num_fine_elements_per_subdomain_and_dim": half,
           "grid_type": "yasp"}
    gpd = init_grid_and_problem(cfg, mu_bar=1.0, mu_hat=1.0)
    m, data = discretize(gpd)
    return gpd, m, data


def test_quad_grid_type_aliases():
    from pylrbms_tpu.grid import make_grid
    for token in ("yasp", "cube", "quad"):
        g = make_grid(((0, 0), (1, 1)), [2, 2], 1, grid_type=token)
        assert g.grid_type == "quad"
        assert g.num_elements == g.global_nx * g.global_ny  # 1 elem/cell
    for token in ("alu", "tri"):
        g = make_grid(((0, 0), (1, 1)), [2, 2], 1, grid_type=token)
        assert g.grid_type == "tri"


def test_quad_operator_spd():
    _, m, _ = _setup(half=1)
    A = np.asarray(m.assemble({"diffusion": 0.5}).to_dense())
    assert np.abs(A - A.T).max() <= 1e-12 * np.abs(A).max()
    w = np.linalg.eigvalsh(A)
    assert w.min() > 0


@pytest.mark.slow
def test_quad_exact_solution_convergence():
    """u = cos(pi x/2) cos(pi y/2) is exact at mu=1; expect O(h^2) in L2."""
    errs = []
    for half in (1, 2, 4):
        gpd, m, data = _setup(half=half)
        U = m.solve({"diffusion": 1.0})
        sp = data["space"]
        xq = np.asarray(asm._vol_points(sp))
        uex = np.cos(0.5 * np.pi * xq[..., 0]) * np.cos(0.5 * np.pi * xq[..., 1])
        phi = np.asarray(sp.vol_phi)
        Uc = np.asarray(U).reshape(sp.K, sp.s, sp.s, sp.T, sp.nb)
        uh = np.einsum("kyxtj,tqj->kyxtq", Uc, phi)
        w = np.asarray(sp.vol_w)
        errs.append(float(np.sqrt(
            sp.hx * sp.hy * np.einsum("tq,kyxtq->", w, (uh - uex) ** 2))))
    eoc = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert (eoc > 1.7).all(), (errs, eoc)


def test_quad_flux_reconstruction_local_conservation():
    """SWIPDG with v = 1_T gives  |T| * div(t)|_T = int_T f  exactly."""
    gpd, m, data = _setup(half=2)
    mu = {"diffusion": 0.5}
    U = m.solve(mu)
    est = m.estimator
    d = est.data
    sp = data["space"]
    t = est.reconstruct_flux(U, mu)                       # [K, Nrt]
    chi, idx, div = sp.rt_cell_tab()
    nf = idx.shape[-1]
    t_cell = np.asarray(t)[:, idx.reshape(-1)].reshape(sp.K, sp.s, sp.s, sp.T, nf)
    div_t = np.einsum("kyxte,te->kyxt", t_cell, div)      # constant per element
    # int_T f(mu)
    xq = np.asarray(asm._vol_points(sp))
    f = sum(float(c) * np.asarray(ff(jnp.asarray(xq)))
            for c, ff in zip([1.0], d.f_funcs))
    w = np.asarray(sp.vol_w)
    int_f = sp.hx * sp.hy * np.einsum("tq,kyxtq->kyxt", w, f)
    area_T = sp.hx * sp.hy  # one element per cell on the quad grid
    assert np.abs(area_T * div_t - int_f).max() < 1e-10


def test_quad_oswald_projection():
    """I_os reproduces continuous nodal data vanishing on the boundary."""
    from pylrbms_tpu.ops.oswald import OswaldOperator
    gpd, m, data = _setup(half=2)
    sp = data["space"]
    xn = sp.node_coords_phys()                            # [K,s,s,T,nb,2]
    u = (np.sin(np.pi * (xn[..., 0] + 1) / 2)
         * np.sin(np.pi * (xn[..., 1] + 1) / 2)).reshape(sp.K, sp.N)
    os = OswaldOperator(sp)
    err = os.apply(jnp.asarray(u))                        # u - I_os(u)
    assert float(jnp.abs(err).max()) < 1e-12


def test_quad_rom_estimator_parity():
    gpd, m, data = _setup(half=2)
    from pylrbms_tpu.reductor import LRBMSReductor
    red = LRBMSReductor(m, products=data["local_energy_dg_product"], order=0)
    for v in (0.2, 0.6, 1.0):
        red.extend_basis(m.solve({"diffusion": v}))
    rd = red.reduce()
    mu = {"diffusion": 0.45}
    c = rd.solve(mu)
    U_rec = red.reconstruct(c)
    eta_rom = float(rd.estimate(c, mu))
    eta_fom = float(m.estimate(U_rec, mu))
    assert abs(eta_rom - eta_fom) <= 1e-8 * eta_fom


def test_quad_online_enrichment_reaches_fom_floor():
    gpd, m, data = _setup(half=2)
    from pylrbms_tpu.reductor import LRBMSReductor
    from pylrbms_tpu.online_enrichment import AdaptiveEnrichment
    mu = {"diffusion": 0.37}
    eta_fom = float(m.estimate(m.solve(mu), mu))
    red = LRBMSReductor(m, products=data["local_energy_dg_product"], order=0)
    rd = red.reduce()
    ae = AdaptiveEnrichment(gpd, m, data["block_space"], red, rd,
                            target_error=1.001 * eta_fom,
                            marking_doerfler_theta=0.5)
    u, rd2, _ = ae.solve(mu, enrichment_steps=8)
    eta_final = float(rd2.estimate(u, mu))
    assert eta_final <= 1.01 * eta_fom, (eta_final, eta_fom)


@pytest.mark.slow
def test_quad_parabolic_and_eoc():
    import math
    from pylrbms_tpu.problems.artificial_channels import \
        init_grid_and_problem as channels
    from pylrbms_tpu.discretize_parabolic_block_swipdg import \
        discretize as discretize_parabolic
    gpd = channels({"num_subdomains": [2, 2],
                    "half_num_fine_elements_per_subdomain_and_dim": 1,
                    "grid_type": "yasp"})
    im, _ = discretize_parabolic(gpd, T=1.0, nt=8)
    mu = {"switch": 0.4}
    traj = im.solve(mu)
    assert bool(jnp.all(jnp.isfinite(traj)))
    est, _parts = im.estimate(traj, mu)
    assert np.isfinite(float(est)) and float(est) > 0

    from pylrbms_tpu.EOC import StationaryEocStudy, default_refine
    study = StationaryEocStudy(
        init_grid_and_problem, lambda g: discretize(g),
        {"num_subdomains": [2, 2],
         "half_num_fine_elements_per_subdomain_and_dim": 1,
         "num_refinements": 0, "grid_type": "yasp"},
        default_refine, mu=1, p_ref=2, max_levels=1)
    data = study.run(("h", "elliptic_mu_bar", "eta_df", "eta"))
    n0 = data[0]["norm"]["elliptic_mu_bar"]
    n1 = data[1]["norm"]["elliptic_mu_bar"]
    rate = math.log(n1 / n0) / math.log(0.5)
    assert 0.7 < rate < 1.5, f"quad elliptic norm EOC {rate}"


def test_quad_matrix_free_stencil_matches_dense():
    from pylrbms_tpu.ops.matrixfree import assemble_swipdg_stencil, StencilOperator
    gpd, m, data = _setup(half=1, subs=(3, 2))
    sp = data["space"]
    sten = tuple(assemble_swipdg_stencil(sp, lf, None)
                 for lf in m.estimator.data.lambda_funcs)
    sop = StencilOperator(sp, sten)
    mu = {"diffusion": 0.5}
    A = m.assemble(mu)
    Amf = sop.assemble(m.theta(mu))
    x = jnp.asarray(np.random.RandomState(0).randn(sp.K, sp.N))
    y_d, y_mf = A.apply(x), Amf.apply(x)
    assert float(jnp.abs(y_d - y_mf).max()) <= 1e-12 * float(jnp.abs(y_d).max())
    b = m.rhs(mu)
    x_mf = Amf.solve_pcg(b, tol=1e-12, maxiter=3000)
    relres = float(jnp.linalg.norm(b - A.apply(x_mf)) / jnp.linalg.norm(b))
    assert relres < 1e-10


@pytest.mark.slow
def test_quad_positive_form_matches_matrix_form():
    """local_quantities_positive == local_quantities (same quadrature)."""
    gpd, m, data = _setup(half=2)
    mu = {"diffusion": 0.5}
    U = m.solve(mu)
    est = m.estimator
    nc1, r1, df1 = est.local_quantities(U, mu)
    nc2, r2, df2 = est.local_quantities_positive(U, mu)
    for a, b in ((nc1, nc2), (r1, r2), (df1, df2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)
