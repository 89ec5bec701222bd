"""Order-2 estimation pipeline: RT1 flux space, P2 Oswald, P2 estimator EOC.

Beyond-reference coverage: the reference's estimator is P1/RT0-only (its P2
space is EOC-reference only, ``/root/reference/python/dune/pylrbms/
discretize_elliptic_swipdg.py:26-71``); here the full OS2015-style machinery
runs on the P2 block space with the degree-matched RT1 reconstruction
(``pylrbms_tpu/ops/rt1.py``), validated by:

* unisolvence/duality of the RT1 moment-dual basis,
* exactness: for a globally conforming quadratic u (lambda = 1) the
  reconstruction reproduces t = -grad(u) on all-interior-edge elements,
* H(div) conformity of the reconstructed flux for random DG data,
* Oswald-order-2 idempotency / C0 continuity / Dirichlet zeroing,
* matrix-form estimator == positive-form estimator,
* the manufactured-solution EOC: all three indicators decay at order 2 and
  the efficiency eta/|u - u_h|_energy is level-constant (the jump-lifted
  interior moments are what make eta_r second order).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylrbms_tpu.grid import make_grid
from pylrbms_tpu.ops.spaces import BlockDGSpace
from pylrbms_tpu.ops import rt1, assembly as asm
from pylrbms_tpu.ops.oswald import OswaldOperator
from pylrbms_tpu.problems.non_parametric import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize


def _space(nsub=2, half=1, nref=1, order=2):
    g = make_grid(num_subdomains=[nsub, nsub],
                  half_num_fine_elements_per_subdomain_and_dim=half,
                  num_refinements=nref)
    return BlockDGSpace(g, order=order)


ONE = lambda x: jnp.ones(x.shape[:-1], x.dtype)


def test_rt1_duality_and_layout():
    sp = _space()
    chi1, idx1, div1 = rt1.rt1_cell_tab(sp)
    assert chi1.shape[-2:] == (8, 2) and idx1.shape[-1] == 8
    # moments of the dual basis are the identity
    from pylrbms_tpu.quadrature import edge_rule
    tau, wf = edge_rule(sp._face_quad)
    scale = np.array([sp.hx, sp.hy])
    area = sp.hx * sp.hy
    slots = rt1._tri_edge_slots(sp)
    for ti, name in enumerate(("A", "B")):
        M = np.zeros((8, 8))
        for k, (geom, n, ell) in enumerate(slots[name]):
            xe = geom.points(tau) * scale
            Vn = rt1._coeff_basis_vals(xe) @ n
            M[2 * k] = ell * np.einsum("q,qc->c", wf, Vn)
            M[2 * k + 1] = ell * np.einsum("q,q,qc->c", wf, 2 * tau - 1, Vn)
        Vq = rt1._coeff_basis_vals(sp.vol_qp[ti] * scale)
        M[6] = area * np.einsum("q,qc->c", sp.vol_w[ti], Vq[..., 0])
        M[7] = area * np.einsum("q,qc->c", sp.vol_w[ti], Vq[..., 1])
        assert np.abs(M @ sp._rt1_minv[ti] - np.eye(8)).max() < 1e-12
    # local-to-global covers the global dof set exactly once per global dof
    l2g = rt1.rt1_local_to_global(sp)
    assert len(np.unique(l2g)) == rt1.N_rt1_global(sp)
    assert l2g.max() == rt1.N_rt1_global(sp) - 1


def test_rt1_reconstruction_exact_for_conforming_quadratic():
    sp = _space(nsub=1, half=2, nref=1)          # single block, s=4
    def u_ex(x, y):
        return x * x + 2 * x * y - 3 * y * y + 0.5 * x - 0.25 * y + 0.125
    def gu_ex(x, y):
        return np.stack([2 * x + 2 * y + 0.5, 2 * x - 6 * y - 0.25], -1)
    coords = sp.node_coords_phys()
    U = jnp.asarray(u_ex(coords[..., 0], coords[..., 1]).reshape(sp.K, sp.N))
    flux = rt1.FluxReconstructorRT1(sp, None)
    t = np.asarray(flux.apply(ONE, U))
    chi1, idx1, _ = rt1.rt1_cell_tab(sp)
    t_cell = t[..., idx1.reshape(-1)].reshape(sp.K, sp.s, sp.s, sp.T, 8)
    t_q = np.einsum("kyxte,tqea->kyxtqa", t_cell, chi1)
    xq = np.asarray(asm._vol_points(sp))
    exact = -gu_ex(xq[..., 0], xq[..., 1])
    # interior cells: all incident edges are interior -> t == -grad u exactly
    assert np.abs((t_q - exact)[:, 1:-1, 1:-1]).max() < 1e-11


def test_rt1_hdiv_conformity_random():
    sp = _space(nsub=1, half=2, nref=1)
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((sp.K, sp.N)))
    flux = rt1.FluxReconstructorRT1(sp, None)
    t = np.asarray(flux.apply(ONE, U))
    _, idx1, _ = rt1.rt1_cell_tab(sp)
    t_cell = t[..., idx1.reshape(-1)].reshape(sp.K, sp.s, sp.s, sp.T, 8)
    Minv = sp._rt1_minv
    scale = np.array([sp.hx, sp.hy])
    tau = np.linspace(0.1, 0.9, 5)
    from pylrbms_tpu import basis as B

    def eval_t(coeff8, ti, xpts):
        chi = np.einsum("pca,cj->pja", rt1._coeff_basis_vals(xpts), Minv[ti])
        return np.einsum("e,pea->pa", coeff8, chi)

    # D family: A vs B inside every cell
    (tmA, emA), (tpB, epB) = B.EDGES_UNIT["D"]
    nD = sp.face_tabs["D"].normal
    xeA, xeB = emA.points(tau) * scale, epB.points(tau) * scale
    for cy in range(sp.s):
        for cx in range(sp.s):
            tA = eval_t(t_cell[0, cy, cx, 0], 0, xeA)
            tB = eval_t(t_cell[0, cy, cx, 1], 1, xeB)
            assert np.abs((tA - tB) @ nD).max() < 1e-10
    # V family: (cy, cx, A) right vs (cy, cx+1, B) left
    (tmA, emV), (tpB, epV) = B.EDGES_UNIT["V"]
    nV = sp.face_tabs["V"].normal
    xm, xp = emV.points(tau) * scale, epV.points(tau) * scale
    for cy in range(sp.s):
        for cx in range(sp.s - 1):
            tm = eval_t(t_cell[0, cy, cx, 0], 0, xm)
            tp = eval_t(t_cell[0, cy, cx + 1, 1], 1, xp)
            assert np.abs((tm - tp) @ nV).max() < 1e-10


def test_oswald_order2():
    sp = _space(nsub=2, half=1, nref=1)
    osw = OswaldOperator(sp)
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.standard_normal((sp.K, sp.N)))
    I1 = osw.interpolate(U)
    # idempotent (the image is the conforming zero-trace subspace)
    assert float(jnp.abs(osw.interpolate(I1) - I1).max()) < 1e-12
    # continuous: nodes sharing a lattice point carry one value
    vals = np.asarray(osw._block_to_global_cells(I1)).reshape(-1)
    per_node = {}
    for vid, v in zip(osw.vertex_ids, vals):
        per_node.setdefault(vid, []).append(v)
    for vid, vs in per_node.items():
        assert np.ptp(vs) < 1e-12
    # zero at boundary lattice nodes
    for vid, vs in per_node.items():
        if not osw.interior_mask[vid]:
            assert abs(vs[0]) < 1e-12
    # order-1 generic builder reproduces the hand-built P1 tables
    sp1 = _space(nsub=2, half=1, nref=1, order=1)
    osw1 = OswaldOperator(sp1)
    osw1g = OswaldOperator.__new__(OswaldOperator)
    osw1g.space, osw1g.Sy, osw1g.Sx = sp1, osw1.Sy, osw1.Sx
    osw1g._init_generic()
    U1 = jnp.asarray(rng.standard_normal((sp1.K, sp1.N)))
    assert float(jnp.abs(osw1.interpolate(U1) - osw1g.interpolate(U1)).max()) < 1e-12


def test_p2_matrix_vs_positive_paths():
    cfg = dict(num_subdomains=[2, 2],
               half_num_fine_elements_per_subdomain_and_dim=1,
               num_refinements=1)
    m, data = discretize(init_grid_and_problem(cfg), order=2)
    U = m.solve({})
    est = m.estimator
    nc, r, df = est.local_quantities(U[None], {})
    nc2, r2, df2 = est.local_quantities_positive(U[None], {})
    for a, b in ((nc, nc2), (r, r2), (df, df2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-14)


def _true_energy_err(sp, U):
    xq = np.asarray(asm._vol_points(sp))
    w = np.asarray(sp.vol_w)
    dphi = np.asarray(sp.vol_dphi)
    Uc = np.asarray(U).reshape(sp.K, sp.s, sp.s, sp.T, sp.nb)
    gu = np.einsum("kyxtj,tqja->kyxtqa", Uc, dphi)
    gex = np.stack(
        [-0.5 * np.pi * np.sin(0.5 * np.pi * xq[..., 0]) * np.cos(0.5 * np.pi * xq[..., 1]),
         -0.5 * np.pi * np.cos(0.5 * np.pi * xq[..., 0]) * np.sin(0.5 * np.pi * xq[..., 1])],
        -1)
    d = gu - gex
    return float(np.sqrt(sp.hx * sp.hy * np.einsum("tq,kyxtqa,kyxtqa->", w, d, d)))


@pytest.mark.slow
def test_p2_estimator_eoc_second_order_and_constant_efficiency():
    """Manufactured solution u = cos(pi x/2) cos(pi y/2), lambda = 1: the P2
    true energy error is O(h^2); the paper-convention eta and all three
    indicators must follow at order ~2 with level-constant efficiency (the
    measured table: eff 2.22 / 2.22 / 2.22 at h = 1/2, 1/4, 1/8)."""
    etas, errs, parts = [], [], []
    for nref in (0, 1, 2):
        cfg = dict(num_subdomains=[2, 2],
                   half_num_fine_elements_per_subdomain_and_dim=2,
                   num_refinements=nref)
        m, data = discretize(init_grid_and_problem(cfg), order=2)
        sp = data["space"]
        U = m.solve({})
        eta, (nc, r, df), _ = m.estimator.estimate(
            U, {}, decompose=True, paper_convention=True)
        etas.append(float(eta))
        errs.append(_true_energy_err(sp, U))
        parts.append([float(jnp.sqrt(jnp.sum(v ** 2))) for v in (nc, r, df)])
    etas, errs, parts = np.array(etas), np.array(errs), np.array(parts)
    eoc_eta = np.log2(etas[:-1] / etas[1:])
    eoc_err = np.log2(errs[:-1] / errs[1:])
    assert np.all(eoc_err > 1.8), eoc_err
    assert np.all(eoc_eta > 1.8), eoc_eta
    for j in range(3):                       # nc, r, df all second order
        eoc_p = np.log2(parts[:-1, j] / parts[1:, j])
        assert np.all(eoc_p > 1.7), (j, eoc_p)
    eff = etas / errs
    assert np.ptp(eff) / eff.mean() < 0.1, eff     # level-constant
    assert np.all(eff > 1.0), eff                  # reliable on this config


def test_p2_mor_and_online_enrichment():
    """The MOR layer is generic over the space order: reduce / ROM solve /
    N-independent online estimate / online enrichment all run on the P2
    model, with the ROM estimator equal to the FOM estimator of the
    reconstructed solution (the defining consistency of the projected
    estimator tensors, here over RT1-sized tensors)."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    from pylrbms_tpu.reductor import LRBMSReductor
    from pylrbms_tpu.online_enrichment import AdaptiveEnrichment
    cfg = dict(num_subdomains=[2, 2],
               half_num_fine_elements_per_subdomain_and_dim=1,
               num_refinements=1)
    gpd = os2015(cfg)
    m, data = discretize(gpd, order=2)
    red = LRBMSReductor(m, order=1)
    for mu in ({"diffusion": 0.1}, {"diffusion": 1.0}):
        red.extend_basis(m.solve(mu))
    rom = red.reduce()
    mu = {"diffusion": 0.4}
    u_r = rom.solve(mu)
    eta_rom = float(rom.estimate(u_r, mu))
    eta_rec = float(m.estimator.estimate(red.reconstruct(u_r), mu))
    assert abs(eta_rom - eta_rec) / eta_rec < 1e-8
    # enrichment drives eta down on a fresh one-snapshot ROM
    red2 = LRBMSReductor(m, order=1)
    red2.extend_basis(m.solve({"diffusion": 1.0}))
    rom2 = red2.reduce()
    loop = AdaptiveEnrichment(gpd, m, data["block_space"], red2, rom2,
                              target_error=1e-12, marking_doerfler_theta=0.5,
                              marking_max_age=100)
    etas = []
    loop.solve({"diffusion": 0.27}, enrichment_steps=3,
               callback=lambda rd_, u, mu_, info: etas.append(info["eta"]))
    assert etas[-1] < 0.2 * etas[0], etas


def test_p2_lean_reduce_matches_standard():
    """The at-scale (lean) reduce path sizes its flux-image stack from the
    reconstructor (RT1 width for P2), not space.N_rt — regression for the
    order-2 shape bug; results must equal the standard path."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    from pylrbms_tpu.reductor import LRBMSReductor
    cfg = dict(num_subdomains=[2, 2],
               half_num_fine_elements_per_subdomain_and_dim=1,
               num_refinements=1)
    m, _ = discretize(os2015(cfg), order=2)
    red = LRBMSReductor(m, order=1)
    for mu in ({"diffusion": 0.1}, {"diffusion": 1.0}):
        red.extend_basis(m.solve(mu))
    rd_ref = red.reduce()
    red._project_cache = {}
    red._img_cache = None
    red.force_lean = True
    red.force_chunk = 4
    rd_lean = red.reduce()
    for name in ('A_red', 'b_red', 'G_nc', 'AA', 'ABT', 'BBT', 'DV', 'RD'):
        np.testing.assert_allclose(np.asarray(getattr(rd_ref, name)),
                                   np.asarray(getattr(rd_lean, name)),
                                   rtol=1e-12, atol=1e-14, err_msg=name)
    mu = {'diffusion': 0.55}
    e1 = float(rd_ref.estimate(rd_ref.solve(mu), mu))
    e2 = float(rd_lean.estimate(rd_lean.solve(mu), mu))
    assert abs(e1 - e2) <= 1e-9 * abs(e1)


def test_p2_crisscross_reconstruction_exact():
    """The crisscross RT1 tabulation (4 element types, parity-gathered
    per-cell tables) reproduces t = -grad(u) for a conforming quadratic on
    all-interior-edge cells."""
    g = make_grid(num_subdomains=[1, 1],
                  half_num_fine_elements_per_subdomain_and_dim=2,
                  num_refinements=1, grid_type="crisscross")
    sp = BlockDGSpace(g, order=2)

    def u_ex(x, y):
        return x * x + 2 * x * y - 3 * y * y + 0.5 * x - 0.25 * y + 0.125

    def gu_ex(x, y):
        return np.stack([2 * x + 2 * y + 0.5, 2 * x - 6 * y - 0.25], -1)

    coords = sp.node_coords_phys()
    U = jnp.asarray(u_ex(coords[..., 0], coords[..., 1]).reshape(sp.K, sp.N))
    flux = rt1.FluxReconstructorRT1(sp, None)
    t = np.asarray(flux.apply(ONE, U))
    chi1, idx1, _ = rt1.rt1_cell_tab(sp)
    t_cell = t[..., idx1.reshape(-1)].reshape(sp.K, sp.s, sp.s, sp.T, 8)
    t_q = np.einsum("kyxte,yxtqea->kyxtqa", t_cell, chi1)
    xq = np.asarray(asm._vol_points(sp))
    exact = -gu_ex(xq[..., 0], xq[..., 1])
    assert np.abs((t_q - exact)[:, 1:-1, 1:-1]).max() < 1e-11


@pytest.mark.slow
def test_p2_crisscross_eoc():
    """Crisscross P2 estimator: second-order indicators, level-constant
    efficiency (measured 2.26 / 2.29 / 2.30 at h = 1/2, 1/4, 1/8)."""
    etas, errs = [], []
    for nref in (1, 2):
        cfg = dict(num_subdomains=[2, 2],
                   half_num_fine_elements_per_subdomain_and_dim=1,
                   num_refinements=nref, grid_type="crisscross")
        m, data = discretize(init_grid_and_problem(cfg), order=2)
        sp = data["space"]
        U = m.solve({})
        eta = float(m.estimator.estimate(U, {}, paper_convention=True))
        # percell-aware true error
        xq = np.asarray(asm._vol_points(sp))
        w = np.asarray(sp.vol_w)
        dphi = np.asarray(sp.vol_dphi)
        Uc = np.asarray(U).reshape(sp.K, sp.s, sp.s, sp.T, sp.nb)
        gu = np.einsum("kyxtj,yxtqja->kyxtqa", Uc, dphi)
        gex = np.stack(
            [-0.5 * np.pi * np.sin(0.5 * np.pi * xq[..., 0]) * np.cos(0.5 * np.pi * xq[..., 1]),
             -0.5 * np.pi * np.cos(0.5 * np.pi * xq[..., 0]) * np.sin(0.5 * np.pi * xq[..., 1])],
            -1)
        d = gu - gex
        errs.append(float(np.sqrt(sp.hx * sp.hy
                                  * np.einsum("yxtq,kyxtqa,kyxtqa->", w, d, d))))
        etas.append(eta)
    assert np.log2(etas[0] / etas[1]) > 1.8, etas
    assert np.log2(errs[0] / errs[1]) > 1.8, errs
    eff = np.array(etas) / np.array(errs)
    assert np.ptp(eff) / eff.mean() < 0.1, eff


def test_q2_quad_reconstruction_exact():
    """Rectangle RT_[1] = Q_{2,1} x Q_{1,2}: reproduces t = -grad(u) for a
    conforming quadratic whose gradient lies in the space (Q_{1,1}
    components) on all-interior-edge cells."""
    g = make_grid(num_subdomains=[1, 1],
                  half_num_fine_elements_per_subdomain_and_dim=2,
                  num_refinements=1, grid_type="quad")
    sp = BlockDGSpace(g, order=2)

    def u_ex(x, y):
        return x * x + 3 * x * y - 2 * y * y + x - y

    def gu_ex(x, y):
        return np.stack([2 * x + 3 * y + 1, 3 * x - 4 * y - 1], -1)

    coords = sp.node_coords_phys()
    U = jnp.asarray(u_ex(coords[..., 0], coords[..., 1]).reshape(sp.K, sp.N))
    flux = rt1.FluxReconstructorRT1(sp, None)
    t = np.asarray(flux.apply(ONE, U))
    chi1, idx1, _ = rt1.rt1_cell_tab(sp)
    t_cell = t[..., idx1.reshape(-1)].reshape(sp.K, sp.s, sp.s, sp.T, 12)
    t_q = np.einsum("kyxte,tqea->kyxtqa", t_cell, chi1)
    xq = np.asarray(asm._vol_points(sp))
    exact = -gu_ex(xq[..., 0], xq[..., 1])
    assert np.abs((t_q - exact)[:, 1:-1, 1:-1]).max() < 1e-11


@pytest.mark.slow
def test_q2_quad_eoc():
    """Q2 estimator: second-order indicators, level-constant efficiency
    (measured 2.98 / 3.00 / 3.00 at h = 1/2, 1/4, 1/8), matrix == positive
    paths."""
    etas, errs = [], []
    m = None
    for nref in (0, 1):
        cfg = dict(num_subdomains=[2, 2],
                   half_num_fine_elements_per_subdomain_and_dim=2,
                   num_refinements=nref, grid_type="quad")
        m, data = discretize(init_grid_and_problem(cfg), order=2)
        sp = data["space"]
        U = m.solve({})
        etas.append(float(m.estimator.estimate(U, {}, paper_convention=True)))
        errs.append(_true_energy_err(sp, U))
    assert np.log2(etas[0] / etas[1]) > 1.8, etas
    assert np.log2(errs[0] / errs[1]) > 1.8, errs
    eff = np.array(etas) / np.array(errs)
    assert np.ptp(eff) / eff.mean() < 0.1, eff
    nc, r, df = m.estimator.local_quantities(U[None], {})
    nc2, r2, df2 = m.estimator.local_quantities_positive(U[None], {})
    for a, b in ((nc, nc2), (r, r2), (df, df2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-13)


def test_p2_parabolic_estimate_runs():
    """order=2 flows through the parabolic discretizer (**kw) and the
    parabolic estimator operates on the RT1/P2 tensors unchanged."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    from pylrbms_tpu.discretize_parabolic_block_swipdg import discretize as dpar
    cfg = dict(num_subdomains=[2, 2],
               half_num_fine_elements_per_subdomain_and_dim=1,
               num_refinements=1)
    im, _ = dpar(os2015(cfg), T=1.0, nt=4, order=2)
    mu = {"diffusion": 0.5}
    U = im.solve(mu)
    assert U.shape[0] == 5
    est, parts = im.estimate(U, mu)
    assert np.isfinite(float(est)) and float(est) > 0


def test_p2_vtu_subdivision_output(tmp_path):
    """Order-2 VTU output: 4 linear sub-cells per element, exact values at
    every nodal point (all families)."""
    import re
    from pylrbms_tpu.utils.vtk import write_dg_vtu
    for gt in ("tri", "quad", "crisscross"):
        g = make_grid(((0, 0), (1, 1)), [2, 2], 1, num_refinements=1,
                      grid_type=gt)
        sp = BlockDGSpace(g, order=2)
        U = np.random.default_rng(0).normal(size=(sp.K, sp.N))
        f = write_dg_vtu(sp, U, str(tmp_path / f"u_{gt}"))
        text = open(f).read()
        m = re.search(r'NumberOfPoints="(\d+)" NumberOfCells="(\d+)"', text)
        assert int(m.group(1)) == sp.K * sp.N
        assert int(m.group(2)) == sp.K * sp.s * sp.s * sp.T * 4
        field = re.search(r'Name="u" format="ascii">\n([\s\S]*?)</DataArray>',
                          text).group(1)
        np.testing.assert_allclose(np.sort(np.fromstring(field, sep=" ")),
                                   np.sort(U.reshape(-1)))
