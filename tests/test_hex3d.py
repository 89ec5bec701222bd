"""3D hex (Q1 SWIPDG) family: oracle assembly parity, solve, EOC.

The oracle is an independent numpy/scipy SIPG assembler on the GLOBAL 3D
mesh (per-face python loops, global cell enumeration) — a separate code path
from the batched strip-based assembly in ``ops/swipdg3d.py`` — mapped into
the block dof layout and compared entry-exactly.  The 3D family goes beyond
the 2D-only reference (its grid providers are 2D; SPE10 model 2 is 3D)."""
import numpy as np
import pytest
import jax.numpy as jnp

from pylrbms_tpu.grid3d import make_grid3d
from pylrbms_tpu.ops.spaces3d import BlockDGSpace3D
from pylrbms_tpu.ops.swipdg3d import (assemble_swipdg_component3, fold_diag3)
from pylrbms_tpu.ops import assembly3d as asm3
from pylrbms_tpu.la.block import BlockOpStatic, AffineBlockOp
from pylrbms_tpu import basis as B
from pylrbms_tpu import quadrature as Q

EPS = 1e-6            # must match assembly._EVAL_EPS
SIG_I, SIG_B, BETA = 8.0, 14.0, 1.0   # order-1 IPDG defaults


def _op_from_component(sp, comps, dtype=jnp.float64):
    st = BlockOpStatic.from_space(sp)
    stack = lambda name: jnp.stack([getattr(c, name) for c in comps])
    A_diag = jnp.stack([fold_diag3(sp, c, dtype) for c in comps])
    return AffineBlockOp(st, A_diag,
                         stack("X_in_out"), stack("X_out_in"),
                         stack("Y_in_out"), stack("Y_out_in"),
                         stack("Z_in_out"), stack("Z_out_in"))


# ---------------------------------------------------------------------------
# independent global-mesh oracle
# ---------------------------------------------------------------------------

def oracle_global_sipg(grid, lam, vol_quad=3, face_quad=3):
    """Assemble the global SIPG matrix in the block layout [K*N, K*N] with
    per-face python loops over the GLOBAL mesh."""
    import scipy.sparse as sp_
    s = grid.s
    nx, ny, nz = grid.global_nx, grid.global_ny, grid.global_nz
    hx, hy, hz = grid.hx, grid.hy, grid.hz
    h = np.array([hx, hy, hz])
    ll = np.asarray(grid.lower_left)
    nb = 8
    K = grid.num_subdomains
    N = s ** 3 * nb
    vol = hx * hy * hz

    def gdofs(gx, gy, gz):
        """Global block-layout dofs of global cell (gx, gy, gz)."""
        sx, cx = divmod(gx, s)
        sy, cy = divmod(gy, s)
        sz, cz = divmod(gz, s)
        k = (sz * grid.ky + sy) * grid.kx + sx
        c = (cz * s + cy) * s + cx
        return k * N + c * nb + np.arange(nb)

    def org(gx, gy, gz):
        return ll + np.array([gx, gy, gz]) * h

    qp, qw = Q.hex_rule_unit_cell(vol_quad)
    phi_v = B.eval_basis_hex(1, qp)
    dphi_v = B.eval_basis_hex_grad_unit(1, qp) / h

    A = sp_.lil_matrix((K * N, K * N))

    # volume
    for gz in range(nz):
        for gy in range(ny):
            for gx in range(nx):
                x = org(gx, gy, gz) + qp * h
                lv = lam(x)
                blk = vol * np.einsum("q,q,qia,qja->ij", qw, lv, dphi_v, dphi_v)
                d = gdofs(gx, gy, gz)
                A[np.ix_(d, d)] += blk

    uv, wf = Q.face3d_rule(face_quad)
    cen = np.array([0.5, 0.5, 0.5])

    def face_pts(axis, side01, uvv):
        """unit-cell coords of face points; axis 0/1/2, fixed coord side01."""
        u, v = uvv[:, 0], uvv[:, 1]
        c = np.full_like(u, side01)
        cols = {0: (c, u, v), 1: (u, c, v), 2: (u, v, c)}[axis]
        return np.stack(cols, axis=-1)

    areas = [hy * hz, hx * hz, hx * hy]
    diams = [np.hypot(hy, hz), np.hypot(hx, hz), np.hypot(hx, hy)]

    # interior faces, all 3 orientations
    for axis in range(3):
        n = np.zeros(3)
        n[axis] = 1.0
        pm = face_pts(axis, 1.0, uv)
        pp = face_pts(axis, 0.0, uv)
        phim, phip = B.eval_basis_hex(1, pm), B.eval_basis_hex(1, pp)
        dm = B.eval_basis_hex_grad_unit(1, pm) / h
        dp = B.eval_basis_hex_grad_unit(1, pp) / h
        ranges = [nx, ny, nz]
        ranges[axis] -= 1
        for gz in range(ranges[2]):
            for gy in range(ranges[1]):
                for gx in range(ranges[0]):
                    gm = np.array([gx, gy, gz])
                    gp = gm.copy()
                    gp[axis] += 1
                    om_ = org(*gm)
                    x = om_ + pm * h
                    xm = x + EPS * (om_ + cen * h - x)
                    op_ = org(*gp)
                    xp = x + EPS * (op_ + cen * h - x)
                    lm, lp = lam(xm), lam(xp)
                    gdn_m = dm @ n
                    gdn_p = dp @ n
                    pen = SIG_I * 0.5 * (0.5 * lm + 0.5 * lp) / diams[axis] ** BETA
                    ell = areas[axis]
                    fm = 0.5 * lm[:, None] * gdn_m     # omega_- * flux_-
                    fp = 0.5 * lp[:, None] * gdn_p

                    def P(pi, pj, sg):
                        return sg * ell * np.einsum("q,q,qi,qj->ij", wf, pen, pi, pj)

                    def CJ(wfl, pi, sg):
                        return sg * ell * np.einsum("q,qj,qi->ij", wf, wfl, pi)

                    def CI(wfl, pj, sg):
                        return sg * ell * np.einsum("q,qi,qj->ij", wf, wfl, pj)

                    Mmm = P(phim, phim, 1) + CJ(fm, phim, -1) + CI(fm, phim, -1)
                    Mmp = P(phim, phip, -1) + CJ(fp, phim, -1) + CI(fm, phip, 1)
                    Mpm = P(phip, phim, -1) + CJ(fm, phip, 1) + CI(fp, phim, -1)
                    Mpp = P(phip, phip, 1) + CJ(fp, phip, 1) + CI(fp, phip, 1)
                    dmi = gdofs(*gm)
                    dpi = gdofs(*gp)
                    A[np.ix_(dmi, dmi)] += Mmm
                    A[np.ix_(dmi, dpi)] += Mmp
                    A[np.ix_(dpi, dmi)] += Mpm
                    A[np.ix_(dpi, dpi)] += Mpp

    # Dirichlet boundary faces
    for axis in range(3):
        for lo in (True, False):
            n = np.zeros(3)
            n[axis] = -1.0 if lo else 1.0
            pmu = face_pts(axis, 0.0 if lo else 1.0, uv)
            phim = B.eval_basis_hex(1, pmu)
            dm = B.eval_basis_hex_grad_unit(1, pmu) / h
            dims = [nx, ny, nz]
            fixed = 0 if lo else dims[axis] - 1
            other = [d for a, d in enumerate(dims) if a != axis]
            for i0 in range(other[0]):
                for i1 in range(other[1]):
                    g = [0, 0, 0]
                    g[axis] = fixed
                    rest = [a for a in range(3) if a != axis]
                    g[rest[0]], g[rest[1]] = i0, i1
                    om_ = org(*g)
                    x = om_ + pmu * h
                    xm = x + EPS * (om_ + cen * h - x)
                    lm = lam(xm)
                    gdn = dm @ n
                    flux = lm[:, None] * gdn
                    pen = SIG_B * lm / diams[axis] ** BETA
                    ell = areas[axis]
                    M = (ell * np.einsum("q,q,qi,qj->ij", wf, pen, phim, phim)
                         - ell * np.einsum("q,qj,qi->ij", wf, flux, phim)
                         - ell * np.einsum("q,qi,qj->ij", wf, flux, phim))
                    d = gdofs(*g)
                    A[np.ix_(d, d)] += M

    return A.tocsr()


LAM_FNS = {
    "const": (lambda x: np.ones(np.asarray(x).shape[:-1]),
              lambda x: jnp.ones(x.shape[:-1])),
    "smooth": (lambda x: 1.0 + np.asarray(x)[..., 0] + 0.5 * np.asarray(x)[..., 2],
               lambda x: 1.0 + x[..., 0] + 0.5 * x[..., 2]),
}


@pytest.mark.parametrize("cfg,lam_key", [
    (dict(num_subdomains=[1, 1, 1], half=1, nref=1), "smooth"),   # interior only
    (dict(num_subdomains=[2, 2, 2], half=1, nref=0), "smooth"),   # couplings only
    (dict(num_subdomains=[2, 1, 2], half=1, nref=1), "const"),    # both
])
def test_hex3d_assembly_vs_oracle(cfg, lam_key):
    g = make_grid3d(domain=((0.0, 0.0, 0.0), (1.0, 0.8, 1.2)),
                    num_subdomains=cfg["num_subdomains"],
                    half_num_fine_elements_per_subdomain_and_dim=cfg["half"],
                    num_refinements=cfg["nref"])
    sp = BlockDGSpace3D(g)
    lam_np, lam_jx = LAM_FNS[lam_key]
    comp = assemble_swipdg_component3(sp, lam_jx)
    op = _op_from_component(sp, [comp])
    G = np.asarray(op.assemble(jnp.ones(1)).to_dense())
    Gref = oracle_global_sipg(g, lam_np).toarray()
    err = np.abs(G - Gref).max() / np.abs(Gref).max()
    assert err < 1e-12, err


def _discretize_poisson(g, lam_jx, f_jx):
    sp = BlockDGSpace3D(g)
    comp = assemble_swipdg_component3(sp, lam_jx)
    op = _op_from_component(sp, [comp])
    rhs = asm3.volume_functional(sp, f_jx)
    return sp, op, rhs


def test_hex3d_manufactured_solution_eoc():
    """u = sin(pi x) sin(pi y) sin(pi z), lambda = 1, all-Dirichlet zero:
    Q1 SWIPDG L2 error converges at second order."""
    def u_ex(x):
        return (np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])
                * np.sin(np.pi * x[..., 2]))

    def f_jx(x):
        return (3 * np.pi ** 2 * jnp.sin(np.pi * x[..., 0])
                * jnp.sin(np.pi * x[..., 1]) * jnp.sin(np.pi * x[..., 2]))

    lam = lambda x: jnp.ones(x.shape[:-1])
    errs, hs = [], []
    for nref in (0, 1, 2):
        g = make_grid3d(num_subdomains=[2, 2, 2],
                        half_num_fine_elements_per_subdomain_and_dim=1,
                        num_refinements=nref)
        sp, op, rhs = _discretize_poisson(g, lam, f_jx)
        asmb = op.assemble(jnp.ones(1))
        U = asmb.solve_pcg(rhs, tol=1e-12, maxiter=2000)
        # L2 error by quadrature
        xq = np.asarray(asm3.vol_points(sp))                # [K, C, nq, 3]
        uh = np.einsum("qi,kci->kcq",
                       np.asarray(sp.vol_phi),
                       np.asarray(U).reshape(sp.K, sp.s ** 3, sp.nb))
        e2 = sp.volume * np.einsum("q,kcq->", np.asarray(sp.vol_w),
                                   (uh - u_ex(xq)) ** 2)
        errs.append(np.sqrt(e2))
        hs.append(g.max_entity_diameter())
    eoc = [np.log(errs[i] / errs[i + 1]) / np.log(hs[i] / hs[i + 1])
           for i in range(len(errs) - 1)]
    # measured: errs = 7.75e-2 / 2.16e-2 / 5.64e-3, eoc = 1.84 / 1.94 -> 2
    assert errs[-1] < 6e-3
    assert eoc[-1] > 1.85, (errs, eoc)


def test_hex3d_block_partition_invariance():
    """The assembled global operator is identical whether the same fine mesh
    is partitioned as 1 or 8 subdomains (couplings == interior faces)."""
    lam = LAM_FNS["smooth"][1]
    g1 = make_grid3d(num_subdomains=[1, 1, 1],
                     half_num_fine_elements_per_subdomain_and_dim=2,
                     num_refinements=1)     # 4^3 cells, one block
    g8 = make_grid3d(num_subdomains=[2, 2, 2],
                     half_num_fine_elements_per_subdomain_and_dim=1,
                     num_refinements=1)     # same 4^3 cells, 8 blocks
    sp1, op1, rhs1 = _discretize_poisson(g1, lam, lam)
    sp8, op8, rhs8 = _discretize_poisson(g8, lam, lam)
    # solve both and compare solutions cellwise via a global cell map
    U1 = np.asarray(op1.assemble(jnp.ones(1)).solve_pcg(rhs1, tol=1e-12))
    U8 = np.asarray(op8.assemble(jnp.ones(1)).solve_pcg(rhs8, tol=1e-12))

    def cellmap(g, sp, U):
        out = np.zeros((g.global_nz, g.global_ny, g.global_nx, sp.nb))
        for k in range(sp.K):
            sx, sy, sz = g.subdomain_coords(k)
            blk = U[k].reshape(g.s, g.s, g.s, sp.nb)
            out[sz * g.s:(sz + 1) * g.s, sy * g.s:(sy + 1) * g.s,
                sx * g.s:(sx + 1) * g.s] = blk
        return out

    d = np.abs(cellmap(g1, sp1, U1) - cellmap(g8, sp8, U8)).max()
    assert d < 1e-9, d


def test_hex3d_matrixfree_apply_and_solve():
    """3D stencil (matrix-free) apply == dense block apply to machine
    precision, across partition shapes; mf PCG with cell-Jacobi converges."""
    from pylrbms_tpu.ops.matrixfree3d import (assemble_swipdg_stencil3,
                                              StencilOperator3)
    rng = np.random.default_rng(0)
    lam = lambda x: 1.0 + x[..., 0] + 0.5 * x[..., 2]
    for ns in ([1, 1, 1], [2, 2, 2], [3, 2, 1]):
        g = make_grid3d(domain=((0, 0, 0), (1.0, 0.8, 1.2)),
                        num_subdomains=ns,
                        half_num_fine_elements_per_subdomain_and_dim=1,
                        num_refinements=1)
        sp = BlockDGSpace3D(g)
        comp = assemble_swipdg_component3(sp, lam)
        dense = _op_from_component(sp, [comp]).assemble(jnp.ones(1))
        st = StencilOperator3(
            sp, (assemble_swipdg_stencil3(sp, lam),)).assemble(jnp.ones(1))
        x = jnp.asarray(rng.standard_normal((sp.K, sp.N)))
        err = (np.abs(np.asarray(dense.apply(x)) - np.asarray(st.apply(x))).max()
               / np.abs(np.asarray(dense.apply(x))).max())
        assert err < 1e-13, (ns, err)
        b = jnp.asarray(rng.standard_normal((sp.K, sp.N)))
        u = st.solve_pcg(b, tol=1e-12, maxiter=5000)
        r = (np.abs(np.asarray(st.apply(u) - b)).max()
             / np.abs(np.asarray(b)).max())
        assert r < 1e-10, (ns, r)


def test_hex3d_matrixfree_mass_stencil():
    """mass_stencil3 joins the affine family: (M + dt A) x matches the
    dense mass + operator apply."""
    from pylrbms_tpu.ops.matrixfree3d import (assemble_swipdg_stencil3,
                                              mass_stencil3, StencilOperator3)
    from pylrbms_tpu.ops import assembly3d as asm3
    g = make_grid3d(num_subdomains=[2, 1, 2],
                    half_num_fine_elements_per_subdomain_and_dim=1,
                    num_refinements=1)
    sp = BlockDGSpace3D(g)
    lam = lambda x: jnp.ones(x.shape[:-1])
    stA = assemble_swipdg_stencil3(sp, lam)
    stM = mass_stencil3(sp, stA)
    dt = 0.25
    G = StencilOperator3(sp, (stM, stA)).assemble(jnp.asarray([1.0, dt]))
    comp = assemble_swipdg_component3(sp, lam)
    Adense = _op_from_component(sp, [comp]).assemble(jnp.ones(1))
    M = asm3.volume_mass(sp, None)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((sp.K, sp.N)))
    y_ref = jnp.einsum("knm,km->kn", M, x) + dt * Adense.apply(x)
    err = (np.abs(np.asarray(G.apply(x)) - np.asarray(y_ref)).max()
           / np.abs(np.asarray(y_ref)).max())
    assert err < 1e-13, err


def test_hex3d_mf_pcg_model_solve():
    """model.solve's matrix-free two-level path (type='mf_pcg') on the 3D
    family: modal and harvested coarse spaces both converge to 1e-8."""
    from pylrbms_tpu.problems.spe10 import init_grid_and_problem_3d
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    gpd = init_grid_and_problem_3d(
        {'num_subdomains': [2, 2, 2],
         'half_num_fine_elements_per_subdomain_and_dim': 1,
         'num_refinements': 1}, max_contrast=1e4)
    mu = {'switch': 1.0}
    for cs, cm in (("modal", 4), ("harvested", 8)):
        d, _ = discretize(gpd, lean=True)
        U = d.solve(mu, inverse_options={'type': 'mf_pcg',
                                         'precision': 1e-10,
                                         'coarse_space': cs,
                                         'coarse_modes': cm})
        A = d.op.assemble(d.theta(mu))
        b = d.rhs(mu)
        r = float(jnp.abs(A.apply(U) - b).max() / jnp.abs(b).max())
        assert r < 1e-8, (cs, r)


def test_hex3d_sharded_online_step_matches_unsharded():
    """K-axis GSPMD sharding of the 3D model over the virtual 8-device mesh
    (the z-coupling family rides the same sharded apply): equals the
    unsharded step."""
    import jax
    import pytest as _pytest
    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 virtual devices")
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    from pylrbms_tpu.parallel.mesh import SubdomainMesh
    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    theta = jnp.asarray([1.0, 0.5])
    theta_f = jnp.asarray([1.0])
    mu = d.parse_parameter(0.5)
    A = d.op.assemble(theta)
    b = jnp.einsum("q,qkn->kn", theta_f, d.rhs_q)
    U_ref = A.solve_pcg(b, tol=1e-9, maxiter=800)
    nc, r, df = d.estimator.local_quantities(U_ref, mu)
    ind_ref = np.asarray(nc + r + df)

    sm = SubdomainMesh.create(8)
    sm.distribute_model(d)
    step = sm.jit_online_step(d, tol=1e-9, maxiter=800)
    U, ind = step(theta, theta_f, mu)
    assert len(set(x.device for x in U.addressable_shards)) == 8
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ind), ind_ref, rtol=1e-7, atol=1e-12)


def test_hex3d_vtu_output(tmp_path):
    """3D VTU writer round-trips values; grid.visualize and model.visualize
    produce parseable files."""
    import xml.etree.ElementTree as ET
    from pylrbms_tpu.utils.vtk import write_hex_vtu
    g = make_grid3d(num_subdomains=[2, 1, 1],
                    half_num_fine_elements_per_subdomain_and_dim=1,
                    num_refinements=1)
    sp = BlockDGSpace3D(g)
    U = np.random.default_rng(0).random((sp.K, sp.N))
    f = write_hex_vtu(sp, U, str(tmp_path / "u3"))
    root = ET.parse(f).getroot()
    vals = np.fromstring(root.find(".//PointData/DataArray").text, sep=" ")
    assert np.allclose(vals, U.reshape(-1))
    f2 = g.visualize(str(tmp_path / "grid3"))
    assert ET.parse(f2).getroot().find(".//Piece") is not None


def test_hex3d_stencil_coarse_matrix():
    """stencil_coarse_matrix (the XL no-dense-blocks path) equals the dense
    operator's coarse matrix."""
    from pylrbms_tpu.ops.matrixfree3d import (assemble_swipdg_stencil3,
                                              StencilOperator3,
                                              stencil_coarse_matrix)
    g = make_grid3d(num_subdomains=[2, 2, 2],
                    half_num_fine_elements_per_subdomain_and_dim=1,
                    num_refinements=1)
    sp = BlockDGSpace3D(g)
    lam = lambda x: 1.0 + x[..., 0]
    st = StencilOperator3(
        sp, (assemble_swipdg_stencil3(sp, lam),)).assemble(jnp.ones(1))
    A0_st = np.asarray(stencil_coarse_matrix(st, chunk=3))   # force chunking
    comp = assemble_swipdg_component3(sp, lam)
    A0_ref = np.asarray(
        _op_from_component(sp, [comp]).assemble(jnp.ones(1)).coarse_matrix())
    assert np.abs(A0_st - A0_ref).max() / np.abs(A0_ref).max() < 1e-13


def test_hex3d_stencil_diag_blocks():
    """stencil_diag_blocks (XL block-Jacobi route) equals fold_diag3 of the
    assembled component."""
    from pylrbms_tpu.ops.matrixfree3d import (assemble_swipdg_stencil3,
                                              StencilOperator3,
                                              stencil_diag_blocks)
    g = make_grid3d(num_subdomains=[2, 2, 2],
                    half_num_fine_elements_per_subdomain_and_dim=1,
                    num_refinements=1)
    sp = BlockDGSpace3D(g)
    lam = lambda x: 1.0 + x[..., 0] + 0.3 * x[..., 1]
    st = StencilOperator3(
        sp, (assemble_swipdg_stencil3(sp, lam),)).assemble(jnp.ones(1))
    Dst = np.asarray(stencil_diag_blocks(st, dtype=jnp.float64))
    comp = assemble_swipdg_component3(sp, lam)
    Dref = np.asarray(fold_diag3(sp, comp))
    assert np.abs(Dst - Dref).max() / np.abs(Dref).max() < 1e-14
