"""Script-level regression: our golden values for the decomp script config
(role of the reference's hardcoded "(should be ...)" prints,
``linearelliptic_block_swipdg_decomp.py:41-43`` — but asserted, per
SURVEY.md §4 'supply the missing rigor')."""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "scripts"))


GOLDEN = {"eta_nc": 1.303846e-02, "eta_r": 5.775504e-03,
          "eta_df": 3.356385e-02, "eta": 5.058341e-02}


def test_decomp_script_regression(capsys):
    import linearelliptic_block_swipdg_decomp as script
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    gpd = script.init_grid_and_problem(script.config)
    d, _ = discretize(gpd)
    mu = d.parse_parameter(1.)
    U = d.solve(mu)
    eta, (nc, r, df), _ = d.estimate(U, mu, decompose=True)
    vals = {"eta_nc": np.linalg.norm(nc), "eta_r": np.linalg.norm(r),
            "eta_df": np.linalg.norm(df), "eta": float(eta)}
    for k, v in GOLDEN.items():
        assert vals[k] == pytest.approx(v, rel=1e-5), (k, vals[k], v)

    # ROM built from 5 uniform snapshots reproduces the FOM triple exactly
    from pylrbms_tpu.reductor import LRBMSReductor, ExtensionError
    red = LRBMSReductor(d)
    for mu_i in d.parameter_space.sample_uniformly(2)[:5]:
        try:
            red.extend_basis(d.solve(mu_i))
        except ExtensionError:
            pass
    rd = red.reduce()
    eta_r_, (nc_, r_, df_), _ = rd.estimate(rd.solve(mu), mu, decompose=True)
    assert np.linalg.norm(nc_) == pytest.approx(vals["eta_nc"], rel=1e-8)
    assert np.linalg.norm(r_) == pytest.approx(vals["eta_r"], rel=1e-8)
    assert np.linalg.norm(df_) == pytest.approx(vals["eta_df"], rel=1e-8)


def _triple(d, mu):
    U = d.solve(mu)
    eta, (nc, r, df), _ = d.estimate(U, mu, decompose=True)
    return [float(np.linalg.norm(x)) for x in (nc, r, df)] + [float(eta)]


def test_thermalblock_golden():
    """Self-golden regression for thermalblock [4,4] (VERDICT round-1
    item 8: golden breadth beyond the single OS2015 config)."""
    from pylrbms_tpu.problems.thermalblock import init_grid_and_problem as tb
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    gpd = tb({'num_subdomains': [4, 4],
              'half_num_fine_elements_per_subdomain_and_dim': 1,
              'num_refinements': 1})
    d, _ = discretize(gpd)
    vals = _triple(d, d.parse_parameter([1.0, 0.1, 0.3, 1.0]))
    for v, g in zip(vals, (1.942884e-01, 5.775504e-03, 6.137637e-02,
                           5.712534e-01)):
        assert v == pytest.approx(g, rel=1e-5), (vals,)


def test_os2015_quad_family_golden():
    """Self-golden for the quad (Yasp/Q1) grid family."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    gpd = os2015({'num_subdomains': [4, 4],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 1, 'grid_type': 'quad'})
    d, _ = discretize(gpd)
    vals = _triple(d, d.parse_parameter(1.))
    for v, g in zip(vals, (6.490054e-05, 8.496632e-03, 3.357390e-02,
                           4.002763e-02)):
        assert v == pytest.approx(g, rel=1e-4, abs=1e-12), (vals,)


@pytest.mark.slow
def test_channels_parabolic_golden():
    """Self-golden for the parabolic artificial-channels pipeline (implicit
    Euler + parabolic estimator with elliptic reconstruction)."""
    from pylrbms_tpu.problems.artificial_channels import init_grid_and_problem as ch
    from pylrbms_tpu.discretize_parabolic_block_swipdg import discretize as pdisc
    gpd = ch({'num_subdomains': [2, 2],
              'half_num_fine_elements_per_subdomain_and_dim': 1,
              'num_refinements': 1})
    im, _ = pdisc(gpd, T=1.0, nt=8)
    mu = im.parse_parameter({'switch': 0.1, '_t': 0.0})
    U = im.solve(mu)
    est, parts = im.estimate(U, mu)
    assert float(est) == pytest.approx(2.275404e-01, rel=1e-5)
    goldens = (9.237918e-04, 1.007213e-01, 5.859737e-03, 4.036123e-02,
               8.016293e-02)
    for p, g in zip(parts, goldens):
        assert float(np.linalg.norm(np.asarray(p))) == pytest.approx(
            g, rel=1e-4), (g,)


@pytest.mark.slow
def test_max_discretization_error_anchors():
    """Anchors in the role of the reference's documented max discretization
    errors (``online_adaptive_lrbms.py:49-53``, BASELINE.md rows 4-6):
    eta at mu = parameter_range[0] for three configs, locked against our
    own build."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    from pylrbms_tpu.problems.local_thermalblock import \
        init_grid_and_problem as ltb
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    anchors = (
        (os2015, [4, 4], 1.296416e-02),
        (os2015, [6, 6], 3.683152e-03),
        (ltb, [6, 6], 3.507750e-03),
    )
    for init, subs, golden in anchors:
        gpd = init({'num_subdomains': subs,
                    'half_num_fine_elements_per_subdomain_and_dim': 2,
                    'num_refinements': 1})
        d, _ = discretize(gpd)
        mu = d.parse_parameter(gpd['parameter_range'][0])
        eta = float(d.estimate(d.solve(mu), mu))
        assert eta == pytest.approx(golden, rel=1e-5), (subs, eta, golden)


def test_golden_gap_attribution():
    """Reference golden-triple reconciliation (VERDICT round-1 item 2):
    at the reference's effective mesh (s = 2*half fine cells per subdomain
    per dim) with the paper (unsquared-locals) aggregation, the reference
    goldens 1.66e-01/1.45e-01/3.55e-01
    (``linearelliptic_block_swipdg_decomp.py:41-43``) are matched to 0.2% /
    2.2% (eta_r / eta_df); eta_nc is within 20% with the excess bounded by
    the Oswald vertex-zeroing convention + the ALU-bisection triangulation
    (docs/results/golden_gap_attribution.md)."""
    import golden_gap_study as study
    executed, paper, h = study.triple(nref=1)
    assert h == pytest.approx(0.25)
    assert paper["r"] == pytest.approx(study.GOLDEN["r"], rel=0.01)
    assert paper["df"] == pytest.approx(study.GOLDEN["df"], rel=0.05)
    assert paper["nc"] == pytest.approx(study.GOLDEN["nc"], rel=0.25)
    # as-executed convention stays locked to our own goldens
    assert executed["nc"] == pytest.approx(GOLDEN["eta_nc"], rel=1e-5)
    # the zeroing-free Oswald variant moves eta_nc toward the golden
    _, paper_nozero, _ = study.triple(nref=1, oswald_boundary_zeroing=False)
    assert study.GOLDEN["nc"] < paper_nozero["nc"] < paper["nc"]
    # neighboring mesh levels are ~4x off in the squared locals: the mesh
    # identification is unambiguous
    executed0, _, _ = study.triple(nref=0)
    assert 3.0 < executed0["df"] / executed["df"] < 5.5


def test_crisscross_closes_eta_nc_gap():
    """The eta_nc remainder of the golden-triple reconciliation is the
    triangulation, PROVEN with data (VERDICT round-1 item 2, closing the
    last factor): an independent unstructured numpy/scipy SWIPDG oracle at
    the golden config reproduces our pipeline's value on the uniform
    diagonal mesh (2.00e-01 vs 1.99e-01) and lands on the reference golden
    on the crisscross (ALU-bisection) mesh: 1.666e-01 vs 1.66e-01 — 0.3%.
    With eta_r at 0.2% and eta_df at 2.2%, the whole reference golden
    triple is reconciled."""
    import crisscross_oracle as oracle
    out = oracle.run(n=8)
    assert out["diagonal"] == pytest.approx(1.9921e-01, rel=0.02)
    assert out["crisscross"] == pytest.approx(1.66e-01, rel=0.02)


def test_checkpoint_roundtrip(tmp_path):
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    from pylrbms_tpu.reductor import LRBMSReductor
    from pylrbms_tpu.utils.checkpoint import save_reductor, load_reductor
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    red = LRBMSReductor(d, order=0)
    red.extend_basis(d.solve(d.parse_parameter(0.4)))
    path = save_reductor(red, str(tmp_path / "ckpt"))
    red2 = load_reductor(d, path)
    assert [b.shape for b in red.bases] == [b.shape for b in red2.bases]
    mu = d.parse_parameter(0.8)
    c1 = red.reduce().solve(mu)
    c2 = red2.reduce().solve(mu)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-12)


def test_vtu_writer_and_model_visualize(tmp_path):
    """VTU output as a first-class artifact: structural + content
    assertions (point/cell counts, value round-trip), and the model-level
    entry point (<-> the reference's ``d.visualize``, ``mpi_elliptic.py:58``)."""
    import re
    from pylrbms_tpu.grid import make_grid
    from pylrbms_tpu.ops.spaces import BlockDGSpace
    from pylrbms_tpu.utils.vtk import write_dg_vtu
    grid = make_grid(((0, 0), (1, 1)), [2, 2], 1, num_refinements=0)
    space = BlockDGSpace(grid, order=1)
    rng = np.random.default_rng(5)
    U = rng.normal(size=(space.K, space.N))
    f = write_dg_vtu(space, U, str(tmp_path / "u"))
    text = open(f).read()
    assert "<VTKFile" in text and 'Name="u"' in text
    # content: the scalar field round-trips exactly, counts are consistent
    n_pts = space.K * space.N
    n_cells = n_pts // space.nb
    m = re.search(r'NumberOfPoints="(\d+)" NumberOfCells="(\d+)"', text)
    assert m and (int(m.group(1)), int(m.group(2))) == (n_pts, n_cells)
    field = re.search(r'Name="u" format="ascii">\n([\s\S]*?)</DataArray>',
                      text).group(1)
    vals = np.fromstring(field, sep=" ")
    np.testing.assert_allclose(np.sort(vals), np.sort(U.reshape(-1)),
                               rtol=0, atol=0)
    conn = re.search(r'Name="connectivity" format="ascii">\n([\s\S]*?)'
                     r'</DataArray>', text).group(1)
    conn = np.fromstring(conn, sep=" ", dtype=np.int64)
    assert conn.min() >= 0 and conn.max() == n_pts - 1
    assert conn.size == n_cells * space.nb

    # model-level entry point (solution of a real solve)
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 0})
    d, _ = discretize(gpd)
    Usol = d.solve(d.parse_parameter(1.))
    f2 = d.visualize(Usol, str(tmp_path / "sol"))
    text2 = open(f2).read()
    field2 = re.search(r'Name="u" format="ascii">\n([\s\S]*?)</DataArray>',
                       text2).group(1)
    vals2 = np.fromstring(field2, sep=" ")
    # the max nodal value of the OS2015 solution at mu=1 is ~u(0,0)=1
    assert 0.5 < vals2.max() < 1.5
    assert np.isfinite(vals2).all()


def test_academic3d_golden_triples():
    """Self-golden regression anchors for the 3D hex family (Q1 and Q2),
    paper-convention indicator norms at mu = 0.5 (role of the reference's
    hardcoded golden prints, extended to the beyond-reference 3D family)."""
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize

    GOLDEN3 = {
        1: {"eta": 2.669043e+00, "nc": 8.099561e-02, "r": 1.546472e+00,
            "df": 1.041575e+00, "nref": 1},
        2: {"eta": 1.010787e+00, "nc": 1.879885e-02, "r": 6.276844e-01,
            "df": 3.643033e-01, "nref": 0},
    }
    mu = {"diffusion": 0.5}
    for order, g in GOLDEN3.items():
        gpd = init_grid_and_problem(
            {'num_subdomains': [2, 2, 2],
             'half_num_fine_elements_per_subdomain_and_dim': 1,
             'num_refinements': g["nref"]})
        d, _ = discretize(gpd, order=order)
        U = d.solve(mu)
        eta, (nc, r, df), _ = d.estimate(U, mu, decompose=True,
                                         paper_convention=True)
        vals = {"eta": float(eta), "nc": np.linalg.norm(np.asarray(nc)),
                "r": np.linalg.norm(np.asarray(r)),
                "df": np.linalg.norm(np.asarray(df))}
        for k in ("eta", "nc", "r", "df"):
            assert vals[k] == pytest.approx(g[k], rel=1e-5), (order, k, vals[k])
