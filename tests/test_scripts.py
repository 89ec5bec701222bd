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


def test_vtu_writer(tmp_path):
    from pylrbms_tpu.grid import make_grid
    from pylrbms_tpu.ops.spaces import BlockDGSpace
    from pylrbms_tpu.utils.vtk import write_dg_vtu
    import numpy as np
    grid = make_grid(((0, 0), (1, 1)), [2, 2], 1, num_refinements=0)
    space = BlockDGSpace(grid, order=1)
    U = np.ones((space.K, space.N))
    f = write_dg_vtu(space, U, str(tmp_path / "u"))
    text = open(f).read()
    assert "<VTKFile" in text and "VTK_TRIANGLE" not in text and 'Name="u"' in text
