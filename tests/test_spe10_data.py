"""The REAL ``spe_perm.dat`` loading branch (VERDICT r2 missing #3).

In this zero-egress environment only the synthetic-surrogate branch of
``problems/spe10.py`` has ever run; these tests write a tiny fixture in the
exact on-disk format of the SPE10 model-2 data set — whitespace-separated
floats, three component blocks (kx, ky, kz) of 60*220*85 values each,
Fortran-style x-fastest / z-slowest ordering (nz=85 blocks of [ny=220, nx=60]
rasters) — and assert the layer extraction and the 3D z-slab selection, so
the real file drops in unchanged.  (Reference analog: dune-xt's
``Spe10::Model2`` data function, consumed by the reference via
``grid_and_problem_data`` — SURVEY.md §2.3.)
"""
import numpy as np
import pytest

from pylrbms_tpu.problems import spe10 as S


@pytest.fixture()
def perm_file(tmp_path):
    """A full-size-format file with a deterministic, position-identifying
    value pattern: value(c, z, y, x) = c*1e9 + z*1e6 + y*1e3 + x  (c = 0/1/2
    for kx/ky/kz) — any indexing mistake produces a wrong value, not a
    coincidental match."""
    nx, ny, nz = S.SPE10_NX, S.SPE10_NY, S.SPE10_NZ
    z, y, x = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                          indexing="ij")
    base = (z * 1e6 + y * 1e3 + x).astype(np.float64)
    comps = [base + c * 1e9 for c in range(3)]      # kx, ky, kz blocks
    path = tmp_path / "spe_perm.dat"
    with open(path, "w") as f:
        for comp in comps:
            flat = comp.ravel()                     # x fastest, z slowest
            # the real file wraps lines at a handful of values; mimic that
            for i in range(0, flat.size, 6):
                f.write(" ".join(f"{v:.1f}" for v in flat[i:i + 6]) + "\n")
    return str(path)


def test_load_spe10_layer_file_branch(perm_file):
    layer = 42
    got = S.load_spe10_layer(layer=layer, path=perm_file)
    assert got.shape == (S.SPE10_NY, S.SPE10_NX)
    # value encodes (z, y, x): check corners + interior
    assert got[0, 0] == layer * 1e6
    assert got[0, 59] == layer * 1e6 + 59
    assert got[219, 0] == layer * 1e6 + 219e3
    assert got[7, 13] == layer * 1e6 + 7e3 + 13
    # kx (component 0) is what the 2D slice uses: no 1e9 offset leaked in
    assert got.max() < 1e9


def test_load_spe10_block_file_branch(perm_file):
    lo, hi = 40, 44
    got = S.load_spe10_block(layers=(lo, hi), path=perm_file)
    assert got.shape == (hi - lo, S.SPE10_NY, S.SPE10_NX)
    for i, z in enumerate(range(lo, hi)):
        assert got[i, 0, 0] == z * 1e6
        assert got[i, 100, 30] == z * 1e6 + 100e3 + 30


def test_load_spe10_env_var(perm_file, monkeypatch):
    monkeypatch.setenv("SPE10_DATA", perm_file)
    got = S.load_spe10_layer(layer=0)
    assert got[5, 6] == 5e3 + 6


def test_spe10_problem_uses_file_field(perm_file, monkeypatch):
    """End-to-end: the 2D problem resamples the FILE field (not the
    surrogate) onto the fine raster, normalized to max 1."""
    monkeypatch.setenv("SPE10_DATA", perm_file)
    gpd = S.init_grid_and_problem(
        {"num_subdomains": [2, 2],
         "half_num_fine_elements_per_subdomain_and_dim": 1,
         "num_refinements": 1}, layer=3)
    lam_hi = gpd["lambda"]["functions"][1]          # ScalarFunction
    g = gpd["grid"]
    xs = np.stack(np.meshgrid(
        np.linspace(1e-3, 1 - 1e-3, g.global_nx),
        np.linspace(1e-3, 1 - 1e-3, g.global_ny), indexing="xy"), -1)
    cells = np.asarray(lam_hi(xs))
    assert abs(cells.max() - 1.0) < 1e-12          # normalized
    # the file field at layer 3 is ~3e6 + O(1e5): after normalization the
    # relative spread across y dominates; the surrogate field instead has
    # ~7 orders of magnitude of contrast — distinguish by dynamic range
    assert cells.min() > 0.8                       # file branch: flat field
    syn = S._synthetic_spe10_layer(3, S.SPE10_NX, S.SPE10_NY)
    assert syn.min() / syn.max() < 1e-3            # surrogate is high-contrast
