"""Colored-image re-reduction: correctness of the neighborhood-disjoint
color batching (reductor._colored_rows / the colored incremental update).

Same-color subdomains are >= 3 apart per axis, so their 3x3 oversampling
neighborhoods — and hence the supports of Oswald/flux images of basis
columns living on them (both operators are one-element-layer local) — are
disjoint.  Batching all same-color columns into ONE batch element must
therefore be EXACT (adding structural zeros is exact in IEEE), collapsing
K*r_max operator applies to n_colors*r_max.

These tests use a 6x6 subdomain grid so each of the 9 colors really
batches 4 subdomains (on smaller grids every subdomain gets its own color
and the path degenerates to the reference one).

Reference analog: the projected Oswald/flux operators of
/root/reference/python/dune/pylrbms/reductor.py:33-73, whose per-subdomain
C++ applies we batch.
"""
import numpy as np
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.reductor import LRBMSReductor

RED_TENSORS = ("A_red", "b_red", "G_nc", "AA", "ABT", "BBT", "DV", "RD")


@pytest.fixture(scope="module")
def d66():
    gpd = init_grid_and_problem({'num_subdomains': [6, 6],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 0})
    d, data = discretize(gpd)
    return d, data


def test_subdomain_colors_are_neighborhood_disjoint(d66):
    d, _ = d66
    color, n_colors = LRBMSReductor._subdomain_colors(d.grid)
    K = d.grid.num_subdomains
    assert n_colors == 9 and len(color) == K
    # 6x6 grid: every color batches exactly 4 subdomains
    counts = np.bincount(color)
    assert (counts == 4).all()
    for c in range(n_colors):
        ks = np.where(color == c)[0]
        hoods = [set(d.grid.neighborhood_of(int(k))) for k in ks]
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                assert not (hoods[i] & hoods[j]), \
                    f"color {c}: neighborhoods of {ks[i]} and {ks[j]} overlap"


def test_colored_full_reduce_matches_rowchunked(d66):
    """Full lean projection: colored path == the row-chunked reference
    path, bitwise up to einsum reassociation (we allow 1e-13)."""
    d, data = d66
    rng = np.random.default_rng(3)

    def build(colored):
        red = LRBMSReductor(d, products=data['local_energy_dg_product'],
                            order=0)
        red.force_lean = True
        red.prefetch_next = False
        red.use_colored_images = colored
        for v in (0.3, 1.0):
            red.extend_basis(d.solve({'diffusion': v}))
        return red, red.reduce()

    red_c, rd_c = build(True)
    red_r, rd_r = build(False)
    for name in RED_TENSORS:
        np.testing.assert_allclose(np.asarray(getattr(rd_c, name)),
                                   np.asarray(getattr(rd_r, name)),
                                   rtol=1e-13, atol=1e-15, err_msg=name)
    mu = {'diffusion': 0.55}
    e_c = float(rd_c.estimate(rd_c.solve(mu), mu))
    e_r = float(rd_r.estimate(rd_r.solve(mu), mu))
    assert abs(e_c - e_r) <= 1e-10 * abs(e_r)


def test_colored_incremental_update_matches_full(d66):
    """Incremental colored update (_make_image_update_fn with color
    batching): growing the basis and re-reducing via the cached image
    stacks must equal a from-scratch full projection."""
    d, data = d66
    red = LRBMSReductor(d, products=data['local_energy_dg_product'], order=0)
    red.force_lean = True
    red.prefetch_next = False
    red.extend_basis(d.solve({'diffusion': 0.3}))
    red.reduce()                                   # seeds the image cache
    assert getattr(red, "_img_cache", None) is not None
    # grow: a second global snapshot -> one new column per subdomain
    red.extend_basis(d.solve({'diffusion': 1.0}))
    rd_inc = red.reduce()

    ref = LRBMSReductor(d, products=data['local_energy_dg_product'],
                        bases=[b.copy() for b in red.bases])
    ref.force_lean = True
    ref.prefetch_next = False
    ref.force_full_projection = True
    rd_full = ref.reduce()
    for name in RED_TENSORS:
        np.testing.assert_allclose(np.asarray(getattr(rd_inc, name)),
                                   np.asarray(getattr(rd_full, name)),
                                   rtol=1e-10, atol=1e-12, err_msg=name)


def test_colored_full_reduce_matches_rowchunked_3d():
    """3D: 4x4x4 subdomains -> 27 colors, several batching multiple
    subdomains; the colored lean projection must equal the row-chunked
    path (3x3x3-neighborhood disjointness)."""
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem as igp3
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import \
        discretize as discretize3d
    gpd = igp3({'num_subdomains': [4, 4, 4],
                'half_num_fine_elements_per_subdomain_and_dim': 1,
                'num_refinements': 0})
    d, data = discretize3d(gpd)
    color, n_colors = LRBMSReductor._subdomain_colors(d.grid)
    assert n_colors == 27 and np.bincount(color).max() >= 4

    def build(colored):
        red = LRBMSReductor(d, order=0)
        red.force_lean = True
        red.prefetch_next = False
        red.use_colored_images = colored
        for v in (0.3, 1.0):
            red.extend_basis(np.asarray(d.solve({'diffusion': v}),
                                        np.float64))
        return red.reduce()

    rd_c, rd_r = build(True), build(False)
    for name in RED_TENSORS:
        np.testing.assert_allclose(np.asarray(getattr(rd_c, name)),
                                   np.asarray(getattr(rd_r, name)),
                                   rtol=1e-13, atol=1e-15, err_msg=name)
