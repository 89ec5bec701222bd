"""3D hex nested-grid prolongation (ops/prolong.prolongation_gather_3d).

The 3D analogue of the 2D prolongation used by the EOC harness
(reference methodology: EOC.py:287-313 — prolong the level solution into
the reference space).  Exactness checks: a global tensor polynomial of
per-dim degree <= order is in the DG space on every nested level, so its
interpolant must prolong to the fine interpolant bit-exactly; Q1 -> Q2
cross-order prolongation (the efficiency studies' path) must agree with
direct evaluation.
"""
import numpy as np
import pytest

from pylrbms_tpu.grid3d import Grid3D
from pylrbms_tpu.ops.spaces3d import BlockDGSpace3D
from pylrbms_tpu.ops.prolong import prolong


def _interp(space, f):
    xn = space.node_coords_phys()
    return f(xn).reshape(space.K, space.N)


def _grid(k, s):
    return Grid3D(lower_left=(0.0, 0.0, 0.0), upper_right=(1.0, 1.0, 1.0),
                  kx=k[0], ky=k[1], kz=k[2], s=s)


@pytest.mark.parametrize("order", [1, 2])
def test_same_order_exact(order):
    sc = BlockDGSpace3D(_grid((2, 2, 2), 2), order=order)
    sf = BlockDGSpace3D(_grid((2, 2, 2), 4), order=order)
    if order == 1:
        f = lambda x: (1.0 + 2 * x[..., 0] - 3 * x[..., 1]
                       + 0.5 * x[..., 2] + x[..., 0] * x[..., 1] * x[..., 2])
    else:
        f = lambda x: ((1 + x[..., 0] ** 2) * (2 - x[..., 1] + x[..., 1] ** 2)
                       * (1 + 0.3 * x[..., 2] ** 2))
    Uc = _interp(sc, f)
    Uf = np.asarray(prolong(sc, Uc, sf))
    assert np.abs(Uf - _interp(sf, f)).max() < 1e-12
    # batched leading axes broadcast through
    Ub = np.asarray(prolong(sc, np.stack([Uc, 2 * Uc]), sf))
    assert np.abs(Ub[1] - 2 * Uf).max() < 1e-12


def test_q1_into_q2_and_block_relayout():
    # Q1 coarse -> Q2 fine reference space with a DIFFERENT subdomain
    # layout on the same cell grid (the 3D efficiency study's shape)
    sc = BlockDGSpace3D(_grid((2, 2, 1), 2), order=1)    # 4x4x2 cells
    sf = BlockDGSpace3D(_grid((4, 4, 2), 2), order=2)    # 8x8x4 cells
    f = lambda x: 1.0 - x[..., 0] + 2 * x[..., 1] * x[..., 2]
    Uc = _interp(sc, f)
    Uf = np.asarray(prolong(sc, Uc, sf))
    assert np.abs(Uf - _interp(sf, f)).max() < 1e-12


def test_discontinuous_one_sided():
    # a coarse-cellwise-constant function prolongs one-sidedly: every fine
    # dof gets exactly the value of the coarse cell containing its centroid
    sc = BlockDGSpace3D(_grid((2, 1, 1), 1), order=1)    # 2x1x1 cells
    sf = BlockDGSpace3D(_grid((2, 1, 1), 2), order=1)    # 4x2x2 cells
    Uc = np.zeros((sc.K, sc.N))
    Uc[1] = 1.0                                          # right cell == 1
    Uf = np.asarray(prolong(sc, Uc, sf))
    want = np.zeros((sf.K, sf.N))
    want[1] = 1.0
    assert np.abs(Uf - want).max() == 0.0
