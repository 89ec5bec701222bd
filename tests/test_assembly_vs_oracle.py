"""Batched SWIPDG assembly must exactly match the independent numpy oracle.

Covers SURVEY.md §7 hard part 3 (face-coupling kernels "validated against
dense scipy assembly").
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.grid import make_grid
from pylrbms_tpu.functions import (make_expression_function_1x1,
                                   make_constant_function_1x1,
                                   make_constant_function_2x2,
                                   make_checkerboard_function_1x1)
from pylrbms_tpu.ops.spaces import BlockDGSpace
from pylrbms_tpu.ops.swipdg import assemble_swipdg_component
from pylrbms_tpu.la.block import AffineBlockOp
from pylrbms_tpu.ops import assembly as asm
from pylrbms_tpu.reference_impl.swipdg_np import assemble_swipdg_np, assemble_rhs_np


COS = "(cos(0.5*pi*x[0])*cos(0.5*pi*x[1]))"


def _dense(space, lam_fn, kappa_fn=None):
    comp = assemble_swipdg_component(space, lam_fn, kappa_fn)
    op = AffineBlockOp.from_components(space, [comp])
    return np.asarray(op.assemble(jnp.ones(1)).to_dense())


@pytest.mark.parametrize("kx,ky,half", [(2, 2, 1), (3, 2, 1)])
def test_swipdg_matches_oracle_smooth(kx, ky, half):
    grid = make_grid(((-1, -1), (1, 1)), [kx, ky], half, num_refinements=1)
    space = BlockDGSpace(grid, order=1)
    lam = make_expression_function_1x1("x", f"1+{COS}", order=2)
    A = _dense(space, lam)
    A_ref = assemble_swipdg_np(grid, lam).toarray()
    assert np.max(np.abs(A - A_ref)) < 1e-12 * max(1, np.max(np.abs(A_ref)))


def test_swipdg_matches_oracle_kappa_and_checkerboard():
    grid = make_grid(((-1, -1), (1, 1)), [2, 2], 1, num_refinements=1)
    space = BlockDGSpace(grid, order=1)
    lam = make_checkerboard_function_1x1([-1, -1], [1, 1], [2, 2],
                                         [[1.0], [0.0], [0.0], [1.0]])
    kappa = make_constant_function_2x2([[2.0, 0.5], [0.5, 1.0]])
    A = _dense(space, lam, kappa)
    A_ref = assemble_swipdg_np(grid, lam, kappa).toarray()
    assert np.max(np.abs(A - A_ref)) < 1e-12 * max(1, np.max(np.abs(A_ref)))
    # symmetry of the SWIPDG form
    assert np.max(np.abs(A - A.T)) < 1e-12


def test_swipdg_matches_oracle_p2():
    grid = make_grid(((0, 0), (1, 1)), [2, 1], 1, num_refinements=1)
    space = BlockDGSpace(grid, order=2)
    lam = make_expression_function_1x1("x", "1+x[0]*x[1]", order=2)
    A = _dense(space, lam)
    A_ref = assemble_swipdg_np(grid, lam, order=2).toarray()
    assert np.max(np.abs(A - A_ref)) < 1e-12 * max(1, np.max(np.abs(A_ref)))


def test_rhs_matches_oracle():
    grid = make_grid(((-1, -1), (1, 1)), [2, 2], 1, num_refinements=1)
    space = BlockDGSpace(grid, order=1)
    f = make_expression_function_1x1("x", f"0.5*pi*pi*{COS}", order=2)
    b = np.asarray(asm.volume_functional(space, f)).ravel()
    b_ref = assemble_rhs_np(grid, f)
    assert np.max(np.abs(b - b_ref)) < 1e-13 * max(1.0, np.max(np.abs(b_ref)))


def test_volume_mass_integrates_constants():
    grid = make_grid(((0, 0), (2, 1)), [2, 1], 1, num_refinements=1)
    space = BlockDGSpace(grid, order=1)
    M = np.asarray(asm.volume_mass(space))
    ones = np.ones((space.K, space.N))
    total = np.einsum("kn,knm,km->", ones, M, ones)
    assert abs(total - 2.0) < 1e-13  # domain area


def test_two_level_pcg_matches_dense():
    import jax.numpy as jnp
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    gpd = init_grid_and_problem({'num_subdomains': [3, 3],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    A = d.op.assemble(jnp.asarray([1.0, 0.7]))
    b = d.rhs_q[0]
    x_dense = A.solve_dense(b)
    x_tl = A.solve_pcg(b, tol=1e-13, maxiter=1000, two_level=True)
    err = float(jnp.abs(x_tl - x_dense).max() / jnp.abs(x_dense).max())
    assert err < 1e-9, err


def test_mixed_precision_refinement_reaches_f64_accuracy():
    import jax.numpy as jnp
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    gpd = init_grid_and_problem({'num_subdomains': [2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    A = d.op.assemble(jnp.asarray([1.0, 0.6]))
    b = d.rhs_q[0]
    from pylrbms_tpu.la.block import AssembledBlockOp
    x_ref = A.solve_dense(b)
    A32 = AssembledBlockOp(A.static, *(v.astype(jnp.float32) for v in
                                       (A.A_diag, A.C_R_io, A.C_R_oi,
                                        A.C_U_io, A.C_U_oi)))
    x32 = A32.solve_pcg(b.astype(jnp.float32), tol=1e-7, maxiter=400)
    x_mp = A.solve_refined(b, refinements=3)
    rel32 = float(jnp.abs(x32.astype(jnp.float64) - x_ref).max() / jnp.abs(x_ref).max())
    rel_mp = float(jnp.abs(x_mp - x_ref).max() / jnp.abs(x_ref).max())
    assert rel_mp < 1e-10, rel_mp
    assert rel_mp < rel32 * 1e-2   # refinement beats plain f32 by >=2 digits
