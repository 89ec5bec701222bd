"""K-sharded matrix-free (stencil) solves == unsharded, on the virtual
8-device CPU mesh.

The stencil path is the at-scale representation (O(K s^d nb^2) memory); its
K-sharding is the designed route past the single-chip ceiling (STATUS.md
"XL ladder").  The apply's shifted-slice adds across subdomain rows become
GSPMD halo collectives (<-> the reference's ``dof_communicator`` halo
exchange inside ISTL solves, ``discretize_elliptic_block_swipdg.py:473``);
results must equal the unsharded solve to solver tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylrbms_tpu.parallel.mesh import SubdomainMesh

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


def _sharded_devices(x):
    return len(set(s.device for s in x.addressable_shards))


@needs8
def test_mf_sharded_solve_matches_unsharded_2d():
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    from pylrbms_tpu.la.block import prepare_coarse
    from pylrbms_tpu.la.block import AssembledBlockOp as ABO

    # ky=8 rows over 8 devices: each shard is one contiguous subdomain row,
    # halo adds touch only mesh neighbors
    gpd = init_grid_and_problem({'num_subdomains': [2, 8],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    sop = d.mf_operator()
    theta = jnp.asarray([1.0, 0.45])
    b = d.rhs_q[0]

    A0 = d.op.assemble(theta)
    bf = A0.block_jacobi_factors()
    C, ci = prepare_coarse(A0, ABO.coarse_modes_basis(d.space, 3))

    x_ref = sop.assemble(theta).solve_pcg(
        b, tol=1e-12, maxiter=2000, block_factors=bf,
        coarse_basis=C, coarse_inv=ci)

    sm = SubdomainMesh.create(8)
    sop_sh = sm.shard_stencil(sop)
    sk0, repl = sm.shard_k(0), sm.replicated()
    b_sh = jax.device_put(b, sk0)
    bf_sh = jax.device_put(bf, sk0)
    C_sh = jax.device_put(C, sk0)
    ci_sh = jax.device_put(ci, repl)
    solve = sm.jit_mf_solve(sop_sh, tol=1e-12, maxiter=2000)
    x = solve(sop_sh, jax.device_put(theta, repl), b_sh, bf_sh, C_sh, ci_sh)

    assert _sharded_devices(x) == 8
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-9, atol=1e-12)


@needs8
def test_mf_sharded_solve_matches_unsharded_3d():
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize

    # kz=8 over 8 devices (subdomain index is kz-major in 3D)
    gpd = init_grid_and_problem({'num_subdomains': [1, 1, 8],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    sop = d.mf_operator()
    theta = jnp.asarray([1.0, 0.45])
    b = d.rhs_q[0]

    bf = d.op.assemble(theta).block_jacobi_factors()
    # single-level block-Jacobi PCG stalls near 1e-8 relative residual on
    # this config (f64 rounding at the penalty-dominated conditioning), so
    # solve to an achievable tol and compare there
    x_ref = sop.assemble(theta).solve_pcg(b, tol=1e-8, maxiter=2000,
                                          block_factors=bf)

    sm = SubdomainMesh.create(8)
    sop_sh = sm.shard_stencil(sop)
    sk0, repl = sm.shard_k(0), sm.replicated()
    solve = sm.jit_mf_solve(sop_sh, tol=1e-8, maxiter=2000)
    x = solve(sop_sh, jax.device_put(theta, repl),
              jax.device_put(b, sk0), jax.device_put(bf, sk0), None, None)

    assert _sharded_devices(x) == 8
    # solution agreement is bounded by cond(A)*tol; assert the sharded
    # solve's own residual independently
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-3, atol=1e-8)
    A = sop.assemble(theta)
    res = float(jnp.linalg.norm(A.apply(x) - b) / jnp.linalg.norm(b))
    assert res < 1e-8, res


@needs8
def test_mf_sharded_apply_matches_unsharded_crisscross():
    """The parity-masked crisscross stencil apply rides the same GSPMD
    sharding (masks are static numpy constants, replicated)."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize

    gpd = init_grid_and_problem({'num_subdomains': [2, 8],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1,
                                 'grid_type': 'crisscross'})
    d, _ = discretize(gpd)
    sop = d.mf_operator()
    theta = jnp.asarray([1.0, 0.7])
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(d.space.K, d.space.N)))
    y_ref = sop.assemble(theta).apply(x)

    sm = SubdomainMesh.create(8)
    sop_sh = sm.shard_stencil(sop)
    sk0, repl = sm.shard_k(0), sm.replicated()
    from pylrbms_tpu.utils.precision import hp
    with sm.mesh:
        apply = jax.jit(hp(lambda s_, th, x_: s_.assemble(th).apply(x_)),
                        out_shardings=sk0)
        y = apply(sop_sh, jax.device_put(theta, repl), jax.device_put(x, sk0))
    assert _sharded_devices(y) == 8
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-11, atol=1e-13)


@needs8
def test_corrector_sharded_matches_unsharded_3d():
    """The 3D batched patch corrector (z-couplings included) K-sharded over
    the mesh equals the unsharded solve."""
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    from pylrbms_tpu.ops.corrector import BatchedCorrector

    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    mu = {"diffusion": 0.6}
    U = d.solve(mu)
    corr = BatchedCorrector(d)
    marked = [0, 3, 7]
    W_ref = corr.solve(marked, mu, current_solution=U)
    sm = SubdomainMesh.create(8)
    W_sh = corr.solve(marked, mu, current_solution=U, mesh=sm)
    np.testing.assert_allclose(np.asarray(W_sh), np.asarray(W_ref),
                               rtol=1e-7, atol=1e-10)


@needs8
def test_lean_positive_estimate_sharded_matches_unsharded_3d():
    """The lean (positive-form) estimator — the XL-scale estimate path,
    no matrix-form tensors — runs K-sharded: Oswald's global vertex
    scatter and the flux reconstruction's global face moments ride GSPMD;
    distribute_model skips the absent matrix tensors on lean models."""
    from pylrbms_tpu.problems.academic3d import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg3d import discretize
    from pylrbms_tpu.utils.precision import hp

    gpd = init_grid_and_problem({'num_subdomains': [2, 2, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd, lean=True)
    mu = {"diffusion": 0.6}
    U = d.solve(mu)
    ref = tuple(np.asarray(v)
                for v in d.estimator.local_quantities_positive(U[None], mu))

    sm = SubdomainMesh.create(8)
    sm.distribute_model(d)
    U_sh = jax.device_put(U, sm.shard_k(0))
    with sm.mesh:
        fn = jax.jit(hp(lambda u: d.estimator.local_quantities_positive(
            u[None], mu)), out_shardings=sm.shard_k(1))
        out = fn(U_sh)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-10, atol=1e-14)
    assert _sharded_devices(out[0]) == 8
