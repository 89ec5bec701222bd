#!/usr/bin/env python
"""Two-process ``jax.distributed`` smoke test (CPU backend).

Proves the multi-host entry point (``parallel/mesh.py:
initialize_distributed`` -> ``jax.distributed.initialize``) off-mesh: two
local processes form a distributed JAX runtime, see each other's devices,
and agree on a cross-process reduction — the TPU-native analog of the
reference's MPI comm-semantics test on a small real world
(``/root/reference/python/test/mpitest.py:11-37``).

Run:  python scripts/distributed_smoke.py          (spawns 2 workers)
      python scripts/distributed_smoke.py --worker <pid> <nprocs> <port>
"""
import os
import sys
import subprocess


def worker(pid: int, nprocs: int, port: int) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001
        pass

    from pylrbms_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == nprocs * jax.local_device_count()

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    # cross-process gather + reduction (the pymor.parallel.mpi.norm /
    # Allreduce analog, SURVEY.md §5.8)
    local = jnp.asarray([float(pid + 1)])
    gathered = multihost_utils.process_allgather(local)
    total = float(gathered.sum())
    expect = nprocs * (nprocs + 1) / 2.0
    assert total == expect, (total, expect)

    # global-mesh psum over all processes' devices
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("k",))
    # shard_map psum: every device contributes 1.0; result must equal the
    # global device count on every process
    from jax import shard_map

    ones = multihost_utils.host_local_array_to_global_array(
        np.ones((jax.local_device_count(),)), mesh, P("k"))
    out = jax.jit(shard_map(lambda x: jax.lax.psum(x, "k"),
                            mesh=mesh, in_specs=P("k"), out_specs=P()))(ones)
    got = float(np.asarray(
        multihost_utils.global_array_to_host_local_array(out, mesh, P())
    ).ravel()[0])
    assert got == jax.device_count(), (got, jax.device_count())

    print(f"worker {pid}/{nprocs}: OK (processes={jax.process_count()}, "
          f"global devices={jax.device_count()}, allgather sum={total}, "
          f"psum={got})")

    # ---- the real thing (VERDICT r2 #3): ONE K-sharded online solve over
    # the two-process device mesh, parity-asserted against the unsharded
    # single-process result (<-> the reference testing real MPI semantics on
    # a small world, mpitest.py — but with an actual distributed solve)
    jax.config.update("jax_enable_x64", True)
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    from pylrbms_tpu.parallel.mesh import SubdomainMesh

    gpd = init_grid_and_problem(
        {"num_subdomains": [2, 4],
         "half_num_fine_elements_per_subdomain_and_dim": 1,
         "num_refinements": 1})
    d, _ = discretize(gpd)           # deterministic: identical on every rank
    theta = jnp.asarray([1.0, 0.5], jnp.float64)
    theta_f = jnp.asarray([1.0], jnp.float64)
    mu = d.parse_parameter(0.5)

    # unsharded reference (process-local compute)
    A = d.op.assemble(theta)
    b = jnp.einsum("q,qkn->kn", theta_f, d.rhs_q)
    U_ref = np.asarray(A.solve_pcg(b, tol=1e-10, maxiter=500))
    nc, r, dfq = d.estimator.local_quantities(jnp.asarray(U_ref), mu)
    ind_ref = np.asarray(nc + r + dfq)

    # K = 8 sharded over ALL devices of BOTH processes
    sm = SubdomainMesh(Mesh(np.array(jax.devices()), ("k",)))
    assert not sm.replicated().is_fully_addressable      # really multi-proc
    sm.distribute_model(d)
    step = sm.jit_online_step(d, tol=1e-10, maxiter=500)
    U, ind = step(sm.globalize(theta), sm.globalize(theta_f),
                  {k: sm.globalize(v) for k, v in mu.items()})
    U_np, ind_np = sm.to_host(U), sm.to_host(ind)
    scale = float(np.abs(U_ref).max())
    assert np.abs(U_np - U_ref).max() <= 1e-8 * scale, \
        np.abs(U_np - U_ref).max() / scale
    assert np.abs(ind_np - ind_ref).max() <= 1e-8 * np.abs(ind_ref).max()
    print(f"worker {pid}/{nprocs}: K-sharded solve over "
          f"{jax.device_count()} devices / {nprocs} processes == unsharded "
          f"to 1e-8 (K={d.space.K}, max rel diff "
          f"{np.abs(U_np - U_ref).max() / scale:.2e})")


def main() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    nprocs = 2
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(pid), str(nprocs), str(port)],
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 # 4 virtual devices per process -> an 8-device 2-process
                 # mesh for the K-sharded solve leg (drop any inherited
                 # device-count flag, e.g. the test suite's =8)
                 "XLA_FLAGS": " ".join(
                     [f for f in os.environ.get("XLA_FLAGS", "").split()
                      if "xla_force_host_platform_device_count" not in f]
                     + ["--xla_force_host_platform_device_count=4"]),
                 "PYTHONPATH": os.pathsep.join(
                     [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
                     + os.environ.get("PYTHONPATH", "").split(os.pathsep))},
        )
        for pid in range(nprocs)
    ]
    rcs = [p.wait(timeout=300) for p in procs]
    if any(rcs):
        print(f"distributed smoke FAILED: rcs={rcs}", file=sys.stderr)
        return 1
    print("distributed smoke: OK (2 processes, cross-process allgather + "
          "psum + K-sharded solve == unsharded)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        sys.exit(main())
