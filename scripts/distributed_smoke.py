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
    print("distributed smoke: OK (2 processes, cross-process allgather + psum)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        sys.exit(main())
