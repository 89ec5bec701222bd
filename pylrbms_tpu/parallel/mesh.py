"""Device-mesh distribution of the subdomain axis.

TPU-native replacement for the reference's MPI domain decomposition
(SURVEY.md §2.5): the rank-local subdomain lists (``grid.subdomains_on_rank``)
become shards of the leading K axis over a 1D ``jax.sharding.Mesh``; the
``dof_communicator`` halo exchanges become XLA collectives GSPMD inserts for
the interface-coupling gathers; ``pymor.parallel.mpi.norm`` becomes a plain
``jnp`` norm over sharded arrays (an all-reduce under the hood).

Multi-host: call :func:`initialize_distributed` once per process
(<-> ``Dune::XT::Common::bindings::add_initialization`` / ``init_mpi()``,
``bindings.cc:16-20``, ``threadpool_test.py:7-8``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host init (no-op single-host)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


@dataclass
class SubdomainMesh:
    """1D mesh over the subdomain axis."""
    mesh: Mesh

    @staticmethod
    def create(n_devices: Optional[int] = None, axis: str = "k") -> "SubdomainMesh":
        devs = jax.devices()
        n = n_devices or len(devs)
        return SubdomainMesh(Mesh(np.array(devs[:n]), (axis,)))

    @property
    def axis(self) -> str:
        return self.mesh.axis_names[0]

    def shard_k(self, ndim_before_k: int = 0):
        """NamedSharding placing the K axis (at position ndim_before_k) on
        the mesh axis."""
        spec = [None] * ndim_before_k + [self.axis]
        return NamedSharding(self.mesh, P(*spec))

    def replicated(self):
        return NamedSharding(self.mesh, P())

    def put(self, x, sharding):
        """``device_put`` that also works when the mesh spans multiple
        processes (``jax.distributed``): non-fully-addressable shardings
        go through ``make_array_from_callback``, each process materializing
        only its addressable shards from the (process-replicated) host
        value — the moral equivalent of the reference's rank-local
        subdomain ownership (``grid.subdomains_on_rank``)."""
        if getattr(sharding, "is_fully_addressable", True):
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    def globalize(self, x):
        """Replicate a host value onto the (possibly multi-process) mesh."""
        return self.put(x, self.replicated())

    def to_host(self, x):
        """Full host value of a (possibly multi-process) global array."""
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.global_array_to_host_local_array(
            x, self.mesh, P()))

    # ------------------------------------------------------------------
    def distribute_model(self, d):
        """Shard the big per-subdomain tensors of a StationaryBlockModel
        over the mesh (in place).  K must be divisible by the mesh size."""
        K = d.space.K
        n = self.mesh.devices.size
        assert K % n == 0, f"K={K} not divisible by mesh size {n}"
        sk1 = self.shard_k(1)    # [Q, K, ...]
        sk0 = self.shard_k(0)    # [K, ...]
        d.op.A_diag = self.put(d.op.A_diag, sk1)
        d.rhs_q = self.put(d.rhs_q, sk1)
        for key, v in list(d.products.items()):
            if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == K:
                d.products[key] = self.put(v, sk0)
        ed = d.estimator.data if d.estimator else None
        if ed is not None:
            # lean models carry None for the matrix-form tensors (the
            # positive-form integrals serve the estimate); skip those
            def put(name, sharding):
                v = getattr(ed, name)
                if v is not None:
                    setattr(ed, name, self.put(v, sharding))
            for name in ("E_bar", "L2", "BB", "R_dd", "min_ev", "diam"):
                put(name, sk0)
            put("M_aa", self.shard_k(2))
            put("M_ab", self.shard_k(1))
            put("d_vec", self.shard_k(1))
            put("rf_qq", self.shard_k(2))
        return d

    def shard_stencil(self, sop):
        """Shard a matrix-free stencil operator (2D ``StencilOperator`` /
        ``AssembledStencil`` or 3D ``StencilOperator3`` / ``AssembledStencil3``)
        over the mesh: every per-subdomain leaf (leading axis == K) gets its
        K axis placed on the mesh; interface strips (leading axis =
        #interfaces) are replicated — they are O(E s nb^2), tiny next to the
        volume/face families.  GSPMD then inserts the halo collectives at
        the shifted-slice adds of the matrix-free apply — the stencil
        path's scale-out beyond one chip (<-> the reference's
        ``dof_communicator`` halo exchange inside ISTL solves,
        ``discretize_elliptic_block_swipdg.py:473``).  K must be divisible
        by the mesh size; the subdomain index is row-major over the
        subdomain grid, so each shard is a contiguous band of grid rows and
        the halo adds touch only mesh-neighbor shards."""
        K = sop.space.K
        n = self.mesh.devices.size
        assert K % n == 0, f"K={K} not divisible by mesh size {n}"
        sk, repl = self.shard_k(0), self.replicated()

        def put(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == K:
                return self.put(x, sk)
            return self.put(x, repl)

        return jax.tree.map(put, sop)

    def jit_mf_solve(self, sop, tol: float = 1e-10, maxiter: int = 2000):
        """Jitted K-sharded matrix-free two-level PCG solve
        ``(theta, b, block_factors, coarse_basis, coarse_inv) -> U``.

        All tensors are pytree arguments; inputs prepared with
        :meth:`shard_stencil` / :meth:`shard_k` stay sharded through the
        solve and ``U`` comes out K-sharded.  Pass ``None`` for the coarse
        pair to run single-level block-Jacobi PCG."""
        from ..utils.precision import hp

        def solve(sop_, theta, b, bf, C, ci):
            A = sop_.assemble(theta)
            return A.solve_pcg(b, tol=tol, maxiter=maxiter, block_factors=bf,
                               coarse_basis=C, coarse_inv=ci)

        with self.mesh:
            return jax.jit(hp(solve), out_shardings=self.shard_k(0))

    def jit_online_step(self, d, tol: float = 1e-8, maxiter: int = 500):
        """Jitted sharded online step: assemble + PCG solve + localized
        estimate; outputs sharded over K.

        All sharded model tensors enter as jit ARGUMENTS (pytrees), never as
        closure constants — required for multi-process meshes (jax forbids
        closing over non-addressable arrays) and the remote-compile path
        (captured arrays become HLO constants)."""
        import jax.numpy as jnp

        from ..utils.precision import hp

        est = d.estimator
        tensor_names = ("E_bar", "L2", "BB", "R_dd", "min_ev", "diam",
                        "M_aa", "M_ab", "d_vec", "rf_qq")

        def step(op, rhs_q, tensors, theta, theta_f, mu):
            A = op.assemble(theta)
            b = jnp.einsum("q,qkn->kn", theta_f, rhs_q)
            U = A.solve_pcg(b, tol=tol, maxiter=maxiter)
            nc, r, df = est.local_quantities(U, mu, tensors=tensors)
            return U, nc + r + df

        with self.mesh:
            jitted = jax.jit(hp(step),
                             out_shardings=(self.shard_k(0), self.shard_k(0)))

        def call(theta, theta_f, mu):
            tensors = {n: getattr(est.data, n) for n in tensor_names
                       if getattr(est.data, n) is not None}
            with self.mesh:
                return jitted(d.op, d.rhs_q, tensors, theta, theta_f, mu)

        return call


def psum_norm(local_sq, axis_name: str):
    """Global 2-norm of rank-local squared contributions inside shard_map
    (<-> ``pymor.parallel.mpi.norm``, ``estimators.py:100-101``)."""
    import jax.numpy as jnp
    return jnp.sqrt(jax.lax.psum(jnp.sum(local_sq), axis_name))
