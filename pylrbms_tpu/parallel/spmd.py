"""Explicit SPMD online solve: shard_map + ppermute halo exchange + psum.

The GSPMD path (parallel/mesh.py) lets XLA infer the collectives; this module
is the hand-written SPMD formulation of the same online step — the direct
TPU analog of the reference's MPI structure (SURVEY.md §2.5):

* subdomain ROWS of the kx x ky partition are sharded over a 1D mesh
  (rank-local subdomain lists <-> shards of the K axis);
* the up/down interface couplings crossing shard boundaries exchange one
  boundary-layer strip per neighbor per matvec via ``ppermute``
  (<-> the ``dof_communicator`` halo exchange inside ISTL solves);
* CG inner products are ``psum`` reductions
  (<-> ``pymor.parallel.mpi.norm``).

Requirements: ky divisible by the mesh size (row sharding).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.precision import hp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _rowwise(arrs, ky, kx):
    """reshape leading K=ky*kx axis to [ky, kx, ...] for row sharding."""
    return jax.tree.map(lambda a: a.reshape((ky, kx) + a.shape[1:]), arrs)


class SpmdOnlineSolver:
    """Builds a shard_map'ed (assemble + PCG + local estimate) step."""

    def __init__(self, d, mesh: Mesh):
        self.d = d
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        grid = d.grid
        self.kx, self.ky = grid.kx, grid.ky
        n_dev = mesh.devices.size
        assert self.ky % n_dev == 0, "ky must be divisible by the mesh size"

    # ------------------------------------------------------------------
    def _apply_local(self, op_local, C_from_below, x, st):
        """Local block apply + cross-shard halo exchange for U-couplings.

        op_local entries are row-sharded slices [kyl, kx, ...]; x [kyl, kx, N];
        ``C_from_below`` is the below-shard's boundary-edge out_in strip
        (shipped once outside the CG loop).
        """
        A_diag, C_R_io, C_R_oi, C_U_io, C_U_oi = op_local
        axis = self.axis
        kx = self.kx
        s = st.s
        nb = st.nb
        n_dev = int(self.mesh.devices.size)
        sr = {k: jnp.asarray(v) for k, v in st.side_rows.items()}

        N = x.shape[-1]

        def embed(update, rows):
            """update [..., s*nb] -> [..., N] scattered at `rows` (trailing
            advanced index only: dims stay in place)."""
            z = jnp.zeros(update.shape[:-1] + (N,), update.dtype)
            return z.at[..., rows].add(update)

        y = jnp.einsum("YXij,YXj->YXi", A_diag, x)

        # intra-row (left/right) couplings: fully local
        if kx > 1:
            xl = x[:, :-1][..., sr["right"].reshape(-1)]       # [kyl, kx-1, s*nb]
            xr = x[:, 1:][..., sr["left"].reshape(-1)]
            xl = xl.reshape(xl.shape[:2] + (s, nb))
            xr = xr.reshape(xr.shape[:2] + (s, nb))
            upd_l = jnp.einsum("YXfij,YXfj->YXfi", C_R_io, xr).reshape(
                xl.shape[:2] + (s * nb,))
            upd_r = jnp.einsum("YXfij,YXfj->YXfi", C_R_oi, xl).reshape(
                xl.shape[:2] + (s * nb,))
            y = y.at[:, :-1].add(embed(upd_l, sr["right"].reshape(-1)))
            y = y.at[:, 1:].add(embed(upd_r, sr["left"].reshape(-1)))

        # vertical couplings: local rows + one halo strip per direction
        kyl = x.shape[0]
        top_rows = sr["top"].reshape(-1)
        bot_rows = sr["bottom"].reshape(-1)
        x_top = x[-1][..., top_rows].reshape(kx, s, nb)        # my last row, top side
        x_bot = x[0][..., bot_rows].reshape(kx, s, nb)         # my first row, bottom side

        # receive the lower neighbor's top strip and the upper neighbor's bottom strip
        idx = jax.lax.axis_index(axis)
        up = [(i, (i + 1) % n_dev) for i in range(n_dev)]      # send to upper shard
        down = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        recv_top_of_below = jax.lax.ppermute(x_top, axis, up)      # from idx-1
        recv_bot_of_above = jax.lax.ppermute(x_bot, axis, down)    # from idx+1

        if kyl > 1:
            xm = x[:-1][..., top_rows].reshape(kyl - 1, kx, s, nb)
            xp = x[1:][..., bot_rows].reshape(kyl - 1, kx, s, nb)
            upd_m = jnp.einsum("YXfij,YXfj->YXfi", C_U_io[:-1], xp)
            upd_p = jnp.einsum("YXfij,YXfj->YXfi", C_U_oi[:-1], xm)
            y = y.at[:-1].add(embed(upd_m.reshape(kyl - 1, kx, s * nb), top_rows))
            y = y.at[1:].add(embed(upd_p.reshape(kyl - 1, kx, s * nb), bot_rows))
        # cross-shard pair: my last row (in) <-> next shard's first row (out)
        has_above = idx < n_dev - 1
        upd = jnp.einsum("Xfij,Xfj->Xfi", C_U_io[-1], recv_bot_of_above)
        y = y.at[-1].add(jnp.where(has_above,
                                   embed(upd.reshape(kx, s * nb), top_rows), 0.0))
        has_below = idx > 0
        upd2 = jnp.einsum("Xfij,Xfj->Xfi", C_from_below, recv_top_of_below)
        y = y.at[0].add(jnp.where(has_below,
                                  embed(upd2.reshape(kx, s * nb), bot_rows), 0.0))
        return y

    # ------------------------------------------------------------------
    def make_step(self, tol=1e-8, maxiter=400):
        d = self.d
        st = d.op.static
        axis = self.axis
        kx, ky = self.kx, self.ky
        s, nb = st.s, st.nb

        # row-sharded operator arrays: A_diag [Q, ky, kx, N, N], U-couplings
        # re-indexed by their LOWER row so every edge lives on one shard.
        Q = d.op.Q
        A_diag = d.op.A_diag.reshape(Q, ky, kx, st.N, st.N)
        C_R_io = d.op.C_R_io.reshape(Q, ky, kx - 1, s, nb, nb) if kx > 1 else \
            jnp.zeros((Q, ky, 0, s, nb, nb), d.op.A_diag.dtype)
        C_R_oi = d.op.C_R_oi.reshape(Q, ky, kx - 1, s, nb, nb) if kx > 1 else C_R_io
        # U edges: [ky-1, kx]; pad a zero edge row at the top so shape is [ky, kx]
        zpad = jnp.zeros((Q, 1, kx, s, nb, nb), d.op.A_diag.dtype)
        C_U_io = jnp.concatenate([d.op.C_U_io.reshape(Q, ky - 1, kx, s, nb, nb), zpad],
                                 axis=1) if ky > 1 else jnp.tile(zpad, (1, ky, 1, 1, 1, 1))
        C_U_oi = jnp.concatenate([d.op.C_U_oi.reshape(Q, ky - 1, kx, s, nb, nb), zpad],
                                 axis=1) if ky > 1 else jnp.tile(zpad, (1, ky, 1, 1, 1, 1))
        rhs_q = d.rhs_q.reshape(-1, ky, kx, st.N)

        spec_row = P(None, self.axis)       # [Q, ky, ...]
        mesh = self.mesh

        n_dev = int(mesh.devices.size)
        up_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(theta, theta_f, A_diag, C_R_io, C_R_oi, C_U_io, C_U_oi, rhs_q):
            mix = lambda a: jnp.einsum("q,q...->...", theta, a)
            op_local = (mix(A_diag), mix(C_R_io), mix(C_R_oi),
                        mix(C_U_io), mix(C_U_oi))
            b = jnp.einsum("q,q...->...", theta_f, rhs_q)     # [kyl, kx, N]
            # preconditioner blocks: f32 inversion where f64 LU is
            # unavailable (TPU) — changes iterations, not the limit
            inv_dtype = op_local[0].dtype
            if inv_dtype == jnp.float64 and jax.default_backend() != "cpu":
                inv_dtype = jnp.float32
            Ainv = jnp.linalg.inv(
                op_local[0].astype(inv_dtype)).astype(op_local[0].dtype)
            # the boundary edge's out_in strip lives on the shard below;
            # ship it once (constant across CG iterations)
            C_from_below = jax.lax.ppermute(op_local[4][-1], axis, up_perm)

            def M(r):
                return jnp.einsum("YXnm,YXm->YXn", Ainv, r)

            def Aapply(x):
                return self._apply_local(op_local, C_from_below, x, st)

            def dot(u, v):
                return jax.lax.psum(jnp.vdot(u, v), axis)

            bnorm2 = dot(b, b)
            atol2 = (tol ** 2) * jnp.maximum(bnorm2, 1e-300)
            x0 = jnp.zeros_like(b)
            r0 = b - Aapply(x0)
            z0 = M(r0)
            state = (x0, r0, z0, z0, dot(r0, z0), 0)

            def cond(st_):
                x, r, z, p, rz, it = st_
                return jnp.logical_and(dot(r, r) > atol2, it < maxiter)

            def body(st_):
                x, r, z, p, rz, it = st_
                Ap = Aapply(p)
                alpha = rz / dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = M(r)
                rzn = dot(r, z)
                p = z + (rzn / rz) * p
                return (x, r, z, p, rzn, it + 1)

            x, *_ = jax.lax.while_loop(cond, body, state)
            return x

        sharded = shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), spec_row, spec_row, spec_row, spec_row,
                      spec_row, spec_row),
            out_specs=P(self.axis),
            check_vma=False)

        def run(theta, theta_f):
            x = sharded(theta, theta_f, A_diag, C_R_io, C_R_oi,
                        C_U_io, C_U_oi, rhs_q)
            return x.reshape(ky * kx, st.N)

        return jax.jit(hp(run))
