"""Oswald interpolation error operator (vertex averaging), batched.

TPU-native equivalent of dune-gdt's ``apply_oswald_interpolation_operator``
and the reference's ``OswaldInterpolationErrorOperator``
(``discretize_elliptic_block_swipdg.py:30,72-122``): for a P1 DG function u,
the conforming Oswald interpolant I_os(u) takes at every mesh vertex the
arithmetic mean of the DG values from all incident elements, and 0 at
Dirichlet-boundary vertices (all-Dirichlet boundary info, ``:108-113``).
The operator returns the nonconformity witness  u - I_os(u).

The reference computes this per source-subdomain on oversampled neighborhood
views; because the 1-layer (3x3, incl. diagonal) neighborhood contains every
element incident to a vertex of the subdomain's closure, that equals the
restriction of the *global* Oswald interpolation — which is what we compute,
as one vertex scatter/gather over the whole mesh.  The per-source-block
structure needed by the reductor (``reductor.py:36-46``) is recovered by
applying this operator to basis vectors supported on a single subdomain.

Order 1 uses hand-built per-family vertex tables.  Order 2 (beyond the
reference, which applies Oswald on the P1 block space only) uses a generic
builder: all Lagrange nodes of the structured families live on the
half-step lattice (vertices, edge midpoints, cell centers), so global node
identity is recovered by quantizing physical node coordinates to half-cell
units — the same vertex scatter/average then enforces C^0 continuity of
the full order-2 nodal set (vertices + edge midpoints, + face/center nodes
for Q2).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces import BlockDGSpace


class OswaldOperator:
    def __init__(self, space: BlockDGSpace):
        self.space = space
        g = space.grid
        Sy, Sx = g.global_ny, g.global_nx
        self.Sy, self.Sx = Sy, Sx
        if space.order != 1:
            self._init_generic()
            return
        # vertex ids per (global cell, element, node): [Sy, Sx, T, nb]
        gy, gx = np.meshgrid(np.arange(Sy), np.arange(Sx), indexing="ij")

        def v(iy, ix):
            return iy * (Sx + 1) + ix
        if g.grid_type == "quad":
            # Q1 node order (0,0), (1,0), (0,1), (1,1)  (x fastest)
            vid = np.zeros((Sy, Sx, 1, 4), dtype=np.int64)
            vid[:, :, 0, 0] = v(gy, gx)
            vid[:, :, 0, 1] = v(gy, gx + 1)
            vid[:, :, 0, 2] = v(gy + 1, gx)
            vid[:, :, 0, 3] = v(gy + 1, gx + 1)
        elif g.grid_type == "crisscross":
            # P1 nodes ARE the triangle vertices: read them off the per-cell
            # node tables (parity checkerboard; spaces.py CC_ELEMS) — the
            # vertex-incidence pattern this induces is exactly the ALU
            # bisection mesh's (scripts/crisscross_oracle.py).
            nodes = space.nodes_unit                   # [s, s, T, nb, 2]
            s = space.s
            tile = np.rint(nodes).astype(np.int64)     # vertex offsets {0,1}
            ny_ = np.tile(tile[None, :, None, :, :, :, 1],
                          (g.ky, 1, g.kx, 1, 1, 1)).reshape(Sy, Sx, space.T, space.nb)
            nx_ = np.tile(tile[None, :, None, :, :, :, 0],
                          (g.ky, 1, g.kx, 1, 1, 1)).reshape(Sy, Sx, space.T, space.nb)
            vid = v(gy[:, :, None, None] + ny_, gx[:, :, None, None] + nx_)
        else:
            # A: (0,0), (1,0), (1,1);  B: (0,0), (0,1), (1,1)  (unit-cell coords)
            vid = np.zeros((Sy, Sx, 2, 3), dtype=np.int64)
            vid[:, :, 0, 0] = v(gy, gx)
            vid[:, :, 0, 1] = v(gy, gx + 1)
            vid[:, :, 0, 2] = v(gy + 1, gx + 1)
            vid[:, :, 1, 0] = v(gy, gx)
            vid[:, :, 1, 1] = v(gy + 1, gx)
            vid[:, :, 1, 2] = v(gy + 1, gx + 1)
        self.vertex_ids = vid.reshape(-1)                       # [Sy*Sx*T*nb]
        self.n_vertices = (Sy + 1) * (Sx + 1)
        counts = np.zeros(self.n_vertices)
        np.add.at(counts, self.vertex_ids, 1.0)
        self.counts = counts
        iy, ix = np.meshgrid(np.arange(Sy + 1), np.arange(Sx + 1), indexing="ij")
        self.interior_mask = ((iy > 0) & (iy < Sy) & (ix > 0) & (ix < Sx)).reshape(-1)

    def _init_generic(self):
        """Generic node-identity builder (order 2, any family): quantize
        physical node coordinates to the half-cell lattice
        (2*Sy+1) x (2*Sx+1); lattice points on the domain boundary are the
        Dirichlet nodes."""
        sp = self.space
        g = sp.grid
        Sy, Sx = self.Sy, self.Sx
        org = g.cell_origins()                              # [Sy, Sx, 2]
        scale = np.array([sp.hx, sp.hy])
        nodes = sp.nodes_unit * scale       # [T, nb, 2] | percell [s,s,T,nb,2]
        if sp.percell:
            nodes = np.tile(nodes[None, :, None],
                            (g.ky, 1, g.kx, 1, 1, 1, 1)
                            ).reshape(Sy, Sx, sp.T, sp.nb, 2)
        else:
            nodes = np.broadcast_to(nodes[None, None],
                                    (Sy, Sx, sp.T, sp.nb, 2))
        coords = org[:, :, None, None, :] + nodes           # [Sy,Sx,T,nb,2]
        x0 = org[0, 0]                                      # domain lower-left
        ix2 = np.rint((coords[..., 0] - x0[0]) / (sp.hx / 2)).astype(np.int64)
        iy2 = np.rint((coords[..., 1] - x0[1]) / (sp.hy / 2)).astype(np.int64)
        assert ix2.min() >= 0 and ix2.max() <= 2 * Sx
        assert iy2.min() >= 0 and iy2.max() <= 2 * Sy
        self.vertex_ids = (iy2 * (2 * Sx + 1) + ix2).reshape(-1)
        self.n_vertices = (2 * Sy + 1) * (2 * Sx + 1)
        counts = np.zeros(self.n_vertices)
        np.add.at(counts, self.vertex_ids, 1.0)
        self.counts = np.maximum(counts, 1.0)   # unused lattice points
        iy, ix = np.meshgrid(np.arange(2 * Sy + 1), np.arange(2 * Sx + 1),
                             indexing="ij")
        self.interior_mask = ((iy > 0) & (iy < 2 * Sy)
                              & (ix > 0) & (ix < 2 * Sx)).reshape(-1)

    # ------------------------------------------------------------------
    def _block_to_global_cells(self, U):
        """[..., K, N] -> [..., Sy*Sx*T*nb] in global-cell order."""
        sp = self.space
        g = sp.grid
        lead = U.shape[:-2]
        U = U.reshape(lead + (g.ky, g.kx, sp.s, sp.s, sp.T, sp.nb))
        U = jnp.moveaxis(U, -4, -5)      # [.., ky, s, kx, s, T, nb]
        return U.reshape(lead + (-1,))

    def _global_cells_to_block(self, V, lead):
        sp = self.space
        g = sp.grid
        V = V.reshape(lead + (g.ky, sp.s, g.kx, sp.s, sp.T, sp.nb))
        V = jnp.moveaxis(V, -4, -5)      # [.., ky, kx, s, s, T, nb]
        return V.reshape(lead + (sp.K, sp.N))

    @property
    def vertex_ids_block(self):
        """``vertex_ids`` re-indexed to the block dof layout [K*N]: node j of
        block-flat dof i is ``vertex_ids_block[i]``.  Lets ``interpolate``
        scatter/gather on the flat [..., K*N] axis directly — the
        reshape+moveaxis to global-cell order materialized a 7-D temp whose
        tiny minor dims (T, nb) pad ~8x under TPU tiling (a measured 12 GB
        HLO temp at SPE10 scale with a 4096-column batch, compile-OOM)."""
        vb = getattr(self, "_vertex_ids_block", None)
        if vb is None:
            sp, g = self.space, self.space.grid
            perm = np.arange(sp.K * sp.N).reshape(
                g.ky, g.kx, sp.s, sp.s, sp.T, sp.nb)
            perm = np.moveaxis(perm, 2, 1).reshape(-1)
            vb = np.empty(sp.K * sp.N, dtype=np.int64)
            vb[perm] = self.vertex_ids
            self._vertex_ids_block = vb
        return vb

    def interpolate(self, U):
        """I_os(u): [..., K, N] -> [..., K, N] (conforming, zero on boundary)."""
        lead = U.shape[:-2]
        sp = self.space
        vals = U.reshape(lead + (-1,))
        vid = jnp.asarray(self.vertex_ids_block)
        sums = jnp.zeros(lead + (self.n_vertices,), U.dtype)
        sums = sums.at[..., vid].add(vals)
        avg = sums / jnp.asarray(self.counts, U.dtype)
        avg = avg * jnp.asarray(self.interior_mask, U.dtype)
        out = avg[..., vid]
        return out.reshape(lead + (sp.K, sp.N))

    def apply(self, U):
        """Nonconformity witness u - I_os(u)  (<-> the identity-minus-
        interpolant of ``...block_swipdg.py:118-119``)."""
        return U - self.interpolate(U)
