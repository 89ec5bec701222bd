"""3D Oswald interpolation error operator (vertex averaging on hexes).

3D counterpart of ``ops/oswald.py`` (<-> dune-gdt's
``apply_oswald_interpolation_operator``, beyond the 2D-only reference): for
a trilinear Q1 DG function u, the conforming Oswald interpolant I_os(u)
takes at every mesh vertex the arithmetic mean of the DG values from all
(up to 8) incident hexes, and 0 at Dirichlet-boundary vertices.  Returns the
nonconformity witness u - I_os(u).  One vertex scatter/gather over the whole
mesh; per-source-block structure is recovered by applying to basis vectors
supported on a single subdomain (as in 2D).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces3d import BlockDGSpace3D


class Oswald3D:
    def __init__(self, space: BlockDGSpace3D):
        self.space = space
        g = space.grid
        Sx, Sy, Sz = g.global_nx, g.global_ny, g.global_nz
        self.Sx, self.Sy, self.Sz = Sx, Sy, Sz
        if space.order != 1:
            self._init_generic()
            return
        gz, gy, gx = np.meshgrid(np.arange(Sz), np.arange(Sy), np.arange(Sx),
                                 indexing="ij")

        def v(iz, iy, ix):
            return (iz * (Sy + 1) + iy) * (Sx + 1) + ix

        # Q1 node order j = (iz*2 + iy)*2 + ix (basis.hex_node_coords_unit)
        vid = np.zeros((Sz, Sy, Sx, 8), dtype=np.int64)
        for j, (iz, iy, ix) in enumerate(np.ndindex(2, 2, 2)):
            vid[..., j] = v(gz + iz, gy + iy, gx + ix)
        self.vertex_ids = vid.reshape(-1)
        self.n_vertices = (Sz + 1) * (Sy + 1) * (Sx + 1)
        counts = np.zeros(self.n_vertices)
        np.add.at(counts, self.vertex_ids, 1.0)
        self.counts = counts
        iz, iy, ix = np.meshgrid(np.arange(Sz + 1), np.arange(Sy + 1),
                                 np.arange(Sx + 1), indexing="ij")
        self.interior_mask = ((iz > 0) & (iz < Sz) & (iy > 0) & (iy < Sy)
                              & (ix > 0) & (ix < Sx)).reshape(-1)

    def _init_generic(self):
        """Generic node-identity builder (order 2): all Q2 Lagrange nodes
        live on the half-cell lattice (2Sz+1) x (2Sy+1) x (2Sx+1); global
        node identity is recovered by quantizing physical node coordinates
        to half-cell units, and lattice points on the domain boundary are
        the Dirichlet nodes (same construction as the 2D
        ``OswaldOperator._init_generic``)."""
        sp = self.space
        Sx, Sy, Sz = self.Sx, self.Sy, self.Sz
        # reorder to global-cell order to match _block_to_global_cells
        g = sp.grid
        coords = sp.node_coords_phys().reshape(
            g.kz, g.ky, g.kx, sp.s, sp.s, sp.s, sp.nb, 3)
        coords = np.moveaxis(coords, 3, 1)         # sz next to kz
        coords = np.moveaxis(coords, 4, 3)         # sy next to ky
        coords = coords.reshape(-1, 3)
        x0 = np.asarray(g.lower_left)
        ix2 = np.rint((coords[:, 0] - x0[0]) / (sp.hx / 2)).astype(np.int64)
        iy2 = np.rint((coords[:, 1] - x0[1]) / (sp.hy / 2)).astype(np.int64)
        iz2 = np.rint((coords[:, 2] - x0[2]) / (sp.hz / 2)).astype(np.int64)
        assert ix2.min() >= 0 and ix2.max() <= 2 * Sx
        assert iy2.min() >= 0 and iy2.max() <= 2 * Sy
        assert iz2.min() >= 0 and iz2.max() <= 2 * Sz
        self.vertex_ids = ((iz2 * (2 * Sy + 1) + iy2) * (2 * Sx + 1) + ix2)
        self.n_vertices = (2 * Sz + 1) * (2 * Sy + 1) * (2 * Sx + 1)
        counts = np.zeros(self.n_vertices)
        np.add.at(counts, self.vertex_ids, 1.0)
        self.counts = np.maximum(counts, 1.0)      # unused lattice points
        iz, iy, ix = np.meshgrid(np.arange(2 * Sz + 1), np.arange(2 * Sy + 1),
                                 np.arange(2 * Sx + 1), indexing="ij")
        self.interior_mask = ((iz > 0) & (iz < 2 * Sz) & (iy > 0)
                              & (iy < 2 * Sy) & (ix > 0)
                              & (ix < 2 * Sx)).reshape(-1)

    # ------------------------------------------------------------------
    def _block_to_global_cells(self, U):
        """[..., K, N] -> [..., Sz*Sy*Sx*nb] in global-cell order."""
        sp = self.space
        g = sp.grid
        lead = U.shape[:-2]
        U = U.reshape(lead + (g.kz, g.ky, g.kx, sp.s, sp.s, sp.s, sp.nb))
        # [.., kz, ky, kx, sz, sy, sx, nb] -> [.., kz, sz, ky, sy, kx, sx, nb]
        U = jnp.moveaxis(U, -4, -6)      # sz next to kz
        U = jnp.moveaxis(U, -3, -4)      # sy next to ky
        return U.reshape(lead + (-1,))

    @property
    def vertex_ids_block(self):
        """``vertex_ids`` re-indexed to the block dof layout [K*N] (same
        rationale as the 2D ``OswaldOperator.vertex_ids_block``: avoids
        materializing the tiny-minor-dim global-cell-order temp that pads
        ~8x under TPU tiling)."""
        vb = getattr(self, "_vertex_ids_block", None)
        if vb is None:
            sp, g = self.space, self.space.grid
            perm = np.arange(sp.K * sp.N).reshape(
                g.kz, g.ky, g.kx, sp.s, sp.s, sp.s, sp.nb)
            perm = np.moveaxis(perm, 3, 1)             # sz next to kz
            perm = np.moveaxis(perm, 4, 3)             # sy next to ky
            perm = perm.reshape(-1)
            vb = np.empty(sp.K * sp.N, dtype=np.int64)
            vb[perm] = self.vertex_ids
            self._vertex_ids_block = vb
        return vb

    def interpolate(self, U):
        """I_os(u): [..., K, N] -> [..., K, N] (conforming, zero on the
        domain boundary)."""
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

    def _global_cells_to_block(self, V, lead):
        """Inverse of :meth:`_block_to_global_cells` (permutation verified
        round-trip in tests/test_hex3d_estimator.py)."""
        sp = self.space
        g = sp.grid
        V = V.reshape(lead + (g.kz, sp.s, g.ky, sp.s, g.kx, sp.s, sp.nb))
        V = jnp.moveaxis(V, (-6, -4), (-4, -3))
        return V.reshape(lead + (sp.K, sp.N))

    def apply(self, U):
        """Nonconformity witness u - I_os(u)."""
        return U - self.interpolate(U)
