"""RT0 hex diffusive flux reconstruction (3D), batched over all faces.

3D counterpart of ``ops/fluxreco.py`` (<-> dune-gdt's
``RS2017_apply_diffusive_flux_reconstruction_in_neighborhood``, extended
beyond the 2D-only reference): per affine diffusion component, reconstruct
t_q in tensor RT0 on hexes via the face-mean moments

  inner face e:      int_e t.n  = int_e ( -{lambda_q kappa grad u}_omega . n
                                           + penalty_e(lambda_q) [u] )
  Dirichlet face e:  int_e t.n_out = int_e ( -lambda_q kappa grad u . n_out
                                             + penalty_b(lambda_q) u )

with the identical weights/penalty used in 3D assembly.  The face-moment
integrand functions of :class:`FluxReconstructor` are dimension-agnostic and
reused; only the geometry/bookkeeping (three face families X/Y/Z, six
boundary sides) is 3D.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces3d import BlockDGSpace3D
from .assembly import IPDGParams, DEFAULT_IPDG
from .fluxreco import FluxReconstructor


class FluxReconstructor3D(FluxReconstructor):
    """`apply(lam_fn, U)` -> [..., K, N_rt] local RT0 hex dofs."""

    nm = 1
    required_order = 1

    def __init__(self, space: BlockDGSpace3D, kappa_fn=None,
                 ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64):
        assert space.order == self.required_order
        self.space = space
        self.kappa_fn = kappa_fn
        self.ipdg = ipdg
        self.dtype = dtype
        g = space.grid
        self.Sx, self.Sy, self.Sz = g.global_nx, g.global_ny, g.global_nz
        self.rt_l2g = self._make_l2g(space)
        # global cell origins [Sz, Sy, Sx, 3]
        ll = np.asarray(g.lower_left)
        h = np.array([g.hx, g.hy, g.hz])
        gz, gy, gx = np.meshgrid(np.arange(self.Sz), np.arange(self.Sy),
                                 np.arange(self.Sx), indexing="ij")
        self.cell_org = ll + np.stack([gx, gy, gz], axis=-1) * h

    # ------------------------------------------------------------------
    def _u_block_to_cells(self, U):
        sp = self.space
        g = sp.grid
        lead = U.shape[:-2]
        U = U.reshape(lead + (g.kz, g.ky, g.kx, sp.s, sp.s, sp.s, sp.nb))
        U = jnp.moveaxis(U, -4, -6)
        U = jnp.moveaxis(U, -3, -4)
        return U.reshape(lead + (self.Sz, self.Sy, self.Sx, sp.nb))

    @property
    def scale(self) -> np.ndarray:
        g = self.space.grid
        return np.array([g.hx, g.hy, g.hz])
    # eval-point geometry: the base class's dimension-generic _phys_pts

    # ------------------------------------------------------------------
    def apply_global(self, lam_fn, U):
        """U [..., K, N] -> global RT dofs [..., N_rt_global]
        (flat concat of X [Sz*Sy*(Sx+1)], Y [Sz*(Sy+1)*Sx], Z [(Sz+1)*Sy*Sx])."""
        sp = self.space
        dt = self.dtype
        Sx, Sy, Sz = self.Sx, self.Sy, self.Sz
        uc = self._u_block_to_cells(U)             # [..., Sz, Sy, Sx, nb]
        out_dt = jnp.result_type(uc.dtype, dt)
        lead = uc.shape[:-4]
        org = self.cell_org                        # [Sz, Sy, Sx, 3]
        nb = sp.nb
        nm = self.nm                               # moments per face

        # (family, sliced minus cells, sliced plus cells, lo side, hi side,
        #  inner dof slice setter)
        parts = []

        # ---- X faces: dofX [Sz, Sy, Sx+1] ----
        dofX = jnp.zeros(lead + (Sz, Sy, Sx + 1, nm), out_dt)
        if Sx > 1:
            x_m, x_p = self._phys_pts(sp.face_tabs["X"],
                                      org[:, :, :-1].reshape(-1, 3))
            um = uc[..., :, :, :-1, :].reshape(lead + (Sz * Sy * (Sx - 1), nb))
            up = uc[..., :, :, 1:, :].reshape(lead + (Sz * Sy * (Sx - 1), nb))
            inner = self._face_moment_inner("X", lam_fn, um, up, x_m, x_p)
            dofX = dofX.at[..., :, :, 1:Sx, :].set(
                inner.reshape(lead + (Sz, Sy, Sx - 1, nm)))
        xL, _ = self._phys_pts(sp.face_tabs["bnd_left"],
                               org[:, :, 0].reshape(-1, 3))
        uL = uc[..., :, :, 0, :].reshape(lead + (Sz * Sy, nb))
        dofX = dofX.at[..., :, :, 0, :].set(
            self._face_moment_boundary("left", lam_fn, uL, xL)
            .reshape(lead + (Sz, Sy, nm)))
        xR, _ = self._phys_pts(sp.face_tabs["bnd_right"],
                               org[:, :, Sx - 1].reshape(-1, 3))
        uR = uc[..., :, :, Sx - 1, :].reshape(lead + (Sz * Sy, nb))
        dofX = dofX.at[..., :, :, Sx, :].set(
            self._face_moment_boundary("right", lam_fn, uR, xR)
            .reshape(lead + (Sz, Sy, nm)))
        parts.append(dofX.reshape(lead + (-1,)))

        # ---- Y faces: dofY [Sz, Sy+1, Sx] ----
        dofY = jnp.zeros(lead + (Sz, Sy + 1, Sx, nm), out_dt)
        if Sy > 1:
            x_m, x_p = self._phys_pts(sp.face_tabs["Y"],
                                      org[:, :-1, :].reshape(-1, 3))
            um = uc[..., :, :-1, :, :].reshape(lead + (Sz * (Sy - 1) * Sx, nb))
            up = uc[..., :, 1:, :, :].reshape(lead + (Sz * (Sy - 1) * Sx, nb))
            inner = self._face_moment_inner("Y", lam_fn, um, up, x_m, x_p)
            dofY = dofY.at[..., :, 1:Sy, :, :].set(
                inner.reshape(lead + (Sz, Sy - 1, Sx, nm)))
        xB, _ = self._phys_pts(sp.face_tabs["bnd_bottom"],
                               org[:, 0, :].reshape(-1, 3))
        uB = uc[..., :, 0, :, :].reshape(lead + (Sz * Sx, nb))
        dofY = dofY.at[..., :, 0, :, :].set(
            self._face_moment_boundary("bottom", lam_fn, uB, xB)
            .reshape(lead + (Sz, Sx, nm)))
        xT, _ = self._phys_pts(sp.face_tabs["bnd_top"],
                               org[:, Sy - 1, :].reshape(-1, 3))
        uT = uc[..., :, Sy - 1, :, :].reshape(lead + (Sz * Sx, nb))
        dofY = dofY.at[..., :, Sy, :, :].set(
            self._face_moment_boundary("top", lam_fn, uT, xT)
            .reshape(lead + (Sz, Sx, nm)))
        parts.append(dofY.reshape(lead + (-1,)))

        # ---- Z faces: dofZ [Sz+1, Sy, Sx] ----
        dofZ = jnp.zeros(lead + (Sz + 1, Sy, Sx, nm), out_dt)
        if Sz > 1:
            x_m, x_p = self._phys_pts(sp.face_tabs["Z"],
                                      org[:-1].reshape(-1, 3))
            um = uc[..., :-1, :, :, :].reshape(lead + ((Sz - 1) * Sy * Sx, nb))
            up = uc[..., 1:, :, :, :].reshape(lead + ((Sz - 1) * Sy * Sx, nb))
            inner = self._face_moment_inner("Z", lam_fn, um, up, x_m, x_p)
            dofZ = dofZ.at[..., 1:Sz, :, :, :].set(
                inner.reshape(lead + (Sz - 1, Sy, Sx, nm)))
        xN, _ = self._phys_pts(sp.face_tabs["bnd_near"],
                               org[0].reshape(-1, 3))
        uN = uc[..., 0, :, :, :].reshape(lead + (Sy * Sx, nb))
        dofZ = dofZ.at[..., 0, :, :, :].set(
            self._face_moment_boundary("near", lam_fn, uN, xN)
            .reshape(lead + (Sy, Sx, nm)))
        xF, _ = self._phys_pts(sp.face_tabs["bnd_far"],
                               org[Sz - 1].reshape(-1, 3))
        uF = uc[..., Sz - 1, :, :, :].reshape(lead + (Sy * Sx, nb))
        dofZ = dofZ.at[..., Sz, :, :, :].set(
            self._face_moment_boundary("far", lam_fn, uF, xF)
            .reshape(lead + (Sy, Sx, nm)))
        parts.append(dofZ.reshape(lead + (-1,)))

        parts += self._extra_parts(lam_fn, uc, out_dt)
        return jnp.concatenate(parts, axis=-1)
