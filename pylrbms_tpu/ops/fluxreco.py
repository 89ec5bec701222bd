"""RT0 diffusive flux reconstruction, batched over all faces.

TPU-native equivalent of dune-gdt's
``RS2017_apply_diffusive_flux_reconstruction_in_neighborhood`` and the
reference's ``FluxReconstructionOperator``
(``discretize_elliptic_block_swipdg.py:32,125-176``): per affine diffusion
component ``lambda_q`` (with the component's own SWIPDG-affine-factor weights,
matching the componentwise assembly), reconstruct t_q in RT0 from u_h via the
face moments (Ern/Vohralik-style, lowest order):

  inner face e:      int_e t.n  = int_e ( -{lambda_q kappa grad u}_omega . n
                                           + penalty_e(lambda_q) [u] )
  Dirichlet face e:  int_e t.n_out = int_e ( -lambda_q kappa grad u . n_out
                                             + penalty_b(lambda_q) u )

with the identical weights/penalty used in assembly (assembly.py docstring).
The reference computes this per source subdomain on oversampled neighborhoods
and restricts (``:164-174``); the global computation is identical since the
moments are face-local — we batch all faces of the mesh at once and restrict
to local subdomain RT spaces by a static index gather.

Outputs use the *family-normal* dof convention of spaces.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces import BlockDGSpace
from .assembly import IPDGParams, DEFAULT_IPDG, _EVAL_EPS


class FluxReconstructor:
    """Precomputes face geometry; `apply(lam_fn, U)` -> global RT dofs.

    The machinery is shared with the RT1 reconstruction for P2 spaces
    (:class:`pylrbms_tpu.ops.rt1` / :class:`FluxReconstructorRT1` below):
    every face-moment function carries a trailing moment axis of size
    ``nm`` (1 for RT0: the mean flux moment; 2 for RT1: + the linear
    moment against 2 tau - 1), and the flat global dof layout interleaves
    the ``nm`` moments per edge (edge e -> dofs nm*e .. nm*e+nm-1),
    followed by any interior dofs (``_extra_parts``)."""

    nm = 1          # moments per edge
    required_order = 1

    def __init__(self, space: BlockDGSpace, kappa_fn=None,
                 ipdg: IPDGParams = DEFAULT_IPDG, dtype=jnp.float64):
        assert space.order == self.required_order, \
            f"this flux reconstruction expects P{self.required_order} DG"
        self.space = space
        self.kappa_fn = kappa_fn
        self.ipdg = ipdg
        self.dtype = dtype
        g = space.grid
        self.Sy, self.Sx = g.global_ny, g.global_nx
        self.rt_l2g = self._make_l2g(space)
        # physical cell origins in global order [Sy, Sx, 2]
        self.cell_org = g.cell_origins()

    def _make_l2g(self, space):
        return jnp.asarray(space.rt_local_to_global())

    def _edge_moments(self, w, integrand, ell):
        """[..., F, nqf] integrand -> [..., F, nm] edge moments."""
        return (ell * jnp.einsum("q,...fq->...f", w, integrand))[..., None]

    def _extra_parts(self, lam_fn, uc, out_dt):
        """Non-edge (interior) dof blocks appended after the edge parts."""
        return []

    # ------------------------------------------------------------------
    def _u_block_to_cells(self, U):
        sp = self.space
        g = sp.grid
        lead = U.shape[:-2]
        U = U.reshape(lead + (g.ky, g.kx, sp.s, sp.s, sp.T, sp.nb))
        U = jnp.moveaxis(U, -4, -5)
        return U.reshape(lead + (self.Sy, self.Sx, sp.T, sp.nb))

    def _face_moment_inner(self, fam, lam_fn, u_m, u_p, x_m, x_p):
        """[..., F] face dofs for a batch of inner faces.

        u_m/u_p: [..., F, nb] dof values of minus/plus triangles;
        x_m/x_p: [..., F, nqf, 2] one-sided eval points."""
        sp = self.space
        tab = sp.face_tabs[fam]
        dt = self.dtype
        n = jnp.asarray(tab.normal, dt)
        w = jnp.asarray(tab.w, dt)
        ell = tab.length
        phi_m = jnp.asarray(tab.phi_m, dt)
        phi_p = jnp.asarray(tab.phi_p, dt)
        dphi_m = jnp.asarray(tab.dphi_m, dt)
        dphi_p = jnp.asarray(tab.dphi_p, dt)
        lam_m = lam_fn(x_m).astype(dt)
        lam_p = lam_fn(x_p).astype(dt)
        if self.kappa_fn is None:
            delta_m = jnp.ones_like(lam_m)
            delta_p = jnp.ones_like(lam_p)
            gun_m = jnp.einsum("...fj,qja,a->...fq", u_m, dphi_m, n)
            gun_p = jnp.einsum("...fj,qja,a->...fq", u_p, dphi_p, n)
        else:
            kap_m = self.kappa_fn(x_m).astype(dt)
            kap_p = self.kappa_fn(x_p).astype(dt)
            delta_m = jnp.einsum("...ab,a,b->...", kap_m, n, n)
            delta_p = jnp.einsum("...ab,a,b->...", kap_p, n, n)
            gun_m = jnp.einsum("...fj,...fqab,qjb,a->...fq", u_m, kap_m, dphi_m, n)
            gun_p = jnp.einsum("...fj,...fqab,qjb,a->...fq", u_p, kap_p, dphi_p, n)
        ssum = delta_m + delta_p
        nz = ssum != 0
        om_m = jnp.where(nz, delta_p / jnp.where(nz, ssum, 1.0), 0.5)
        om_p = jnp.where(nz, delta_m / jnp.where(nz, ssum, 1.0), 0.5)
        gamma = jnp.where(nz, delta_m * delta_p / jnp.where(nz, ssum, 1.0), 0.0)
        pen = (self.ipdg.sigma_inner(sp.order) * gamma
               * (om_m * lam_m + om_p * lam_p) / tab.pen_len ** self.ipdg.beta)
        uv_m = jnp.einsum("...fj,qj->...fq", u_m, phi_m)
        uv_p = jnp.einsum("...fj,qj->...fq", u_p, phi_p)
        integrand = (-(om_m * lam_m * gun_m + om_p * lam_p * gun_p)
                     + pen * (uv_m - uv_p))
        return self._edge_moments(w, integrand, ell)

    def _face_moment_boundary(self, side, lam_fn, u, x, key=None):
        """[..., F] boundary face dofs in the family-normal convention.
        ``key`` overrides the tab lookup (crisscross parity tabs)."""
        sp = self.space
        tab = sp.face_tabs[key or ("bnd_" + side)]
        dt = self.dtype
        n_out = jnp.asarray(tab.normal, dt)
        w = jnp.asarray(tab.w, dt)
        ell = tab.length
        phi = jnp.asarray(tab.phi_m, dt)
        dphi = jnp.asarray(tab.dphi_m, dt)
        lam = lam_fn(x).astype(dt)
        if self.kappa_fn is None:
            delta = jnp.ones_like(lam)
            gun = jnp.einsum("...fj,qja,a->...fq", u, dphi, n_out)
        else:
            kap = self.kappa_fn(x).astype(dt)
            delta = jnp.einsum("...ab,a,b->...", kap, n_out, n_out)
            gun = jnp.einsum("...fj,...fqab,qjb,a->...fq", u, kap, dphi, n_out)
        pen = (self.ipdg.sigma_boundary(sp.order) * delta * lam
               / tab.pen_len ** self.ipdg.beta)
        uv = jnp.einsum("...fj,qj->...fq", u, phi)
        t_dot_nout = self._edge_moments(w, -lam * gun + pen * uv, ell)
        # family normal: V=(1,0), H=(0,1) (3D: +x/+y/+z); sign +1 where
        # n_out == n_family
        sign = +1.0 if side in ("right", "top", "far") else -1.0
        return sign * t_dot_nout

    # ------------------------------------------------------------------
    def apply_global(self, lam_fn, U):
        """U [..., K, N] -> global RT dofs [..., N_rt_global]
        (flat concat of D [Sy*Sx], V [Sy*(Sx+1)], H [(Sy+1)*Sx])."""
        sp = self.space
        dt = self.dtype
        Sy, Sx = self.Sy, self.Sx
        uc = self._u_block_to_cells(U)             # [..., Sy, Sx, T, nb]
        # output dtype follows the input (certify mode passes a wider U than
        # the tabulation dtype; scattering wide into narrow is a JAX error)
        out_dt = jnp.result_type(uc.dtype, dt)
        lead = uc.shape[:-4]
        org = self.cell_org                         # [Sy, Sx, 2] numpy
        if sp.grid.grid_type == "crisscross":
            return self._apply_global_cc(lam_fn, uc, out_dt)
        phys = self._phys_pts

        # ---- D faces (tri grids): all cells, minus=A plus=B ----
        parts = []
        if "D" in sp.face_tabs:
            tab = sp.face_tabs["D"]
            x_m, x_p = phys(tab, org.reshape(-1, 2))
            dofD = self._face_moment_inner(
                "D", lam_fn,
                uc[..., tab.tri_m, :].reshape(lead + (Sy * Sx, sp.nb)),
                uc[..., tab.tri_p, :].reshape(lead + (Sy * Sx, sp.nb)),
                x_m, x_p)                                    # [..., Sy*Sx]
            parts.append(dofD.reshape(lead + (-1,)))

        # ---- V faces ----
        nm = self.nm
        tab = sp.face_tabs["V"]
        tVm, tVp = tab.tri_m, tab.tri_p
        dofV = jnp.zeros(lead + (Sy, Sx + 1, nm), out_dt)
        if Sx > 1:
            x_m, x_p = phys(tab, org[:, :-1].reshape(-1, 2))
            um = uc[..., :, :-1, tVm, :].reshape(lead + (Sy * (Sx - 1), sp.nb))
            up = uc[..., :, 1:, tVp, :].reshape(lead + (Sy * (Sx - 1), sp.nb))
            inner = self._face_moment_inner("V", lam_fn, um, up, x_m, x_p)
            dofV = dofV.at[..., :, 1:Sx, :].set(
                inner.reshape(lead + (Sy, Sx - 1, nm)))
        tabL = sp.face_tabs["bnd_left"]
        xL, _ = phys(tabL, org[:, 0].reshape(-1, 2))
        uL = uc[..., :, 0, tabL.tri_m, :].reshape(lead + (Sy, sp.nb))
        dofV = dofV.at[..., :, 0, :].set(self._face_moment_boundary("left", lam_fn, uL, xL))
        tabR = sp.face_tabs["bnd_right"]
        xR, _ = phys(tabR, org[:, Sx - 1].reshape(-1, 2))
        uR = uc[..., :, Sx - 1, tabR.tri_m, :].reshape(lead + (Sy, sp.nb))
        dofV = dofV.at[..., :, Sx, :].set(self._face_moment_boundary("right", lam_fn, uR, xR))
        parts.append(dofV.reshape(lead + (-1,)))

        # ---- H faces ----
        tab = sp.face_tabs["H"]
        tHm, tHp = tab.tri_m, tab.tri_p
        dofH = jnp.zeros(lead + (Sy + 1, Sx, nm), out_dt)
        if Sy > 1:
            x_m, x_p = phys(tab, org[:-1, :].reshape(-1, 2))
            um = uc[..., :-1, :, tHm, :].reshape(lead + ((Sy - 1) * Sx, sp.nb))
            up = uc[..., 1:, :, tHp, :].reshape(lead + ((Sy - 1) * Sx, sp.nb))
            inner = self._face_moment_inner("H", lam_fn, um, up, x_m, x_p)
            dofH = dofH.at[..., 1:Sy, :, :].set(
                inner.reshape(lead + (Sy - 1, Sx, nm)))
        tabB = sp.face_tabs["bnd_bottom"]
        xB, _ = phys(tabB, org[0, :].reshape(-1, 2))
        uB = uc[..., 0, :, tabB.tri_m, :].reshape(lead + (Sx, sp.nb))
        dofH = dofH.at[..., 0, :, :].set(self._face_moment_boundary("bottom", lam_fn, uB, xB))
        tabT = sp.face_tabs["bnd_top"]
        xT, _ = phys(tabT, org[Sy - 1, :].reshape(-1, 2))
        uT = uc[..., Sy - 1, :, tabT.tri_m, :].reshape(lead + (Sx, sp.nb))
        dofH = dofH.at[..., Sy, :, :].set(self._face_moment_boundary("top", lam_fn, uT, xT))
        parts.append(dofH.reshape(lead + (-1,)))

        parts += self._extra_parts(lam_fn, uc, out_dt)
        return jnp.concatenate(parts, axis=-1)

    @property
    def scale(self) -> np.ndarray:
        """Per-axis cell extents (2D here; the 3D subclass overrides)."""
        return np.array([self.space.hx, self.space.hy])

    def _phys_pts(self, tab, orgs):
        """orgs [F, dim] -> one-sided eval points [F, nqf, dim].

        Dimension-generic: an axis-aligned (one-hot) family normal means the
        plus element lives one cell over along that axis; any other normal
        (the in-cell diagonal families) keeps the plus element in the same
        cell (shift 0)."""
        dt = self.dtype
        scale = self.scale
        orgs_j = jnp.asarray(orgs, dt)[:, None, :]
        x = orgs_j + jnp.asarray(tab.pts_unit_m * scale, dt)[None]
        cen_m = orgs_j + jnp.asarray(tab.centroid_m * scale, dt)[None]
        x_m = x + _EVAL_EPS * (cen_m - x)
        if tab.centroid_p is None:
            return x_m, None
        n = np.asarray(tab.normal)
        if np.count_nonzero(np.abs(n) > 1e-12) == 1:
            shift = np.abs(n) * scale
        else:
            shift = np.zeros_like(scale)
        cen_p = orgs_j + jnp.asarray(shift + tab.centroid_p * scale, dt)[None]
        x_p = x + _EVAL_EPS * (cen_p - x)
        return x_m, x_p

    def _apply_global_cc(self, lam_fn, uc, out_dt):
        """Crisscross face moments: same integrands, face families split by
        the minus cell's parity (basis.py CC_EDGES_UNIT).  The D dofs of odd
        cells use the D1 family normal (hy, hx)/|d| (anti-diagonal)."""
        sp = self.space
        nm = self.nm
        Sy, Sx = self.Sy, self.Sx
        lead = uc.shape[:-4]
        org = self.cell_org
        gy, gx = np.meshgrid(np.arange(Sy), np.arange(Sx), indexing="ij")
        P = (gy + gx) % 2

        def u_at(cy, cx, t):
            return uc[..., cy, cx, t, :]                      # [..., F, nb]

        dofD = jnp.zeros(lead + (Sy * Sx, nm), out_dt)
        for p in (0, 1):
            cy, cx = np.nonzero(P == p)
            tab = sp.face_tabs[f"D{p}"]
            x_m, x_p = self._phys_pts(tab, org[cy, cx])
            mom = self._face_moment_inner(f"D{p}", lam_fn,
                                          u_at(cy, cx, tab.tri_m),
                                          u_at(cy, cx, tab.tri_p), x_m, x_p)
            dofD = dofD.at[..., cy * Sx + cx, :].set(mom)
        parts = [dofD.reshape(lead + (-1,))]

        dofV = jnp.zeros(lead + (Sy, Sx + 1, nm), out_dt)
        for p in (0, 1):
            cy, cx = np.nonzero((P == p) & (gx < Sx - 1))
            if cy.size:
                tab = sp.face_tabs[f"V{p}"]
                x_m, x_p = self._phys_pts(tab, org[cy, cx])
                mom = self._face_moment_inner(f"V{p}", lam_fn,
                                              u_at(cy, cx, tab.tri_m),
                                              u_at(cy, cx + 1, tab.tri_p),
                                              x_m, x_p)
                dofV = dofV.at[..., cy, cx + 1, :].set(mom)
        for side, cxv, vxv in (("left", 0, 0), ("right", Sx - 1, Sx)):
            cy_all = np.arange(Sy)
            for p in (0, 1):
                cys = cy_all[(cy_all + cxv) % 2 == p]
                key = f"bnd_{side}_p{p}"
                tab = sp.face_tabs[key]
                x, _ = self._phys_pts(tab, org[cys, cxv])
                mom = self._face_moment_boundary(
                    side, lam_fn, u_at(cys, np.full_like(cys, cxv), tab.tri_m),
                    x, key=key)
                dofV = dofV.at[..., cys, vxv, :].set(mom)
        parts.append(dofV.reshape(lead + (-1,)))

        dofH = jnp.zeros(lead + (Sy + 1, Sx, nm), out_dt)
        for p in (0, 1):
            cy, cx = np.nonzero((P == p) & (gy < Sy - 1))
            if cy.size:
                tab = sp.face_tabs[f"H{p}"]
                x_m, x_p = self._phys_pts(tab, org[cy, cx])
                mom = self._face_moment_inner(f"H{p}", lam_fn,
                                              u_at(cy, cx, tab.tri_m),
                                              u_at(cy + 1, cx, tab.tri_p),
                                              x_m, x_p)
                dofH = dofH.at[..., cy + 1, cx, :].set(mom)
        for side, cyv, hyv in (("bottom", 0, 0), ("top", Sy - 1, Sy)):
            cx_all = np.arange(Sx)
            for p in (0, 1):
                cxs = cx_all[(cyv + cx_all) % 2 == p]
                key = f"bnd_{side}_p{p}"
                tab = sp.face_tabs[key]
                x, _ = self._phys_pts(tab, org[np.full_like(cxs, cyv), cxs])
                mom = self._face_moment_boundary(
                    side, lam_fn, u_at(np.full_like(cxs, cyv), cxs, tab.tri_m),
                    x, key=key)
                dofH = dofH.at[..., hyv, cxs, :].set(mom)
        parts.append(dofH.reshape(lead + (-1,)))
        parts += self._extra_parts(lam_fn, uc, out_dt)
        return jnp.concatenate(parts, axis=-1)

    def restrict(self, t_global):
        """[..., N_rt_global] -> [..., K, N_rt] local RT vectors
        (<-> ``subdomain_rt_spaces[ii].restrict``, ``:171-173``)."""
        return t_global[..., self.rt_l2g]

    def apply(self, lam_fn, U):
        """U [..., K, N] -> [..., K, N_rt] (global reconstruction, restricted)."""
        return self.restrict(self.apply_global(lam_fn, U))
