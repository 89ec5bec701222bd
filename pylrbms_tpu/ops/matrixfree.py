"""Matrix-free (stencil) SWIPDG operator: elementwise blocks, fused apply.

The dense per-subdomain blocks ``A_diag [K, N, N]`` stream O(K N^2) bytes per
matvec — fine for the reference-scale configs, but the HBM-bandwidth wall at
SPE10 scale (SURVEY.md §7 hard part 6).  The SWIPDG operator is local: its
action is fully described by per-cell volume blocks and per-face block
quadruples, O(K s^2 nb^2) bytes — at s=16 this is ~75x less traffic than the
dense blocks, with the apply a handful of fused batched einsums + shifts
(no gathers: the mesh is structured).

Layout (x as [K, s, s, T, nb]):
  vol   [K, s, s, T, nb, nb]         y[c,t]   += V x[c,t]
  D     4 x [K, s, s, nb, nb]        A<->B within each cell
  Vint  4 x [K, s, s-1, nb, nb]      cell (cy,cx,A) <-> (cy,cx+1,B)
  Hint  4 x [K, s-1, s, nb, nb]      cell (cy,cx,B) <-> (cy+1,cx,A)
  interface quadruples + Dirichlet side blocks reuse SwipdgComponent's strips.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.precision import hp

from .spaces import BlockDGSpace
from . import assembly as asm
from .assembly import IPDGParams, DEFAULT_IPDG
from .swipdg import _interior_face_sets


@dataclass(eq=False)
class SwipdgStencil:
    """One affine component in stencil form."""
    vol: jnp.ndarray                      # [K, s, s, T, nb, nb]
    D: Tuple[jnp.ndarray, ...]            # 4 x [K, s, s, nb, nb]
    V: Tuple[jnp.ndarray, ...]            # 4 x [K, s, s-1, nb, nb]
    H: Tuple[jnp.ndarray, ...]            # 4 x [K, s-1, s, nb, nb]
    # subdomain interfaces / boundary (shared layout with SwipdgComponent)
    R: Tuple[jnp.ndarray, ...]            # 4 x [E_R, s, nb, nb]
    U: Tuple[jnp.ndarray, ...]            # 4 x [E_U, s, nb, nb]
    D_side: Dict[str, jnp.ndarray]        # side -> [K, s, nb, nb]


@hp
def assemble_swipdg_stencil(space: BlockDGSpace, lam_fn, kappa_fn=None,
                            ipdg: IPDGParams = DEFAULT_IPDG,
                            dtype=jnp.float64) -> SwipdgStencil:
    if space.percell:            # 'crisscross': parity-split face families
        return _assemble_swipdg_stencil_cc(space, lam_fn, kappa_fn, ipdg, dtype)
    s, nb, K, T = space.s, space.nb, space.K, space.T
    origins = space.subdomain_origins

    # volume blocks (same integrand as assembly.volume_elliptic, pre-scatter)
    xq = jnp.asarray(asm._vol_points(space), dtype)
    lam = lam_fn(xq).astype(dtype)
    dphi = jnp.asarray(space.vol_dphi, dtype)
    w = jnp.asarray(space.vol_w, dtype)
    area = space.hx * space.hy
    if kappa_fn is None:
        vol = area * jnp.einsum("tq,kyxtq,tqia,tqja->kyxtij", w, lam, dphi, dphi)
    else:
        kap = kappa_fn(xq).astype(dtype)
        vol = area * jnp.einsum("tq,kyxtq,tqia,kyxtqab,tqjb->kyxtij",
                                w, lam, dphi, kap, dphi)

    def faces(fam, cy_m, cx_m, shape):
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm._face_phys_points(space, tab, cy_m, cx_m, origins)
        blocks = asm.inner_face_blocks(space, tab, lam_fn, kappa_fn,
                                       x_m, x_p, space.order, ipdg, dtype)
        return tuple(b.reshape((K,) + shape + (nb, nb)) for b in blocks)

    sets = _interior_face_sets(space)
    Dq = (faces("D", sets["D"][0], sets["D"][1], (s, s)) if "D" in sets
          else tuple(jnp.zeros((K, s, s, 0, 0), dtype) for _ in range(4)))
    Vq = faces("V", sets["V"][0], sets["V"][1], (s, s - 1)) if s > 1 else \
        tuple(jnp.zeros((K, s, 0, nb, nb), dtype) for _ in range(4))
    Hq = faces("H", sets["H"][0], sets["H"][1], (s - 1, s)) if s > 1 else \
        tuple(jnp.zeros((K, 0, s, nb, nb), dtype) for _ in range(4))

    # interface / boundary strips (same integrands, assembled directly)
    grid = space.grid
    org = origins.reshape(grid.ky, grid.kx, 2)
    r = np.arange(s)

    def interface(fam, left_org, cy_m, cx_m):
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm._face_phys_points(space, tab, cy_m, cx_m, left_org)
        return asm.inner_face_blocks(space, tab, lam_fn, kappa_fn, x_m, x_p,
                                     space.order, ipdg, dtype)

    if grid.kx > 1:
        Rq = interface("V", org[:, :-1].reshape(-1, 2), r, np.full(s, s - 1))
    else:
        Rq = tuple(jnp.zeros((0, s, nb, nb), dtype) for _ in range(4))
    if grid.ky > 1:
        Uq = interface("H", org[:-1, :].reshape(-1, 2), np.full(s, s - 1), r)
    else:
        Uq = tuple(jnp.zeros((0, s, nb, nb), dtype) for _ in range(4))

    D_side = {}
    for side in ("left", "right", "bottom", "top"):
        tab = space.face_tabs["bnd_" + side]
        cy, cx, _t = space.side_cells(side)
        _, x_m, _ = asm._face_phys_points(space, tab, cy, cx, origins)
        D_side[side] = asm.boundary_face_blocks(space, tab, lam_fn, kappa_fn,
                                                x_m, space.order, ipdg, dtype)
    return SwipdgStencil(vol=vol, D=Dq, V=Vq, H=Hq, R=Rq, U=Uq, D_side=D_side)


def _assemble_swipdg_stencil_cc(space: BlockDGSpace, lam_fn, kappa_fn,
                                ipdg: IPDGParams, dtype) -> SwipdgStencil:
    """Crisscross variant: the same stencil layout, with each face-family
    grid position filled from its parity family (D0/D1, V0/V1, H0/H1 and the
    per-parity boundary tabs).  Which t-plane a block couples is resolved at
    APPLY time from the static cell-parity checkerboard (see
    :meth:`AssembledStencil.apply`); the storage layout is parity-agnostic."""
    s, nb, K = space.s, space.nb, space.K
    origins = space.subdomain_origins

    xq = jnp.asarray(asm._vol_points(space), dtype)
    lam = lam_fn(xq).astype(dtype)
    dphi = jnp.asarray(space.vol_dphi, dtype)        # [s,s,T,nq,nb,2]
    w = jnp.asarray(space.vol_w, dtype)              # [s,s,T,nq]
    area = space.hx * space.hy
    if kappa_fn is None:
        vol = area * jnp.einsum("yxtq,kyxtq,yxtqia,yxtqja->kyxtij",
                                w, lam, dphi, dphi)
    else:
        kap = kappa_fn(xq).astype(dtype)
        vol = area * jnp.einsum("yxtq,kyxtq,yxtqia,kyxtqab,yxtqjb->kyxtij",
                                w, lam, dphi, kap, dphi)

    sets = _interior_face_sets(space)

    def fam_blocks(fam, cy_m, cx_m, origs):
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm._face_phys_points(space, tab, cy_m, cx_m, origs)
        return asm.inner_face_blocks(space, tab, lam_fn, kappa_fn, x_m, x_p,
                                     space.order, ipdg, dtype)

    def interleave(shape, fams):
        outs = [jnp.zeros((K,) + shape + (nb, nb), dtype) for _ in range(4)]
        for fam, cy, cx in fams:
            if len(cy) == 0:
                continue
            blocks = fam_blocks(fam, cy, cx, origins)
            outs = [o.at[:, cy, cx].set(b) for o, b in zip(outs, blocks)]
        return tuple(outs)

    Dq = interleave((s, s), [("D0",) + sets["D0"][:2], ("D1",) + sets["D1"][:2]])
    Vq = (interleave((s, s - 1), [("V0",) + sets["V0"][:2],
                                  ("V1",) + sets["V1"][:2]]) if s > 1 else
          tuple(jnp.zeros((K, s, 0, nb, nb), dtype) for _ in range(4)))
    Hq = (interleave((s - 1, s), [("H0",) + sets["H0"][:2],
                                  ("H1",) + sets["H1"][:2]]) if s > 1 else
          tuple(jnp.zeros((K, 0, s, nb, nb), dtype) for _ in range(4)))

    grid = space.grid
    org = origins.reshape(grid.ky, grid.kx, 2)

    def iface(orient, left_org, E):
        outs = [jnp.zeros((E, s, nb, nb), dtype) for _ in range(4)]
        for fam, cy_m, cx_m, pos in space.interface_face_groups(orient):
            blocks = fam_blocks(fam, cy_m, cx_m, left_org)
            outs = [o.at[:, pos].set(b) for o, b in zip(outs, blocks)]
        return tuple(outs)

    Rq = (iface("V", org[:, :-1].reshape(-1, 2), grid.ky * (grid.kx - 1))
          if grid.kx > 1 else
          tuple(jnp.zeros((0, s, nb, nb), dtype) for _ in range(4)))
    Uq = (iface("H", org[:-1, :].reshape(-1, 2), (grid.ky - 1) * grid.kx)
          if grid.ky > 1 else
          tuple(jnp.zeros((0, s, nb, nb), dtype) for _ in range(4)))

    D_side = {}
    for side in ("left", "right", "bottom", "top"):
        acc = jnp.zeros((K, s, nb, nb), dtype)
        for tab_key, cy, cx, _t, pos in space.boundary_face_groups(side):
            tab = space.face_tabs[tab_key]
            _, x_m, _ = asm._face_phys_points(space, tab, cy, cx, origins)
            b = asm.boundary_face_blocks(space, tab, lam_fn, kappa_fn, x_m,
                                         space.order, ipdg, dtype)
            acc = acc.at[:, pos].set(b)
        D_side[side] = acc
    return SwipdgStencil(vol=vol, D=Dq, V=Vq, H=Hq, R=Rq, U=Uq, D_side=D_side)


@hp
def mass_stencil(space: BlockDGSpace, like: SwipdgStencil) -> SwipdgStencil:
    """The L2 mass in stencil form: volume blocks only, zero face families
    — shapes matched to ``like`` so it can join an affine StencilOperator
    family.  Makes the implicit-Euler operator G = M + dt*A ONE extra
    affine component, so the parabolic solve reuses the whole matrix-free
    machinery (<-> the reference's per-step ISTL solves on M + dt*A,
    ``discretize_parabolic_block_swipdg.py:15-40``)."""
    dtype = like.vol.dtype
    phi = jnp.asarray(space.vol_phi, dtype)
    w = jnp.asarray(space.vol_w, dtype)
    area = space.hx * space.hy
    if space.percell:
        elem = area * jnp.einsum("yxtq,yxtqi,yxtqj->yxtij", w, phi, phi)
        vol = jnp.broadcast_to(elem[None], like.vol.shape)
    else:
        elem = area * jnp.einsum("tq,tqi,tqj->tij", w, phi, phi)
        vol = jnp.broadcast_to(elem[None, None, None], like.vol.shape)
    z = jax.tree.map(jnp.zeros_like, like)
    return SwipdgStencil(vol=vol, D=z.D, V=z.V, H=z.H, R=z.R, U=z.U,
                         D_side=z.D_side)


@dataclass(eq=False)
class StencilOperator:
    """Affine family of stencils with a fused matrix-free apply."""
    space: BlockDGSpace
    stencils: Tuple[SwipdgStencil, ...]

    def assemble(self, theta) -> "AssembledStencil":
        theta = jnp.asarray(theta)

        def mix(getter):
            parts = [getter(st) for st in self.stencils]
            return sum(t * p for t, p in zip(theta, parts))

        st0 = self.stencils[0]
        return AssembledStencil(
            space=self.space,
            vol=mix(lambda s: s.vol),
            D=tuple(mix(lambda s, i=i: s.D[i]) for i in range(4)),
            V=tuple(mix(lambda s, i=i: s.V[i]) for i in range(4)),
            H=tuple(mix(lambda s, i=i: s.H[i]) for i in range(4)),
            R=tuple(mix(lambda s, i=i: s.R[i]) for i in range(4)),
            U=tuple(mix(lambda s, i=i: s.U[i]) for i in range(4)),
            D_side={k: mix(lambda s, k=k: s.D_side[k]) for k in st0.D_side},
        )


@dataclass(eq=False)
class AssembledStencil:
    space: BlockDGSpace
    vol: jnp.ndarray
    D: tuple
    V: tuple
    H: tuple
    R: tuple
    U: tuple
    D_side: dict

    # ------------------------------------------------------------------
    @hp
    def cell_jacobi_factors(self) -> jnp.ndarray:
        """Per-quad-cell 2nb x 2nb block inverses (vol + in-cell D face):
        the matrix-free preconditioner — O(K s^2 nb^2) memory, no dense
        subdomain blocks.  Weaker than subdomain-block Jacobi (iterations
        grow ~ with s) but the only preconditioner whose memory matches the
        stencil representation at SPE10 scale."""
        sp = self.space
        s, nb = sp.s, sp.nb
        if sp.T == 1:
            # quad grid: one element per cell, no in-cell D face
            dQ = self.vol[..., 0, :, :]
            if s > 1:
                Vmm, _, _, Vpp = self.V
                Hmm, _, _, Hpp = self.H
                dQ = dQ.at[:, :, :-1].add(Vmm)
                dQ = dQ.at[:, :, 1:].add(Vpp)
                dQ = dQ.at[:, :-1, :].add(Hmm)
                dQ = dQ.at[:, 1:, :].add(Hpp)
            dQ = dQ.at[:, :, 0].add(self.D_side["left"])
            dQ = dQ.at[:, :, s - 1].add(self.D_side["right"])
            dQ = dQ.at[:, 0, :].add(self.D_side["bottom"])
            dQ = dQ.at[:, s - 1, :].add(self.D_side["top"])
            cell = dQ                                      # [K, s, s, nb, nb]
        else:
            Dmm, Dmp, Dpm, Dpp = self.D
            # each triangle's OWN (mm/pp) contributions from all its faces must
            # be included, otherwise the cell block is singular (constants see
            # no penalty energy)
            dA = self.vol[..., 0, :, :] + Dmm
            dB = self.vol[..., 1, :, :] + Dpp
            cdt = dA.dtype
            if s > 1:
                Vmm, _, _, Vpp = self.V
                Hmm, _, _, Hpp = self.H
                if sp.percell:
                    # V faces live on t = parity of the minus cell (see apply)
                    parv = sp.cell_parity[:, :-1]
                    v0 = jnp.asarray((parv == 0)[..., None, None]).astype(cdt)
                    v1 = jnp.asarray((parv == 1)[..., None, None]).astype(cdt)
                    dA = dA.at[:, :, :-1].add(v0 * Vmm)
                    dB = dB.at[:, :, :-1].add(v1 * Vmm)
                    dA = dA.at[:, :, 1:].add(v0 * Vpp)
                    dB = dB.at[:, :, 1:].add(v1 * Vpp)
                else:
                    dA = dA.at[:, :, :-1].add(Vmm)   # A minus side of V at (cy, cx)
                    dB = dB.at[:, :, 1:].add(Vpp)    # B plus side of V at (cy, cx-1)
                # H faces couple t1 (below) to t0 (above) for all families
                dB = dB.at[:, :-1, :].add(Hmm)     # t1 minus side of H at (cy, cx)
                dA = dA.at[:, 1:, :].add(Hpp)      # t0 plus side of H below
            # subdomain-side penalty (one-sided Dirichlet blocks; on interfaces
            # the in_in strips differ slightly — fine for a preconditioner)
            if sp.percell:
                # left/right boundary-layer element alternates (side_cells)
                pl = np.arange(s) % 2
                l1 = jnp.asarray((pl == 0)[:, None, None]).astype(cdt)
                l0 = jnp.asarray((pl == 1)[:, None, None]).astype(cdt)
                dB = dB.at[:, :, 0].add(l1 * self.D_side["left"])
                dA = dA.at[:, :, 0].add(l0 * self.D_side["left"])
                prr = (np.arange(s) + s - 1) % 2
                g0 = jnp.asarray((prr == 0)[:, None, None]).astype(cdt)
                g1 = jnp.asarray((prr == 1)[:, None, None]).astype(cdt)
                dA = dA.at[:, :, s - 1].add(g0 * self.D_side["right"])
                dB = dB.at[:, :, s - 1].add(g1 * self.D_side["right"])
            else:
                dB = dB.at[:, :, 0].add(self.D_side["left"])
                dA = dA.at[:, :, s - 1].add(self.D_side["right"])
            dA = dA.at[:, 0, :].add(self.D_side["bottom"])
            dB = dB.at[:, s - 1, :].add(self.D_side["top"])
            top = jnp.concatenate([dA, Dmp], axis=-1)
            bot = jnp.concatenate([Dpm, dB], axis=-1)
            cell = jnp.concatenate([top, bot], axis=-2)    # [K, s, s, 2nb, 2nb]
        # symmetric Jacobi scaling + f32 inversion gate (f64 LU is
        # unavailable on TPU; see la/block.block_jacobi_factors)
        dvec = jnp.abs(jnp.diagonal(cell, axis1=-2, axis2=-1))
        sca = 1.0 / jnp.sqrt(jnp.maximum(dvec, 1e-300))
        cs = cell * sca[..., :, None] * sca[..., None, :]
        inv_dtype = cs.dtype
        if cs.dtype == jnp.float64 and jax.default_backend() != "cpu":
            inv_dtype = jnp.float32
        inv_s = jnp.linalg.inv(cs.astype(inv_dtype)).astype(cs.dtype)
        return inv_s * sca[..., :, None] * sca[..., None, :]

    @hp
    def solve_pcg(self, b: jnp.ndarray, tol: float = 1e-10, maxiter: int = 3000,
                  factors=None, block_factors=None,
                  coarse_inv=None, coarse_basis=None,
                  return_iters: bool = False,
                  coarse_f32: bool = False, x0=None) -> jnp.ndarray:
        """Matrix-free PCG.

        Preconditioner: cell-block Jacobi by default; pass ``block_factors``
        (the dense subdomain-block inverses [K, N, N], e.g. from
        ``AssembledBlockOp.block_jacobi_factors()``) to get the
        contrast-robust subdomain-level preconditioner — it is applied in
        float32 (preconditioner precision only affects iteration counts), so
        a f64-emulated Krylov iteration stays matvec-cheap.

        ``coarse_inv`` ([K, K], e.g. inverse of
        ``AssembledBlockOp.coarse_matrix()``) adds the subdomain-constant
        coarse level additively — the global-information channel block
        methods lack; cuts iteration counts at large K / high contrast."""
        sp = self.space
        K, s, nb = sp.K, sp.s, sp.nb
        if block_factors is not None:
            # bfloat16-stored factors stream half the HBM bytes per CG
            # iteration (the measured online-step bound); f32 MXU accumulate
            Binv = (block_factors if block_factors.dtype == jnp.bfloat16
                    else block_factors.astype(jnp.float32))

            def M(r):
                z32 = jnp.einsum("knm,km->kn", Binv, r.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                return z32.astype(r.dtype)
        else:
            Minv = factors if factors is not None else self.cell_jacobi_factors()
            cb = sp.T * nb            # cell block size (2nb tri / nb quad)

            def M(r):
                rc = r.reshape(K, s, s, cb)
                z = jnp.einsum("kyxij,kyxj->kyxi", Minv, rc)
                return z.reshape(r.shape)

        if coarse_inv is not None:
            M_fine = M
            # f32 coarse apply only when the Krylov space itself is f32; at
            # SPE10-scale contrast an f32 coarse solve has no correct digits
            # and breaks CG (measured — la/block.py prepare_coarse)
            cdt = (jnp.float32 if (b.dtype == jnp.float32 or coarse_f32)
                   else b.dtype)
            C32 = coarse_inv.astype(cdt)
            if coarse_basis is not None:
                Cb = coarse_basis.astype(cdt)
                Kc, _, mc = Cb.shape

                def M(r):
                    rc = jnp.einsum("knm,kn->km", Cb,
                                    r.astype(cdt)).reshape(-1)
                    xc = (C32 @ rc).reshape(Kc, mc)
                    return (M_fine(r)
                            + jnp.einsum("knm,km->kn", Cb, xc).astype(r.dtype))
            else:
                def M(r):
                    rc = jnp.sum(r, axis=1).astype(cdt)             # [K]
                    xc = (C32 @ rc).astype(r.dtype)
                    return M_fine(r) + xc[:, None]

        # chunked control flow (la/krylov.py): the while-loop control round
        # is the measured per-iteration bound at mid scale on the chip
        from ..la.krylov import pcg_chunked
        x, it = pcg_chunked(self.apply, M, b, tol, maxiter, x0=x0)
        return (x, it) if return_iters else x

    @hp
    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [..., K, N] -> A x, matrix-free."""
        sp = self.space
        grid = sp.grid
        K, s, T, nb = sp.K, sp.s, sp.T, sp.nb
        lead = x.shape[:-2]
        xc = x.reshape(lead + (K, s, s, T, nb))
        e = "kyxij,...kyxj->...kyxi"
        ev = e
        if T == 1:
            # quad grid: one element per cell, V/H faces couple like elements
            xQ = xc[..., 0, :]                       # [..., K, s, s, nb]
            y = jnp.einsum(e, self.vol[:, :, :, 0], xQ)
            if s > 1:
                Vmm, Vmp, Vpm, Vpp = self.V
                xm, xp = xQ[..., :, :-1, :], xQ[..., :, 1:, :]
                y = y.at[..., :, :-1, :].add(
                    jnp.einsum(ev, Vmm, xm) + jnp.einsum(ev, Vmp, xp))
                y = y.at[..., :, 1:, :].add(
                    jnp.einsum(ev, Vpm, xm) + jnp.einsum(ev, Vpp, xp))
                Hmm, Hmp, Hpm, Hpp = self.H
                xm, xp = xQ[..., :-1, :, :], xQ[..., 1:, :, :]
                y = y.at[..., :-1, :, :].add(
                    jnp.einsum(ev, Hmm, xm) + jnp.einsum(ev, Hmp, xp))
                y = y.at[..., 1:, :, :].add(
                    jnp.einsum(ev, Hpm, xm) + jnp.einsum(ev, Hpp, xp))
            y = y[..., None, :]                      # [..., K, s, s, 1, nb]
        else:
            xA, xB = xc[..., 0, :], xc[..., 1, :]    # [..., K, s, s, nb]
            yA = jnp.einsum(e, self.vol[:, :, :, 0], xA)
            yB = jnp.einsum(e, self.vol[:, :, :, 1], xB)

            # D faces (within cell, minus=A plus=B)
            Dmm, Dmp, Dpm, Dpp = self.D
            yA = yA + jnp.einsum(e, Dmm, xA) + jnp.einsum(e, Dmp, xB)
            yB = yB + jnp.einsum(e, Dpm, xA) + jnp.einsum(e, Dpp, xB)

            # V interior faces.  tri: minus (cy,cx,A=t0), plus (cy,cx+1,B=t1).
            # crisscross: both sides live on the SAME t-plane, t = parity of
            # the minus cell (V0: A<->C both t0; V1: E<->B both t1) — select
            # and scatter via the static checkerboard mask.
            if s > 1:
                Vmm, Vmp, Vpm, Vpp = self.V
                if sp.percell:
                    parv = sp.cell_parity[:, :-1]          # [s, s-1]
                    m0 = jnp.asarray((parv == 0)[..., None]).astype(x.dtype)
                    m1 = jnp.asarray((parv == 1)[..., None]).astype(x.dtype)
                    xm_sel = m0 * xA[..., :, :-1, :] + m1 * xB[..., :, :-1, :]
                    xp_sel = m0 * xA[..., :, 1:, :] + m1 * xB[..., :, 1:, :]
                    ym = jnp.einsum(ev, Vmm, xm_sel) + jnp.einsum(ev, Vmp, xp_sel)
                    yp = jnp.einsum(ev, Vpm, xm_sel) + jnp.einsum(ev, Vpp, xp_sel)
                    yA = yA.at[..., :, :-1, :].add(m0 * ym)
                    yB = yB.at[..., :, :-1, :].add(m1 * ym)
                    yA = yA.at[..., :, 1:, :].add(m0 * yp)
                    yB = yB.at[..., :, 1:, :].add(m1 * yp)
                else:
                    yA = yA.at[..., :, :-1, :].add(
                        jnp.einsum(ev, Vmm, xA[..., :, :-1, :])
                        + jnp.einsum(ev, Vmp, xB[..., :, 1:, :]))
                    yB = yB.at[..., :, 1:, :].add(
                        jnp.einsum(ev, Vpm, xA[..., :, :-1, :])
                        + jnp.einsum(ev, Vpp, xB[..., :, 1:, :]))
                # H interior: minus (cy,cx,t1), plus (cy+1,cx,t0) — the lower
                # element of any crisscross cell owns the bottom edge and the
                # upper one the top edge, so this holds for BOTH parities
                # (H0: B->C, H1: E->A) and the tri code path is shared.
                Hmm, Hmp, Hpm, Hpp = self.H
                yB = yB.at[..., :-1, :, :].add(
                    jnp.einsum(ev, Hmm, xB[..., :-1, :, :])
                    + jnp.einsum(ev, Hmp, xA[..., 1:, :, :]))
                yA = yA.at[..., 1:, :, :].add(
                    jnp.einsum(ev, Hpm, xB[..., :-1, :, :])
                    + jnp.einsum(ev, Hpp, xA[..., 1:, :, :]))

            y = jnp.stack([yA, yB], axis=-2)         # [..., K, s, s, T, nb]

        # ---- subdomain interfaces (reshape K -> [ky, kx]) ----
        # boundary-layer element per side (tri: A/B; quad: the single
        # element; crisscross: alternates on left/right — handled by masks)
        cc = sp.percell
        tL = int(sp.side_cells("left")[2][0])
        tR = int(sp.side_cells("right")[2][0])
        tB = int(sp.side_cells("bottom")[2][0])
        tT = int(sp.side_cells("top")[2][0])
        kx, ky = grid.kx, grid.ky
        yg = y.reshape(lead + (ky, kx, s, s, T, nb))
        xg = xc.reshape(lead + (ky, kx, s, s, T, nb))
        if kx > 1:
            Rii, Rio, Roi, Roo = (b.reshape((ky, kx - 1, s, nb, nb)) for b in self.R)
            em = "YXfij,...YXfj->...YXfi"
            if cc:
                # face parity p = parity of the minus cell (cy, s-1); both
                # sides couple on t = p (V0: A<->C t0, V1: E<->B t1)
                pr = (np.arange(s) + s - 1) % 2
                r0 = jnp.asarray((pr == 0)[:, None]).astype(x.dtype)
                r1 = jnp.asarray((pr == 1)[:, None]).astype(x.dtype)
                xm = (r0 * xg[..., :, :-1, :, s - 1, 0, :]
                      + r1 * xg[..., :, :-1, :, s - 1, 1, :])
                xp = (r0 * xg[..., :, 1:, :, 0, 0, :]
                      + r1 * xg[..., :, 1:, :, 0, 1, :])
                ym = jnp.einsum(em, Rii, xm) + jnp.einsum(em, Rio, xp)
                yp = jnp.einsum(em, Roi, xm) + jnp.einsum(em, Roo, xp)
                yg = yg.at[..., :, :-1, :, s - 1, 0, :].add(r0 * ym)
                yg = yg.at[..., :, :-1, :, s - 1, 1, :].add(r1 * ym)
                yg = yg.at[..., :, 1:, :, 0, 0, :].add(r0 * yp)
                yg = yg.at[..., :, 1:, :, 0, 1, :].add(r1 * yp)
            else:
                xm = xg[..., :, :-1, :, s - 1, tR, :]  # [..., ky, kx-1, s(cy), nb]
                xp = xg[..., :, 1:, :, 0, tL, :]
                yg = yg.at[..., :, :-1, :, s - 1, tR, :].add(
                    jnp.einsum(em, Rii, xm) + jnp.einsum(em, Rio, xp))
                yg = yg.at[..., :, 1:, :, 0, tL, :].add(
                    jnp.einsum(em, Roi, xm) + jnp.einsum(em, Roo, xp))
        if ky > 1:
            Uii, Uio, Uoi, Uoo = (b.reshape((ky - 1, kx, s, nb, nb)) for b in self.U)
            xm = xg[..., :-1, :, s - 1, :, tT, :]     # [..., ky-1, kx, s(cx), nb]
            xp = xg[..., 1:, :, 0, :, tB, :]
            em = "YXfij,...YXfj->...YXfi"
            yg = yg.at[..., :-1, :, s - 1, :, tT, :].add(
                jnp.einsum(em, Uii, xm) + jnp.einsum(em, Uio, xp))
            yg = yg.at[..., 1:, :, 0, :, tB, :].add(
                jnp.einsum(em, Uoi, xm) + jnp.einsum(em, Uoo, xp))

        # ---- physical Dirichlet boundary ----
        eb = "Xfij,...Xfj->...Xfi"
        if cc:
            # left: cell (cy, 0), parity cy%2 -> element t = 1-p (B/C);
            # right: cell (cy, s-1), parity (cy+1)%2 -> element t = p (A/E)
            pl = np.arange(s) % 2
            l1 = jnp.asarray((pl == 0)[:, None]).astype(x.dtype)   # t=1 (B)
            l0 = jnp.asarray((pl == 1)[:, None]).astype(x.dtype)   # t=0 (C)
            DL = self.D_side["left"].reshape(ky, kx, s, nb, nb)[:, 0]
            xl = (l1 * xg[..., :, 0, :, 0, 1, :]
                  + l0 * xg[..., :, 0, :, 0, 0, :])
            yl = jnp.einsum(eb, DL, xl)
            yg = yg.at[..., :, 0, :, 0, 1, :].add(l1 * yl)
            yg = yg.at[..., :, 0, :, 0, 0, :].add(l0 * yl)
            prr = (np.arange(s) + s - 1) % 2
            g0 = jnp.asarray((prr == 0)[:, None]).astype(x.dtype)  # t=0 (A)
            g1 = jnp.asarray((prr == 1)[:, None]).astype(x.dtype)  # t=1 (E)
            DR = self.D_side["right"].reshape(ky, kx, s, nb, nb)[:, -1]
            xr = (g0 * xg[..., :, kx - 1, :, s - 1, 0, :]
                  + g1 * xg[..., :, kx - 1, :, s - 1, 1, :])
            yr = jnp.einsum(eb, DR, xr)
            yg = yg.at[..., :, kx - 1, :, s - 1, 0, :].add(g0 * yr)
            yg = yg.at[..., :, kx - 1, :, s - 1, 1, :].add(g1 * yr)
        else:
            yg = yg.at[..., :, 0, :, 0, tL, :].add(
                jnp.einsum(eb, self.D_side["left"].reshape(ky, kx, s, nb, nb)[:, 0],
                           xg[..., :, 0, :, 0, tL, :]))
            yg = yg.at[..., :, kx - 1, :, s - 1, tR, :].add(
                jnp.einsum(eb, self.D_side["right"].reshape(ky, kx, s, nb, nb)[:, -1],
                           xg[..., :, kx - 1, :, s - 1, tR, :]))
        yg = yg.at[..., 0, :, 0, :, tB, :].add(
            jnp.einsum(eb, self.D_side["bottom"].reshape(ky, kx, s, nb, nb)[0],
                       xg[..., 0, :, 0, :, tB, :]))
        yg = yg.at[..., ky - 1, :, s - 1, :, tT, :].add(
            jnp.einsum(eb, self.D_side["top"].reshape(ky, kx, s, nb, nb)[-1],
                       xg[..., ky - 1, :, s - 1, :, tT, :]))

        return yg.reshape(lead + (K, sp.N))


# pytree registrations: stencil operators are jit-arg-able (arrays as leaves,
# the space as static aux) so their tensors never become HLO constants.
jax.tree_util.register_dataclass(
    SwipdgStencil,
    data_fields=["vol", "D", "V", "H", "R", "U", "D_side"], meta_fields=[])
jax.tree_util.register_dataclass(
    StencilOperator, data_fields=["stencils"], meta_fields=["space"])
jax.tree_util.register_dataclass(
    AssembledStencil,
    data_fields=["vol", "D", "V", "H", "R", "U", "D_side"],
    meta_fields=["space"])
