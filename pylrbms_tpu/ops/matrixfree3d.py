"""Matrix-free (stencil) SWIPDG operator on the 3D hex family.

3D counterpart of ``ops/matrixfree.py``: the dense per-subdomain blocks
``A_diag [K, N, N]`` are O(K s^6 nb^2) bytes — prohibitive beyond s ~ 4 in
3D (N = s^3 nb grows cubically) — while the SWIPDG action is fully local:
per-cell volume blocks + per-face quadruples are O(K s^3 nb^2), a factor
``N/nb = s^3`` less HBM traffic per matvec.  The apply is a handful of fused
batched einsums + axis shifts (no gathers: the mesh is structured).

Layout (x as [K, s, s, s, nb], cell index [cz, cy, cx]):
  vol  [K, s, s, s, nb, nb]            y[c] += V x[c]
  X    4 x [K, s, s, s-1, nb, nb]      (cz,cy,cx) <-> (cz,cy,cx+1)
  Y    4 x [K, s, s-1, s, nb, nb]      (cz,cy,cx) <-> (cz,cy+1,cx)
  Z    4 x [K, s-1, s, s, nb, nb]      (cz,cy,cx) <-> (cz+1,cy,cx)
  interface quadruples IX/IY/IZ [E, s^2, nb, nb] + 6 Dirichlet side strips
  (same layouts as ``SwipdgComponent3``; face pos = side_cells ordering).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.precision import hp
from .spaces3d import BlockDGSpace3D
from . import assembly as asm
from . import assembly3d as asm3
from .assembly import IPDGParams, DEFAULT_IPDG


@dataclass(eq=False)
class SwipdgStencil3:
    """One affine component in 3D stencil form."""
    vol: jnp.ndarray                      # [K, s, s, s, nb, nb]
    X: Tuple[jnp.ndarray, ...]            # 4 x [K, s, s, s-1, nb, nb]
    Y: Tuple[jnp.ndarray, ...]            # 4 x [K, s, s-1, s, nb, nb]
    Z: Tuple[jnp.ndarray, ...]            # 4 x [K, s-1, s, s, nb, nb]
    IX: Tuple[jnp.ndarray, ...]           # 4 x [E_X, s^2, nb, nb]
    IY: Tuple[jnp.ndarray, ...]
    IZ: Tuple[jnp.ndarray, ...]
    D_side: Dict[str, jnp.ndarray]        # side -> [K, s^2, nb, nb]


@hp
def assemble_swipdg_stencil3(space: BlockDGSpace3D, lam_fn, kappa_fn=None,
                             ipdg: IPDGParams = DEFAULT_IPDG,
                             dtype=jnp.float64) -> SwipdgStencil3:
    s, nb, K = space.s, space.nb, space.K
    origins = space.subdomain_origins

    # volume blocks (pre-scatter)
    xq = asm3.vol_points(space, dtype)
    lam = lam_fn(xq).astype(dtype)
    dphi = jnp.asarray(space.vol_dphi, dtype)
    w = jnp.asarray(space.vol_w, dtype)
    if kappa_fn is None:
        vol = space.volume * jnp.einsum("q,kcq,qia,qja->kcij",
                                        w, lam, dphi, dphi)
    else:
        kap = kappa_fn(xq).astype(dtype)
        vol = space.volume * jnp.einsum("q,kcq,qia,kcqab,qjb->kcij",
                                        w, lam, kap, dphi, dphi)
    vol = vol.reshape(K, s, s, s, nb, nb)

    sets = space.interior_face_sets()

    def faces(fam, shape):
        cz, cy, cx = sets[fam][:3]
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm3.face_phys_points(space, tab, cz, cy, cx, origins)
        blocks = asm.inner_face_blocks(space, tab, lam_fn, kappa_fn,
                                       x_m, x_p, space.order, ipdg, dtype)
        return tuple(b.reshape((K,) + shape + (nb, nb)) for b in blocks)

    z4 = lambda shape: tuple(jnp.zeros((K,) + shape + (nb, nb), dtype)
                             for _ in range(4))
    Xq = faces("X", (s, s, s - 1)) if s > 1 else z4((s, s, 0))
    Yq = faces("Y", (s, s - 1, s)) if s > 1 else z4((s, 0, s))
    Zq = faces("Z", (s - 1, s, s)) if s > 1 else z4((0, s, s))

    grid = space.grid
    kx, ky, kz = grid.kx, grid.ky, grid.kz
    org = origins.reshape(kz, ky, kx, 3)

    def iface(orient, minus_org):
        E = minus_org.shape[0]
        if E == 0:
            return tuple(jnp.zeros((0, s * s, nb, nb), dtype) for _ in range(4))
        (fam, cz_m, cy_m, cx_m, _pos), = space.interface_face_groups(orient)
        tab = space.face_tabs[fam]
        _, x_m, x_p = asm3.face_phys_points(space, tab, cz_m, cy_m, cx_m,
                                            minus_org)
        return asm.inner_face_blocks(space, tab, lam_fn, kappa_fn,
                                     x_m, x_p, space.order, ipdg, dtype)

    IX = iface("X", org[:, :, :-1].reshape(-1, 3))
    IY = iface("Y", org[:, :-1, :].reshape(-1, 3))
    IZ = iface("Z", org[:-1].reshape(-1, 3))

    D_side = {}
    for side in ("left", "right", "bottom", "top", "near", "far"):
        (key, cz, cy, cx, _pos), = space.boundary_face_groups(side)
        tab = space.face_tabs[key]
        _, x_m, _ = asm3.face_phys_points(space, tab, cz, cy, cx, origins)
        D_side[side] = asm.boundary_face_blocks(
            space, tab, lam_fn, kappa_fn, x_m, space.order, ipdg, dtype)

    return SwipdgStencil3(vol=vol, X=Xq, Y=Yq, Z=Zq, IX=IX, IY=IY, IZ=IZ,
                          D_side=D_side)


@hp
def mass_stencil3(space: BlockDGSpace3D, like: SwipdgStencil3) -> SwipdgStencil3:
    """The L2 mass in 3D stencil form (volume blocks only; shapes matched to
    ``like`` so it can join an affine family — implicit Euler reuse)."""
    dtype = like.vol.dtype
    phi = jnp.asarray(space.vol_phi, dtype)
    w = jnp.asarray(space.vol_w, dtype)
    elem = space.volume * jnp.einsum("q,qi,qj->ij", w, phi, phi)
    vol = jnp.broadcast_to(elem, like.vol.shape)
    zf = jax.tree.map(jnp.zeros_like, like)
    return SwipdgStencil3(vol=vol, X=zf.X, Y=zf.Y, Z=zf.Z,
                          IX=zf.IX, IY=zf.IY, IZ=zf.IZ, D_side=zf.D_side)


@dataclass(eq=False)
class StencilOperator3:
    """Affine family of 3D stencils with a fused matrix-free apply."""
    space: BlockDGSpace3D
    stencils: Tuple[SwipdgStencil3, ...]

    def assemble(self, theta) -> "AssembledStencil3":
        theta = jnp.asarray(theta)

        def mix(getter):
            parts = [getter(st) for st in self.stencils]
            return sum(t * p for t, p in zip(theta, parts))

        st0 = self.stencils[0]
        return AssembledStencil3(
            space=self.space,
            vol=mix(lambda s: s.vol),
            X=tuple(mix(lambda s, i=i: s.X[i]) for i in range(4)),
            Y=tuple(mix(lambda s, i=i: s.Y[i]) for i in range(4)),
            Z=tuple(mix(lambda s, i=i: s.Z[i]) for i in range(4)),
            IX=tuple(mix(lambda s, i=i: s.IX[i]) for i in range(4)),
            IY=tuple(mix(lambda s, i=i: s.IY[i]) for i in range(4)),
            IZ=tuple(mix(lambda s, i=i: s.IZ[i]) for i in range(4)),
            D_side={k: mix(lambda s, k=k: s.D_side[k]) for k in st0.D_side},
        )


@dataclass(eq=False)
class AssembledStencil3:
    space: BlockDGSpace3D
    vol: jnp.ndarray
    X: tuple
    Y: tuple
    Z: tuple
    IX: tuple
    IY: tuple
    IZ: tuple
    D_side: dict

    # ------------------------------------------------------------------
    @hp
    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [..., K, N] -> A x, matrix-free."""
        sp = self.space
        grid = sp.grid
        K, s, nb = sp.K, sp.s, sp.nb
        lead = x.shape[:-2]
        xQ = x.reshape(lead + (K, s, s, s, nb))
        e = "kzyxij,...kzyxj->...kzyxi"
        y = jnp.einsum(e, self.vol, xQ)

        def inner(y, quads, axis):
            """Face family along ``axis`` (-2=x, -3=y, -4=z of the cell grid,
            offset by the trailing nb axis)."""
            Fmm, Fmp, Fpm, Fpp = quads
            a = axis - 1                     # cell axis in [..., K,s,s,s,nb]
            sl_m = [slice(None)] * xQ.ndim
            sl_p = [slice(None)] * xQ.ndim
            sl_m[a] = slice(None, -1)
            sl_p[a] = slice(1, None)
            sl_m, sl_p = tuple(sl_m), tuple(sl_p)
            xm, xp = xQ[sl_m], xQ[sl_p]
            y = y.at[sl_m].add(jnp.einsum(e, Fmm, xm) + jnp.einsum(e, Fmp, xp))
            y = y.at[sl_p].add(jnp.einsum(e, Fpm, xm) + jnp.einsum(e, Fpp, xp))
            return y

        if s > 1:
            y = inner(y, self.X, axis=-1)
            y = inner(y, self.Y, axis=-2)
            y = inner(y, self.Z, axis=-3)

        # ---- subdomain interfaces: reshape K -> [kz, ky, kx] ----
        kx, ky, kz = grid.kx, grid.ky, grid.kz
        yg = y.reshape(lead + (kz, ky, kx, s, s, s, nb))
        xg = xQ.reshape(lead + (kz, ky, kx, s, s, s, nb))
        em = "EFij,...EFj->...EFi"

        def take_side(v, k_axis, k_sl, c_axis, c_idx):
            """Slice subdomains along k_axis and the boundary cell layer
            along c_axis; flatten (remaining k dims x F=s^2) for the einsum.
            Returns the sliced array reshaped to [..., Ek, s^2, nb] plus the
            shape needed to scatter back."""
            sl = [slice(None)] * v.ndim
            sl[k_axis] = k_sl
            sl[c_axis] = c_idx
            out = v[tuple(sl)]
            # out: [..., kz', ky', kx', ca, cb, nb] — flatten k' dims and
            # (ca, cb) separately
            shp = out.shape
            Ek = shp[-6] * shp[-5] * shp[-4]
            return out.reshape(shp[:-6] + (Ek, s * s, nb)), shp

        # X interfaces: minus = right layer (cx = s-1) of subdomains
        # sx < kx-1, plus = left layer (cx = 0) of sx > 0; face pos
        # ordering (cz, cy) matches side_cells('right'/'left').
        def couple(yg, quads, k_axis, c_axis):
            Fii, Fio, Foi, Foo = quads
            if Fii.shape[0] == 0:
                return yg
            kd = yg.ndim + k_axis if k_axis < 0 else k_axis
            xm, shp_m = take_side(xg, kd, slice(None, -1), c_axis, s - 1)
            xp, shp_p = take_side(xg, kd, slice(1, None), c_axis, 0)
            ym = jnp.einsum(em, Fii, xm) + jnp.einsum(em, Fio, xp)
            yp = jnp.einsum(em, Foi, xm) + jnp.einsum(em, Foo, xp)
            sl_m = [slice(None)] * yg.ndim
            sl_m[kd] = slice(None, -1)
            sl_m[c_axis] = s - 1
            sl_p = [slice(None)] * yg.ndim
            sl_p[kd] = slice(1, None)
            sl_p[c_axis] = 0
            yg = yg.at[tuple(sl_m)].add(ym.reshape(shp_m))
            yg = yg.at[tuple(sl_p)].add(yp.reshape(shp_p))
            return yg

        # cell axes in [..., kz, ky, kx, cz, cy, cx, nb] (negative indices)
        if kx > 1:
            yg = couple(yg, self.IX, k_axis=-5, c_axis=-2)
        if ky > 1:
            yg = couple(yg, self.IY, k_axis=-6, c_axis=-3)
        if kz > 1:
            yg = couple(yg, self.IZ, k_axis=-7, c_axis=-4)

        # ---- physical-boundary Dirichlet strips ----
        Dm = {k: v.reshape((kz, ky, kx, s, s, nb, nb))
              for k, v in self.D_side.items()}

        def bnd(yg, side, k_axis, k_idx, c_axis, c_idx):
            kd = yg.ndim + k_axis
            sl = [slice(None)] * yg.ndim
            sl[kd] = k_idx
            sl[c_axis] = c_idx
            sl = tuple(sl)
            # D layout: [kz, ky, kx, a, b, nb, nb]; pick the same k axis
            dsl = [slice(None)] * 7
            dsl[{-7: 0, -6: 1, -5: 2}[k_axis]] = k_idx
            Dsel = Dm[side][tuple(dsl)]                # [k', k'', s, s, nb, nb]
            return yg.at[sl].add(
                jnp.einsum("ZYabij,...ZYabj->...ZYabi", Dsel, xg[sl]))

        yg = bnd(yg, "left", -5, 0, -2, 0)
        yg = bnd(yg, "right", -5, kx - 1, -2, s - 1)
        yg = bnd(yg, "bottom", -6, 0, -3, 0)
        yg = bnd(yg, "top", -6, ky - 1, -3, s - 1)
        yg = bnd(yg, "near", -7, 0, -4, 0)
        yg = bnd(yg, "far", -7, kz - 1, -4, s - 1)

        return yg.reshape(x.shape)

    # ------------------------------------------------------------------
    @hp
    def cell_blocks(self) -> jnp.ndarray:
        """Per-hex-cell nb x nb diagonal blocks (vol + own-side face mm/pp
        contributions + boundary strips) [K, s, s, s, nb, nb] — the
        UNINVERTED cell-Jacobi blocks; their diagonal is the (approximate,
        in_in-strip) operator diagonal used e.g. for IR Jacobi scaling."""
        sp = self.space
        s, nb = sp.s, sp.nb
        K = sp.K
        grid = sp.grid
        kx, ky, kz = grid.kx, grid.ky, grid.kz
        d = self.vol                                  # [K, s, s, s, nb, nb]
        if s > 1:
            for quads, axis in ((self.X, -1), (self.Y, -2), (self.Z, -3)):
                Fmm, _, _, Fpp = quads
                a = axis - 2                          # in [K,s,s,s,nb,nb]
                sl_m = [slice(None)] * 6
                sl_p = [slice(None)] * 6
                sl_m[a] = slice(None, -1)
                sl_p[a] = slice(1, None)
                d = d.at[tuple(sl_m)].add(Fmm)
                d = d.at[tuple(sl_p)].add(Fpp)
        # side strips on EVERY subdomain side (on interfaces the in_in strips
        # differ slightly from the Dirichlet ones — fine for a preconditioner)
        Dm = {k: v.reshape(K, s, s, nb, nb) for k, v in self.D_side.items()}
        d = d.at[:, :, :, 0].add(Dm["left"])
        d = d.at[:, :, :, s - 1].add(Dm["right"])
        d = d.at[:, :, 0, :].add(Dm["bottom"])
        d = d.at[:, :, s - 1, :].add(Dm["top"])
        d = d.at[:, 0, :, :].add(Dm["near"])
        d = d.at[:, s - 1, :, :].add(Dm["far"])
        return d

    def dense_subdomain_blocks(self) -> jnp.ndarray:
        """EXACT dense per-SUBDOMAIN diagonal blocks [K, N, N] assembled
        from the stencil: vol on the cell-block diagonal + intra-subdomain
        X/Y/Z face quadruples + the interface quads' in_in/out_out strips
        on the facing cell layers + Dirichlet strips on PHYSICAL boundary
        subdomains only (matches the operator's own apply, so the blocks
        equal fold_diag3's A_diag — the first draft added D_side on every
        subdomain side, which poisons the block-Jacobi preconditioner:
        measured relres 1.39 after 4000 its vs 1.5e-2 with exact blocks on
        the z-thin 65k config).

        This is what lets solve-only models (truth solves at >= 400k dofs,
        ``pylrbms_tpu/truth.py``) use the contrast/anisotropy-robust
        subdomain-block preconditioner without ever materializing the full
        dense affine family: one [K, N, N] array in the stencil dtype."""
        sp = self.space
        s, nb, K = sp.s, sp.nb, sp.K
        grid = sp.grid
        kx, ky, kz = grid.kx, grid.ky, grid.kz
        nc = s * s * s
        import numpy as _np
        cell = _np.arange(nc).reshape(s, s, s)
        dt_ = self.vol.dtype

        # gather every (k, row_cell, col_cell, value-block) contribution
        # into ONE flat list and scatter ONCE into the [K, N, N] layout:
        # the chained-.at[].add form compiled to ~6 live full-size copies
        # (measured 19.4 GB for a 3 GB result at the 442k Q2 config — a
        # compile-time HBM OOM on the 16 GB chip)
        ks_l, rc_l, cc_l = [], [], []
        vals = []

        def put(k_idx, row_cells, col_cells, V, nblk):
            k_idx = _np.asarray(k_idx).reshape(-1)            # [E]
            ks_l.append(_np.repeat(k_idx, nblk))              # [E*nblk]
            rc_l.append(_np.asarray(row_cells).reshape(-1))
            cc_l.append(_np.asarray(col_cells).reshape(-1))
            vals.append(V.reshape(-1, nb, nb))

        all_k = _np.arange(K)
        # volume blocks
        put(all_k, _np.broadcast_to(cell.reshape(1, -1), (K, nc)),
            _np.broadcast_to(cell.reshape(1, -1), (K, nc)),
            self.vol, nc)
        if s > 1:
            fams = ((self.X, cell[:, :, :-1], cell[:, :, 1:]),
                    (self.Y, cell[:, :-1, :], cell[:, 1:, :]),
                    (self.Z, cell[:-1, :, :], cell[1:, :, :]))
            for (Fmm, Fmp, Fpm, Fpp), cm_a, cp_a in fams:
                cm = cm_a.reshape(1, -1)
                cp = cp_a.reshape(1, -1)
                nf = cm.shape[1]
                cmb = _np.broadcast_to(cm, (K, nf))
                cpb = _np.broadcast_to(cp, (K, nf))
                put(all_k, cmb, cmb, Fmm, nf)
                put(all_k, cmb, cpb, Fmp, nf)
                put(all_k, cpb, cmb, Fpm, nf)
                put(all_k, cpb, cpb, Fpp, nf)
        # interface in_in / out_out strips -> the facing cell layers of
        # the minus / plus subdomain (the off-diagonal io/oi strips belong
        # to the coupling blocks, not these diagonal ones)
        from .swipdg3d import edge_lists3
        xlo, xhi, ylo, yhi, zlo, zhi = edge_lists3(grid)
        ifams = (
            (self.IX, xlo, xhi, cell[:, :, s - 1], cell[:, :, 0]),
            (self.IY, ylo, yhi, cell[:, s - 1, :], cell[:, 0, :]),
            (self.IZ, zlo, zhi, cell[s - 1, :, :], cell[0, :, :]),
        )
        F2 = s * s
        for (Fii, Fio, Foi, Foo), klo, khi, cm_a, cp_a in ifams:
            if Fii.shape[0] == 0:
                continue
            cm = _np.broadcast_to(cm_a.reshape(1, -1), (len(klo), F2))
            cp = _np.broadcast_to(cp_a.reshape(1, -1), (len(khi), F2))
            put(_np.asarray(klo), cm, cm, Fii, F2)
            put(_np.asarray(khi), cp, cp, Foo, F2)
        # Dirichlet strips on PHYSICAL boundary subdomains only
        k = _np.arange(K)
        ixk = k % kx
        iyk = (k // kx) % ky
        izk = k // (kx * ky)
        sides = {"left": (ixk == 0, cell[:, :, 0]),
                 "right": (ixk == kx - 1, cell[:, :, s - 1]),
                 "bottom": (iyk == 0, cell[:, 0, :]),
                 "top": (iyk == ky - 1, cell[:, s - 1, :]),
                 "near": (izk == 0, cell[0, :, :]),
                 "far": (izk == kz - 1, cell[s - 1, :, :])}
        for name, (kmask, cells) in sides.items():
            ks = _np.nonzero(kmask)[0]
            if ks.size == 0:
                continue
            cs = _np.broadcast_to(cells.reshape(1, -1), (ks.size, F2))
            put(ks, cs, cs,
                self.D_side[name].reshape(K, F2, nb, nb)[
                    jnp.asarray(ks)], F2)

        ks_f = jnp.asarray(_np.concatenate(ks_l).astype(_np.int32))
        rows0 = jnp.asarray((_np.concatenate(rc_l) * nb).astype(_np.int32))
        cols0 = jnp.asarray((_np.concatenate(cc_l) * nb).astype(_np.int32))
        V = jnp.concatenate(vals, axis=0)                 # [M, nb, nb]
        ii = _np.arange(nb)
        rows = rows0[:, None, None] + jnp.asarray(ii)[None, :, None]
        cols = cols0[:, None, None] + jnp.asarray(ii)[None, None, :]
        D = jnp.zeros((K, nc * nb, nc * nb), dt_)
        return D.at[ks_f[:, None, None], rows, cols].add(V)

    def cell_jacobi_factors(self) -> jnp.ndarray:
        """Per-hex-cell nb x nb block inverses of :meth:`cell_blocks`:
        the O(K s^3 nb^2)-memory matrix-free preconditioner."""
        d = self.cell_blocks()
        dvec = jnp.abs(jnp.diagonal(d, axis1=-2, axis2=-1))
        sca = 1.0 / jnp.sqrt(jnp.maximum(dvec, 1e-300))
        cs = d * sca[..., :, None] * sca[..., None, :]
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
        """Matrix-free PCG (same options as the 2D AssembledStencil)."""
        sp = self.space
        K, s, nb = sp.K, sp.s, sp.nb
        if block_factors is not None:
            Binv = (block_factors if block_factors.dtype == jnp.bfloat16
                    else block_factors.astype(jnp.float32))

            def M(r):
                z32 = jnp.einsum("knm,km->kn", Binv, r.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                return z32.astype(r.dtype)
        else:
            Minv = factors if factors is not None else self.cell_jacobi_factors()

            def M(r):
                rc = r.reshape(K, s, s, s, nb)
                z = jnp.einsum("kzyxij,kzyxj->kzyxi", Minv, rc)
                return z.reshape(r.shape)

        if coarse_inv is not None:
            M_fine = M
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
                    rc = jnp.sum(r, axis=1).astype(cdt)
                    xc = (C32 @ rc).astype(r.dtype)
                    return M_fine(r) + xc[:, None]

        # chunked control flow (la/krylov.py): the while-loop control round
        # is the measured per-iteration bound at mid scale on the chip
        from ..la.krylov import pcg_chunked
        x, it = pcg_chunked(self.apply, M, b, tol, maxiter, x0=x0)
        return (x, it) if return_iters else x


# pytree registration (arrays as leaves, the space as aux metadata):
# stencils pass straight into jitted functions without HLO-constant capture
jax.tree_util.register_dataclass(
    SwipdgStencil3,
    data_fields=["vol", "X", "Y", "Z", "IX", "IY", "IZ", "D_side"],
    meta_fields=[])
jax.tree_util.register_dataclass(
    StencilOperator3, data_fields=["stencils"], meta_fields=["space"])
jax.tree_util.register_dataclass(
    AssembledStencil3,
    data_fields=["vol", "X", "Y", "Z", "IX", "IY", "IZ", "D_side"],
    meta_fields=["space"])


def stencil_coarse_matrix(A: "AssembledStencil3", chunk: int = 64) -> jnp.ndarray:
    """Galerkin coarse matrix on the subdomain-constant space from the
    stencil alone: A0[k, k'] = 1_k^T A 1_k' ([K, K]).

    Needed at XL scale where the dense per-subdomain blocks (the source of
    ``AssembledBlockOp.coarse_matrix``) are never materialized.  Columns of
    A0 are the per-subdomain sums of A applied to the K subdomain-indicator
    vectors, batched in chunks (the [K, K, N] one-shot batch is gigabytes at
    XL scale)."""
    sp = A.space
    K, N = sp.K, sp.N
    dtype = A.vol.dtype
    eye = jnp.eye(K, dtype=dtype)                 # [K(batch), K]
    cols = []
    step = jax.jit(lambda A_, X_: jnp.sum(A_.apply(X_), axis=2))
    for lo in range(0, K, chunk):
        X = jnp.broadcast_to(eye[lo:lo + chunk, :, None],
                             (min(chunk, K - lo), K, N))
        cols.append(step(A, X))                   # [b, K]
    return jnp.concatenate(cols, axis=0).T        # A0[k, k'] = 1_k A 1_k'


def stencil_diag_blocks(A: "AssembledStencil3", dtype=jnp.float32) -> jnp.ndarray:
    """Dense per-subdomain diagonal blocks [K, N, N] scattered from the
    assembled stencil (the XL route to the contrast-robust subdomain-block
    Jacobi preconditioner WITHOUT ever materializing the affine dense
    family): volume + intra-subdomain face quadruples + interface
    in_in/out_out + physical-boundary Dirichlet strips — exactly
    ``swipdg3d.fold_diag3``'s result for the assembled operator.

    f32 by default: preconditioner precision only affects iteration counts,
    and the [K, N, N] array is the XL memory bound (3 GB at N=1728, K=256)."""
    from .assembly import scatter_blocks
    sp = A.space
    grid = sp.grid
    K, N, s, nb = sp.K, sp.N, sp.s, sp.nb
    D = jnp.zeros((K, N, N), dtype)
    C = s ** 3
    rows_c = np.arange(N, dtype=np.int64).reshape(C, nb)
    D = scatter_blocks(D, A.vol.reshape(K, C, nb, nb).astype(dtype),
                       rows_c, rows_c)
    sets = sp.interior_face_sets()
    for fam, quads in (("X", A.X), ("Y", A.Y), ("Z", A.Z)):
        cz_m, cy_m, cx_m, cz_p, cy_p, cx_p = sets[fam]
        if cz_m.size == 0 or quads[0].shape[-3] == 0:
            continue
        F = cz_m.size
        rows_m = sp.cell_dofs(cz_m, cy_m, cx_m)
        rows_p = sp.cell_dofs(cz_p, cy_p, cx_p)
        Fmm, Fmp, Fpm, Fpp = (q.reshape(K, F, nb, nb).astype(dtype)
                              for q in quads)
        D = scatter_blocks(D, Fmm, rows_m, rows_m)
        D = scatter_blocks(D, Fmp, rows_m, rows_p)
        D = scatter_blocks(D, Fpm, rows_p, rows_m)
        D = scatter_blocks(D, Fpp, rows_p, rows_p)
    # interface in_in / out_out + physical-boundary Dirichlet strips
    from .swipdg3d import edge_lists3
    xlo, xhi, ylo, yhi, zlo, zhi = edge_lists3(grid)
    side_rows = {sd: sp.side_dofs(sd).reshape(s * s, nb)
                 for sd in ("left", "right", "bottom", "top", "near", "far")}

    def add_rows(D, subs, rows, blk):
        return D.at[subs[:, None, None, None],
                    rows[None, :, :, None],
                    rows[None, :, None, :]].add(blk.astype(dtype))

    for (lo_k, hi_k, quads, hi_side, lo_side) in (
            (xlo, xhi, A.IX, "right", "left"),
            (ylo, yhi, A.IY, "top", "bottom"),
            (zlo, zhi, A.IZ, "far", "near")):
        if lo_k.size == 0:
            continue
        D = add_rows(D, lo_k, side_rows[hi_side], quads[0])    # in_in
        D = add_rows(D, hi_k, side_rows[lo_side], quads[3])    # out_out
    subs_all = np.arange(K)
    kx, ky, kz = grid.kx, grid.ky, grid.kz
    sx = subs_all % kx
    sy = (subs_all // kx) % ky
    sz = subs_all // (kx * ky)
    bnd = {"left": subs_all[sx == 0], "right": subs_all[sx == kx - 1],
           "bottom": subs_all[sy == 0], "top": subs_all[sy == ky - 1],
           "near": subs_all[sz == 0], "far": subs_all[sz == kz - 1]}
    for sd, subs in bnd.items():
        D = add_rows(D, subs, side_rows[sd], A.D_side[sd][subs])
    return D
