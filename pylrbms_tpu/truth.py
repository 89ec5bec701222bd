"""Self-hosted truth references: large f64 solves with NO direct-solver
dependence (VERDICT r4 missing #4 / next #7).

The recorded single-host ceiling for 3D truth references is scipy SuperLU
itself: the 442k-dof Q2 reference of the --finer-ref efficiency study dies
inside gstrf after ~2 h of fill (commit c806956 / docs/results/
spe10_3d_efficiency_study.txt).  This module replaces splu for large truth
solves with the framework's own mixed-precision machinery, built entirely
on the STENCIL representation (no dense [K, N, N] subdomain blocks are
ever materialized — the dense route is what caps the existing
`prepare_coarse`/`harvested_coarse_basis` at mid scale):

- preconditioner: per-cell block-Jacobi factors
  (``AssembledStencil3.cell_jacobi_factors`` — O(cells * nb^2) memory)
  plus a harvested spectral coarse space filtered through the CELL-factor
  preconditioned operator (:func:`harvested_coarse_cell`);
- the coarse Galerkin matrix is assembled by 27-COLORED stencil applies
  (:func:`prepare_coarse_mf`): masking the basis to one lattice color per
  apply separates the 7-point neighbor contributions exactly, so the full
  [K*m, K*m] matrix costs 27*m matrix-free applies instead of dense block
  algebra;
- the solve is :func:`pylrbms_tpu.ops.ir.solve_ir` — native-f32 inner
  Krylov on the Jacobi-scaled system with f64 residual restarts and a
  gated f64 polish — so the chip's hot loop is a NATIVE-f32 program (the
  remote AOT ceiling measured at >=1M dofs was hit by fully f64-EMULATED
  programs; the lean f64 share here is a few applies per solve).

Solver recipe for the adversarial z-thin anisotropic configs (round-5
measured, 65k z-thin SPE10: stalled at ~5000 its before): enough harvest
vectors + f64 coarse apply — harvested(32/48/64, rounds>=2) + modal(6)
converges in 2463/1762/965 iterations.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .utils.precision import hp
from .utils.logging import getLogger

logger = getLogger("pylrbms.truth")


def _cell_precond_fn(space):
    """(factors, r) -> z closure for cell-block factors (dim-generic)."""
    s, nb = space.s, space.nb
    dim = getattr(space, "dim", 2)
    T = getattr(space, "T", 1)
    if dim == 3:
        shape = (space.K, s, s, s, nb)
        eq = "kzyxij,kzyxj->kzyxi"
    else:
        cb = T * nb
        shape = (space.K, s, s, cb)
        eq = "kyxij,kyxj->kyxi"

    def M(factors, r):
        rc = r.reshape(r.shape[:-2] + shape[1:] if r.ndim > 2 else shape)
        z = jnp.einsum(eq, factors, rc)
        return z.reshape(r.shape)

    return M


def harvested_coarse_cell(S, cell_factors, space, n_harvest: int = 32,
                          extra_modal: int = 6, rounds: int = 2,
                          deg: int = 30, seed: int = 0,
                          block_factors=None) -> np.ndarray:
    """Chebyshev-harvested slow modes of the preconditioned stencil
    operator — the stencil-representation analog of
    :func:`pylrbms_tpu.la.block.harvested_coarse_basis` (which needs the
    dense affine family).  The filter preconditioner is the CELL-Jacobi
    factors by default, or the subdomain ``block_factors`` [K, N, N] when
    given (the anisotropy/contrast-robust choice — the filter should see
    the same M^-1 A the solve iterates).  Returns
    [K, N, extra_modal + n_harvest]."""
    from .la.block import AssembledBlockOp
    K, N = space.K, space.N
    if block_factors is not None:
        def Mc(F, r):
            return jnp.einsum("knm,km->kn", F, r)
        cell_factors = block_factors
    else:
        Mc = _cell_precond_fn(space)

    @jax.jit
    @hp
    def _pow(v, F, S_):
        def body(i, carry):
            v, _ = carry
            w = Mc(F, S_.apply(v))
            nrm = jnp.sqrt(jnp.sum(w * w))
            return (w / jnp.maximum(nrm, 1e-300), nrm)
        return jax.lax.fori_loop(0, 30, body, (v, jnp.array(0.0, v.dtype)))

    from .la.block import AssembledBlockOp as _ABO
    if n_harvest == 0:
        C = _ABO.coarse_modes_basis(space, extra_modal)
        return np.stack([np.linalg.qr(C[k])[0] for k in range(K)])
    dt_ = cell_factors.dtype
    rng = np.random.default_rng(seed)
    v0 = jnp.asarray(rng.normal(size=(K, N)), dt_)
    _, lam = _pow(v0, cell_factors, S)
    # 1.3 margin: the cell-preconditioned operator's spectrum is wider and
    # more clustered at the top than the subdomain-block one — a 30-step
    # power iteration undershoots lambda_max more easily, and any mode
    # above the Chebyshev band is amplified exponentially (degenerate
    # basis -> indefinite coarse -> diverging outer CG)
    bnd = 1.3 * float(lam)
    a = (0.25 / 2.05) * bnd
    e = (bnd + a) / 2.0
    c = (bnd - a) / 2.0

    @jax.jit
    @hp
    def filt(V, F, S_, e_, c_):
        def pa(X):
            return jax.vmap(lambda x: Mc(F, S_.apply(x)))(X)

        Y = (pa(V) - e_ * V) / c_

        def body(i, carry):
            Vm1, Vc = carry
            return (Vc, 2.0 * (pa(Vc) - e_ * Vc) / c_ - Vm1)

        _, Vc = jax.lax.fori_loop(0, deg - 1, body, (V, Y))
        return Vc

    V = jnp.asarray(rng.normal(size=(n_harvest, K, N)), dt_)
    ec = (jnp.asarray(e, dt_), jnp.asarray(c, dt_))
    for _ in range(rounds):
        V = filt(V, cell_factors, S, *ec)
        Vh = np.asarray(V, np.float64)
        if not np.isfinite(Vh).all():
            ec = (ec[0] + ec[1], 2.0 * ec[1])
            Vh = np.asarray(filt(
                jnp.asarray(rng.normal(size=(n_harvest, K, N)), dt_),
                cell_factors, S, *ec), np.float64)
        Q, _ = np.linalg.qr(Vh.reshape(n_harvest, -1).T)
        V = jnp.asarray(Q.T.reshape(n_harvest, K, N), dt_)
    cols = [np.moveaxis(np.asarray(V, np.float64), 0, -1)]
    if extra_modal:
        cols.insert(0, AssembledBlockOp.coarse_modes_basis(space,
                                                           extra_modal))
    C = np.concatenate(cols, axis=-1)
    return np.stack([np.linalg.qr(C[k])[0] for k in range(K)])


def _lattice_coords(space):
    K = space.K
    grid = space.grid
    kx = grid.kx
    ky = grid.ky
    kz = getattr(grid, "kz", 1)
    k = np.arange(K)
    ix = k % kx
    iy = (k // kx) % ky
    iz = k // (kx * ky)
    return ix, iy, iz, kx, ky, kz


def coarse_galerkin_mf(S, C) -> np.ndarray:
    """Full [K*m, K*m] Galerkin coarse matrix from COLORED stencil applies.

    Basis columns live per subdomain; a 3-periodic coloring of the
    subdomain lattice per axis (27 colors in 3D, 9 in 2D) makes the
    7-point neighbor of any subdomain the UNIQUE member of its color in
    the subdomain's neighborhood, so ``C_k^T (A C_masked)_k`` separates
    into exact Galerkin entries.  Cost: n_colors * m matrix-free applies
    (batched), instead of the dense block algebra
    ``coarse_matrix_general`` needs."""
    space = S.space
    K, N, m = C.shape
    ix, iy, iz, kx, ky, kz = _lattice_coords(space)
    dim3 = getattr(space, "dim", 2) == 3
    color = (ix % 3) + 3 * (iy % 3) + (9 * (iz % 3) if dim3 else 0)
    n_colors = 27 if dim3 else 9
    # neighbor offsets in k-index per axis
    offs = [0, +1, -1, +kx, -kx]
    if dim3:
        offs += [+kx * ky, -kx * ky]
    Cd = jnp.asarray(C, S.vol.dtype if hasattr(S, "vol")
                     else jnp.float64)

    @jax.jit
    @hp
    def apply_cols(S_, X):
        return jax.vmap(S_.apply)(X)            # [m, K, N]

    Ac = np.zeros((K, m, K, m))
    Cnp = np.asarray(C, np.float64)
    for col in range(n_colors):
        mask = (color == col).astype(np.float64)
        if not mask.any():
            continue
        Xm = jnp.asarray(np.moveaxis(Cnp * mask[:, None, None], -1, 0))
        Y = np.asarray(apply_cols(S, Xm.astype(Cd.dtype)), np.float64)
        # entry: Ac[(k, i), (k', j)] = C[k,:,i] . Y[j, k] where k' is the
        # unique color-`col` subdomain in k's 7-point neighborhood
        blk = np.einsum("kni,jkn->kij", Cnp, Y)          # [K, m, m]
        for off in offs:
            kk = np.arange(K) + off
            valid = (kk >= 0) & (kk < K)
            if off in (+1, -1):
                valid &= (ix + off >= 0) & (ix + off < kx)
            elif off in (+kx, -kx):
                valid &= (iy + np.sign(off) >= 0) & (iy + np.sign(off) < ky)
            elif off != 0:
                valid &= (iz + np.sign(off) >= 0) & (iz + np.sign(off) < kz)
            kk = np.where(valid, kk, 0)
            sel = valid & (color[kk] == col)
            rows = np.nonzero(sel)[0]
            if rows.size == 0:
                continue
            Ac[rows, :, kk[rows], :] += blk[rows]
    return Ac.reshape(K * m, K * m)


def prepare_coarse_mf(S, C):
    """Stencil-representation variant of :func:`la.block.prepare_coarse`:
    condition (unit-energy columns) + SPD-safe host-f64 pseudo-inverse of
    the colored-apply Galerkin matrix.  Returns (C_cond, Ac_inv) device
    arrays."""
    C = np.asarray(C, np.float64)
    # unit block-energy normalization via one colored pass would need the
    # diag blocks only; the full Galerkin diag suffices and we need the
    # matrix anyway — normalize after assembling once, then rescale.
    Ac = coarse_galerkin_mf(S, C)
    K, N, m = C.shape
    d = np.sqrt(np.maximum(np.abs(np.diag(Ac)), 1e-300))
    C = C / d.reshape(K, m)[:, None, :]
    Ac = Ac / d[:, None] / d[None, :]
    sd = 1.0 / np.sqrt(np.maximum(np.abs(np.diag(Ac)), 1e-300))
    Ssym = 0.5 * (Ac + Ac.T) * sd[:, None] * sd[None, :]
    w, V = np.linalg.eigh(Ssym)
    wmax = max(float(w.max()), 1e-300)
    keep = w > 1e-12 * wmax
    inv_s = (V[:, keep] / w[keep]) @ V[:, keep].T
    Ac_inv = inv_s * sd[:, None] * sd[None, :]
    dt_ = jnp.float64
    return jnp.asarray(C, dt_), jnp.asarray(Ac_inv, dt_)


class SolveOnlyModel:
    """Minimal model for truth solves at >= 1M dofs: space + affine
    STENCILS + rhs only — none of the dense [K, N, N] per-subdomain
    tensors (operators/products/estimator) that cap ``discretize3d`` at
    mid scale (at the 1M-dof layouts a single [K, N, N] f64 product is
    4+ GB of HBM; the full lean model materializes several)."""

    def __init__(self, gpd, order: int = 1, dtype=jnp.float64):
        from .grid3d import Grid3D
        from .ops.spaces3d import BlockDGSpace3D
        from .ops import assembly3d as asm3
        from .parameters import as_functional
        from .discretize_elliptic_block_swipdg import _affine
        grid: "Grid3D" = gpd["grid"]
        self.space = BlockDGSpace3D(grid, order=order)
        self._lambda_funcs, lambda_coeffs = _affine(gpd["lambda"])
        f_funcs, f_coeffs = _affine(gpd["f"])
        self.parameter_type = gpd.get("parameter_type")
        self._lambda_coeffs = [as_functional(c) for c in lambda_coeffs]
        self._f_coeffs = [as_functional(c) for c in f_coeffs]
        self.op = None
        sp = self.space

        @jax.jit
        @hp
        def _rhs():
            return jnp.stack([asm3.volume_functional(sp, ff, jnp.float64)
                              for ff in f_funcs])

        self.rhs_q = _rhs()

    def parse_parameter(self, mu):
        from .parameters import parse_parameter
        return parse_parameter(self.parameter_type, mu)

    def theta(self, mu):
        from .parameters import evaluate_coefficients
        return evaluate_coefficients(self._lambda_coeffs,
                                     self.parse_parameter(mu))

    def rhs(self, mu):
        from .parameters import evaluate_coefficients
        th_f = evaluate_coefficients(self._f_coeffs,
                                     self.parse_parameter(mu))
        return jnp.einsum("q,qkn->kn", th_f, self.rhs_q)

    def stencil_at(self, mu, dtype):
        """ONE assembled stencil at lam_mu(x) = sum_q theta_q lam_q(x) —
        no persistent affine component family, no assembled copy: at >= 1M
        dofs HBM cannot hold Q f64 component stencils AND the assembled
        operator; re-assembling per (mu, dtype) is seconds of batched
        quadrature."""
        from .ops.matrixfree3d import (assemble_swipdg_stencil3,
                                       AssembledStencil3)
        theta = np.asarray(self.theta(self.parse_parameter(mu)), np.float64)
        funcs = self._lambda_funcs
        sp = self.space

        def lam_mu(x):
            out = None
            for t, lf in zip(theta, funcs):
                v = float(t) * lf(x)
                out = v if out is None else out + v
            return out

        @jax.jit
        @hp
        def _asm():
            c = assemble_swipdg_stencil3(sp, lam_mu, None, dtype=dtype)
            return c

        c = _asm()
        return AssembledStencil3(space=sp, vol=c.vol, X=c.X, Y=c.Y, Z=c.Z,
                                 IX=c.IX, IY=c.IY, IZ=c.IZ,
                                 D_side=c.D_side)


def spd_block_inverse(D, floor_rel: float = 1e-4):
    # floor_rel 1e-4 (not 1e-6): the factor is APPLIED in f32, so its
    # useful dynamic range is ~eps_f32^-1 * floor — a 1e-6 floor lets the
    # stiff-mode amplification reach 1e6 and the f32 application noise
    # (~1e-7 relative of the LARGE intermediates) swamps the result,
    # making the preconditioner effectively indefinite at Q2-442k internal
    # conditioning (measured: CG plateaus at |r|/|b| ~ 17)
    """SPD-GUARANTEED approximate block inverse via (Jacobi-scaled) eigh:
    Binv = S V max(w, floor)^-1 V^T S.

    Why not the LU inverse (``la.block.block_jacobi_factors``): on hardware
    without f64 factorizations the f32 LU inverse of a block with internal
    cond ~1e6 (z-thin anisotropy x contrast) carries ~eps_f32 * cond = O(0.1)
    relative error and LOSES SYMMETRY/definiteness — CG with that as M
    shows sustained residual GROWTH (measured round 5: relres 0.7 -> 1.75
    over 4 chunks on the z-thin 65k).  The eigh form is symmetric PSD by
    construction at ANY accuracy, so CG stays a descent method and the
    factor error only costs iterations."""
    dvec = jnp.abs(jnp.diagonal(D, axis1=-2, axis2=-1))
    sca = 1.0 / jnp.sqrt(jnp.maximum(dvec, 1e-300))
    cs = D * sca[..., :, None] * sca[..., None, :]
    inv_dt = (jnp.float32 if (cs.dtype == jnp.float64
                              and jax.default_backend() != "cpu")
              else cs.dtype)

    def one_chunk(csk):
        w, V = jnp.linalg.eigh(csk.astype(inv_dt))
        wmax = jnp.max(w, axis=-1, keepdims=True)
        winv = 1.0 / jnp.maximum(w, floor_rel * jnp.maximum(wmax, 1e-300))
        return jnp.einsum("...nm,...m,...km->...nk", V, winv,
                          V).astype(csk.dtype)

    K, N = cs.shape[0], cs.shape[-1]
    # chunk the batched eigh over K: its workspace is several [c, N, N]
    # copies — the full-batch form at [256, 1728, 1728] exceeds HBM
    c = max(1, min(K, int(2e9 / max(N * N * 4, 1))))
    if c < K:
        pad = (-K) % c
        csp = jnp.concatenate(
            [cs] + ([jnp.broadcast_to(jnp.eye(N, dtype=cs.dtype),
                                      (pad, N, N))] if pad else []))
        inv_s = jax.lax.map(one_chunk,
                            csp.reshape(-1, c, N, N)).reshape(-1, N, N)[:K]
    else:
        inv_s = one_chunk(cs)
    return inv_s * sca[..., :, None] * sca[..., None, :]


def _solve_f32ir(st, S, S32, BF, F32, C, ci, b, dvec, tol, maxiter,
                 verbose, t_asm, t_coarse, space):
    """Iterative-refinement solve for the NON-adversarial (near-isotropic)
    configs: native-f32 inner Krylov on the Jacobi-scaled system (the
    round-4 at-scale design, ops/ir.py) with ONE f64 residual pair per
    round — the f64-emulated chunk recurrence the adversarial configs
    need crashes the TPU worker at >= 442k Q2 (kernel fault), and the
    near-isotropic contrast-1e4 configs don't need it (measured: the f32
    inner converges at 131k-3D; it is the z-thin anisotropy that defeats
    it)."""
    import time
    f32 = jnp.float32
    s = space.s
    dim3 = getattr(space, "dim", 2) == 3
    cell_shape = ((space.K, s, s, s, space.nb) if dim3
                  else (space.K, s, s, getattr(space, "T", 1) * space.nb))
    def _pcg_safe(matvec, M, b_, tol_, maxiter_):
        """Safeguarded f32 PCG: freezes on curvature/rz breakdown and
        returns the BEST-residual iterate — an unguarded f32 recurrence at
        Q2-442k internal conditioning breaks down mid-inner and explodes
        (measured |r| -> 5e4 x |b| within 3000 its)."""
        # dots accumulate in f64: an f32 reduction over 442k+ entries
        # carries enough roundoff to flip the sign of a small pAp/rz and
        # trip the breakdown guard on iteration 1 (measured)
        def dot(u, v):
            return jnp.vdot(u.astype(jnp.float64), v.astype(jnp.float64))

        atol2 = (tol_ ** 2) * jnp.maximum(dot(b_, b_), 1e-300)
        x0 = jnp.zeros_like(b_)
        r0 = b_
        z0 = M(r0)
        rz0 = dot(r0, z0)
        rn0 = dot(r0, r0)
        st0 = (x0, r0, z0, z0, rz0, 0, jnp.asarray(True), x0, rn0)

        def body(st):
            x, r, z, p, rz, it, ok, xb, rnb = st
            Ap = matvec(p)
            pAp = dot(p, Ap)
            ok_new = ok & (pAp > 0) & (rz > 0)
            alpha = jnp.where(ok_new, rz / jnp.where(pAp > 0, pAp, 1.0),
                              0.0).astype(b_.dtype)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rzn = dot(r, z)
            beta = jnp.where(ok_new & (rz > 0),
                             rzn / jnp.where(rz > 0, rz, 1.0),
                             0.0).astype(b_.dtype)
            p = jnp.where(ok_new, z + beta * p, p)
            rn = dot(r, r)
            better = ok_new & (rn < rnb)
            xb = jnp.where(better, x, xb)
            rnb = jnp.where(better, rn, rnb)
            return (x, r, z, p, rzn, it + 1, ok_new, xb, rnb)

        def gbody(st):
            done = jnp.logical_not(st[6] & (dot(st[1], st[1]) > atol2))
            new = body(st)
            return jax.tree.map(lambda a, n: jnp.where(done, a, n), st,
                                new)

        out = jax.lax.fori_loop(0, maxiter_, lambda i, st: gbody(st), st0)
        return out[7], out[5]                      # best x, iterations

    @jax.jit
    @hp
    def _round(S_, S32_, F_, C_, ci_, b_, dv_, x_):
        s64 = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(dv_), 1e-300))
        s32 = s64.astype(f32)
        si32 = (1.0 / s64).astype(f32)
        C32 = C_.astype(f32)
        ci32 = ci_.astype(f32)

        def Mf(r):
            if BF is not None:
                fine = jnp.einsum("knm,km->kn", F_.astype(f32), r,
                                  preferred_element_type=f32)
            else:
                rc = r.reshape(cell_shape)
                fine = jnp.einsum("...ij,...j->...i", F_.astype(f32),
                                  rc).reshape(r.shape)
            rcoarse = jnp.einsum("knm,kn->km", C32, r).reshape(-1)
            xc = (ci32 @ rcoarse).reshape(C32.shape[0], C32.shape[2])
            return fine + jnp.einsum("knm,km->kn", C32, xc)

        def matvec32(v):
            return s32 * S32_.apply(s32 * v)

        def M32(r):
            return si32 * Mf(si32 * r)

        r = b_ - S_.apply(x_)                       # the round's f64 pair
        rt = s64 * r
        nrm = jnp.maximum(jnp.max(jnp.abs(rt)), 1e-300)
        rt32 = (rt / nrm).astype(f32)
        dxt, k = _pcg_safe(matvec32, M32, rt32, 1e-5, 3000)
        x_new = x_ + nrm * s64 * dxt.astype(b_.dtype)
        r_new = b_ - S_.apply(x_new)
        return x_new, jnp.vdot(r_new, r_new), k

    t0 = time.perf_counter()
    bn = float(jnp.linalg.norm(b.reshape(-1)))
    atol = tol * max(bn, 1e-300)
    x = jnp.zeros_like(b)
    F_use = BF if BF is not None else F32
    it_total = 0
    rd = 0
    rn_prev = np.inf
    while it_total < maxiter and rd < 40:
        x, rn2, k = _round(S, S32, F_use, C, ci, b, dvec, x)
        rn = float(jnp.sqrt(rn2))
        it_total += int(k)
        rd += 1
        if verbose:
            logger.info(f"truth IR round {rd}: |r|/|b| {rn / bn:.2e} "
                        f"(+{int(k)} f32 its)")
        if rn <= atol * 1.001:
            break
        if rn > 0.5 * rn_prev:
            logger.info("truth_solve(f32ir): stalled — stopping")
            break
        rn_prev = rn
    jax.block_until_ready(x)
    t_solve = time.perf_counter() - t0
    rel = float(jnp.linalg.norm((b - S.apply(x)).reshape(-1))
                / jnp.maximum(jnp.linalg.norm(b.reshape(-1)), 1e-300))
    info = dict(relres=rel, it32=it_total, rounds=rd, it64=0,
                t_assemble=t_asm, t_coarse=t_coarse, t_solve=t_solve)
    if verbose:
        logger.info(f"truth_solve(f32ir): relres {rel:.2e}, f32 its "
                    f"{it_total} ({rd} rounds), solve {t_solve:.1f} s")
    if not np.isfinite(rel) or rel > max(1e3 * tol, 1e-6):
        raise RuntimeError(f"truth_solve did not converge: relres {rel}")
    return np.asarray(x, np.float64), info


def truth_solve(d, mu, tol: float = 1e-10, maxiter: int = 20000,
                n_harvest: int = 32, extra_modal: int = 6,
                rounds: int = 2, verbose: bool = True,
                precond: str = None, jacobi_storage: str = None,
                chunk_iters: int = None, recurrence: str = "f64"):
    """f64-accurate FOM solve through the stencil-only mixed-precision
    path — the splu replacement for truth references past the SuperLU
    ceiling.  Returns (U [K, N] np.float64, info dict).

    ``precond``: 'block' (subdomain-block Jacobi — the contrast/anisotropy
    robust choice; needs [K, N, N] of factor storage) | 'cell' (per-cell
    blocks — O(cells nb^2) memory, for configs whose block factors do not
    fit) | None = auto by factor-storage budget.  The z-thin adversarial
    configs REQUIRE 'block': measured round 5, cell-preconditioned Krylov
    crawls (relres 0.69 after 2000 its) where block-preconditioned
    converges (965-2463 its).  ``jacobi_storage='bf16'`` halves the factor
    HBM stream (iteration-count cost only)."""
    import time
    from .ops.ir import cast_f32
    from .la.block import block_jacobi_factors
    st = d
    space = st.space
    mu = st.parse_parameter(mu)
    theta = st.theta(mu)
    K, N = space.K, space.N
    if precond is None:
        precond = "block" if K * N * N * 4 <= 9e9 else "cell"
    # HBM phasing at truth scale: the f32 stencil + preconditioner build
    # (incl. the eigh transient) and the f64 stencil never coexist —
    # solve-only models assemble ONE stencil at (mu, dtype) on demand
    # (stencil_at), full models fall back to the cached affine family
    t0 = time.perf_counter()
    if hasattr(st, "stencil_at"):
        S32 = st.stencil_at(mu, jnp.float32)
    else:
        sop = st.mf_operator()
        S32 = cast_f32(jax.jit(hp(lambda s, th: s.assemble(th)))(
            sop, theta))
    jax.block_until_ready(S32.vol)
    if verbose:
        logger.info(f"truth: f32 stencil assembled "
                    f"({time.perf_counter() - t0:.1f} s)")
    if precond == "block":
        # SPD-safe eigh inverse of the f32 stencil-extracted blocks (see
        # spd_block_inverse: the LU inverse of high-internal-cond blocks
        # in f32 is indefinite enough to make CG grow; eigh keeps M SPD at
        # any factor accuracy, and preconditioner accuracy only costs
        # iterations — f32 blocks halve the [K, N, N] build memory)
        D32 = jax.jit(hp(lambda s_: s_.dense_subdomain_blocks()))(S32)
        jax.block_until_ready(D32)
        if verbose:
            logger.info(f"truth: dense blocks built "
                        f"({time.perf_counter() - t0:.1f} s)")
        dvec = jnp.abs(jnp.diagonal(D32, axis1=-2, axis2=-1))  # IR scaling
        BF = jax.jit(hp(spd_block_inverse), donate_argnums=0)(D32)
        jax.block_until_ready(BF)
        if verbose:
            logger.info(f"truth: SPD block inverse done "
                        f"({time.perf_counter() - t0:.1f} s)")
        del D32
        F32 = None
    else:
        BF = None
        F32 = jax.jit(hp(lambda s: s.cell_jacobi_factors()))(S32)
        dvec = jnp.abs(jnp.diagonal(
            jax.jit(hp(lambda s_: s_.cell_blocks()))(S32),
            axis1=-2, axis2=-1)).reshape(K, N)
    t_asm = time.perf_counter() - t0
    t0 = time.perf_counter()
    C_np = harvested_coarse_cell(S32, F32, space, n_harvest=n_harvest,
                                 extra_modal=extra_modal, rounds=rounds,
                                 block_factors=BF)
    if verbose:
        logger.info(f"truth: harvested basis done "
                    f"({time.perf_counter() - t0:.1f} s)")
    C, ci = prepare_coarse_mf(S32, C_np)
    t_coarse = time.perf_counter() - t0
    if verbose:
        logger.info(f"truth: coarse Galerkin + inverse done "
                    f"({t_coarse:.1f} s)")
    if BF is not None and jacobi_storage == "bf16":
        BF = BF.astype(jnp.bfloat16)   # after the harvest: halve the
        #                                per-iteration factor stream only
    if hasattr(st, "stencil_at"):
        if recurrence != "f32ir":
            del S32                  # phase out the f32 operator before
        S = st.stencil_at(mu, jnp.float64)   # the f64 one materializes
    else:
        S = jax.jit(hp(lambda s, th: s.assemble(th)))(sop, theta)
    b = jnp.asarray(np.asarray(st.rhs(mu), np.float64))
    t0 = time.perf_counter()
    s = space.s
    if recurrence == "f32ir":
        return _solve_f32ir(st, S, S32, BF, F32, C, ci, b, dvec, tol,
                            maxiter, verbose, t_asm, t_coarse, space)
    dim3 = getattr(space, "dim", 2) == 3
    cell_shape = ((space.K, s, s, s, space.nb) if dim3
                  else (space.K, s, s, getattr(space, "T", 1) * space.nb))

    # ROBUST f64 Krylov, HOST-DRIVEN bounded dispatches WITH PERSISTENT
    # KRYLOV STATE.  Round-5 findings that shaped this: (a) the
    # adversarial z-thin configs DEFEAT an f32-inner IR even with frequent
    # restarts (4000 f32 its contract |r| by 1.3%, then the f32 recurrence
    # explodes) — the recurrence must be f64 with f32-applied factors +
    # f64 coarse; (b) one monolithic dispatch at truth scale dies with
    # UNAVAILABLE on the remote chip (RPC deadline) — the solve must be
    # bounded dispatches; (c) RESTARTING CG at each dispatch boundary
    # destroys convergence at this conditioning (measured: per-512-it
    # restarts grow |r| 42x where the continuous recurrence converges) —
    # the full (x, r, z, p, rz) state lives on device ACROSS dispatches,
    # so the concatenation of chunks IS one continuous PCG.
    if chunk_iters is None:
        # bound the per-dispatch device time: a 512-it f64-emulated chunk
        # at 442k Q2 crashed the TPU worker; scale inversely with dofs
        chunk_iters = int(max(64, min(512, 512 * 131072 / (K * N))))

    def _mk_M(F_, C_, ci_):
        f32 = jnp.float32

        def M(r):
            if BF is not None:
                fine = jnp.einsum(
                    "knm,km->kn",
                    F_ if F_.dtype == jnp.bfloat16 else F_.astype(f32),
                    r.astype(f32),
                    preferred_element_type=f32).astype(r.dtype)
            else:
                rc = r.reshape(cell_shape)
                fine = jnp.einsum("...ij,...j->...i", F_.astype(f32),
                                  rc.astype(f32)).astype(r.dtype)
                fine = fine.reshape(r.shape)
            rcoarse = jnp.einsum("knm,kn->km", C_, r).reshape(-1)
            xc = (ci_ @ rcoarse).reshape(C_.shape[0], C_.shape[2])
            return fine + jnp.einsum("knm,km->kn", C_, xc)

        return M

    @jax.jit
    @hp
    def _start(S_, F_, C_, ci_, b_):
        M = _mk_M(F_, C_, ci_)
        x0 = jnp.zeros_like(b_)
        r0 = b_
        z0 = M(r0)
        return (x0, r0, z0, z0, jnp.vdot(r0, z0))

    @jax.jit
    @hp
    def _chunk(S_, F_, C_, ci_, b_, state, atol2_):
        M = _mk_M(F_, C_, ci_)

        def body(st):
            x, r, z, p, rz = st
            Ap = S_.apply(p)
            alpha = rz / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rzn = jnp.vdot(r, z)
            p = z + (rzn / rz) * p
            return (x, r, z, p, rzn)

        def gbody(st):
            done = jnp.vdot(st[1], st[1]) <= atol2_
            new = body(st)
            return jax.tree.map(lambda a, n: jnp.where(done, a, n), st, new)

        state = jax.lax.fori_loop(0, chunk_iters,
                                  lambda i, st: gbody(st), state)
        return state, jnp.vdot(state[1], state[1])

    bn = float(jnp.linalg.norm(b.reshape(-1)))
    atol = tol * max(bn, 1e-300)
    atol2 = jnp.asarray(atol * atol)
    F_use = BF if BF is not None else F32
    state = _start(S, F_use, C, ci, b)
    it_total = 0
    rd = 0
    rn = np.inf
    rn_best = np.inf
    since_best = 0
    while it_total < maxiter:
        state, rn2 = _chunk(S, F_use, C, ci, b, state, atol2)
        rn = float(jnp.sqrt(rn2))
        it_total += chunk_iters
        rd += 1
        if verbose:
            logger.info(f"truth chunk {rd}: |r|/|b| {rn / bn:.2e}")
        if rn <= atol * 1.001:
            break
        if rn < 0.95 * rn_best:
            rn_best, since_best = rn, 0
        else:
            since_best += 1
            if since_best >= 6:
                logger.info("truth_solve: stalled (best |r|/|b| "
                            f"{rn_best / bn:.2e}) — stopping")
                break
    x = state[0]
    jax.block_until_ready(x)
    t_solve = time.perf_counter() - t0
    rel = float(jnp.linalg.norm((b - S.apply(x)).reshape(-1))
                / jnp.maximum(jnp.linalg.norm(b.reshape(-1)), 1e-300))
    info = dict(relres=rel, it32=it_total, rounds=rd,
                it64=it_total, t_assemble=t_asm, t_coarse=t_coarse,
                t_solve=t_solve)
    if verbose:
        logger.info(f"truth_solve: relres {rel:.2e}, f32 its {info['it32']}"
                    f" ({info['rounds']} rounds, f64 polish "
                    f"{info['it64']}), assemble {t_asm:.1f} s, coarse "
                    f"{t_coarse:.1f} s, solve {t_solve:.1f} s")
    if not np.isfinite(rel) or rel > max(1e3 * tol, 1e-6):
        raise RuntimeError(f"truth_solve did not converge: relres {rel}")
    return np.asarray(x, np.float64), info
