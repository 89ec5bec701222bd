"""Mixed-precision iterative refinement for the matrix-free Krylov solves.

SURVEY.md §7 hard part 2 prescribes "mixed-precision Krylov with f64 residual
recomputation" for the at-scale solves.  On TPU float64 is software-emulated
(double-word f32 arithmetic): an f64 stencil matvec costs ~an order of
magnitude more FLOPs and 2x the HBM bytes of the native-f32 one, and at the
131k-dof 3D config the emulated matvec is the measured wall-clock bound of
both the implicit-Euler trajectory and the batched-mu parabolic sweep
(docs/results/spe10_3d_parabolic_tpu.txt).

The round-2 attempt (f32 inner Krylov, f64 residual restarts, NO scaling)
stalled past coefficient contrast ~1e4: with SPE10-grade jumps the f32
representation noise of the operator entries is ~eps_f32 * |A| and the
low-permeability dof components drown in roundoff from the high-permeability
rows.  The fix implemented here is the textbook one (Carson & Higham,
SIAM J. Sci. Comput. 2018: LU-IR/GMRES-IR convergence is governed by the
condition of the SCALED system): run the inner f32 PCG on the symmetrically
Jacobi-scaled operator

    A~ = S A S,   S = diag(diag(A))^(-1/2)

whose entries are O(1)-balanced, so f32 roundoff is RELATIVE per dof instead
of absolute at the contrast scale.  No scaled operator is materialized: with
``s = diag(A)^(-1/2)`` the scaled matvec is ``v -> s * A32(s * v)`` (the row
scaling divides the large-row noise back down, giving exactly the scaled
operator's |A~|-relative error bound), and the existing preconditioner
(f32 block-Jacobi + conditioned coarse) is conjugated: ``r -> (1/s) M((1/s) r)``.

Outer loop (all inside jit, ``lax.while_loop``):

    r = b - A64 x                      # ONE emulated-f64 matvec per round
    dx~ = f32-PCG(A~, S r / ||.||inf)  # native-speed Krylov
    x += ||.||inf * S dx~
    stop on tol, round budget, or stall (residual not halved)

followed by an optional f64 PCG polish from the accumulated x — it exits
after its initial residual check when IR already converged, and guarantees
the f64-grade result when the f32 inner solve cannot contract (extreme
conditioning), making the mixed path SAFE AT ANY CONTRAST: worst case is a
few wasted f64 matvecs, never a wrong or stalled solve.

The reference's solver regime this replaces: per-parameter ISTL
BiCGStab+ILUT at precision 1e-10 on CPU f64
(/root/reference/python/scripts/online_adaptive_lrbms.py:71-72,
mpi_elliptic.py:51-52).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.precision import hp


def pcg(matvec, M, b, tol, maxiter, x0=None):
    """Generic preconditioned CG (dtype follows ``b``); returns (x, iters).

    Same recurrence/stopping convention as ``AssembledStencil.solve_pcg``:
    exit when ||r||_2 <= tol * ||b||_2 or at ``maxiter``.  Control flow is
    the CHUNKED form (la/krylov.py): fixed-trip inner chunks with
    select-frozen state — the measured while-loop control round (~0.8 ms/
    iteration on the remote v5e) is paid once per chunk, not per iteration.
    """
    from ..la.krylov import pcg_chunked
    return pcg_chunked(matvec, M, b, tol, maxiter, x0=x0)


def make_precond_f32(block_factors=None, factors=None, cell_shape=None,
                     coarse_inv=None, coarse_basis=None):
    """f32 preconditioner closure [K, N] -> [K, N] for the inner IR solve.

    Mirrors the preconditioner assembly of ``AssembledStencil.solve_pcg``
    (subdomain block-Jacobi [K, N, N] or per-cell factors reshaped via
    ``cell_shape``, plus the additive conditioned coarse level) with every
    tensor cast to f32 once at trace time.
    """
    f32 = jnp.float32
    if block_factors is not None:
        Binv = (block_factors if block_factors.dtype == jnp.bfloat16
                else block_factors.astype(f32))

        def M_fine(r):
            return jnp.einsum("knm,km->kn", Binv, r,
                              preferred_element_type=f32).astype(f32)
    elif factors is not None:
        Minv = factors.astype(f32)

        def M_fine(r):
            rc = r.reshape(cell_shape)
            z = jnp.einsum("...ij,...j->...i", Minv, rc)
            return z.reshape(r.shape)
    else:
        def M_fine(r):
            return r

    if coarse_inv is None:
        return M_fine
    C32 = coarse_inv.astype(f32)
    if coarse_basis is not None:
        Cb = coarse_basis.astype(f32)
        Kc, _, mc = Cb.shape

        def M(r):
            rc = jnp.einsum("knm,kn->km", Cb, r).reshape(-1)
            xc = (C32 @ rc).reshape(Kc, mc)
            return M_fine(r) + jnp.einsum("knm,km->kn", Cb, xc)
    else:
        def M(r):
            rc = jnp.sum(r, axis=1)
            xc = C32 @ rc
            return M_fine(r) + xc[:, None]
    return M


@hp
def solve_ir(A64, A32, b, diag, *, tol=1e-10, maxiter=2000,
             block_factors=None, factors=None, cell_shape=None,
             coarse_inv=None, coarse_basis=None, x0=None,
             inner_tol=1e-4, inner_maxiter=300, max_rounds=20,
             stall_factor=0.5, fallback=True, return_info=False):
    """Solve ``A64 x = b`` to f64 accuracy with f32 Krylov work.

    ``A64`` / ``A32`` are assembled stencil operators (any object with a
    matrix-free ``.apply``; ``A32`` is the f32 tree-cast of ``A64``), ``diag``
    is the f64 diagonal of A(theta) as [K, N] (exactness is not required —
    any positive spectrally-close diagonal gives a consistent scaling).

    Stops on ``||b - A x||_2 <= tol ||b||_2``, a round budget, or stall
    (a round failing to cut the residual by ``stall_factor``); ``fallback``
    then runs the emulated-f64 PCG from the accumulated iterate so the
    result meets ``tol`` regardless of how far the f32 inner could contract.
    Returns ``x`` (or ``(x, f32_iters, rounds, fallback_iters)``).
    """
    f32, f64 = jnp.float32, b.dtype
    s64 = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(diag), 1e-300))
    s32 = s64.astype(f32)
    si32 = (1.0 / s64).astype(f32)

    Mf = make_precond_f32(block_factors=block_factors, factors=factors,
                          cell_shape=cell_shape, coarse_inv=coarse_inv,
                          coarse_basis=coarse_basis)

    def matvec32(v):
        return s32 * A32.apply(s32 * v)

    def M32(r):
        return si32 * Mf(si32 * r)

    def dot(u, v):
        return jnp.vdot(u, v)

    bn2 = dot(b, b)
    atol2 = (tol ** 2) * jnp.maximum(bn2, 1e-300)

    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - A64.apply(x0)
    rn0 = dot(r0, r0)
    # (x, r, ||r||^2, f32 iters, rounds, making_progress)
    state = (x0, r0, rn0, 0, 0, jnp.asarray(True))

    def cond(st):
        x, r, rn2, it, rd, ok = st
        return jnp.logical_and(jnp.logical_and(rn2 > atol2, rd < max_rounds),
                               ok)

    def body(st):
        x, r, rn2, it, rd, ok = st
        rt = s64 * r
        nrm = jnp.maximum(jnp.max(jnp.abs(rt)), 1e-300)
        rt32 = (rt / nrm).astype(f32)
        dxt, k = pcg(matvec32, M32, rt32, inner_tol, inner_maxiter)
        x = x + nrm * s64 * dxt.astype(f64)
        r = b - A64.apply(x)                # the round's ONE f64 matvec
        rn2_new = dot(r, r)
        ok = rn2_new <= (stall_factor ** 2) * rn2
        return (x, r, rn2_new, it + k, rd + 1, ok)

    x, r, rn2, it32, rounds, _ = jax.lax.while_loop(cond, body, state)

    it64 = jnp.asarray(0)
    if fallback:
        # correctness anchor: finishes the solve in emulated f64 when IR
        # could not contract.  Gated behind lax.cond on the ALREADY-KNOWN
        # f64 residual norm — when IR converged (the common case) the
        # polish branch is never executed, saving its entry f64 matvec +
        # preconditioner apply per solve (measured ~2 ms/step of the 24k
        # parabolic trajectory).
        def matvec64(v):
            return A64.apply(v)

        def M64(rr):
            # UNSCALED-space preconditioner (Mf, not the conjugated M32:
            # the fallback Krylov runs on A, not on S A S)
            return Mf(rr.astype(f32)).astype(f64)

        def polish(xv):
            x2, it2 = pcg(matvec64, M64, b, tol, maxiter, x0=xv)
            return x2, it2.astype(jnp.int32)

        x, it64 = jax.lax.cond(rn2 > atol2, polish,
                               lambda xv: (xv, jnp.zeros((), jnp.int32)), x)
    if return_info:
        return x, it32, rounds, it64
    return x


def cast_f32(op):
    """f32 tree-cast of an assembled stencil / operator pytree (leaves cast,
    static aux like the space preserved by the dataclass registration)."""
    return jax.tree.map(lambda a: a.astype(jnp.float32), op)


def diag_of_blocks(A_diag_q):
    """[Q, K, N, N] affine diagonal-block stacks -> [Q, K, N] diagonals
    (combine with theta via ``einsum('q,qkn->kn', theta, diag_q)``)."""
    return jnp.diagonal(A_diag_q, axis1=-2, axis2=-1)
