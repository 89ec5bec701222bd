"""Halo-dense (bordered-block) operator form: a few static slab shifts + ONE
batched MXU matmul per matrix-free apply.

Motivation (measured on v5e, 24 576-dof SPE10 config, round 5): the f32
Krylov iteration body is OP-OVERHEAD bound, not bandwidth bound —
the fused stencil apply costs ~0.2 ms across ~40 small ops whose
[.., nb=3] last-dim layout wastes ~98% of each (8, 128) TPU tile, and the
assembled dense-block apply costs ~0.24 ms because its 4 interface-coupling
updates are SCATTER-adds (slow on TPU).  A flat-index gather variant was
measured WORSE (0.44 ms — TPU general gathers walk element-by-element).
This form removes all three costs:

    y[k] = B[k] @ xh[k]

where B[k] = [A_kk | C_(k,nbr_1) | ... ] is the subdomain's block row
including its interface-coupling columns, and the halo vector xh[k] =
[x[k], strip(nbr_1), ...] is built by STATIC reshape-shifts over the
regular (kz, ky, kx) subdomain lattice (the same shifted-slab trick the
stencil apply uses, but at subdomain granularity: one take + one pad-shift
per coupling family).  Nh is padded to a lane multiple (128) so the matmul
tiles perfectly onto the MXU.

Cost model: streams K*N*Nh coefficients per apply — ~1.3x the dense-block
bytes in 2D (Nh = N + 4 s nb).  The win regime is the mid-scale f32 inner
loop (iterative-refinement inner solves, ops/ir.py), where the
overhead-bound stencil/dense forms leave ~4-8x on the table; at 3D scale
the stencil form's byte advantage wins again — the solver keeps both and
picks per config.

<-> replaces the apply economics of the reference's ISTL CSR matvec
(``threadpool_test.py:27-40``) with the TPU-native layout.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.precision import hp


@dataclass(eq=False)
class HaloPlan:
    """Static halo layout for a block lattice (cached per static)."""
    K: int
    N: int
    Nh: int
    kx: int
    ky: int
    kz: int
    # per coupling family:
    # (name, k_out [E], rows_out [F, nb], col0, rows_in_flat [strip],
    #  axis 0/1/2 = x/y/z, d +1 take-from-next / -1 take-from-prev)
    fams: tuple
    strip: int


def make_halo_plan(static) -> HaloPlan:
    K, N, nb = static.K, static.N, static.nb
    sr = {k: np.asarray(v) for k, v in static.side_rows.items()}
    F = next(iter(sr.values())).shape[0]              # s (2D) or s^2 (3D)
    strip = F * nb
    # (name, rows_out(of k_out), rows_in(of k_in), k_out, axis, d):
    # d = +1: k_out receives from its NEXT neighbor along `axis`
    fams_def = [
        ("C_R_io", sr["right"], sr["left"], static.left_k, 0, +1),
        ("C_R_oi", sr["left"], sr["right"], static.right_k, 0, -1),
        ("C_U_io", sr["top"], sr["bottom"], static.low_k, 1, +1),
        ("C_U_oi", sr["bottom"], sr["top"], static.up_k, 1, -1),
    ]
    if static.near_k is not None:
        fams_def += [
            ("C_W_io", sr["far"], sr["near"], static.near_k, 2, +1),
            ("C_W_oi", sr["near"], sr["far"], static.far_k, 2, -1),
        ]
    n_fam = len(fams_def)
    Nh = -(-(N + n_fam * strip) // 128) * 128
    fams = []
    for slot, (name, rows_out, rows_in, k_out, axis, d) in \
            enumerate(fams_def):
        col0 = N + slot * strip
        fams.append((name, np.asarray(k_out, np.int64), rows_out, col0,
                     rows_in.reshape(-1).astype(np.int32), axis, d))
    return HaloPlan(K=K, N=N, Nh=Nh, kx=static.kx, ky=static.ky,
                    kz=static.kz, fams=tuple(fams), strip=strip)


import weakref

_PLAN_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def halo_plan_for(static) -> HaloPlan:
    plan = _PLAN_CACHE.get(static)
    if plan is None:
        plan = _PLAN_CACHE[static] = make_halo_plan(static)
    return plan


@dataclass(eq=False)
class HaloDenseOp:
    """y = A x as static slab shifts + one batched matmul (module
    docstring).  Duck-types what ``solve_pcg`` (la/block.py) and
    ``solve_ir`` (ops/ir.py) consume: ``.apply``,
    ``.block_jacobi_factors``, ``A_diag`` (dtype probe)."""
    plan: HaloPlan
    B: jnp.ndarray           # [K, N, Nh]

    @property
    def A_diag(self):
        return self.B

    @hp
    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [..., K, N] -> A x."""
        p = self.plan
        lead = x.shape[:-2]
        lat = (p.kz, p.ky, p.kx)
        parts = [x]
        for name, k_out, rows_out, col0, rows_in, axis, d in p.fams:
            side = jnp.take(x, jnp.asarray(rows_in), axis=-1)  # [...,K,strip]
            g = side.reshape(lead + lat + (p.strip,))
            ax = {0: -2, 1: -3, 2: -4}[axis]          # lattice axis in g
            pad = [(0, 0)] * g.ndim
            if d == +1:       # k receives from its next neighbor
                sl = [slice(None)] * g.ndim
                sl[ax] = slice(1, None)
                pad[ax] = (0, 1)
            else:             # k receives from its previous neighbor
                sl = [slice(None)] * g.ndim
                sl[ax] = slice(None, -1)
                pad[ax] = (1, 0)
            shifted = jnp.pad(g[tuple(sl)], pad)
            parts.append(shifted.reshape(lead + (p.K, p.strip)))
        xh = jnp.concatenate(parts, axis=-1)
        if xh.shape[-1] < p.Nh:
            padw = [(0, 0)] * xh.ndim
            padw[-1] = (0, p.Nh - xh.shape[-1])
            xh = jnp.pad(xh, padw)
        acc = (jnp.float32 if self.B.dtype in (jnp.float32, jnp.bfloat16)
               else self.B.dtype)
        return jnp.einsum("kij,...kj->...ki", self.B, xh,
                          preferred_element_type=acc).astype(x.dtype)

    @hp
    def block_jacobi_factors(self) -> jnp.ndarray:
        from ..la.block import block_jacobi_factors
        return block_jacobi_factors(self.B[:, :, :self.plan.N])

    # shared Krylov driver (duck-typed like AffineBlockApply)
    def solve_pcg(self, *a, **kw):
        from ..la.block import AssembledBlockOp
        return AssembledBlockOp.solve_pcg(self, *a, **kw)


def halo_from_assembled(op, dtype=None) -> HaloDenseOp:
    """Build the halo-dense form of an :class:`AssembledBlockOp` — jittable
    (static scatter indices; a handful of scatter ops at ASSEMBLE time buy a
    scatter-free apply for every Krylov iteration)."""
    plan = halo_plan_for(op.static)
    K, N, Nh, nb = plan.K, plan.N, plan.Nh, op.static.nb
    dt_ = dtype or op.A_diag.dtype
    B = jnp.zeros((K, N, Nh), dt_)
    B = B.at[:, :, :N].set(op.A_diag.astype(dt_))
    for name, k_out, rows_out, col0, rows_in, axis, d in plan.fams:
        C = getattr(op, name)
        if C is None or k_out.size == 0:
            continue
        E = k_out.shape[0]
        F = rows_out.shape[0]
        # target (k_out[e], rows_out[f, i], col0 + f*nb + j)
        rows = np.broadcast_to(rows_out[None, :, :, None], (E, F, nb, nb))
        cols = col0 + (np.arange(F)[None, :, None, None] * nb
                       + np.arange(nb)[None, None, None, :])
        cols = np.broadcast_to(cols, (E, F, nb, nb))
        ks = np.broadcast_to(k_out[:, None, None, None], (E, F, nb, nb))
        B = B.at[jnp.asarray(ks), jnp.asarray(rows),
                 jnp.asarray(cols)].add(C.astype(dt_))
    return HaloDenseOp(plan=plan, B=B)


jax.tree_util.register_dataclass(
    HaloDenseOp, data_fields=["B"], meta_fields=["plan"])
