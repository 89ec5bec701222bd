"""Affine block operator algebra + solvers.

TPU-native replacement for the pyMOR ``LincombOperator``/``BlockOperator`` over
ISTL matrices and the ISTL iterative solvers consumed by the reference
(SURVEY.md §2.3 "ISTL LA", "ISTL iterative solvers"; the two assembled views
of ``discretize_lhs``, ``discretize_elliptic_block_swipdg.py:439-507``).

Here the *single* source of truth is the affine family

  A(mu) = sum_q theta_q(mu) * [ diag blocks  A_diag[q]  (K, N, N)
                              + couplings    C_*[q]     (E, s, nb, nb) ]

Couplings live only on the interface boundary layer (one triangle row per
side), stored block-diagonal per face — never as N x N matrices.  The
"monolithic" and "block" views of the reference are both trivial reshapes.

Solvers:
* ``dense``  — materialize the global matrix and LU-solve (small problems,
  replaces ISTL ``bicgstab.ilut`` at reference scale).
* ``pcg``    — on-chip preconditioned CG (``lax.while_loop``) with an exact
  block-Jacobi preconditioner (batched Cholesky of the diagonal blocks) —
  the TPU-friendly substitute for ILUT (SURVEY.md §7 hard part 5).  SWIPDG is
  symmetric, so CG applies.
"""
from __future__ import annotations

from dataclasses import dataclass
import numpy as np
import jax
import jax.numpy as jnp

from ..utils.precision import hp

from ..ops.spaces import BlockDGSpace
from ..ops.swipdg import edge_lists, fold_diag


@dataclass(eq=False)   # identity hash/eq: usable as static jit metadata
class BlockOpStatic:
    """Static index metadata shared by all affine components.

    2D grids use the R (x-pairs) and U (y-pairs) coupling families; the 3D
    'hex' family adds the W (z-pairs) family (``near_k``/``far_k``,
    ``side_rows['near'/'far']``).  Interface strips are [E, F, nb, nb] with
    F faces per subdomain interface (s in 2D, s^2 in 3D) — every consumer
    below is shape-generic in F."""
    K: int
    N: int
    s: int
    nb: int
    kx: int
    ky: int
    side_rows: dict            # side -> [F, nb] dof indices (numpy)
    left_k: np.ndarray         # [E_R]
    right_k: np.ndarray
    low_k: np.ndarray          # [E_U]
    up_k: np.ndarray
    kz: int = 1
    near_k: np.ndarray = None  # [E_W] (3D z-pairs; None for 2D)
    far_k: np.ndarray = None

    @staticmethod
    def from_space(space) -> "BlockOpStatic":
        if getattr(space, "dim", 2) == 3:
            return BlockOpStatic.from_space3(space)
        side_rows = {side: space.side_dofs(side).reshape(space.s, space.nb)
                     for side in ("left", "right", "bottom", "top")}
        left_k, right_k, low_k, up_k = edge_lists(space.grid)
        return BlockOpStatic(K=space.K, N=space.N, s=space.s, nb=space.nb,
                             kx=space.grid.kx, ky=space.grid.ky,
                             side_rows=side_rows, left_k=left_k, right_k=right_k,
                             low_k=low_k, up_k=up_k)

    @staticmethod
    def from_space3(space) -> "BlockOpStatic":
        from ..ops.swipdg3d import edge_lists3
        F = space.s * space.s
        side_rows = {side: space.side_dofs(side).reshape(F, space.nb)
                     for side in ("left", "right", "bottom", "top",
                                  "near", "far")}
        xlo, xhi, ylo, yhi, zlo, zhi = edge_lists3(space.grid)
        return BlockOpStatic(K=space.K, N=space.N, s=space.s, nb=space.nb,
                             kx=space.grid.kx, ky=space.grid.ky,
                             kz=space.grid.kz, side_rows=side_rows,
                             left_k=xlo, right_k=xhi, low_k=ylo, up_k=yhi,
                             near_k=zlo, far_k=zhi)


@dataclass
class AffineBlockOp:
    """Affine family of block operators (diag + interface couplings)."""
    static: BlockOpStatic
    A_diag: jnp.ndarray        # [Q, K, N, N]
    C_R_io: jnp.ndarray        # [Q, E_R, F, nb, nb]
    C_R_oi: jnp.ndarray
    C_U_io: jnp.ndarray
    C_U_oi: jnp.ndarray
    C_W_io: jnp.ndarray = None  # [Q, E_W, F, nb, nb] (3D z-pairs; None in 2D)
    C_W_oi: jnp.ndarray = None

    @property
    def Q(self) -> int:
        return self.A_diag.shape[0]

    @staticmethod
    def from_components(space: BlockDGSpace, comps, dtype=jnp.float64) -> "AffineBlockOp":
        st = BlockOpStatic.from_space(space)
        A_diag = jnp.stack([fold_diag(space, c, dtype) for c in comps])
        C_R_io = jnp.stack([c.R_in_out for c in comps])
        C_R_oi = jnp.stack([c.R_out_in for c in comps])
        C_U_io = jnp.stack([c.U_in_out for c in comps])
        C_U_oi = jnp.stack([c.U_out_in for c in comps])
        return AffineBlockOp(st, A_diag, C_R_io, C_R_oi, C_U_io, C_U_oi)

    # ------------------------------------------------------------------
    def assemble(self, theta) -> "AssembledBlockOp":
        """sum_q theta_q * components (<-> ``LincombOperator.assemble``)."""
        theta = jnp.asarray(theta)
        w = (lambda C: None if C is None
             else jnp.einsum("q,qefij->efij", theta, C))
        return AssembledBlockOp(
            static=self.static,
            A_diag=jnp.einsum("q,qkij->kij", theta, self.A_diag),
            C_R_io=w(self.C_R_io), C_R_oi=w(self.C_R_oi),
            C_U_io=w(self.C_U_io), C_U_oi=w(self.C_U_oi),
            C_W_io=w(self.C_W_io), C_W_oi=w(self.C_W_oi),
        )


@dataclass
class AssembledBlockOp:
    static: BlockOpStatic
    A_diag: jnp.ndarray        # [K, N, N]
    C_R_io: jnp.ndarray        # [E_R, F, nb, nb]
    C_R_oi: jnp.ndarray
    C_U_io: jnp.ndarray
    C_U_oi: jnp.ndarray
    C_W_io: jnp.ndarray = None  # [E_W, F, nb, nb] (3D z-pairs; None in 2D)
    C_W_oi: jnp.ndarray = None

    @hp
    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [K, N] (or [..., K, N]) -> A x."""
        from ..ops.pallas_kernels import block_matvec, use_pallas_matvec
        st = self.static
        single = x.ndim == 2
        xb = x[None] if single else x.reshape((-1,) + x.shape[-2:])
        if single and use_pallas_matvec(self.A_diag, x):
            y = block_matvec(self.A_diag, x)[None]
        else:
            y = jnp.einsum("kij,bkj->bki", self.A_diag, xb)

        def couple(y, C, rows_out, rows_in, k_out, k_in):
            if k_out.size == 0:
                return y
            xi = xb[:, k_in][:, :, rows_in]                  # [b, E, s, nb]
            upd = jnp.einsum("efij,befj->befi", C, xi)
            return y.at[:, k_out[:, None, None],
                        rows_out[None, :, :]].add(upd)

        sr = {k: jnp.asarray(v) for k, v in st.side_rows.items()}
        y = couple(y, self.C_R_io, sr["right"], sr["left"], st.left_k, st.right_k)
        y = couple(y, self.C_R_oi, sr["left"], sr["right"], st.right_k, st.left_k)
        y = couple(y, self.C_U_io, sr["top"], sr["bottom"], st.low_k, st.up_k)
        y = couple(y, self.C_U_oi, sr["bottom"], sr["top"], st.up_k, st.low_k)
        if self.C_W_io is not None:
            y = couple(y, self.C_W_io, sr["far"], sr["near"], st.near_k, st.far_k)
            y = couple(y, self.C_W_oi, sr["near"], sr["far"], st.far_k, st.near_k)
        return y[0] if single else y.reshape(x.shape)

    # ------------------------------------------------------------------
    def to_dense(self) -> jnp.ndarray:
        """Global [K*N, K*N] matrix (<-> the monolithic CSR view,
        ``discretize_elliptic_block_swipdg.py:452-471``)."""
        st = self.static
        K, N = st.K, st.N
        G = jnp.zeros((K, K, N, N), self.A_diag.dtype)
        G = G.at[jnp.arange(K), jnp.arange(K)].set(self.A_diag)

        def place(G, C, k_r, k_c, rows, cols):
            if k_r.size == 0:
                return G
            return G.at[k_r[:, None, None, None], k_c[:, None, None, None],
                        rows[None, :, :, None], cols[None, :, None, :]].add(C)

        sr = {k: jnp.asarray(v) for k, v in st.side_rows.items()}
        G = place(G, self.C_R_io, st.left_k, st.right_k, sr["right"], sr["left"])
        G = place(G, self.C_R_oi, st.right_k, st.left_k, sr["left"], sr["right"])
        G = place(G, self.C_U_io, st.low_k, st.up_k, sr["top"], sr["bottom"])
        G = place(G, self.C_U_oi, st.up_k, st.low_k, sr["bottom"], sr["top"])
        if self.C_W_io is not None:
            G = place(G, self.C_W_io, st.near_k, st.far_k, sr["far"], sr["near"])
            G = place(G, self.C_W_oi, st.far_k, st.near_k, sr["near"], sr["far"])
        return G.transpose(0, 2, 1, 3).reshape(K * N, K * N)

    # ------------------------------------------------------------------
    @hp
    def solve_dense(self, b: jnp.ndarray) -> jnp.ndarray:
        """Direct global solve; b [K, N] or [..., K, N] (backend-safe:
        f32 LU + f64 iterative refinement where f64 LU is unavailable)."""
        st = self.static
        G = self.to_dense()
        single = b.ndim == 2
        bb = b.reshape(-1, st.K * st.N)                 # [B, n]
        x = jax.vmap(lambda v: dense_solve_mixed(G, v))(bb)
        return x.reshape((st.K, st.N) if single else b.shape)

    @hp
    def block_jacobi_factors(self):
        """Explicit inverses of the diagonal blocks [K, N, N].

        On TPU a batched dense inverse applied as a matmul keeps the
        preconditioner on the MXU; sequential triangular solves would
        serialize (SURVEY.md §7 hard part 5).

        The blocks are symmetrically Jacobi-scaled before inversion:
        M^-1 = S inv(S A S) S with S = diag(A)^{-1/2}.  Algebraically the
        same matrix, but the scaled inverse survives float32 at high
        coefficient contrast (SPE10: plain f32 inv of cond ~ 1e6 blocks is
        garbage and makes CG diverge).

        On non-CPU backends float64 LU is unavailable, so f64 operators get
        their preconditioner inverted in f32 and cast back — an approximate
        preconditioner changes the iteration count, not the limit."""
        return block_jacobi_factors(self.A_diag)

    def coarse_matrix(self) -> jnp.ndarray:
        """Galerkin coarse matrix on the subdomain-constant space:
        A0[k, k'] = 1_k^T A 1_k'  ([K, K]); the second level of the
        two-level preconditioner (K-independent CG iterations — the
        TPU-friendly substitute for ILUT coarse corrections)."""
        st = self.static
        K = st.K
        A0 = jnp.zeros((K, K), self.A_diag.dtype)
        A0 = A0.at[jnp.arange(K), jnp.arange(K)].set(
            jnp.sum(self.A_diag, axis=(1, 2)))

        def add(A0, C, k_r, k_c):
            if k_r.size == 0:
                return A0
            return A0.at[k_r, k_c].add(jnp.sum(C, axis=(1, 2, 3)))

        A0 = add(A0, self.C_R_io, st.left_k, st.right_k)
        A0 = add(A0, self.C_R_oi, st.right_k, st.left_k)
        A0 = add(A0, self.C_U_io, st.low_k, st.up_k)
        A0 = add(A0, self.C_U_oi, st.up_k, st.low_k)
        if self.C_W_io is not None:
            A0 = add(A0, self.C_W_io, st.near_k, st.far_k)
            A0 = add(A0, self.C_W_oi, st.far_k, st.near_k)
        return A0

    @staticmethod
    def coarse_modes_basis(space, modes: int = 3) -> np.ndarray:
        """Per-subdomain coarse basis [K, N, modes] (nodal interpolants of
        centered-scaled monomials): 1 | x, y | xy, x^2, y^2 (modes <= 6).
        modes=1 reproduces the subdomain-constant space.  On s=1 subdomains
        (too few distinct nodes for independent quadratics) modes is clamped
        to 3 to keep the coarse matrix invertible."""
        K, N = space.K, space.N
        dim = getattr(space, "dim", 2)
        if space.s < 2:
            modes = min(modes, dim + 1)
        # the monomial list is finite: 1 + 5 columns in 2D, 1 + 9 in 3D —
        # clamp instead of IndexError when a caller asks for more (e.g.
        # _mf_solve's coarse_modes default, sized for 'harvested')
        modes = min(modes, 6 if dim == 2 else 10)
        C = np.ones((K, N, modes))
        if modes > 1:
            xn = space.node_coords_phys().reshape(K, N, dim)
            org = space.subdomain_origins
            if dim == 3:
                w = np.array([space.s * space.hx, space.s * space.hy,
                              space.s * space.hz])
            else:
                w = np.array([space.s * space.hx, space.s * space.hy])
            ctr = org + w / 2.0
            Xl = (xn - ctr[:, None, :]) / w
            if dim == 3:
                x, y, z = Xl[..., 0], Xl[..., 1], Xl[..., 2]
                cols = [x, y, z, x * y, x * z, y * z, x * x, y * y, z * z]
            else:
                x, y = Xl[..., 0], Xl[..., 1]
                cols = [x, y, x * y, x * x, y * y]
            for j in range(1, modes):
                C[:, :, j] = cols[j - 1]
        return C

    def geneo_basis(self, M_diag, modes: int = 6) -> np.ndarray:
        """Spectral (GenEO-style) coarse basis of this assembled operator;
        see :func:`geneo_coarse_basis`."""
        return geneo_coarse_basis(self.A_diag, M_diag, modes)

    def coarse_matrix_general(self, C) -> jnp.ndarray:
        """Galerkin coarse matrix on an arbitrary per-subdomain coarse basis
        C [K, N, m]: Ac[(k,i),(k',j)] = C_k[:,i]^T A_{kk'} C_k'[:,j]
        ([K*m, K*m]).  Computed block-sparsely from the diagonal blocks and
        the interface strips — the dense [K*m, K, N] basis embedding the
        naive version materializes is ~4 GB at SPE10 scale (K=256, m=19,
        f64) and would not fit next to the operator."""
        st = self.static
        C = jnp.asarray(C, self.A_diag.dtype)
        K, N, m = C.shape
        diag = jnp.einsum("kni,knl,klj->kij", C, self.A_diag, C)   # [K,m,m]
        Ac = jnp.zeros((K, K, m, m), C.dtype)
        Ac = Ac.at[jnp.arange(K), jnp.arange(K)].set(diag)
        sr = {k: jnp.asarray(v) for k, v in st.side_rows.items()}

        def add(Ac, Cstrip, k_out, k_in, rows_out, rows_in):
            if k_out.size == 0:
                return Ac
            Co = C[k_out][:, rows_out, :]              # [E, s, nb, m]
            Ci = C[k_in][:, rows_in, :]
            blk = jnp.einsum("esai,esab,esbj->eij", Co, Cstrip, Ci)
            return Ac.at[k_out, k_in].add(blk)

        Ac = add(Ac, self.C_R_io, st.left_k, st.right_k, sr["right"], sr["left"])
        Ac = add(Ac, self.C_R_oi, st.right_k, st.left_k, sr["left"], sr["right"])
        Ac = add(Ac, self.C_U_io, st.low_k, st.up_k, sr["top"], sr["bottom"])
        Ac = add(Ac, self.C_U_oi, st.up_k, st.low_k, sr["bottom"], sr["top"])
        if self.C_W_io is not None:
            Ac = add(Ac, self.C_W_io, st.near_k, st.far_k, sr["far"], sr["near"])
            Ac = add(Ac, self.C_W_oi, st.far_k, st.near_k, sr["near"], sr["far"])
        return Ac.transpose(0, 2, 1, 3).reshape(K * m, K * m)

    @hp
    def solve_pcg(self, b: jnp.ndarray, tol: float = 1e-12, maxiter: int = 2000,
                  factors=None, two_level: bool = False,
                  coarse_inv=None, coarse_basis=None,
                  return_iters: bool = False,
                  coarse_f32: bool = False) -> jnp.ndarray:
        """Block-Jacobi preconditioned CG (symmetric SWIPDG); optionally with
        an additive coarse level (``two_level`` builds the subdomain-constant
        one from this operator; ``coarse_inv`` passes a prebuilt inverse —
        [K, K] for constants, or [K*m, K*m] together with ``coarse_basis``
        [K, N, m] for a modal or spectral/GenEO coarse space).

        ``factors`` may be stored in bfloat16: the per-iteration
        preconditioner apply then streams half the HBM bytes (the measured
        online-step bound at bench scale, docs/ARCHITECTURE.md) and the MXU
        accumulates in float32 (``preferred_element_type``) — the
        preconditioner's precision only affects iteration counts."""
        b = b.astype(self.A_diag.dtype)   # keep the while_loop carry uniform
        Ainv = factors if factors is not None else self.block_jacobi_factors()
        if Ainv.dtype != jnp.bfloat16:
            Ainv = Ainv.astype(b.dtype)   # externally-built factors may be wider
        acc = jnp.float32 if b.dtype in (jnp.float32, jnp.bfloat16) else b.dtype

        if two_level and coarse_inv is None:
            coarse_inv = dense_inv_mixed(self.coarse_matrix())
        if coarse_inv is not None:
            # coarse level applied as a dense matmul (a triangular lu_solve
            # per iteration is slow on TPU).  Precision rule: f32 when the
            # operator itself is f32 (the TPU online regime, moderate
            # contrast) but the OPERATOR dtype when wider — at SPE10-scale
            # contrast (~1e6) an f32 coarse apply has no correct digits and
            # makes CG diverge (measured; see prepare_coarse)
            # coarse_f32: with a prepare_coarse-conditioned space the f32
            # apply costs ~3% extra iterations even at contrast 1e6 but
            # avoids the f64-emulated [K*m, K*m] matvec stream on TPU (the
            # measured wall-time bound of the harvested space at SPE10
            # scale: m=19 streams 190 MB/iteration in emulated f64)
            cdt = (jnp.float32 if (self.A_diag.dtype == jnp.float32
                                   or coarse_f32)
                   else self.A_diag.dtype)
            C32 = coarse_inv.astype(cdt)
            if coarse_basis is not None:
                Cb = coarse_basis.astype(cdt)
                K_, _, m_ = Cb.shape

                def M(r):
                    fine = jnp.einsum("knm,km->kn", Ainv, r,
                                      preferred_element_type=acc).astype(r.dtype)
                    rc = jnp.einsum("knm,kn->km", Cb,
                                    r.astype(cdt)).reshape(-1)
                    xc = (C32 @ rc).reshape(K_, m_)
                    return fine + jnp.einsum("knm,km->kn", Cb, xc).astype(r.dtype)
            else:
                def M(r):
                    fine = jnp.einsum("knm,km->kn", Ainv, r,
                                      preferred_element_type=acc).astype(r.dtype)
                    rc = jnp.sum(r, axis=1).astype(cdt)
                    xc = (C32 @ rc).astype(r.dtype)
                    return fine + xc[:, None]
        else:
            def M(r):
                return jnp.einsum("knm,km->kn", Ainv, r,
                                  preferred_element_type=acc).astype(r.dtype)

        from .krylov import pcg_chunked
        x, it = pcg_chunked(self.apply, M, b, tol, maxiter)
        return (x, it) if return_iters else x

    @hp
    def solve_refined(self, b: jnp.ndarray, tol: float = 1e-10,
                      maxiter: int = 400, refinements: int = 3) -> jnp.ndarray:
        """Mixed-precision iterative refinement (SURVEY.md §7 hard part 2):
        inner block-Jacobi PCG in float32 (fast on TPU), residual
        recomputation and solution accumulation in float64.  Each refinement
        recovers ~7 digits, so 2-3 rounds reach ~1e-10 even though the
        Krylov work never leaves f32."""
        st = self.static

        def cast(dt):
            c = (lambda a: None if a is None else a.astype(dt))
            return AssembledBlockOp(st, self.A_diag.astype(dt),
                                    c(self.C_R_io), c(self.C_R_oi),
                                    c(self.C_U_io), c(self.C_U_oi),
                                    c(self.C_W_io), c(self.C_W_oi))

        b64 = b.astype(jnp.float64)
        A32 = cast(jnp.float32)
        factors32 = A32.block_jacobi_factors()
        A64 = cast(jnp.float64)
        x = jnp.zeros_like(b64)
        r = b64
        for _ in range(refinements):
            scale = jnp.maximum(jnp.max(jnp.abs(r)), 1e-300)
            dx32 = A32.solve_pcg((r / scale).astype(jnp.float32),
                                 tol=1e-7, maxiter=maxiter, factors=factors32)
            x = x + scale * dx32.astype(jnp.float64)
            r = b64 - A64.apply(x)
        return x

    def solve(self, b: jnp.ndarray, options: dict | None = None) -> jnp.ndarray:
        options = options or {}
        kind = options.get("type", "auto")
        st = self.static
        if kind == "auto":
            kind = "dense" if st.K * st.N <= 6144 else "pcg"
        if kind in ("dense", "direct"):
            return self.solve_dense(b)
        return self.solve_pcg(b, tol=options.get("precision", 1e-12),
                              maxiter=options.get("max_iter", 2000))


@hp
def block_jacobi_factors(A_diag: jnp.ndarray) -> jnp.ndarray:
    """Jacobi-scaled explicit inverses of diagonal blocks [K, N, N]
    (see :meth:`AssembledBlockOp.block_jacobi_factors`); module-level so
    any block-diagonal stack (e.g. the parabolic M + dt*A blocks) can be
    factorized without constructing an operator."""
    dvec = jnp.abs(jnp.diagonal(A_diag, axis1=-2, axis2=-1))
    s = 1.0 / jnp.sqrt(jnp.maximum(dvec, 1e-300))          # [K, N]
    As = A_diag * s[:, :, None] * s[:, None, :]
    inv_dtype = As.dtype
    if As.dtype == jnp.float64 and jax.default_backend() != "cpu":
        inv_dtype = jnp.float32
    inv_s = jnp.linalg.inv(As.astype(inv_dtype)).astype(As.dtype)
    return inv_s * s[:, :, None] * s[:, None, :]


def dense_inv_mixed(A: jnp.ndarray, newton: int = 2) -> jnp.ndarray:
    """Backend-safe dense inverse (batched): plain inv where f64 LU exists;
    on accelerators without it (TPU) f32 inv + Newton-Schulz refinement
    X <- X (2I - A X), which converges quadratically back to ~f64 accuracy
    for well-conditioned blocks (mass matrices)."""
    if A.dtype != jnp.float64 or jax.default_backend() == "cpu":
        return jnp.linalg.inv(A)
    X = jnp.linalg.inv(A.astype(jnp.float32)).astype(jnp.float64)
    I = jnp.eye(A.shape[-1], dtype=A.dtype)
    for _ in range(newton):
        X = X @ (2.0 * I - A @ X)
    return X


def dense_solve_mixed(A: jnp.ndarray, b: jnp.ndarray, refinements: int = 2):
    """Backend-safe dense solve: plain LU where available; on accelerators
    without f64 LU (TPU), f32 LU + iterative refinement with f64 residuals —
    ~f64 accuracy for well-scaled systems.  Batched/broadcast over leading
    dims of A [..., n, n] and b [..., n] — b is ALWAYS a stack of vectors
    (jnp.linalg.solve would treat any b.ndim > 1 as matrices)."""
    sv = jnp.vectorize(jnp.linalg.solve, signature="(m,m),(m)->(m)")
    if A.dtype != jnp.float64 or jax.default_backend() == "cpu":
        return sv(A, b)
    A32 = A.astype(jnp.float32)
    x = sv(A32, b.astype(jnp.float32)).astype(jnp.float64)
    for _ in range(refinements):
        r = b - jnp.einsum("...ij,...j->...i", A, x)
        x = x + sv(A32, r.astype(jnp.float32)).astype(jnp.float64)
    return x


@dataclass(eq=False)
class AffineBlockApply:
    """Affine-family apply: y = Σ_q θ_q (A_q x) WITHOUT materializing A(θ).

    Per single query this does Q passes over the affine stacks; under an
    outer ``vmap`` over B parameter queries the stacks stream ONCE per CG
    iteration shared across the whole batch — the batched-serving shape,
    where it beats both the assembled-dense apply (vmap would materialize a
    per-query [B, K, N, N]) and the stencil apply (whose ~40 small ops each
    re-stream the [B, K, N] iterate; measured 1.63 ms/iteration at B=256 vs
    the affine form's MXU matmuls [B, N] x [N, N] per (q, k)).  Shares
    ``solve_pcg`` with :class:`AssembledBlockOp` by duck-typing
    (``A_diag`` -> the q-stack, only its dtype is consulted)."""
    static: BlockOpStatic
    A_q: jnp.ndarray           # [Q, K, N, N]
    C_R_io_q: jnp.ndarray      # [Q, E_R, F, nb, nb]
    C_R_oi_q: jnp.ndarray
    C_U_io_q: jnp.ndarray
    C_U_oi_q: jnp.ndarray
    theta: jnp.ndarray         # [Q]
    C_W_io_q: jnp.ndarray = None
    C_W_oi_q: jnp.ndarray = None

    @property
    def A_diag(self):          # duck-typing for the shared solve_pcg
        return self.A_q

    @hp
    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [K, N] (or [..., K, N]) -> A(theta) x, affine-contracted."""
        st = self.static
        single = x.ndim == 2
        xb = x[None] if single else x.reshape((-1,) + x.shape[-2:])
        th = self.theta.astype(xb.dtype)
        yq = jnp.einsum("qkij,bkj->qbki", self.A_q, xb)
        y = jnp.einsum("q,qbki->bki", th, yq)

        def couple(y, Cq, rows_out, rows_in, k_out, k_in):
            if k_out.size == 0:
                return y
            xi = xb[:, k_in][:, :, rows_in]                  # [b, E, s, nb]
            upd = jnp.einsum("q,qefij,befj->befi", th, Cq, xi)
            return y.at[:, k_out[:, None, None],
                        rows_out[None, :, :]].add(upd)

        sr = {k: jnp.asarray(v) for k, v in st.side_rows.items()}
        y = couple(y, self.C_R_io_q, sr["right"], sr["left"], st.left_k, st.right_k)
        y = couple(y, self.C_R_oi_q, sr["left"], sr["right"], st.right_k, st.left_k)
        y = couple(y, self.C_U_io_q, sr["top"], sr["bottom"], st.low_k, st.up_k)
        y = couple(y, self.C_U_oi_q, sr["bottom"], sr["top"], st.up_k, st.low_k)
        if self.C_W_io_q is not None:
            y = couple(y, self.C_W_io_q, sr["far"], sr["near"], st.near_k, st.far_k)
            y = couple(y, self.C_W_oi_q, sr["near"], sr["far"], st.far_k, st.near_k)
        return y[0] if single else y.reshape(x.shape)

    @hp
    def block_jacobi_factors(self):
        """Factors of the theta-contracted diagonal blocks (fallback for
        ``solve_pcg`` without prebuilt ``factors``; production serving passes
        the mu_bar-frozen factors instead so nothing is inverted online)."""
        A_diag = jnp.einsum("q,qkij->kij", self.theta.astype(self.A_q.dtype),
                            self.A_q)
        return block_jacobi_factors(A_diag)

    solve_pcg = AssembledBlockOp.solve_pcg


# pytree registration: operators can be passed straight into jitted
# functions (arrays as leaves, the static metadata as aux), so their tensors
# never end up as HLO constants.
for _cls in (AffineBlockOp, AssembledBlockOp):
    jax.tree_util.register_dataclass(
        _cls,
        data_fields=["A_diag", "C_R_io", "C_R_oi", "C_U_io", "C_U_oi",
                     "C_W_io", "C_W_oi"],
        meta_fields=["static"])
jax.tree_util.register_dataclass(
    AffineBlockApply,
    data_fields=["A_q", "C_R_io_q", "C_R_oi_q", "C_U_io_q", "C_U_oi_q",
                 "theta", "C_W_io_q", "C_W_oi_q"],
    meta_fields=["static"])


def to_scipy_csr(op: AssembledBlockOp):
    """Export the assembled block operator as a scipy CSR matrix without
    materializing the dense global matrix (for CPU baselines / oracles)."""
    import scipy.sparse as sp
    st = op.static
    K, N, s, nb = st.K, st.N, st.s, st.nb
    blocks = [[None] * K for _ in range(K)]
    A_diag = np.asarray(op.A_diag)
    for k in range(K):
        blocks[k][k] = sp.csr_matrix(A_diag[k])

    def place(C, k_r, k_c, rows, cols):
        C = np.asarray(C)
        for e, (kr, kc) in enumerate(zip(k_r, k_c)):
            M = np.zeros((N, N))
            for f in range(rows.shape[0]):
                M[np.ix_(rows[f], cols[f])] += C[e, f]
            B = sp.csr_matrix(M)
            blocks[kr][kc] = B if blocks[kr][kc] is None else blocks[kr][kc] + B

    sr = st.side_rows
    place(op.C_R_io, st.left_k, st.right_k, sr["right"], sr["left"])
    place(op.C_R_oi, st.right_k, st.left_k, sr["left"], sr["right"])
    place(op.C_U_io, st.low_k, st.up_k, sr["top"], sr["bottom"])
    place(op.C_U_oi, st.up_k, st.low_k, sr["bottom"], sr["top"])
    if op.C_W_io is not None:
        place(op.C_W_io, st.near_k, st.far_k, sr["far"], sr["near"])
        place(op.C_W_oi, st.far_k, st.near_k, sr["near"], sr["far"])
    return sp.bmat(blocks, format="csr")


def geneo_coarse_basis(A_neumann, M_diag, modes: int = 6) -> np.ndarray:
    """Per-subdomain spectral (GenEO-style) coarse basis [K, N, modes].

    For every subdomain k the ``modes`` lowest generalized eigenvectors of
    (A^Neu_kk, M_kk) are computed and M-orthonormalized.  ``A_neumann``
    MUST be the subdomain-NEUMANN SWIPDG matrix — volume + intra-subdomain
    face terms only, NO subdomain-boundary penalties (the per-component
    ``SwipdgComponent.A_loc`` summed with theta(mu_bar)): its near-kernel
    (constant + channel/inclusion indicator functions at high coefficient
    contrast) is exactly what block-Jacobi damps slowly and what the modal
    (polynomial) coarse space cannot represent — the property that makes
    two-level Schwarz methods contrast-robust (GenEO, Spillane et al.,
    Numer. Math. 2014).  Using the *assembled* (penalized) diagonal block
    instead selects bubble modes and makes the coarse level useless
    (measured 85 vs 42 iterations on the channels problem).  Offline
    host-side cost: one [N, N] generalized eigsolve per subdomain,
    amortized over every online solve.

    <-> the iteration economy of the reference's ``bicgstab.ilut``
    (``online_adaptive_lrbms.py:71-72``) — replaced by a TPU-friendly coarse
    space instead of an inherently sequential ILU."""
    import scipy.linalg as sla
    A = np.asarray(A_neumann, np.float64)
    M = np.asarray(M_diag, np.float64)
    K, N, _ = A.shape
    m = min(modes, N)
    C = np.zeros((K, N, m))
    for k in range(K):
        Ak = 0.5 * (A[k] + A[k].T)
        Mk = 0.5 * (M[k] + M[k].T)
        _, vecs = sla.eigh(Ak, Mk, subset_by_index=[0, m - 1])
        C[k] = vecs                         # M-orthonormal by construction
    return C


def prepare_coarse(A: "AssembledBlockOp", C):
    """Condition and invert a two-level coarse space for ``solve_pcg``.

    Per-subdomain basis columns are normalized to unit block energy
    (unit-diagonal Galerkin coarse matrix) and the inverse is computed on
    the HOST in float64 with symmetric Jacobi scaling — at SPE10-scale
    contrast (~1e6) the raw coarse matrix has cond ~1e7+ and both an
    unscaled basis and a device f32 inverse make CG diverge (measured:
    modal m=6 at contrast 1e6 fails with the raw path, converges in 154
    iterations with this one).

    Returns ``(C, Ac_inv)`` as device arrays in the operator dtype, ready
    for ``solve_pcg(coarse_basis=C, coarse_inv=Ac_inv)``."""
    C = np.asarray(C, np.float64)
    Ad = np.asarray(A.A_diag, np.float64)
    e = np.einsum("knm,knj,kmj->kj", Ad, C, C)                  # [K, m]
    C = C / np.sqrt(np.maximum(np.abs(e), 1e-300))[:, None, :]
    # one jitted call, operator as pytree argument (remote-compile safe)
    Ac = np.asarray(
        jax.jit(hp(lambda A_, C_: A_.coarse_matrix_general(C_)))(
            A, jnp.asarray(C, A.A_diag.dtype)), np.float64)
    sd = 1.0 / np.sqrt(np.maximum(np.abs(np.diag(Ac)), 1e-300))
    S = 0.5 * (Ac + Ac.T) * sd[:, None] * sd[None, :]
    # SPD-safe pseudo-inverse instead of a plain inv: a (numerically)
    # rank-deficient basis makes the Galerkin matrix indefinite through
    # cancellation — measured on the 3D SPE10 efficiency-study config
    # (65k dofs, (2,8,8) raster): 81 negative eigenvalues down to -0.84
    # AFTER Jacobi scaling, and inv() of that is an indefinite coarse
    # correction that makes the outer CG DIVERGE (|r|/|b| 3.5e+02).
    # Eigen-decompose the scaled matrix and drop non-positive/noise-level
    # modes: the coarse correction stays PSD for ANY basis (degenerate
    # columns simply contribute nothing) and equals inv() to rounding
    # otherwise.  The cutoff must sit at f64-NOISE level, not higher: the
    # genuinely valuable slow-space directions are exactly the SMALL
    # eigenvalues of the scaled Galerkin matrix (that is what makes them
    # slow), and an aggressive relative cutoff guts the preconditioner
    # (measured: a 3e-7 cutoff broke harvested-beats-modal at contrast
    # 1e6).
    w, Q = np.linalg.eigh(S)
    cut = 1e-12 * max(float(w.max()), 1e-300)
    winv = np.where(w > cut, 1.0 / np.maximum(w, cut), 0.0)
    inv = (Q * winv) @ Q.T
    inv = inv * sd[:, None] * sd[None, :]
    return (jnp.asarray(C, A.A_diag.dtype),
            jnp.asarray(inv, np.float64 if A.A_diag.dtype == jnp.float64
                        else np.float32))


def harvested_coarse_basis(A: "AssembledBlockOp", factors, space,
                           n_harvest: int = 16, extra_modal: int = 3,
                           rounds: int = 3, deg: int = 30,
                           interval=None, seed: int = 0) -> np.ndarray:
    """Spectral coarse space harvested from the operator itself
    [K, N, extra_modal + n_harvest].

    Runs a jitted Chebyshev-filtered subspace iteration on the block-Jacobi
    preconditioned operator M^-1 A (``factors`` = the block inverses): the
    filter damps the spectrum on ``interval`` and amplifies the slow tail,
    so after a few rounds the block of vectors spans the SLOW invariant
    subspace — exactly the error components one-level block-Jacobi cannot
    damp.  Splitting those global vectors per subdomain (plus ``extra_modal``
    polynomial modes, per-subdomain QR) yields a coarse space that contains
    the slow space, making the two-level method robust to ARBITRARY
    coefficient structure.  Measured at contrast 1e6 (channels + inclusions,
    8x8 subdomains): block-Jacobi 343 its, modal m=6 154, this space
    (3+16) 79 — and unlike local (GenEO-type) eigenproblems it also sees
    slow modes that are global/smooth, which dominate here
    (tests/test_geneo_bf16.py).

    Offline cost: rounds*deg preconditioned matvecs on n_harvest vectors
    (a single jitted graph per round) + host QRs — amortized over every
    online solve, mu-robust by spectral equivalence.

    <-> replaces the iteration economy of the reference's ILUT
    (``online_adaptive_lrbms.py:71-72``) with a TPU-native mechanism."""
    import jax as _jax

    K, N = space.K, space.N
    if interval is None:
        # the filter interval [a, b] must CONTAIN the spectrum of M^-1 A
        # above a, or the degree-``deg`` Chebyshev AMPLIFIES everything
        # outside it exponentially instead of damping — measured on the 3D
        # SPE10 (2,8,8)-raster 65k config: lambda_max = 2.45 vs the old
        # fixed b = 2.05, amplification ~e^{deg*acosh(1.44)} ~ 1e11, a
        # numerically degenerate basis, and a DIVERGED outer CG.  A short
        # power iteration bounds lambda_max; the damping band keeps the
        # historical a/b ratio (0.25/2.05).
        @_jax.jit
        def _pow(V, Ainv, A_):
            def body(i, carry):
                v, _ = carry
                w = jnp.einsum("knm,km->kn", Ainv, A_.apply(v))
                nrm = jnp.sqrt(jnp.sum(w * w))
                return (w / jnp.maximum(nrm, 1e-300), nrm)
            return _jax.lax.fori_loop(0, 30, body, (V, jnp.array(0.0, V.dtype)))
        rng0 = np.random.default_rng(seed + 1)
        v0 = jnp.asarray(rng0.normal(size=(K, N)), A.A_diag.dtype)
        _, lam = _pow(v0, jnp.asarray(factors, A.A_diag.dtype), A)
        # 1.15 margin: a 30-step power iteration can undershoot lambda_max
        # by >5% when the top spectrum is clustered, and any mode above the
        # band is amplified ~e^{deg*acosh(1+2(lam-b)/(b-a))} by the filter —
        # the same degenerate-basis failure the adaptive interval fixes
        bnd = 1.15 * float(lam)
        interval = ((0.25 / 2.05) * bnd, bnd)
    a, bnd = interval
    e = (bnd + a) / 2.0
    c = (bnd - a) / 2.0

    @_jax.jit
    def filt(V, Ainv, A_, e_, c_):
        # A_ rides in as a pytree ARGUMENT — closure capture would embed
        # the operator tensors as HLO constants (breaks remote compilation
        # at SPE10 scale: HTTP 413 request-size limit); e_/c_ are traced
        # scalars so the widened-band refilter reuses the same executable
        def pa(X):
            return jnp.einsum("knm,vkm->vkn", Ainv, A_.apply(X))

        Y = (pa(V) - e_ * V) / c_

        def body(i, carry):
            Vm1, Vc = carry
            return (Vc, 2.0 * (pa(Vc) - e_ * Vc) / c_ - Vm1)

        _, Vc = _jax.lax.fori_loop(0, deg - 1, body, (V, Y))
        return Vc

    rng = np.random.default_rng(seed)
    V = jnp.asarray(rng.normal(size=(n_harvest, K, N)), A.A_diag.dtype)
    Ainv = jnp.asarray(factors, A.A_diag.dtype)
    dt_ = A.A_diag.dtype
    ec = (jnp.asarray(e, dt_), jnp.asarray(c, dt_))
    for _ in range(rounds):
        V = filt(V, Ainv, A, *ec)
        Vh = np.asarray(V, np.float64)
        if not np.isfinite(Vh).all():
            # residual spectrum above the band overwhelmed the filter
            # (undershot lambda_max estimate) — widen once and refilter
            # from fresh noise rather than QR-ing inf/nan garbage
            ec = (ec[0] + ec[1], 2.0 * ec[1])    # band -> [a, 2*bnd - a]
            Vh = np.asarray(
                filt(jnp.asarray(rng.normal(size=(n_harvest, K, N)), dt_),
                     Ainv, A, *ec), np.float64)
            if not np.isfinite(Vh).all():
                raise FloatingPointError(
                    "harvested coarse filter overflow even after widening "
                    "the Chebyshev band — lambda_max estimate unreliable")
        Q, _ = np.linalg.qr(Vh.reshape(n_harvest, -1).T)
        V = jnp.asarray(Q.T.reshape(n_harvest, K, N), dt_)
    cols = [np.moveaxis(np.asarray(V, np.float64), 0, -1)]       # [K, N, nh]
    if extra_modal:
        cols.insert(0, AssembledBlockOp.coarse_modes_basis(space, extra_modal))
    C = np.concatenate(cols, axis=-1)
    return np.stack([np.linalg.qr(C[k])[0] for k in range(K)])


def neumann_blocks(d, theta_bar) -> np.ndarray:
    """[K, N, N] subdomain-Neumann SWIPDG matrix at theta_bar (the GenEO
    eigenproblem's A): sum_q theta_bar_q * components[q].A_loc — volume +
    intra-subdomain faces, no subdomain-boundary penalties."""
    th = np.asarray(theta_bar, np.float64)
    return sum(float(t) * np.asarray(c.A_loc, np.float64)
               for t, c in zip(th, d.components))


def unblock(x: jnp.ndarray) -> jnp.ndarray:
    """[..., K, N] -> [..., K*N] (<-> ``pymor.algorithms.system.unblock``)."""
    return x.reshape(x.shape[:-2] + (-1,))


def reblock(x: jnp.ndarray, K: int, N: int) -> jnp.ndarray:
    return x.reshape(x.shape[:-1] + (K, N))
