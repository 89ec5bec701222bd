"""Two-level preconditioner upgrades (VERDICT round-1 items 4 + 7):

* Spectral coarse spaces for high contrast: 'harvested' (Chebyshev-filtered
  slow modes of the block-Jacobi-preconditioned operator, split per
  subdomain) must beat the modal (polynomial) coarse space at SPE10-scale
  contrast (~1e6) — this replaces the iteration economy of the reference's
  ``bicgstab.ilut`` (``online_adaptive_lrbms.py:71-72``) with a TPU-native
  mechanism.  'geneo' (local generalized eigenmodes of the subdomain-Neumann
  matrix) is validated for correctness; measured it does NOT beat modal here
  because the slow modes of non-overlapping block-Jacobi are global/smooth
  (see la/block.py harvested_coarse_basis docstring).
* prepare_coarse conditioning: at contrast 1e6 the raw coarse path (f32
  apply, unnormalized basis) diverges; the conditioned one converges.
* bfloat16-stored block-Jacobi factors: halved preconditioner HBM stream
  with an iteration-count cost bounded at 10%.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pylrbms_tpu.problems.non_parametric import init_grid_and_problem
from pylrbms_tpu.functions import ScalarFunction
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.la.block import prepare_coarse, harvested_coarse_basis, \
    geneo_coarse_basis, neumann_blocks, AssembledBlockOp

CONTRAST = 1e6


def _lam(x):
    xx, y = x[..., 0], x[..., 1]
    ch = ((jnp.abs(y - 0.31 - 0.2 * jnp.sin(2 * xx)) < 0.07)
          | (jnp.abs(y + 0.42 + 0.15 * jnp.cos(3 * xx)) < 0.06)
          | (jnp.abs(xx - 0.1 + 0.3 * jnp.sin(2 * y)) < 0.05))
    blob = (((xx - 0.6) ** 2 + (y - 0.6) ** 2 < 0.04)
            | ((xx + 0.55) ** 2 + (y + 0.1) ** 2 < 0.03))
    return jnp.where(ch | blob, CONTRAST,
                     jnp.where((xx * y) > 0.3, 1e3, 1.0))


@pytest.fixture(scope="module")
def hc_model():
    """Non-parametric high-contrast channels+inclusions model, 8x8
    subdomains, 6144 dofs — a small SPE10 proxy."""
    gpd = init_grid_and_problem({
        'num_subdomains': [8, 8],
        'half_num_fine_elements_per_subdomain_and_dim': 1,
        'num_refinements': 2})
    lam = ScalarFunction(_lam, "hc")
    gpd['lambda'] = lam
    gpd['lambda_bar'] = lam
    gpd['lambda_hat'] = lam
    d, _ = discretize(gpd)
    return d


def _pcg(A, b, C=None, ci=None, tol=1e-9, **kw):
    x, it = A.solve_pcg(b, tol=tol, maxiter=8000, coarse_basis=C,
                        coarse_inv=ci, return_iters=True, **kw)
    res = float(jnp.linalg.norm((b - A.apply(x)).reshape(-1))
                / jnp.linalg.norm(b.reshape(-1)))
    return int(it), res, x


def test_harvested_beats_modal_at_high_contrast(hc_model):
    d = hc_model
    A = d.assemble({})
    b = d.rhs({})
    bf = A.block_jacobi_factors()

    it_bj, res_bj, _ = _pcg(A, b)
    C_modal, ci_modal = prepare_coarse(
        A, AssembledBlockOp.coarse_modes_basis(d.space, 6))
    it_modal, res_modal, x_modal = _pcg(A, b, C_modal, ci_modal)

    C_np = harvested_coarse_basis(A, bf, d.space, n_harvest=16, extra_modal=3)
    C_h, ci_h = prepare_coarse(A, C_np)
    it_h, res_h, x_h = _pcg(A, b, C_h, ci_h)

    assert res_bj < 1e-8 and res_modal < 1e-8 and res_h < 1e-8
    np.testing.assert_allclose(np.asarray(x_h), np.asarray(x_modal),
                               rtol=1e-5, atol=1e-9)
    assert it_modal < it_bj                      # two-level helps at all
    # the harvested space must clearly beat the polynomial one
    assert it_h <= 0.7 * it_modal, (it_h, it_modal, it_bj)


def test_geneo_basis_valid_coarse_space(hc_model):
    """GenEO (subdomain-Neumann eigenmodes) is a *correct* conditioned
    coarse space: CG converges to the same solution.  Measured it does NOT
    pay off for non-overlapping block-Jacobi (the slow modes are global, a
    local eigenproblem cannot see them; an additive coarse level with
    unhelpful modes even raises lambda_max) — which is exactly why
    'harvested' is the supported high-contrast option."""
    d = hc_model
    A = d.assemble({})
    b = d.rhs({})
    _, _, x_bj = _pcg(A, b)
    C_np = geneo_coarse_basis(neumann_blocks(d, d.theta({})),
                              d.products["l2"], 6)
    C, ci = prepare_coarse(A, C_np)
    it_g, res_g, x_g = _pcg(A, b, C, ci)
    assert res_g < 1e-8
    np.testing.assert_allclose(np.asarray(x_g), np.asarray(x_bj),
                               rtol=1e-5, atol=1e-9)


def test_bf16_jacobi_iteration_cost_bounded():
    """At bench-like (moderate) contrast, bf16-stored factors cost <10%
    iterations — the regime where the online step is HBM-bound and the
    halved stream pays.  (At contrast 1e6 the cost grows to ~30%, which is
    why the SPE10 matrix-free path keeps f32 factors and jacobi_storage
    only applies to make_online_step.)"""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    gpd = os2015({'num_subdomains': [4, 4],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 2})
    d, _ = discretize(gpd)
    mu = d.parse_parameter(0.4)
    A = d.assemble(mu)
    b = d.rhs(mu)
    f64 = A.block_jacobi_factors()
    it0, res0, _ = _pcg(A, b, tol=1e-8, factors=f64)
    itb, resb, _ = _pcg(A, b, tol=1e-8, factors=f64.astype(jnp.bfloat16))
    assert res0 < 1e-7 and resb < 1e-7
    assert itb <= 1.10 * max(it0, 1), (itb, it0)


@pytest.mark.slow
def test_online_step_harvested_and_bf16_options():
    """make_online_step with coarse_space='harvested' + bf16 factors returns
    the same solution/indicators as the default path (moderate-contrast
    parametric problem)."""
    from pylrbms_tpu.problems.artificial_channels import init_grid_and_problem as channels
    from pylrbms_tpu.model import make_online_step
    gpd = channels({'num_subdomains': [4, 4],
                    'half_num_fine_elements_per_subdomain_and_dim': 1,
                    'num_refinements': 1})
    d, _ = discretize(gpd)
    mu = d.parse_parameter({'switch': 0.01, '_t': 0.0})
    theta = d.theta(mu)
    theta_f = d.theta_f(mu)
    base = make_online_step(d, tol=1e-8, maxiter=2000, matrix_free=False)
    harv = make_online_step(d, tol=1e-8, maxiter=2000, matrix_free=False,
                            coarse_space="harvested", coarse_modes=8,
                            jacobi_storage="bf16")
    U0, ind0 = base(theta, theta_f, mu)
    U1, ind1 = harv(theta, theta_f, mu)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U0),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ind1), np.asarray(ind0),
                               rtol=1e-4, atol=1e-10)


def test_batched_online_step_matches_singles():
    """B parameter queries in ONE dispatch (vmapped step) == B single
    dispatches (VERDICT round-1 item 6)."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    from pylrbms_tpu.model import make_online_step
    gpd = os2015({'num_subdomains': [4, 4],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 1})
    d, _ = discretize(gpd)
    fn = make_online_step(d, tol=1e-9, maxiter=500)
    mus = [0.15, 0.4, 0.85]
    singles = [fn(jnp.asarray([1.0, m]), jnp.asarray([1.0]),
                  {"diffusion": jnp.asarray([m])}) for m in mus]
    Ub, indb = fn(jnp.asarray([[1.0, m] for m in mus]),
                  jnp.asarray([[1.0]] * len(mus)),
                  {"diffusion": jnp.asarray([[m] for m in mus])})
    for i, (U, ind) in enumerate(singles):
        # lock-step batched CG keeps iterating the already-converged
        # queries until the slowest converges -> tiny extra refinement
        np.testing.assert_allclose(np.asarray(Ub[i]), np.asarray(U),
                                   rtol=1e-7, atol=1e-11)
        np.testing.assert_allclose(np.asarray(indb[i]), np.asarray(ind),
                                   rtol=1e-6, atol=1e-13)


def test_mf_solve_harvested_matches_dense():
    """The matrix-free FOM path with the frozen harvested preconditioner
    reproduces the dense solve."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    gpd = os2015({'num_subdomains': [2, 2],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 2})
    d, _ = discretize(gpd)
    mu = d.parse_parameter(0.7)
    U_dense = d.solve(mu, inverse_options={"type": "dense"})
    U_mf = d.solve(mu, inverse_options={
        "type": "mf_pcg", "precision": 1e-11, "coarse_space": "harvested",
        "coarse_modes": 4})
    np.testing.assert_allclose(np.asarray(U_mf), np.asarray(U_dense),
                               rtol=1e-7, atol=1e-10)
    # second mu reuses the frozen preconditioner and still converges
    mu2 = d.parse_parameter(0.2)
    U2 = d.solve(mu2, inverse_options={
        "type": "mf_pcg", "precision": 1e-11, "coarse_space": "harvested",
        "coarse_modes": 4})
    U2_dense = d.solve(mu2, inverse_options={"type": "dense"})
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U2_dense),
                               rtol=1e-7, atol=1e-10)


def test_mixed_refinement_matches_dense_and_guards_contrast(hc_model):
    """Mixed-precision matrix-free refinement (f32 Krylov + f64 residual
    recomputation): matches the dense solve at moderate contrast; the auto
    default keeps emulated-f64 Krylov at extreme contrast where the f32
    matvec noise floor (~eps_f32 * contrast) blocks convergence."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    gpd = os2015({'num_subdomains': [4, 4],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 2})
    d, _ = discretize(gpd)
    mu = d.parse_parameter(0.6)
    U_ref = d.solve(mu, inverse_options={"type": "dense"})
    U_mx, it = d._mf_solve(d.theta(mu), d.rhs(mu),
                           {"precision": 1e-10, "mixed": True,
                            "coarse_modes": 4, "return_iters": True})
    err = float(jnp.abs(U_mx - U_ref).max() / jnp.abs(U_ref).max())
    assert err < 1e-8, err
    # auto-mixed must stay OFF at SPE10-scale contrast: the diagonal-span
    # estimate the auto default uses must classify this as high contrast
    hc = hc_model
    dvec = np.abs(np.asarray(jnp.diagonal(hc.op.A_diag[0],
                                          axis1=-2, axis2=-1)))
    assert float(dvec.max() / dvec.min()) > 1e4
    # ... and classify the moderate-contrast OS2015 operator as mixable
    dvec2 = np.abs(np.asarray(jnp.diagonal(d.op.A_diag[0],
                                           axis1=-2, axis2=-1)))
    assert float(dvec2.max() / dvec2.min()) < 1e4


def test_batched_online_step_matrix_free_matches_singles():
    """The bench's exact serving path: batched-mu + matrix-free stencil +
    fixed two-level preconditioner, equal to single dispatches."""
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem as os2015
    from pylrbms_tpu.model import make_online_step
    gpd = os2015({'num_subdomains': [4, 4],
                  'half_num_fine_elements_per_subdomain_and_dim': 1,
                  'num_refinements': 1})
    d, _ = discretize(gpd)
    fn = make_online_step(d, tol=1e-9, maxiter=500, matrix_free=True)
    mus = [0.2, 0.7]
    singles = [fn(jnp.asarray([1.0, m]), jnp.asarray([1.0]),
                  {"diffusion": jnp.asarray([m])}) for m in mus]
    Ub, indb = fn(jnp.asarray([[1.0, m] for m in mus]),
                  jnp.asarray([[1.0]] * len(mus)),
                  {"diffusion": jnp.asarray([[m] for m in mus])})
    for i, (U, ind) in enumerate(singles):
        # lock-step batched CG refines already-converged queries further
        np.testing.assert_allclose(np.asarray(Ub[i]), np.asarray(U),
                                   rtol=1e-7, atol=1e-11)
        np.testing.assert_allclose(np.asarray(indb[i]), np.asarray(ind),
                                   rtol=1e-6, atol=1e-13)


def test_prepare_coarse_degenerate_basis_stays_spd(hc_model):
    """Round-4 robustness fix: a numerically rank-deficient coarse basis
    (here: every harvested column duplicated) makes the Galerkin matrix
    singular/indefinite through cancellation; the old plain ``inv`` then
    produced an INDEFINITE coarse correction and the outer CG diverged
    (measured |r|/|b| = 3.5e+02 on the 3D SPE10 efficiency-study config).
    The eigh-based PSD pseudo-inverse must keep PCG convergent and
    consistent with the clean basis."""
    d = hc_model
    A = d.assemble({})
    b = d.rhs({})
    bf = A.block_jacobi_factors()
    C_np = harvested_coarse_basis(A, bf, d.space, n_harvest=8, extra_modal=3)
    C_bad = np.concatenate([C_np, C_np], axis=-1)        # exactly dependent
    C, ci = prepare_coarse(A, C_bad)
    w = np.linalg.eigvalsh(0.5 * (np.asarray(ci) + np.asarray(ci).T))
    assert w.min() >= -1e-10 * max(w.max(), 1.0)         # PSD pseudo-inverse
    it, res, x = _pcg(A, b, C, ci)
    assert res < 1e-8, (it, res)
    _, _, x_ref = _pcg(A, b, *prepare_coarse(A, C_np))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-9)


def test_coarse_modes_basis_clamps_to_available_monomials(hc_model):
    """modes beyond the monomial list (6 in 2D, 10 in 3D) clamp instead of
    IndexError (the modal path crashed when handed _mf_solve's
    harvested-sized coarse_modes default)."""
    sp = hc_model.space
    C = AssembledBlockOp.coarse_modes_basis(sp, 16)
    assert C.shape == (sp.K, sp.N, 6)
    np.testing.assert_allclose(C, AssembledBlockOp.coarse_modes_basis(sp, 6))


def test_harvested_adaptive_interval_estimates_spectrum(hc_model):
    """interval=None (the round-4 default) power-iterates lambda_max of the
    block-Jacobi-preconditioned operator so the Chebyshev filter's band
    CONTAINS the spectrum — a band below lambda_max amplifies the fast
    modes exponentially and degenerates the basis (measured on the 3D
    (2,8,8)-raster config: lambda_max 2.45 vs the old fixed 2.05 bound)."""
    d = hc_model
    A = d.assemble({})
    bf = A.block_jacobi_factors()
    # explicit too-narrow interval must still be accepted (back-compat)
    C_narrow = harvested_coarse_basis(A, bf, d.space, n_harvest=4,
                                      extra_modal=1, interval=(0.25, 2.05))
    assert np.isfinite(C_narrow).all()
    # adaptive: basis finite, orthonormal per block, and usable
    C_ad = harvested_coarse_basis(A, bf, d.space, n_harvest=4, extra_modal=1)
    assert np.isfinite(C_ad).all()
    g = np.einsum("knj,knl->kjl", C_ad, C_ad)
    np.testing.assert_allclose(g, np.broadcast_to(np.eye(g.shape[-1]), g.shape),
                               atol=1e-10)
