"""First-class 'crisscross' grid family (the ALU-conform bisection mesh).

The round-1 reconciliation proved (via the unstructured oracle,
``scripts/crisscross_oracle.py``) that the reference's golden eta_nc lives on
the crisscross triangulation.  This file validates the *pipeline* support for
that family:

* the assembled SWIPDG operator matches the independent unstructured oracle
  matrix EXACTLY (dof permutation only),
* matrix-form and positive-form estimator paths agree (cross-checks the
  per-cell RT0/chi/divergence tables),
* the full golden config reproduces the reference golden triple
  1.66e-01 / 1.45e-01 / 3.55e-01
  (``/root/reference/python/scripts/linearelliptic_block_swipdg_decomp.py:41-43``)
  in the paper (unsquared-locals) convention — in-pipeline, no oracle.
"""
import sys
import pathlib

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "scripts"))


def _cc_model(num_subdomains, half, nref):
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    gpd = init_grid_and_problem({
        "num_subdomains": num_subdomains,
        "half_num_fine_elements_per_subdomain_and_dim": half,
        "num_refinements": nref, "grid_type": "crisscross"})
    return discretize(gpd)


def _oracle_perm(space, n):
    """Flat permutation: our (K, N) dof -> oracle tri*3+j index.

    Oracle cell vertex orders (scripts/crisscross_oracle.py:77-82):
    parity 0: t0 = (a,b,e) = A's (v0,v1,v2); t1 = (a,d,e) = B's — identity;
    parity 1: t0 = (b,a,d) = C's (v1,v0,v2); t1 = (b,e,d) = E's — identity.
    """
    g = space.grid
    s, nb, T = space.s, space.nb, space.T
    perm = np.zeros(space.K * space.N, dtype=np.int64)
    for k in range(space.K):
        sx, sy = g.subdomain_coords(k)
        for cy in range(s):
            for cx in range(s):
                gy, gx = sy * s + cy, sx * s + cx
                par = (gy + gx) % 2
                # oracle cells are enumerated per 2x2 block (":63-68")
                ocell = ((gy // 2) * (n // 2) + gx // 2) * 4 \
                    + (gy % 2) * 2 + (gx % 2)
                for t in range(T):
                    tri = ocell * 2 + t
                    for i in range(nb):
                        j = i
                        if par == 1 and t == 0:        # C: (v1, v0, v2)
                            j = {0: 1, 1: 0, 2: 2}[i]
                        our = k * space.N + space.dof_index(cy, cx, t, i)
                        perm[our] = tri * 3 + j
    return perm


def test_cc_operator_matches_unstructured_oracle():
    import crisscross_oracle as oracle
    n = 8
    d, data = _cc_model([2, 2], 1, 2)            # s=4, 8x8 global cells
    space = data["space"]
    assert space.grid.grid_type == "crisscross"

    V, T = oracle.crisscross_mesh(n)
    A_o, b_o, aux = oracle.assemble_swipdg(V, T)

    from pylrbms_tpu.la.block import to_scipy_csr
    A_ours = to_scipy_csr(d.assemble(d.parse_parameter(1.))).toarray()
    perm = _oracle_perm(space, n)
    P = np.zeros_like(A_ours)
    A_perm = np.zeros_like(A_ours)
    A_perm[np.ix_(perm, perm)] = A_ours
    scale = np.abs(A_o.toarray()).max()
    np.testing.assert_allclose(A_perm, A_o.toarray(), atol=1e-12 * scale)

    # rhs agrees up to the oracle's coarser quadrature (its 3-point
    # edge-midpoint rule vs our 5x5 Duffy on the smooth cos*cos load)
    b_ours = np.asarray(d.rhs(d.parse_parameter(1.))).ravel()
    b_perm = np.zeros_like(b_ours)
    b_perm[perm] = b_ours
    assert np.linalg.norm(b_perm - b_o) < 2e-2 * np.linalg.norm(b_o)

    # solutions therefore agree to quadrature accuracy
    import scipy.sparse.linalg as spla
    u_o = spla.spsolve(A_o.tocsc(), b_o)
    u_ours = np.asarray(d.solve(d.parse_parameter(1.))).ravel()
    u_perm = np.zeros_like(u_ours)
    u_perm[perm] = u_ours
    assert np.linalg.norm(u_perm - u_o) < 5e-3 * np.linalg.norm(u_o)


def test_cc_estimator_paths_agree():
    """Matrix-form locals == positive-form locals (f64) on crisscross — a
    strong cross-check of the per-cell chi / divergence / Oswald tables."""
    d, _ = _cc_model([2, 2], 1, 1)
    mu = d.parse_parameter(1.)
    U = d.solve(mu)
    est = d.estimator
    Ub = jnp.asarray(np.asarray(U))[None]
    nc_m, r_m, df_m = (np.asarray(v) for v in est.local_quantities(Ub, mu))
    nc_p, r_p, df_p = (np.asarray(v) for v in
                       est.local_quantities_positive(Ub, mu))
    np.testing.assert_allclose(nc_p, nc_m, rtol=1e-9, atol=1e-14)
    np.testing.assert_allclose(r_p, r_m, rtol=1e-9, atol=1e-14)
    np.testing.assert_allclose(df_p, df_m, rtol=1e-9, atol=1e-14)


def test_cc_reproduces_reference_golden_triple():
    """THE parity headline: the golden config run on the crisscross family
    reproduces the reference goldens in-pipeline (paper convention):
    1.66e-01 / 1.45e-01 / 3.55e-01."""
    d, _ = _cc_model([4, 4], 1, 1)               # s=2, 8x8 global cells
    mu = d.parse_parameter(1.)
    U = d.solve(mu)
    nc_sq, r_sq, df_sq = (np.asarray(v)[0] for v in
                          d.estimator.local_quantities(
                              jnp.asarray(np.asarray(U))[None], mu))
    paper = {k: float(np.sqrt(np.maximum(v, 0.0).sum()))
             for k, v in (("nc", nc_sq), ("r", r_sq), ("df", df_sq))}
    # measured: 1.656117e-01 / 1.446952e-01 / 3.548075e-01 — all <0.25% off
    assert paper["nc"] == pytest.approx(1.66e-01, rel=0.005)
    assert paper["r"] == pytest.approx(1.45e-01, rel=0.005)
    assert paper["df"] == pytest.approx(3.55e-01, rel=0.005)
    # lock our own values tightly against regressions
    assert paper["nc"] == pytest.approx(1.656117e-01, rel=1e-4)
    assert paper["r"] == pytest.approx(1.446952e-01, rel=1e-4)
    assert paper["df"] == pytest.approx(3.548075e-01, rel=1e-4)


def test_cc_online_enrichment_reduces_eta():
    """Adaptive online enrichment runs on the crisscross family (corrector
    dense-patch path) and reduces the estimator."""
    from pylrbms_tpu.reductor import LRBMSReductor
    from pylrbms_tpu.online_enrichment import AdaptiveEnrichment
    from pylrbms_tpu.problems.os2015 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    gpd = init_grid_and_problem({
        "num_subdomains": [2, 2],
        "half_num_fine_elements_per_subdomain_and_dim": 1,
        "num_refinements": 1, "grid_type": "crisscross"})
    d, _ = discretize(gpd)
    red = LRBMSReductor(d, order=0)
    rd = red.reduce()
    mu = d.parse_parameter(0.3)
    loop = AdaptiveEnrichment(gpd, d, d.space, red, rd, target_error=1e-12,
                              marking_doerfler_theta=0.5, marking_max_age=100)
    etas = []
    loop.solve(mu, enrichment_steps=3,
               callback=lambda rd_, u, mu_, info: etas.append(info["eta"]))
    assert etas[-1] < 0.6 * etas[0], f"no reduction: {etas}"


def test_cc_prolongation_is_exact_embedding():
    """Crisscross refinement is nested (the coarse diagonal of either parity
    is a union of fine edges of matching parity), so prolongation must embed
    exactly — checked via L2-norm preservation, coarse P1 -> fine P1/P2."""
    from pylrbms_tpu.grid import make_grid
    from pylrbms_tpu.ops.spaces import BlockDGSpace
    from pylrbms_tpu.ops.prolong import prolong
    from pylrbms_tpu.ops import assembly as asm
    coarse_grid = make_grid(((-1, -1), (1, 1)), [2, 2], 1,
                            num_refinements=1, grid_type="crisscross")
    fine_grid = make_grid(((-1, -1), (1, 1)), [2, 2], 1,
                          num_refinements=2, grid_type="crisscross")
    coarse = BlockDGSpace(coarse_grid, order=1)
    rng = np.random.default_rng(5)
    Uc = jnp.asarray(rng.normal(size=(coarse.K, coarse.N)))
    Mc = asm.volume_mass(coarse)
    nc = float(jnp.einsum("kn,knm,km->", Uc, Mc, Uc))
    for order in (1, 2):
        fine = BlockDGSpace(fine_grid, order=order)
        Uf = prolong(coarse, Uc, fine)
        Mf = asm.volume_mass(fine)
        nf = float(jnp.einsum("kn,knm,km->", Uf, Mf, Uf))
        assert abs(nc - nf) < 1e-12 * max(abs(nc), 1.0)


def test_cc_mor_roundtrip():
    """Reduction on the crisscross family: ROM reproduces FOM estimates."""
    d, _ = _cc_model([2, 2], 1, 1)
    from pylrbms_tpu.reductor import LRBMSReductor, ExtensionError
    red = LRBMSReductor(d)
    for mu_i in d.parameter_space.sample_uniformly(2)[:3]:
        try:
            red.extend_basis(d.solve(mu_i))
        except ExtensionError:
            pass
    rd = red.reduce()
    mu = d.parse_parameter(1.)
    eta_fom, (nc, r, df), _ = d.estimate(d.solve(mu), mu, decompose=True)
    eta_rom, (nc_, r_, df_), _ = rd.estimate(rd.solve(mu), mu, decompose=True)
    assert float(eta_rom) == pytest.approx(float(eta_fom), rel=1e-6)
