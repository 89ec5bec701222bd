#!/usr/bin/env python
"""Profile the steady-state greedy re-reduction at SPE10 scale on the chip.

Breaks the measured ~37 s/iteration re-reduction span
(docs/results/spe10_greedy_tpu.txt) into its parts: the incremental
colored image update vs the contraction einsums (A_red f64 projection vs
the estimator-tensor projections that promote the f32 est tensors back to
f64).  Drives optimization; not part of the test suite.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pylrbms_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    if jax.default_backend() == "cpu":
        print("NOTE: running on CPU — numbers will not reflect the chip")
    else:
        jax.config.update("jax_enable_x64", True)

    from pylrbms_tpu.problems.spe10 import init_grid_and_problem
    from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
    from pylrbms_tpu.reductor import LRBMSReductor

    t0 = time.perf_counter()
    gpd = init_grid_and_problem({'num_subdomains': [16, 16],
                                 'half_num_fine_elements_per_subdomain_and_dim': 2,
                                 'num_refinements': 2})
    d, data = discretize(gpd, dtype=jnp.float64)
    jax.block_until_ready(d.op.A_diag)
    print(f"discretize: {time.perf_counter() - t0:.1f} s "
          f"(K={d.space.K}, N={d.space.N})")

    red = LRBMSReductor(d, products=data['local_energy_dg_product'], order=0)
    red.prefetch_next = False
    red.force_lean = True     # the greedy's projection mode at scale
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    rd = red.reduce()
    jax.block_until_ready(rd.A_red)
    print(f"initial reduce (full, r_max={rd.r_max}): "
          f"{time.perf_counter() - t0:.1f} s")

    K, N = d.space.K, d.space.N
    for it in range(3):
        # one random new column per subdomain (greedy-iteration shape)
        U = rng.normal(size=(K, N))
        red.extend_basis(U)
        t0 = time.perf_counter()
        rd = red.reduce()
        jax.block_until_ready(rd.A_red)
        print(f"re-reduce #{it} (incremental, r_max={rd.r_max}): "
              f"{time.perf_counter() - t0:.1f} s")

    # ---- piecewise timing of the steady re-reduction ----
    sizes = red.basis_sizes()
    r_max = rd.r_max
    V = jnp.asarray(red._padded_bases(r_max))
    mask = jnp.asarray((np.arange(r_max)[None, :]
                        < sizes[:, None]).astype(np.float64))
    ed = d.estimator.data
    nbhd_idx, rows_safe, valid = red._bucket_rows(d.grid, K, r_max)
    rows_j, valid_j = jnp.asarray(rows_safe), jnp.asarray(valid, V.dtype)
    op_arrays = ((d.op.A_diag, d.op.C_R_io, d.op.C_R_oi,
                  d.op.C_U_io, d.op.C_U_oi)
                 + ((d.op.C_W_io, d.op.C_W_oi)
                    if d.op.C_W_io is not None else ()))
    ed_arrays = (ed.E_bar, ed.BB, ed.M_aa, ed.M_ab, ed.d_vec,
                 ed.R_dd, ed.L2, ed.A_div)
    cache = red._img_cache
    Wk, Tk = cache["Wk"], cache["Tk"]
    print("dtypes: V", V.dtype, "Wk", Wk.dtype, "Tk", Tk.dtype,
          "M_aa", ed.M_aa.dtype, "E_bar", ed.E_bar.dtype,
          "A_diag", d.op.A_diag.dtype)

    def timed(tag, f, *a, n=3):
        f(*a)  # compile
        jax.block_until_ready(f(*a))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t0)
        print(f"{tag:50s} {1e3 * min(ts):10.1f} ms")

    import jax
    from pylrbms_tpu.utils.precision import hp
    st = d.op.static
    side_rows = {k: jnp.asarray(v) for k, v in st.side_rows.items()}
    edges = ((st.left_k, st.right_k, st.low_k, st.up_k)
             + ((st.near_k, st.far_k) if st.near_k is not None else ()))

    # time the real contract fn as cached
    timed("contract (A_red + est projections)", red._contract_fn,
          op_arrays, ed_arrays, d.rhs_q, V, mask, Wk, Tk)

    # A_red-only projection
    @jax.jit
    @hp
    def f_ared(op_arrays, V, mask):
        A_red, b_red, _ = LRBMSReductor._project(
            op_arrays, ed_arrays, d.rhs_q, V * mask[:, :, None], mask,
            side_rows, edges)
        return A_red
    timed("A_red projection only (f64)", f_ared, op_arrays, V, mask)

    # est projections only, as-is (promoted to f64)
    @jax.jit
    @hp
    def f_est(ed_arrays, V, mask, Wk, Tk):
        (E_bar, BB, M_aa, M_ab, d_vec, R_dd, _l2, _div) = ed_arrays
        Vm = V * mask[:, :, None]
        G_nc = jnp.einsum("kpn,knm,kqm->kpq", Wk, E_bar, Wk)
        BBT = jnp.einsum("pkur,krs,qkvs->pqkuv", Tk, BB, Tk)
        RD = jnp.einsum("pkur,krs,qkvs->pqkuv", Tk, R_dd, Tk)
        AA = jnp.einsum("prknm,kan,kbm->prkab", M_aa, Vm, Vm)
        ABT = jnp.einsum("kan,pknr,qkur->pqkau", Vm, M_ab, Tk)
        DV = jnp.einsum("fkr,qkur->fqku", d_vec, Tk)
        return G_nc, BBT, RD, AA, ABT, DV
    timed("est projections, operand-promoted (as-is)", f_est,
          ed_arrays, V, mask, Wk, Tk)

    # est projections with operands cast to the est-tensor dtype
    @jax.jit
    @hp
    def f_est32(ed_arrays, V, mask, Wk, Tk):
        (E_bar, BB, M_aa, M_ab, d_vec, R_dd, _l2, _div) = ed_arrays
        Vm = (V * mask[:, :, None]).astype(M_aa.dtype)
        Wk = Wk.astype(E_bar.dtype)
        Tk = Tk.astype(BB.dtype)
        G_nc = jnp.einsum("kpn,knm,kqm->kpq", Wk, E_bar, Wk)
        BBT = jnp.einsum("pkur,krs,qkvs->pqkuv", Tk, BB, Tk)
        RD = jnp.einsum("pkur,krs,qkvs->pqkuv", Tk, R_dd, Tk)
        AA = jnp.einsum("prknm,kan,kbm->prkab", M_aa, Vm, Vm)
        ABT = jnp.einsum("kan,pknr,qkur->pqkau", Vm, M_ab, Tk)
        DV = jnp.einsum("fkr,qkur->fqku", d_vec, Tk)
        return G_nc, BBT, RD, AA, ABT, DV
    timed("est projections, est-dtype operands", f_est32,
          ed_arrays, V, mask, Wk, Tk)

    # incremental image update (steady greedy shape: 1 new col/subdomain)
    new_rows = np.arange(K) * r_max + (sizes - 1)
    from pylrbms_tpu.reductor import LRBMSReductor as LR
    colors = LR._subdomain_colors(d.grid)
    ch = next(c for c in red._UPD_CHUNKS if c >= K)
    ids = np.full(ch, K * r_max, np.int64)
    ids[:K] = np.sort(new_rows)
    color_k, n_colors = colors
    kseq = ids[:K] // r_max
    rank = np.arange(K) - np.searchsorted(kseq, kseq)
    mb = 1
    n_batch = n_colors * mb
    bidx = np.zeros(ch, np.int64)
    bidx[:K] = color_k[kseq] * mb + rank
    upd = red._make_image_update_fn(r_max, ch, n_batch)
    timed(f"incremental image update (colored, n_batch={n_batch})", upd,
          V, mask, jnp.asarray(ids), Wk, Tk, rows_j, valid_j,
          jnp.asarray(bidx))
    upd0 = red._make_image_update_fn(r_max, ch, 0)
    timed(f"incremental image update (uncolored, batch={ch})", upd0,
          V, mask, jnp.asarray(ids), Wk, Tk, rows_j, valid_j, None)


if __name__ == "__main__":
    main()
