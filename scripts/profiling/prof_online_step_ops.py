"""Microbench: coupling + preconditioner reformulations at B=256."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize

dtype = jnp.float32
cfg = {'num_subdomains': [8, 8],
       'half_num_fine_elements_per_subdomain_and_dim': 2,
       'num_refinements': 2}
gpd = init_grid_and_problem(cfg)
d, _ = discretize(gpd, dtype=dtype)
K, N = d.space.K, d.space.N
st = d.op.static
B = 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, K, N)), dtype)
th = jnp.asarray(np.stack([[1.0, m] for m in np.linspace(.1, 1, B)]), dtype)

print("shapes: C_R_io", d.op.C_R_io.shape, "side_rows right",
      st.side_rows["right"].shape, "left_k", st.left_k.shape)

sr = {k: np.asarray(v) for k, v in st.side_rows.items()}
F, nb = sr["right"].shape
S = F * nb


def onehot_rows(rows):                      # [N, F*nb]
    E = np.zeros((N, S), np.float32)
    E[rows.reshape(-1), np.arange(S)] = 1.0
    return jnp.asarray(E, dtype)


def perm(k_idx):                            # [K, E] one-hot
    P = np.zeros((K, len(k_idx)), np.float32)
    P[np.asarray(k_idx), np.arange(len(k_idx))] = 1.0
    return jnp.asarray(P, dtype)


# ---- current coupling (one direction family pair R io/oi) ----
CRio, CRoi = d.op.C_R_io, d.op.C_R_oi   # [Q, E, F, nb, nb]
srj = {k: jnp.asarray(v) for k, v in st.side_rows.items()}
lk, rk = jnp.asarray(st.left_k), jnp.asarray(st.right_k)


@jax.jit
def cur(th, x, y):
    def couple(y, Cq, rows_out, rows_in, k_out, k_in):
        xi = x[:, k_in][:, :, rows_in]
        upd = jnp.einsum("bq,qefij,befj->befi", th, Cq, xi)
        return y.at[:, k_out[:, None, None], rows_out[None, :, :]].add(upd)
    y = couple(y, CRio, srj["right"], srj["left"], st.left_k, st.right_k)
    y = couple(y, CRoi, srj["left"], srj["right"], st.right_k, st.left_k)
    return y


# ---- one-hot matmul version ----
Er = {s: onehot_rows(v) for s, v in sr.items()}
P_lk, P_rk = perm(st.left_k), perm(st.right_k)
# reshape C to [Q, E, S_out, S_in] (fold F into row blocks)
def foldC(C):
    Q, E = C.shape[:2]
    # C[q,e,f,i,j]: face f couples rows_out[f,i] with rows_in[f,j]
    # build block-diagonal over f: [Q, E, S, S]
    Cnp = np.asarray(C)
    out = np.zeros((Q, E, S, S), np.float32)
    for f in range(F):
        out[:, :, f*nb:(f+1)*nb, f*nb:(f+1)*nb] = Cnp[:, :, f]
    return jnp.asarray(out, dtype)

CRio_f, CRoi_f = foldC(CRio), foldC(CRoi)


@jax.jit
def onehot(th, x, y):
    def couple(y, Cf, Eo, Ei, Po, Pi):
        xi = jnp.einsum("ke,bkn,ns->bes", Pi, x, Ei)      # gather
        upd = jnp.einsum("bq,qest,bet->bes", th, Cf, xi)  # couple
        return y + jnp.einsum("ke,bes,ns->bkn", Po, upd, Eo)
    y = couple(y, CRio_f, Er["right"], Er["left"], P_lk, P_rk)
    y = couple(y, CRoi_f, Er["left"], Er["right"], P_rk, P_lk)
    return y


# ---- precond variants ----
Minv = jax.jit(lambda: d.op.assemble(jnp.asarray([1.0, 0.5], dtype))
               .block_jacobi_factors())()
Mb = Minv.astype(jnp.bfloat16)


@jax.jit
def pc_cur(x):
    return jnp.einsum("knm,bkm->bkn", Mb, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


@jax.jit
def pc_t(x):
    xt = jnp.transpose(x, (1, 2, 0))                      # [K, N, B]
    y = jax.lax.dot_general(Mb, xt.astype(jnp.bfloat16),
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return jnp.transpose(y, (2, 0, 1)).astype(x.dtype)


@jax.jit
def pc_bf16x(x):
    return jnp.einsum("knm,bkm->bkn", Mb, x.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def t(f, *a, n=50):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


y0 = jnp.zeros_like(x)
a = cur(th, x, y0); b = onehot(th, x, y0)
err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
print(f"couple cur    {t(cur, th, x, y0):7.3f} ms")
print(f"couple onehot {t(onehot, th, x, y0):7.3f} ms   rel {err:.2e}")
pa, pb, pc = pc_cur(x), pc_t(x), pc_bf16x(x)
print(f"pc cur   {t(pc_cur, x):7.3f} ms")
print(f"pc trans {t(pc_t, x):7.3f} ms  rel {float(jnp.max(jnp.abs(pb-pa))/jnp.max(jnp.abs(pa))):.2e}")
print(f"pc bf16x {t(pc_bf16x, x):7.3f} ms  rel {float(jnp.max(jnp.abs(pc-pa))/jnp.max(jnp.abs(pa))):.2e}")
