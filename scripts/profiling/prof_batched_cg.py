"""In-graph per-op costs (small R, progressive prints)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.la.block import AffineBlockApply

dtype = jnp.float32
cfg = {'num_subdomains': [8, 8],
       'half_num_fine_elements_per_subdomain_and_dim': 2,
       'num_refinements': 2}
gpd = init_grid_and_problem(cfg)
d, _ = discretize(gpd, dtype=dtype)
B = 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, d.space.K, d.space.N)), dtype)
th = jnp.asarray(np.stack([[1.0, m] for m in np.linspace(.1, 1, B)]), dtype)
op, st = d.op, d.op.static
print("setup done", flush=True)

Minv = jax.jit(lambda: op.assemble(jnp.asarray([1.0, 0.5], dtype))
               .block_jacobi_factors())()
Mb = Minv.astype(jnp.bfloat16)
print("factors done", flush=True)

R = 50


def loop(f):
    @jax.jit
    def g(x):
        return jax.lax.fori_loop(
            0, R, lambda i, v: f(v) + 1e-12 * i, x)
    return g


def mk(t):
    return AffineBlockApply(st, op.A_diag, op.C_R_io, op.C_R_oi,
                            op.C_U_io, op.C_U_oi, t)


cases = {
    "apply_full": loop(lambda v: jax.vmap(lambda t, vi: mk(t).apply(vi))(th, v)),
    "apply_diag": loop(lambda v: jnp.einsum(
        "bq,qbki->bki", th, jnp.einsum("qkij,bkj->qbki", op.A_diag, v))),
    "precond": loop(lambda v: jnp.einsum(
        "knm,bkm->bkn", Mb, v,
        preferred_element_type=jnp.float32).astype(dtype)),
}
for name, f in cases.items():
    r = f(x)
    jax.block_until_ready(r)
    print(name, "compiled", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(x)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{name:12s} {min(ts)/R*1e3:7.4f} ms/op", flush=True)
