"""Per-iteration component microbench of the batched affine PCG (B=256)."""
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
K, N = d.space.K, d.space.N
B = 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, K, N)), dtype)
thetas = jnp.asarray(np.stack([[1.0, m] for m in np.linspace(.1, 1, B)]), dtype)


def mk(theta):
    return AffineBlockApply(d.op.static, d.op.A_diag, d.op.C_R_io,
                            d.op.C_R_oi, d.op.C_U_io, d.op.C_U_oi, theta)


@jax.jit
def apply_full(thetas, x):
    return jax.vmap(lambda th, xi: mk(th).apply(xi))(thetas, x)


@jax.jit
def apply_diag(thetas, x):
    yq = jnp.einsum("qkij,bkj->qbki", d.op.A_diag, x)
    return jnp.einsum("bq,qbki->bki", thetas, yq)


Minv = jax.jit(lambda: mk(thetas[0]).block_jacobi_factors())().astype(jnp.bfloat16)


@jax.jit
def precond(x):
    return jnp.einsum("knm,bkm->bkn", Minv, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def t(f, *a, n=50):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


print(f"apply_full {t(apply_full, thetas, x):7.3f} ms")
print(f"apply_diag {t(apply_diag, thetas, x):7.3f} ms")
print(f"precond    {t(precond, x):7.3f} ms")

# one full manual PCG iteration body (apply + precond + 3 dots + axpys)
@jax.jit
def iter_body(thetas, x, r, z, p, rz):
    Ap = apply_full(thetas, p)
    pAp = jnp.einsum("bkn,bkn->b", p, Ap)
    al = rz / pAp
    x = x + al[:, None, None] * p
    r = r - al[:, None, None] * Ap
    z = precond(r)
    rz2 = jnp.einsum("bkn,bkn->b", r, z)
    p = z + (rz2 / rz)[:, None, None] * p
    return x, r, z, p, rz2


st = iter_body(thetas, x, x, x, x, jnp.ones(B, dtype))
jax.block_until_ready(st)
t0 = time.perf_counter()
for _ in range(50):
    # carry the full 5-element state (x, r, z, p, rz) so the timed chain is
    # a true PCG recurrence, not a constant-rz replay
    st = iter_body(thetas, *st)
jax.block_until_ready(st)
print(f"iter_body  {(time.perf_counter()-t0)/50*1e3:7.3f} ms")
