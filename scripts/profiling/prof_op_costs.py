"""Device-true per-op costs via in-graph fori_loop; batched CG iter count."""
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
th = jnp.asarray(np.stack([[1.0, m] for m in np.linspace(.1, 1, B)]), dtype)
st = d.op.static

op = d.op


def mk(theta):
    return AffineBlockApply(st, op.A_diag, op.C_R_io, op.C_R_oi,
                            op.C_U_io, op.C_U_oi, theta)


Minv = jax.jit(lambda: op.assemble(jnp.asarray([1.0, 0.5], dtype))
               .block_jacobi_factors())()
Mb = Minv.astype(jnp.bfloat16)

R = 200


def loop(f):
    @jax.jit
    def g(x):
        def body(i, x):
            y = f(x)
            return y * (1.0 / (1.0 + 1e-30))   # prevent trivial CSE
        return jax.lax.fori_loop(0, R, body, x)
    return g


full = loop(lambda v: jax.vmap(lambda t, vi: mk(t).apply(vi))(th, v))
diag = loop(lambda v: jnp.einsum("bq,qbki->bki", th,
                                 jnp.einsum("qkij,bkj->qbki", op.A_diag, v)))
pc = loop(lambda v: jnp.einsum("knm,bkm->bkn", Mb, v,
                               preferred_element_type=jnp.float32)
          .astype(dtype))


def t(f, n=3):
    r = f(x)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(x)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts) / R * 1e3


print(f"in-graph apply_full {t(full):7.4f} ms/op")
print(f"in-graph apply_diag {t(diag):7.4f} ms/op")
print(f"in-graph precond    {t(pc):7.4f} ms/op")

# actual iteration count of the batched production solve
from pylrbms_tpu.model import _resolve_theta_bar
theta_bar = _resolve_theta_bar(d)
A_bar = jax.jit(lambda o, tb: o.assemble(tb))(op, theta_bar)
from pylrbms_tpu.la.block import harvested_coarse_basis, prepare_coarse
C_np = harvested_coarse_basis(A_bar, Minv, d.space, n_harvest=12, extra_modal=3)
C_modes, Cinv = prepare_coarse(A_bar, C_np)
rhs = d.rhs(d.parse_parameter([1.0])).astype(dtype)


@jax.jit
def solve_iters(th):
    def one(tq):
        A = mk(tq)
        return A.solve_pcg(rhs, tol=1e-6, maxiter=400,
                           factors=Mb, coarse_inv=Cinv,
                           coarse_basis=C_modes, return_iters=True)
    return jax.vmap(one)(th)


U, it = solve_iters(th)
jax.block_until_ready(it)
print("iters: min/med/max =", int(np.min(it)), int(np.median(np.asarray(it))),
      int(np.max(it)))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    U, it = solve_iters(th)
    jax.block_until_ready(U)
    ts.append(time.perf_counter() - t0)
print(f"batched solve wall {min(ts)*1e3:7.2f} ms")
