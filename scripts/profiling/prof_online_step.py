"""Stage profile of the batched online step at the bench config (B=256).

Times three variants: full step (solve+estimate), solve-only, and
estimate-only (precomputed U) to apportion the 83 ms batch.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from pylrbms_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from pylrbms_tpu.problems.os2015 import init_grid_and_problem
from pylrbms_tpu.discretize_elliptic_block_swipdg import discretize
from pylrbms_tpu.model import make_online_step

dtype = jnp.float32
cfg = {'num_subdomains': [8, 8],
       'half_num_fine_elements_per_subdomain_and_dim': 2,
       'num_refinements': 2}
gpd = init_grid_and_problem(cfg)
d, _ = discretize(gpd, dtype=dtype)

B = 256
mus = np.linspace(0.1, 1.0, B)
thetas = jnp.asarray(np.stack([[1.0, m] for m in mus]), dtype)
theta_fs = jnp.ones((B, 1), dtype)
mus_b = {"diffusion": jnp.asarray(mus[:, None], dtype)}

kw = dict(tol=1e-6, maxiter=400, coarse_space="harvested",
          coarse_modes=12, matrix_free="affine")
fn_full = make_online_step(d, with_estimate=True, **kw)
fn_solve = make_online_step(d, with_estimate=False, **kw)


def t(f, *a, n=5):
    r = f(*a)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*a)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


full = t(fn_full, thetas, theta_fs, mus_b)
solve = t(fn_solve, thetas, theta_fs, mus_b)
print(f"full  {full:7.2f} ms/batch  ({full/B:.3f} ms/q)")
print(f"solve {solve:7.2f} ms/batch  ({solve/B:.3f} ms/q)")
print(f"estimate (diff) {full-solve:7.2f} ms/batch")

# iteration count of the lock-step batched CG: run with smaller maxiter
for mi in (40, 60, 80, 120, 200):
    f = make_online_step(d, with_estimate=False, tol=1e-6, maxiter=mi,
                         coarse_space="harvested", coarse_modes=12,
                         matrix_free="affine")
    print(f"maxiter={mi:4d}: {t(f, thetas, theta_fs, mus_b):7.2f} ms/batch")
