"""TPU probe: replicate bench.py's f32-fit secondary exactly (same rng
draw order, same config) to compare line-search variants on the recorded
problem.  ROUND2.md (strong-Wolfe search): |grad| 4.8e-2 at 40 iters.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.optim import make_pack
from gpr_tpu.optim.lbfgs_device import fit

config.matmul_precision = "high"

N, D, M = 1_000_000, 8, 300
rng = np.random.default_rng(0)
dtype = jnp.float32
# replicate bench.py's rng draw order exactly
X = jnp.asarray(rng.standard_normal((N, D)), dtype)
_y = rng.standard_normal(N)
Z = jnp.asarray(rng.standard_normal((M, D)), dtype)
_tproj = rng.standard_normal((D, D))
yf = jnp.asarray(
    np.sin(np.asarray(X) @ (np.arange(D) * 0.3 + 0.2))
    + 0.3 * rng.standard_normal(N), dtype)
params = SeIso.Params(log_ell=jnp.asarray(0.5, dtype),
                      log_sf2=jnp.asarray(0.0, dtype))
packf = make_pack(SeIso, params, Z, 1.0)

print(f"device: {jax.devices()[0].device_kind}", flush=True)
t0 = time.perf_counter()
p, z, s2, st = fit(
    SeIso, X, yf, packf, variational=True, streaming_block_size=16384,
    max_iter=40, epsabs=1e-4,
)
dt = time.perf_counter() - t0
print(f"fit40: {dt:.0f}s iters={int(st.n_iter)} evals={int(st.n_evals)} "
      f"({int(st.n_evals)/max(1,int(st.n_iter)):.1f}/iter) "
      f"f={float(st.f):.5f} |g|={float(jnp.linalg.norm(st.g)):.2e} "
      f"failed={bool(st.failed)}", flush=True)
print(f"hypers: log_ell={float(p.log_ell):.3f} log_sf2={float(p.log_sf2):.3f} "
      f"sigma2={float(s2):.4f}", flush=True)
