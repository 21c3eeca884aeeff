"""TPU probe: validate the chunked device fit() at the bench config.

Measures: wall time per chunk, iterations completed, final mean-NLL and
|grad|, objective-eval efficiency (the zoom early-exit should cut the
~40-evals/iter pathology at the noise floor).
"""
import sys
import time

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
X = jnp.asarray(rng.standard_normal((N, D)), dtype)
y = jnp.asarray(
    np.sin(np.asarray(X) @ (np.arange(D) * 0.3 + 0.2))
    + 0.3 * rng.standard_normal(N), dtype)
Z = jnp.asarray(rng.standard_normal((M, D)), dtype)
params = SeIso.Params(log_ell=jnp.asarray(0.5, dtype),
                      log_sf2=jnp.asarray(0.0, dtype))
pack = make_pack(SeIso, params, Z, 1.0)

print(f"device: {jax.devices()[0].device_kind}", flush=True)
t0 = time.perf_counter()
p, z, s2, st = fit(
    SeIso, X, y, pack, variational=True, streaming_block_size=16384,
    max_iter=60, epsabs=1e-4, dispatch_iters=20,
)
dt_total = time.perf_counter() - t0
print(f"fit60 (chunks of 20): {dt_total:.1f}s total, "
      f"iters={int(st.n_iter)} ({dt_total/max(1,int(st.n_iter)):.2f} s/iter) "
      f"mean-NLL={float(st.f):.5f} |grad|={float(jnp.linalg.norm(st.g)):.2e} "
      f"sigma2={float(s2):.4f} failed={bool(st.failed)}", flush=True)
