"""TPU probe: bench-replica f32 fit WITH a soft-box prior on log_ell —
does regularization keep the trajectory out of the pure-noise collapse
basin (log_ell -> inf) measured in fit_bench_replica.py?"""
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
from gpr_tpu.optim.priors import field_priors, soft_box

config.matmul_precision = "high"

N, D, M = 1_000_000, 8, 300
rng = np.random.default_rng(0)
dtype = jnp.float32
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
prior = field_priors({"log_ell": soft_box(-2.0, 2.0, strength=1e5)})

print(f"device: {jax.devices()[0].device_kind}", flush=True)
t0 = time.perf_counter()
p, z, s2, st = fit(
    SeIso, X, yf, packf, variational=True, streaming_block_size=16384,
    max_iter=60, epsabs=1e-4, log_prior=prior,
)
dt = time.perf_counter() - t0
print(f"fit60+prior: {dt:.0f}s iters={int(st.n_iter)} "
      f"evals={int(st.n_evals)} ({int(st.n_evals)/max(1,int(st.n_iter)):.1f}/iter) "
      f"f={float(st.f):.5f} |g|={float(jnp.linalg.norm(st.g)):.2e} "
      f"failed={bool(st.failed)}", flush=True)
print(f"hypers: log_ell={float(p.log_ell):.3f} log_sf2={float(p.log_sf2):.3f} "
      f"sigma2={float(s2):.4f}", flush=True)
