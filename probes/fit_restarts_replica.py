"""TPU probe: fit_restarts on the bench-replica f32 problem — does the
lengthscale-ladder multi-start avoid the pure-noise collapse basin that
the single start (log_ell=0.5) falls into?"""
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
from gpr_tpu.optim.lbfgs_device import fit_restarts

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
pack = make_pack(SeIso, SeIso.Params(log_ell=jnp.asarray(0.5, dtype),
                                     log_sf2=jnp.asarray(0.0, dtype)), Z, 1.0)
ladder = (-1.5, -0.5, 0.5, 1.5)
x0s = [make_pack(SeIso, SeIso.Params(log_ell=jnp.asarray(le, dtype),
                                     log_sf2=jnp.asarray(0.0, dtype)),
                 Z, 1.0).x0 for le in ladder]

print(f"device: {jax.devices()[0].device_kind}", flush=True)
t0 = time.perf_counter()
p, z, s2, st, probe_fs = fit_restarts(
    SeIso, X, yf, pack, x0s, probe_iters=12, variational=True,
    streaming_block_size=16384, max_iter=60, epsabs=1e-4,
)
dt = time.perf_counter() - t0
print("probes:", {le: round(f, 5) for le, f in zip(ladder, probe_fs)},
      flush=True)
print(f"winner continued: {dt:.0f}s iters={int(st.n_iter)} "
      f"evals={int(st.n_evals)} f={float(st.f):.5f} "
      f"|g|={float(jnp.linalg.norm(st.g)):.2e} failed={bool(st.failed)}",
      flush=True)
print(f"hypers: log_ell={float(p.log_ell):.3f} log_sf2={float(p.log_sf2):.3f} "
      f"sigma2={float(s2):.4f}", flush=True)
