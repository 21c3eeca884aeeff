"""TPU probe: model capacity vs inducing count on the 8-D bench synthetic.

For y = sin(X w) + 0.3 eps (natural lengthscale ~1/|w| ~ 0.25 in 8-D), how
much structure can m random inducing points explain?  Reports best mean-NLL
over a lengthscale ladder per m.  Noise floor: mean-NLL of the true noise
model = 0.5 log(2 pi 0.09) + 0.5 ~ -0.224; the pure-noise (signal-blind)
model sits at ~1.15.
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
from gpr_tpu.optim.lbfgs_device import fit_restarts

config.matmul_precision = "high"

N, D = 200_000, 8
rng = np.random.default_rng(0)
dtype = jnp.float32
X = jnp.asarray(rng.standard_normal((N, D)), dtype)
w = np.arange(D) * 0.3 + 0.2
y = jnp.asarray(np.sin(np.asarray(X) @ w) + 0.3 * rng.standard_normal(N),
                dtype)

print(f"device: {jax.devices()[0].device_kind}  n={N} d={D}", flush=True)
for m in (100, 300, 1000):
    Z = jnp.asarray(rng.standard_normal((m, D)), dtype)
    pack = make_pack(SeIso, SeIso.Params(log_ell=jnp.asarray(0.0, dtype),
                                         log_sf2=jnp.asarray(0.0, dtype)),
                     Z, 1.0)
    x0s = [make_pack(SeIso,
                     SeIso.Params(log_ell=jnp.asarray(le, dtype),
                                  log_sf2=jnp.asarray(0.0, dtype)),
                     Z, 1.0).x0 for le in (-1.5, -0.5, 0.5, 1.5)]
    t0 = time.perf_counter()
    p, z, s2, st, probe_fs = fit_restarts(
        SeIso, X, y, pack, x0s, probe_iters=12, variational=True,
        streaming_block_size=16384, max_iter=60, epsabs=1e-4,
    )
    dt = time.perf_counter() - t0
    print(f"m={m:5d}: best mean-NLL={float(st.f):.4f} "
          f"probes={[round(f, 3) for f in probe_fs]} "
          f"log_ell={float(p.log_ell):.2f} sigma2={float(s2):.3f} "
          f"iters={int(st.n_iter)} evals={int(st.n_evals)} ({dt:.0f}s)",
          flush=True)
