"""TPU probe: same 8-D single-index target as capacity_study.py, but with
the flagship se_fat kernel's learnable projection (8 -> 2): the right model
class *could* represent the index direction — but MEASURED: from a cold
random tproj init the evidence gradient has no signal toward w, and the fit
CONVERGES (|g| < 1e-3) to the pure-noise model.  The single-index structure
is an evidence-landscape plateau for cold starts, not an optimizer failure;
see docs/MANUAL.md section 7.  Noise floor mean-NLL ~ -0.224."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpr_tpu.config import config
from gpr_tpu.kernels import SeFat
from gpr_tpu.optim import make_pack
from gpr_tpu.optim.lbfgs_device import fit

config.matmul_precision = "high"

N, D, M, DPROJ = 200_000, 8, 64, 2
rng = np.random.default_rng(0)
dtype = jnp.float32
X = jnp.asarray(rng.standard_normal((N, D)), dtype)
w = np.arange(D) * 0.3 + 0.2
y = jnp.asarray(np.sin(np.asarray(X) @ w) + 0.3 * rng.standard_normal(N),
                dtype)

params = SeFat.Params(
    d=DPROJ,
    log_sf2=jnp.asarray(0.0, dtype),
    tproj=jnp.asarray(rng.uniform(-1, 1, (D, DPROJ)) / D, dtype),
    log_hetero_skedasticity=None,
    log_multiscales_m05=None,
)
Z = SeFat.inducing_from_inputs(params, X[:M])
pack = make_pack(SeFat, params, Z, 1.0)

print(f"device: {jax.devices()[0].device_kind}  n={N} m={M} proj {D}->{DPROJ}",
      flush=True)
t0 = time.perf_counter()
p, z, s2, st = fit(
    SeFat, X, y, pack, variational=True, streaming_block_size=16384,
    max_iter=150, epsabs=1e-4,
)
dt = time.perf_counter() - t0
print(f"se_fat m={M}: mean-NLL={float(st.f):.4f} "
      f"|g|={float(jnp.linalg.norm(st.g)):.2e} sigma2={float(s2):.3f} "
      f"iters={int(st.n_iter)} evals={int(st.n_evals)} ({dt:.0f}s)",
      flush=True)
# how aligned is the learned projection with the true index direction w?
tp = np.asarray(p.tproj)  # (D, DPROJ)
wn = w / np.linalg.norm(w)
u, _, _ = np.linalg.svd(tp, full_matrices=False)
align = float(np.linalg.norm(u.T @ wn))
print(f"projection-subspace alignment with true w: {align:.3f} (1.0 = w in "
      f"span(tproj))", flush=True)
