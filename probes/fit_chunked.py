"""TPU probe: chunked device fit() at the bench config, with a per-chunk
trace of wall time, objective, gradient norm, and objective-eval counts
(line-search efficiency = evals/iter; healthy L-BFGS is ~1-3).

Run from the repo root: python probes/fit_chunked.py
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
from gpr_tpu.models.streaming import streaming_log_evidence
from gpr_tpu.optim import make_pack
from gpr_tpu.optim.lbfgs_device import LBFGSDeviceState, minimize_lbfgs_device

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
F_NOISE = 5e-7


def fg_of(x, X, y):
    def f(x):
        p, z, s2 = pack.unpack(x)
        return -streaming_log_evidence(
            SeIso, p, z, s2, X, y, variational=True, block_size=16384
        ) / X.shape[0]
    return jax.value_and_grad(f)(x)


@jax.jit
def init_fg(x0, X, y):
    return fg_of(x0, X, y)


@jax.jit
def chunk(st, X, y):
    return minimize_lbfgs_device(
        lambda x: fg_of(x, X, y), st.x, epsabs=1e-4, max_iter=100,
        f_noise=F_NOISE, init_state=st, dispatch_iters=10,
    )


print(f"device: {jax.devices()[0].device_kind}", flush=True)
t0 = time.perf_counter()
f0, g0 = init_fg(pack.x0, X, y)
np.asarray(f0)
k = pack.x0.shape[0]
st = LBFGSDeviceState(
    x=pack.x0, f=f0, g=g0,
    s_hist=jnp.zeros((10, k), dtype), y_hist=jnp.zeros((10, k), dtype),
    rho=jnp.zeros((10,), dtype), head=jnp.asarray(0, jnp.int32),
    n_iter=jnp.asarray(0, jnp.int32), failed=jnp.asarray(False),
    n_evals=jnp.asarray(1, jnp.int32),
)
print(f"init: f={float(st.f):.5f} |g|={float(jnp.linalg.norm(st.g)):.2e} "
      f"({time.perf_counter()-t0:.1f}s incl. compile)", flush=True)

prev_evals, prev_iters = 1, 0
for c in range(10):
    t0 = time.perf_counter()
    st = chunk(st, X, y)
    st = jax.tree.map(np.asarray, st)  # force completion
    dt = time.perf_counter() - t0
    it, ev = int(st.n_iter), int(st.n_evals)
    d_it, d_ev = it - prev_iters, ev - prev_evals
    print(f"chunk {c}: {dt:5.1f}s  iters={it:3d} (+{d_it})  evals={ev:4d} "
          f"(+{d_ev}, {d_ev/max(1,d_it):.1f}/iter)  f={float(st.f):.6f}  "
          f"|g|={float(np.linalg.norm(st.g)):.2e}  failed={bool(st.failed)}",
          flush=True)
    prev_evals, prev_iters = ev, it
    st = LBFGSDeviceState(**{k2: jnp.asarray(v) for k2, v in
                             st._asdict().items()})
    if it >= 100 or bool(st.failed) or float(np.linalg.norm(st.g)) < 1e-4:
        break
