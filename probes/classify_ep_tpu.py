"""TPU timing probe: EP classification at the bench shape.

value_and_grad of ep_log_evidence (20 damped parallel sweeps) at
n=1M x 8, m=300 f32.  One EP sweep costs the same GEMM mix as one
Laplace Newton step (one m x m Cholesky + a handful of (n, m) GEMMs),
so expect ~20/15 of the Laplace 1.17 s/iter.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/classify_ep_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify_ep import ep_log_evidence

N, D, M = 1_000_000, 8, 300


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    y = jnp.asarray(np.sign(np.sin(np.asarray(X) @ (np.arange(D) * 0.3
                                                    + 0.2))), dt)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    def f(p, z, X, y):
        return ep_log_evidence(SeIso, p, z, X, y, n_sweeps=20)

    # convergence diagnostic at this scale: rms site-precision change per
    # damped sweep (models/classify_ep.py ep_sweeps(trace=True))
    from gpr_tpu.models.classify import _fitc_prior
    from gpr_tpu.models.classify_ep import ep_sweeps

    @jax.jit
    def deltas_fn(p, z, X, y):
        _, v, d = _fitc_prior(SeIso, p, z, X, None)
        _, _, deltas = ep_sweeps(v, d, y, jnp.ones_like(y), n_sweeps=30,
                                 trace=True)
        return deltas

    dl = np.asarray(deltas_fn(p, Z, X, y))
    print("site-precision rms delta per sweep (30):", flush=True)
    print("  " + " ".join(f"{v:.2e}" for v in dl), flush=True)

    fwd = jax.jit(f)
    t0 = time.perf_counter()
    ev = fwd(p, Z, X, y)
    sync(ev)
    print(f"ep fwd: first {time.perf_counter()-t0:.1f}s ev {float(ev):.1f}",
          flush=True)
    t0 = time.perf_counter()
    outs = [fwd(p, Z, X, y) for _ in range(3)]
    sync(outs[-1])
    print(f"ep evidence fwd: {(time.perf_counter()-t0)/3*1e3:.0f} ms",
          flush=True)

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
    t0 = time.perf_counter()
    out = vg(p, Z, X, y)
    sync(out)
    first = time.perf_counter() - t0
    per = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [vg(p, Z, X, y) for _ in range(3)]
        sync(outs[-1])
        per.append((time.perf_counter() - t0) / 3)
    print(f"ep evidence+grad (20 sweeps): {min(per)*1e3:.0f} ms/iter "
          f"(first {first:.1f}s, ev {float(out[0]):.1f})", flush=True)


if __name__ == "__main__":
    main()
