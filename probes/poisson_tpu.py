"""TPU timing probe: Poisson-Laplace count regression at the bench shape.

value_and_grad of poisson_log_evidence (20 Newton steps) at n=1M x 8,
m=300 f32 — same GEMM structure as the binary classifier per step.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/poisson_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.poisson import poisson_log_evidence

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
    f_true = np.sin(np.asarray(X) @ (np.arange(D) * 0.3 + 0.2))
    y = jnp.asarray(rng.poisson(np.exp(f_true)).astype(np.float32))
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    def f(p, z, X, y):
        return poisson_log_evidence(SeIso, p, z, X, y, newton_iters=20)

    fwd = jax.jit(f)
    t0 = time.perf_counter()
    ev = fwd(p, Z, X, y)
    sync(ev)
    print(f"poisson fwd: first {time.perf_counter()-t0:.1f}s "
          f"ev {float(ev):.1f}", flush=True)
    t0 = time.perf_counter()
    outs = [fwd(p, Z, X, y) for _ in range(3)]
    sync(outs[-1])
    print(f"poisson evidence fwd: {(time.perf_counter()-t0)/3*1e3:.0f} ms",
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
    print(f"poisson evidence+grad (20 Newton steps): {min(per)*1e3:.0f} "
          f"ms/iter (first {first:.1f}s, ev {float(out[0]):.1f})",
          flush=True)


if __name__ == "__main__":
    main()
