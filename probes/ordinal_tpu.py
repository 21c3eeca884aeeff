"""TPU timing probe: ordinal (cumulative probit) Laplace at the bench shape.

value_and_grad of ordinal_log_evidence (15 Newton steps, K=4 categories,
hypers + inducing + cutpoints) at n=1M x 8, m=300 f32 — same GEMM
structure per Newton step as the binary classifier, plus the (cheap)
elementwise cell-mass chain.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/ordinal_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.ordinal import ordinal_log_evidence

N, D, M, K = 1_000_000, 8, 300, 4


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
    f_true = 1.5 * np.sin(np.asarray(X) @ (np.arange(D) * 0.3 + 0.2))
    y = jnp.asarray(
        np.digitize(f_true + 0.3 * rng.standard_normal(N),
                    [-1.0, 0.0, 1.0]).astype(np.int32)
    )
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))
    cr = jnp.asarray([-1.0, 0.0, 0.0], dt)

    def f(p, z, cr, X, y):
        return ordinal_log_evidence(SeIso, p, z, X, y, cr, newton_iters=15)

    fwd = jax.jit(f)
    t0 = time.perf_counter()
    ev = fwd(p, Z, cr, X, y)
    sync(ev)
    print(f"ordinal fwd: first {time.perf_counter()-t0:.1f}s "
          f"ev {float(ev):.1f}", flush=True)
    t0 = time.perf_counter()
    outs = [fwd(p, Z, cr, X, y) for _ in range(3)]
    sync(outs[-1])
    print(f"ordinal evidence fwd: {(time.perf_counter()-t0)/3*1e3:.0f} ms",
          flush=True)

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
    t0 = time.perf_counter()
    out = vg(p, Z, cr, X, y)
    sync(out)
    first = time.perf_counter() - t0
    for leaf in jax.tree.leaves(out[1]):
        assert bool(jnp.all(jnp.isfinite(leaf))), "grad NaN at 1M f32"
    per = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [vg(p, Z, cr, X, y) for _ in range(3)]
        sync(outs[-1])
        per.append((time.perf_counter() - t0) / 3)
    print(f"ordinal evidence+grad (15 Newton steps): {min(per)*1e3:.0f} "
          f"ms/iter (first {first:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
