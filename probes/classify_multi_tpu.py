"""TPU timing probe: softmax (multi-class) Laplace at the bench shape.

value_and_grad of multiclass_log_evidence (C=3, 15 Newton steps) at
n=1M x 8, m=300 f32.  Per Newton step: C (n, m) GEMM chains for the
per-class factors + C(C+1)/2 weighted m x m Grams + one (Cm, Cm)
Cholesky (900^2 here) — expect a few x the binary classifier's
1.17 s/iter.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/classify_multi_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify_multi import multiclass_log_evidence

N, D, M, C = 1_000_000, 8, 300, 3


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
    score = np.asarray(X) @ (np.arange(D) * 0.3 + 0.2)
    labels = jnp.asarray(np.digitize(score, [-1.0, 1.0]).astype(np.int32))
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    def f(p, z, X, labels):
        return multiclass_log_evidence(SeIso, p, z, X, labels, C,
                                       newton_iters=15)

    fwd = jax.jit(f)
    t0 = time.perf_counter()
    ev = fwd(p, Z, X, labels)
    sync(ev)
    print(f"multiclass fwd: first {time.perf_counter()-t0:.1f}s "
          f"ev {float(ev):.1f}", flush=True)
    t0 = time.perf_counter()
    outs = [fwd(p, Z, X, labels) for _ in range(3)]
    sync(outs[-1])
    print(f"multiclass evidence fwd: {(time.perf_counter()-t0)/3*1e3:.0f} ms",
          flush=True)

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
    t0 = time.perf_counter()
    out = vg(p, Z, X, labels)
    sync(out)
    first = time.perf_counter() - t0
    per = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [vg(p, Z, X, labels) for _ in range(3)]
        sync(outs[-1])
        per.append((time.perf_counter() - t0) / 3)
    print(f"multiclass evidence+grad (C=3, 15 Newton steps): "
          f"{min(per)*1e3:.0f} ms/iter (first {first:.1f}s, "
          f"ev {float(out[0]):.1f})", flush=True)


if __name__ == "__main__":
    main()
