"""TPU timing probe: PITC evidence+gradient at the bench shape.

Measures value_and_grad of pitc_log_evidence (block-whitened scan with a
per-tile (b, b) Cholesky) at n=1M x 8, m=300 for a few block sizes, vs
the FITC streaming baseline — the cost of the accuracy dial.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/pitc_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.pitc import pitc_log_evidence
from gpr_tpu.models.streaming import streaming_log_evidence

N, D, M = 1_000_000, 8, 300


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def timeit(fn, *args, iters=8, batches=2):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    first = time.perf_counter() - t0
    per = []
    for _ in range(batches):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        per.append((time.perf_counter() - t0) / iters)
    return min(per), first, out


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    y = jnp.asarray(rng.standard_normal(N), dt)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt), log_sf2=jnp.asarray(0.0, dt))
    s2 = jnp.asarray(0.1, dt)

    def f_fitc(p, z, s2, X, y):
        return streaming_log_evidence(SeIso, p, z, s2, X, y,
                                      block_size=16384, grad_variant="ug")

    vg = jax.jit(jax.value_and_grad(f_fitc, argnums=(0, 1, 2)))
    t, first, out = timeit(vg, p, Z, s2, X, y)
    print(f"fitc streaming: {t*1e3:.1f} ms/iter (first {first:.1f}s, "
          f"ev {float(out[0]):.1f})", flush=True)

    for b in (128, 256, 512):
        def f_pitc(p, z, s2, X, y, b=b):
            return pitc_log_evidence(SeIso, p, z, s2, X, y, block_size=b,
                                     block_jitter=1e-5)

        vgp = jax.jit(jax.value_and_grad(f_pitc, argnums=(0, 1, 2)))
        try:
            t, first, out = timeit(vgp, p, Z, s2, X, y, iters=4)
            print(f"pitc b={b}: {t*1e3:.1f} ms/iter (first {first:.1f}s, "
                  f"ev {float(out[0]):.1f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pitc b={b}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
