"""Exact dense GP on the real TPU: evidence+grad cost and capacity sweep.

Motivation: models/exact.py is the gold-standard anchor; this probe records
what "small n" means on a v5e-1 in f32 — where the dense O(n^3)/O(n^2) path
is actually FASTER than streaming FITC (no approximation at all), and where
it stops fitting.  Run: PYTHONPATH=/root/.axon_site:/root/repo python
probes/r4_exact_tpu.py

Measured 2026-08-19 (v5e-1, f32 HIGH, min of 10 after warmup):
  see bottom-of-file RESULTS block (filled after the run).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.exact import log_evidence_exact


def bench_n(n, d=8, reps=10):
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (n, d), dtype=jnp.float32)
    y = jnp.sin(X.sum(axis=1)) + 0.1 * jax.random.normal(key, (n,))
    p = SeIso.Params(log_ell=jnp.asarray(0.5, jnp.float32),
                     log_sf2=jnp.asarray(0.0, jnp.float32))

    def f(p, log_s2, X, y):
        return -log_evidence_exact(SeIso, p, X, y, jnp.exp(log_s2))

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
    t0 = time.time()
    out = vg(p, jnp.asarray(-2.0, jnp.float32), X, y)
    ev = -float(np.asarray(out[0]))
    t_first = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = vg(p, jnp.asarray(-2.0, jnp.float32), X, y)
        np.asarray(out[0])  # force completion (tunnel: block_until_ready lies)
        times.append(time.time() - t0)
    return ev, t_first, min(times)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    for n in (2048, 4096, 8192, 16384, 20000, 32768):
        try:
            ev, t_first, t = bench_n(n)
            flops = (n ** 3) / 3 * 4  # fwd chol + bwd ~3x, rough
            print(f"n={n}: evidence+grad {t*1e3:.1f} ms "
                  f"(first {t_first:.1f}s, evidence {ev:.1f}, "
                  f"~{flops/t/1e12:.1f} TF/s effective)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"n={n}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
            break


if __name__ == "__main__":
    main()
