"""Round-4 probe: can the FAST mode's accumulation GEMMs drop to DEFAULT?

The whitened accumulation operands are O(<=1) and the evidence is measured
insensitive to their precision at HIGH vs HIGHEST (r4_tpu_error_split.py).
DEFAULT (single-pass, bf16-rounded operands) is a further 3x on those GEMMs.
This probe measures, at the bench shape, for acc in {high, default} under
matmul=high:
  - evidence error vs the f64 truth
  - gradient agreement vs the accurate mode (matmul=highest, jitter 1e-6)
  - ms/iter evidence+grad
Run: python probes/r4_fast_acc_default.py  (TPU)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.streaming import streaming_log_evidence

N, D, M = 1_000_000, 8, 300
BLOCK = 16384
TRUTH = -2123659.4

H = jax.lax.Precision.HIGH


def rel(a, b):
    a = np.concatenate([np.asarray(x, np.float64).ravel()
                        for x in jax.tree_util.tree_leaves(a)])
    b = np.concatenate([np.asarray(x, np.float64).ravel()
                        for x in jax.tree_util.tree_leaves(b)])
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    dt = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    y = jnp.asarray(rng.standard_normal(N), dt)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    params = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                          log_sf2=jnp.asarray(0.0, dt))
    sigma2 = jnp.asarray(0.1, dt)

    # gradient reference: the accurate mode
    config.matmul_precision = "highest"
    config.acc_precision = "high"

    def f_ref(params, z, sigma2, X, y):
        return streaming_log_evidence(
            SeIso, params, z, sigma2, X, y, block_size=BLOCK,
            grad_variant="ug", grad_precision=H, jitter=1e-6,
        )

    _, g_ref = jax.jit(jax.value_and_grad(f_ref, argnums=(0, 1, 2)))(
        params, Z, sigma2, X, y)
    g_ref = jax.device_get(g_ref)
    print("reference grads ready", flush=True)

    for name, ap in [("acc=high (fast mode today)", "high"),
                     ("acc=default (1-pass bf16)", "default")]:
        config.matmul_precision = "high"
        config.acc_precision = ap

        def f(params, z, sigma2, X, y):
            return streaming_log_evidence(
                SeIso, params, z, sigma2, X, y, block_size=BLOCK,
                grad_variant="ug",
            )

        vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
        t0 = time.perf_counter()
        ev, g = vg(params, Z, sigma2, X, y)
        ev = float(np.asarray(ev))
        first = time.perf_counter() - t0
        gerr = rel(jax.device_get(g), g_ref)
        per = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [vg(params, Z, sigma2, X, y) for _ in range(8)]
            np.asarray(outs[-1][0])
            per.append((time.perf_counter() - t0) / 8)
        print(f"{name:28s} ev err {ev - TRUTH:+8.1f}  grad rel-err "
              f"{gerr:.2e}  {min(per)*1e3:6.1f} ms/iter (first {first:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
