"""Round-4 probe: chase the accurate-mode residual (+62.4 vs mirror's +23.4).

Variants of accurate-fwd (matmul=highest, acc=high, grad=HIGH) at the 1M
bench shape:
  base            block 16384 (pads 15808 masked rows), default f32 jitter
  block 20000     no padding (20000 | 1e6)
  jitter 1e-6     the f64 parity jitter (numpy f32 mirror shows the policy
                  bias is +17.7)
  both
Run: python probes/r4_accurate_mode2.py  (TPU)
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
TRUTH = -2123659.4

H = jax.lax.Precision.HIGH


def main():
    config.matmul_precision = "highest"
    config.acc_precision = "high"
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

    cases = [
        ("base (block 16384, f32 jitter)", 16384, None),
        ("block 20000 (no padding)", 20000, None),
        ("jitter 1e-6", 16384, 1e-6),
        ("block 20000 + jitter 1e-6", 20000, 1e-6),
    ]
    for name, blk, jit in cases:
        def f(params, z, sigma2, X, y, _b=blk, _j=jit):
            return streaming_log_evidence(
                SeIso, params, z, sigma2, X, y, block_size=_b,
                grad_variant="ug", grad_precision=H, jitter=_j,
            )

        vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
        t0 = time.perf_counter()
        ev, _ = vg(params, Z, sigma2, X, y)
        ev = float(np.asarray(ev))
        first = time.perf_counter() - t0
        print(f"{name:34s} ev {ev:.1f}  err {ev - TRUTH:+8.1f}  "
              f"(first {first:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
