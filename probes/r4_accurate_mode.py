"""Round-4 probe: product-level cost/accuracy of the precision modes.

Follow-up to probes/r4_tpu_error_split.py, which attributed the on-TPU
f32-HIGH evidence error (+307 nats at the 1M bench shape) to the kernel
sqdist GEMM (~140) and the whitening V-GEMM (~111), with the whitened
accumulation GEMMs contributing exactly 0.0.  This probe measures the
PRODUCT path (streaming_log_evidence, grad_variant='ug') end to end:

  fast          matmul=high,    acc=high,    grad=high   (bench headline)
  accurate-fwd  matmul=highest, acc=high,    grad=HIGH   (evidence parity,
                                                          backward cheap)
  all-highest   matmul=highest, acc=highest, grad=None   (everything 6-pass)

Each mode reports evidence error vs the all-f64 truth and ms/iter for
evidence+grad.  Run: python probes/r4_accurate_mode.py  (TPU).
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
TRUTH = -2123659.4  # all-f64, jitter 1e-6 (bench.py cached)

HI = jax.lax.Precision.HIGHEST
H = jax.lax.Precision.HIGH


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

    modes = [
        ("fast (high everywhere)", "high", "high", H),
        ("accurate-fwd (hi/acc-high/grad-high)", "highest", "high", H),
        ("all-highest", "highest", "highest", None),
    ]
    for name, mp, ap, gp in modes:
        config.matmul_precision = mp
        config.acc_precision = ap

        def f(params, z, sigma2, X, y, _gp=gp):
            return streaming_log_evidence(
                SeIso, params, z, sigma2, X, y, block_size=BLOCK,
                grad_variant="ug", grad_precision=_gp,
            )

        vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
        t0 = time.perf_counter()
        ev, _ = vg(params, Z, sigma2, X, y)
        ev = float(np.asarray(ev))
        first = time.perf_counter() - t0
        per = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [vg(params, Z, sigma2, X, y) for _ in range(8)]
            np.asarray(outs[-1][0])
            per.append((time.perf_counter() - t0) / 8)
        print(f"{name:38s} ev {ev:.1f}  err {ev - TRUTH:+8.1f}  "
              f"{min(per)*1e3:6.1f} ms/iter (first {first:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
