"""Benchmark: FITC evidence + full gradient at the BASELINE.md target shape.

Target (BASELINE.md): one L-BFGS iteration of 300-inducing FITC on 1M x 8 in
< 10 s on a v5p-8.  An L-BFGS iteration is dominated by one jitted
value-and-grad of the evidence w.r.t. every hyperparameter (kernel hypers,
all 2400 inducing coordinates, log sigma2); that is what we time, on
however many chips are attached (typically one here).

Prints ONE json line:
  {"metric": ..., "value": seconds_per_iteration, "unit": "s/iter",
   "vs_baseline": baseline_seconds / value}

Details (both candidate paths, predict throughput) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N, D, M = 1_000_000, 8, 300
BASELINE_S_PER_ITER = 10.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, warmup=1, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def main():
    from gpr_tpu.config import config
    from gpr_tpu.kernels import SeIso
    from gpr_tpu.models.fitc import log_evidence
    from gpr_tpu.models.streaming import (
        predict_means_blocked,
        streaming_coeffs,
        streaming_log_evidence,
    )

    # f32 storage; reduced-pass matmuls keep the MXU fed while the f64-when-
    # enabled accumulators guard the parity bar (not enabled on TPU bench).
    config.matmul_precision = "high"

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')} x{jax.device_count()}")

    rng = np.random.default_rng(0)
    dtype = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dtype)
    y = jnp.asarray(rng.standard_normal(N), dtype)
    Z = jnp.asarray(rng.standard_normal((M, D)), dtype)
    params = SeIso.Params(
        log_ell=jnp.asarray(0.5, dtype), log_sf2=jnp.asarray(0.0, dtype)
    )
    sigma2 = jnp.asarray(0.1, dtype)

    def vg_streaming(params, z, sigma2):
        def f(params, z, sigma2):
            return streaming_log_evidence(
                SeIso, params, z, sigma2, X, y, block_size=32768
            )
        return jax.value_and_grad(f, argnums=(0, 1, 2))(params, z, sigma2)

    def vg_dense(params, z, sigma2):
        def f(params, z, sigma2):
            return log_evidence(
                SeIso, params, z, sigma2, X, y, factorization="chol"
            )
        return jax.value_and_grad(f, argnums=(0, 1, 2))(params, z, sigma2)

    results = {}
    for name, fn in [("streaming", vg_streaming), ("dense", vg_dense)]:
        try:
            jitted = jax.jit(fn)
            t, (val, _) = timeit(jitted, params, Z, sigma2, warmup=1, iters=3)
            log(f"{name}: {t*1e3:.1f} ms/iter  (evidence {float(val):.1f})")
            results[name] = t
        except Exception as e:  # noqa: BLE001 - report and keep best path
            log(f"{name}: FAILED {type(e).__name__}: {e}")

    if not results:
        print(json.dumps({"metric": "fitc_train_s_per_iter_1Mx8_m300",
                          "value": float("nan"), "unit": "s/iter",
                          "vs_baseline": 0.0}))
        return

    best = min(results.values())

    # secondary: predict throughput (mean prediction at the same shape)
    try:
        _, r_mat, coeffs = jax.jit(
            lambda p, z, s2: streaming_coeffs(SeIso, p, z, s2, X, y,
                                              block_size=32768)[1:]
        )(params, Z, sigma2)

        predict = jax.jit(
            lambda p, z, c, xs: predict_means_blocked(SeIso, p, z, c, xs,
                                                      block_size=65536)
        )
        tp, _ = timeit(predict, params, Z, coeffs, X, warmup=1, iters=3)
        log(f"predict: {N/tp/1e6:.1f} M pts/s ({tp*1e3:.1f} ms for 1M)")
    except Exception as e:  # noqa: BLE001
        log(f"predict: FAILED {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "fitc_train_s_per_iter_1Mx8_m300",
        "value": round(best, 4),
        "unit": "s/iter",
        "vs_baseline": round(BASELINE_S_PER_ITER / best, 2),
    }))


if __name__ == "__main__":
    main()
