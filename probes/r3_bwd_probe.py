"""Round-3 TPU probe: cost attribution of the streaming evidence+gradient.

Times, at the bench shape (1M x 8, m=300, f32/high):
  * value_and_grad for bwd variants base/ug/stack (schedule comparison)
  * "nok" (kernel pullback replaced by zeros) — pullback cost share
  * forward only
  * a structurally identical scan with the exp/d2 kernel evaluation
    replaced by a plain GEMM "kernel" — isolates the transcendental cost
  * block-size sweep for the winner

Each result prints immediately (the tunnel can die; partial data counts).
Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r3_bwd_probe.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N, D, M = 1_000_000, 8, 300


def log(msg):
    print(msg, flush=True)


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def timeit(fn, *args, iters=12, batches=3):
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
    from gpr_tpu.config import config
    from gpr_tpu.kernels import SeIso
    from gpr_tpu.models.streaming import streaming_log_evidence
    from gpr_tpu.numerics.linalg import matmul, rows_sqr_norm

    config.matmul_precision = "high"
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rng = np.random.default_rng(0)
    dt = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    y = jnp.asarray(rng.standard_normal(N), dt)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    params = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                          log_sf2=jnp.asarray(0.0, dt))
    sigma2 = jnp.asarray(0.1, dt)

    def make_vg(variant, block=16384):
        def f(params, z, sigma2, X, y):
            return streaming_log_evidence(
                SeIso, params, z, sigma2, X, y, block_size=block,
                grad_variant=variant,
            )
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))

    for variant in ("base", "ug", "stack", "nok"):
        try:
            t, first, out = timeit(make_vg(variant), params, Z, sigma2, X, y)
            log(f"vg[{variant}] block=16384: {t*1e3:.1f} ms/iter "
                f"(first {first:.1f}s, ev {float(out[0]):.1f})")
        except Exception as e:  # noqa: BLE001
            log(f"vg[{variant}]: FAILED {type(e).__name__}: {e}")

    # forward only
    def fwd(params, z, sigma2, X, y):
        return streaming_log_evidence(SeIso, params, z, sigma2, X, y,
                                      block_size=16384)

    t, first, out = timeit(jax.jit(fwd), params, Z, sigma2, X, y)
    log(f"fwd scan: {t*1e3:.1f} ms (first {first:.1f}s, "
        f"ev {float(out):.1f})")

    # exp-cost isolation: same GEMM skeleton, kernel eval = one plain GEMM
    # row (knm := clipped linear map) — no d2 assembly, no exp
    W = jnp.asarray(rng.standard_normal((D, M)) * 0.01, dt)

    def fwd_noexp(W, u_inv, sigma2, Xb, yb):
        def body(carry, blk):
            x_b, y_b = blk
            knm = matmul(x_b, W) + 0.5  # stand-in kernel tile, no exp
            v = matmul(knm, u_inv)
            r = 1.0 - rows_sqr_norm(v)
            s = r + sigma2
            is_ = 1.0 / s
            a = v * jnp.sqrt(jnp.abs(is_))[:, None]
            g, u, lds, yiy = carry
            g = g + matmul(a.T, a)
            u = u + matmul(v.T, is_ * y_b)
            lds = lds + jnp.sum(jnp.log(jnp.abs(s)))
            yiy = yiy + jnp.sum(is_ * y_b * y_b)
            return (g, u, lds, yiy), None

        nb = N // 16384
        xb = Xb.reshape(nb, 16384, D)
        yb2 = yb.reshape(nb, 16384)
        init = (jnp.zeros((M, M), dt), jnp.zeros((M,), dt),
                jnp.zeros((), dt), jnp.zeros((), dt))
        out, _ = jax.lax.scan(body, init, (xb, yb2), unroll=1)
        return out[2] + out[3] + jnp.sum(out[0]) + jnp.sum(out[1])

    u_inv = jnp.asarray(np.triu(rng.standard_normal((M, M))) * 0.01, dt)
    t, first, out = timeit(jax.jit(fwd_noexp), W, u_inv, sigma2, X, y)
    log(f"fwd no-exp skeleton (2 big GEMMs, no kernel eval): {t*1e3:.1f} ms "
        f"(first {first:.1f}s)")

    # block-size sweep on base
    for block in (8192, 32768, 65536):
        try:
            t, first, out = timeit(make_vg("base", block), params, Z,
                                   sigma2, X, y)
            log(f"vg[base] block={block}: {t*1e3:.1f} ms/iter "
                f"(first {first:.1f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"vg[base] block={block}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    sys.exit(main())
