"""Round-3 TPU probe #4: session-calibrated roofline for the scan path.

Given (r3_fused_timing.py) that BOTH fused Pallas paths lose to the XLA
scan — fwd 18.6 vs 13.0 ms, bwd 52.3 vs 42.2 ms same-session — the scan is
the production answer, and the honest utilization question becomes: how
close is the 6-GEMM evidence+gradient chain to the machine's ACHIEVABLE
pure-GEMM rate at these exact shapes (m=300 lane padding, 3-pass f32,
B-row tiles through lax.scan)?  Measures:

  1. pure-GEMM scan chain, k=3 GEMMs/tile, m=300 and m=384: the session's
     achievable ceiling and the physical lane-padding factor.
  2. vg[ug] block sweep 16384/32768/65536 (the ug variant removed the
     serial V->vg dependency; 40.1 vs 42.0 base in r3_bwd_probe).
  3. vg[base] at m=384: how much of the padding XLA recovers end to end.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r3_calibration_probe.py
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
    from gpr_tpu.numerics.linalg import matmul

    config.matmul_precision = "high"
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rng = np.random.default_rng(0)
    dt = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    y = jnp.asarray(rng.standard_normal(N), dt)

    # ---- 1. pure-GEMM chain ceiling --------------------------------------
    B = 16384
    nb = N // B
    for m in (300, 384):
        w = jnp.asarray(rng.standard_normal((m, m)) * 0.05, dt)
        seed = jnp.asarray(rng.standard_normal((B, m)) * 0.1, dt)

        # generate the (nb, B, m) chain input ON DEVICE from a (B, m) seed:
        # a host transfer of the full array is ~1.2 GB through the tunnel
        # and dominates/starves everything (measured: stuck > 40 min)
        def chain(seed, w):
            def body(carry, i):
                acc = seed * (1.0 + 1e-6 * i)
                for _ in range(3):
                    acc = matmul(acc, w)
                return carry + jnp.sum(acc), None

            out, _ = jax.lax.scan(
                body, jnp.zeros((), dt), jnp.arange(nb, dtype=dt))
            return out

        try:
            t, first, _ = timeit(jax.jit(chain), seed, w)
            fl = 2 * nb * B * m * m * 3
            log(f"pure chain k=3 m={m}: {t*1e3:.1f} ms -> {fl/t/1e12:.1f} "
                f"TF/s useful = {100*fl*3/t/197e12:.0f}% 3-pass busy "
                f"(first {first:.1f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"chain m={m}: FAILED {type(e).__name__}: {e}")

    # ---- 2./3. production vg ---------------------------------------------
    def make_vg(m, block, variant):
        z = jnp.asarray(rng.standard_normal((m, D)), dt)
        params = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                              log_sf2=jnp.asarray(0.0, dt))

        def f(params, z, sigma2, X, y):
            return streaming_log_evidence(
                SeIso, params, z, sigma2, X, y, block_size=block,
                grad_variant=variant,
            )
        return (jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2))),
                params, z)

    for m, block, variant in [
        (300, 16384, "ug"), (300, 32768, "ug"), (300, 65536, "ug"),
        (384, 16384, "base"),
    ]:
        try:
            vg, params, z = make_vg(m, block, variant)
            t, first, out = timeit(vg, params, z,
                                   jnp.asarray(0.1, dt), X, y)
            fl = 6 * 2 * N * m * m
            log(f"vg[{variant}] m={m} block={block}: {t*1e3:.1f} ms/iter "
                f"-> {fl/t/1e12:.1f} TF/s useful (first {first:.1f}s, "
                f"ev {float(out[0]):.1f})")
        except Exception as e:  # noqa: BLE001
            log(f"vg[{variant}] m={m} block={block}: FAILED "
                f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    sys.exit(main())
