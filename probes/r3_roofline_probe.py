"""Round-3 TPU probe #2: roofline attribution for the streaming backward.

Hypothesis under test (from r3_bwd_probe data): at m=300 the 6-GEMM
evidence+gradient chain is HBM-bound when unfused — each (B, m) GEMM
operand/output round-trips HBM, and arithmetic intensity m/4~75 flops/byte
sits below the v5e 3-pass-f32 balance point (~80) — so a fused VMEM-resident
backward tile is the only way past it, IF Mosaic's 3-pass dot runs near
peak.  Measurements:

  1. dot3 microbench: pure Mosaic 3-pass GEMM rate at (2048, 384)x(384, 384)
     with VMEM-resident weights — the fused kernel's speed-of-light.
  2. XLA scan with k = 1, 2, 3 chained (B, m)x(m, m) GEMMs per tile —
     if time grows ~linearly with k, the scan is traffic-bound, not
     MXU-bound.
  3. Pallas fused forward at block 1024 vs 2048 (VMEM pressure vs pipeline).
  4. Block-size sweep of the production vg (base and ug variants).
  5. Flagship se_fat vg today (same-session baseline for the se_iso gap).

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r3_roofline_probe.py
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpr_tpu.config import config
    from gpr_tpu.kernels import SeFat, SeIso
    from gpr_tpu.models.streaming import streaming_log_evidence
    from gpr_tpu.numerics.linalg import matmul
    from gpr_tpu.ops.fused_stats import _dot3

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

    # ---- 1. dot3 microbench: B x 384 x 384, weights VMEM-resident --------
    def dot3_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = _dot3(x_ref[:], w_ref[:],
                         (((1,), (0,)), ((), ())), False)

    for B, reps in ((1024, 1), (2048, 1), (2048, 4)):
        mp = 384
        nb = 1_000_448 // B  # ~1M rows
        xs = jnp.asarray(rng.standard_normal((nb * B, mp)) * 0.1, dt)
        w = jnp.asarray(rng.standard_normal((mp, mp)) * 0.05, dt)

        def k_chain(x_ref, w_ref, o_ref):
            acc = x_ref[:]
            for _ in range(reps):
                acc = _dot3(acc, w_ref[:], (((1,), (0,)), ((), ())), False)
            o_ref[:] = acc

        run = pl.pallas_call(
            k_chain,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((B, mp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mp, mp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, mp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb * B, mp), dt),
        )
        try:
            t, first, _ = timeit(jax.jit(lambda a, b: run(a, b)), xs, w)
            fl = 2 * nb * B * mp * mp * reps
            log(f"pallas dot3 chain B={B} reps={reps}: {t*1e3:.1f} ms "
                f"-> {fl/t/1e12:.1f} TF/s useful, x3 = {3*fl/t/1e12:.1f} "
                f"TF/s MXU (first {first:.1f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"pallas dot3 B={B} reps={reps}: FAILED "
                f"{type(e).__name__}: {e}")

    # ---- 2. XLA scan, k chained GEMMs per tile ---------------------------
    B = 16384
    nb = N // B
    ntrunc = nb * B
    w300 = jnp.asarray(np.triu(rng.standard_normal((M, M))) * 0.05, dt)
    xs300 = jnp.asarray(rng.standard_normal((ntrunc, M)) * 0.1, dt)
    xb300 = xs300.reshape(nb, B, M)

    def make_chain(k):
        def f(xb, w):
            def body(carry, x_b):
                acc = x_b
                for _ in range(k):
                    acc = matmul(acc, w)
                return carry + jnp.sum(acc), None

            out, _ = jax.lax.scan(body, jnp.zeros((), dt), xb)
            return out

        return jax.jit(f)

    for k in (1, 2, 3):
        try:
            t, first, _ = timeit(make_chain(k), xb300, w300)
            fl = 2 * ntrunc * M * M * k
            log(f"xla scan chain k={k} (B={B}, m={M}): {t*1e3:.1f} ms -> "
                f"{fl/t/1e12:.1f} TF/s useful (first {first:.1f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"xla chain k={k}: FAILED {type(e).__name__}: {e}")

    # ---- 3. Pallas fused forward, block 1024 vs 2048 ---------------------
    from gpr_tpu.ops.fused_stats import se_iso_stream_stats_fused_acc

    u_inv = jnp.asarray(np.triu(rng.standard_normal((M, M))) * 0.05, dt)
    for blk in (1024, 2048):
        try:
            f = jax.jit(functools.partial(
                se_iso_stream_stats_fused_acc, block_size=blk))
            t, first, _ = timeit(
                f, params.log_ell, params.log_sf2, Z, u_inv, sigma2, X, y)
            log(f"pallas fused fwd block={blk}: {t*1e3:.1f} ms "
                f"(first {first:.1f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"pallas fused fwd block={blk}: FAILED "
                f"{type(e).__name__}: {e}")

    # ---- 4. production vg block sweep ------------------------------------
    def make_vg(variant, block):
        def f(params, z, sigma2, X, y):
            return streaming_log_evidence(
                SeIso, params, z, sigma2, X, y, block_size=block,
                grad_variant=variant,
            )
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))

    for variant in ("base", "ug"):
        for block in (8192, 32768):
            try:
                t, first, out = timeit(make_vg(variant, block),
                                       params, Z, sigma2, X, y)
                log(f"vg[{variant}] block={block}: {t*1e3:.1f} ms/iter "
                    f"(first {first:.1f}s)")
            except Exception as e:  # noqa: BLE001
                log(f"vg[{variant}] block={block}: FAILED "
                    f"{type(e).__name__}: {e}")

    # ---- 5. flagship today ----------------------------------------------
    pf = SeFat.Params(
        d=D, log_sf2=jnp.asarray(0.1, dt),
        tproj=jnp.asarray(rng.standard_normal((D, D)) / D, dt),
        log_hetero_skedasticity=jnp.full((M,), -5.0, dt),
        log_multiscales_m05=jnp.zeros((M, D), dt),
    )
    Zf = SeFat.inducing_from_inputs(pf, X[:M])

    def f_fat(p, z, s2, X, y):
        return streaming_log_evidence(
            SeFat, p, z, s2, X, y, variational=True, block_size=16384
        )

    try:
        vgf = jax.jit(jax.value_and_grad(f_fat, argnums=(0, 1, 2)))
        t, first, out = timeit(vgf, pf, Zf, sigma2, X, y)
        log(f"flagship se_fat vg: {t*1e3:.1f} ms/iter (first {first:.1f}s, "
            f"ev {float(out[0]):.1f})")
    except Exception as e:  # noqa: BLE001
        log(f"flagship: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    sys.exit(main())
