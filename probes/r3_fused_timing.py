"""Round-3 TPU probe #3: the fused Pallas backward tile, measured.

Times at the bench shape (1M x 8, m=300, f32/high):
  * vg[base]          — unfused scan fwd + scan bwd (reference point)
  * vg[pallas-bwd]    — scan fwd + FUSED backward tile
  * vg[fused-both]    — fused fwd + fused bwd (no (B, m) HBM traffic at all)
  * accuracy cross-check of all three at the fixed seed

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r3_fused_timing.py
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

    def make_vg(block=16384, **kw):
        def f(params, z, sigma2, X, y):
            return streaming_log_evidence(
                SeIso, params, z, sigma2, X, y, block_size=block, **kw
            )
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))

    results = {}
    for name, kw in [
        ("base", dict()),
        ("pallas-bwd", dict(grad_variant="pallas")),
        ("fused-both", dict(impl="pallas", grad_variant="pallas")),
    ]:
        try:
            t, first, out = timeit(make_vg(**kw), params, Z, sigma2, X, y)
            g = out[1]
            log(f"vg[{name}]: {t*1e3:.1f} ms/iter (first {first:.1f}s, "
                f"ev {float(out[0]):.1f}, "
                f"|gz| {float(jnp.linalg.norm(g[1])):.6g}, "
                f"g_ell {float(g[0].log_ell):.6g})")
            results[name] = t
        except Exception as e:  # noqa: BLE001
            log(f"vg[{name}]: FAILED {type(e).__name__}: {e}")

    if "base" in results and "pallas-bwd" in results:
        log(f"speedup bwd: {results['base']/results['pallas-bwd']:.2f}x; "
            f"both: {results['base']/results.get('fused-both', float('nan')):.2f}x")


if __name__ == "__main__":
    sys.exit(main())
