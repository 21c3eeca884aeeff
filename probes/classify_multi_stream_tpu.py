"""TPU timing probe: STREAMING softmax multi-class at the bench shape.

value_and_grad of stream_multiclass_log_evidence (C=3, 15 Newton steps,
block 32768) at n=1M x 8, m=300 f32.  Six block sweeps per Newton step
(module docstring) vs the materialized path's fused chains.

Measured (v5e-1, 2026-08-19): fwd 1191 ms (materialized: 1.05 s),
evidence+grad 6036 ms/iter (materialized: 4.99 s) — only ~1.2x, NOT the
~2.6x the binary stream pays: the materialized multi-class path already
recomputes per-class chains XLA cannot fuse across, so the streaming
recompute overlaps work the dense path was paying anyway.  Bought:
V at (n, m) never forms, n unbounded per device/shard.

Run: PYTHONPATH=/root/.axon_site:/root/repo \
       python probes/classify_multi_stream_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify_multi_stream import (
    stream_multiclass_log_evidence,
)

N, D, M, C, BLOCK = 1_000_000, 8, 300, 3, 32_768


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    score = np.asarray(X) @ (np.arange(D) * 0.3 + 0.2)
    labels = jnp.asarray(np.digitize(score, [-1.0, 1.0]).astype(np.int32))
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    def f(p, z, X, labels):
        return stream_multiclass_log_evidence(
            SeIso, p, z, X, labels, C, block_size=BLOCK, newton_iters=15,
        )

    fwd = jax.jit(f)
    t0 = time.perf_counter()
    ev = fwd(p, Z, X, labels)
    sync(ev)
    print(f"stream multiclass fwd: first {time.perf_counter()-t0:.1f}s "
          f"ev {float(ev):.1f}", flush=True)
    t0 = time.perf_counter()
    outs = [fwd(p, Z, X, labels) for _ in range(3)]
    sync(outs[-1])
    print(f"stream multiclass evidence fwd: "
          f"{(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
    t0 = time.perf_counter()
    out = vg(p, Z, X, labels)
    sync(out)
    first = time.perf_counter() - t0
    per = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [vg(p, Z, X, labels) for _ in range(3)]
        sync(outs[-1])
        per.append((time.perf_counter() - t0) / 3)
    print(f"stream multiclass evidence+grad (C=3, 15 Newton, "
          f"block {BLOCK}): {min(per)*1e3:.0f} ms/iter "
          f"(first {first:.1f}s, ev {float(out[0]):.1f})", flush=True)


if __name__ == "__main__":
    main()
