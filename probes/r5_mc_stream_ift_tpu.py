"""TPU timing probe (round-5 session 3): streaming softmax multi-class
IFT vs unrolled gradients at the bench shape.

The streaming multi-class was the last Laplace-family member still
differentiating through its remat'ed sweeps (6.04 s/iter in the round-4
session-6 measurement; every other family moved to IFT in r5 session 1
at 2.3-3.5x).  _stream_softmax_fixed_point replaces the newton_iters x 6
remat'ed sweeps in the reverse pass with one streaming coupled
(I + K W)^-1 apply (~12 block passes + refinement) + one vjp through a
two-sweep K-apply.

Shape: n=1M x 8, m=300, C=3, block 16384, f32 matmul HIGH, 8 Newton
steps (same as BENCH's materialized multiclass leg).

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_mc_stream_ift_tpu.py

RESULTS (v5e-1, 2026-08-20, same session):
  stream-multiclass[ift]    (8 Newton, C=3): 1040 ms/iter (ev -1183331.8)
  stream-multiclass[unroll] (8 Newton, C=3): 3120 ms/iter (ev -1183331.8)
  -> 3.0x, values identical; every Laplace-family member now trains on
  the one-solve implicit backward.  (The r4 session-6 figure 6.04 s/iter
  was 15 Newton at block 32768 — not directly comparable; the unroll leg
  above is the same-session same-config baseline.)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso

N, D, M, BLOCK = 1_000_000, 8, 300, 16384


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
    lin = np.asarray(X) @ (np.arange(D) * 0.3 + 0.2)
    labels = jnp.asarray(
        np.digitize(np.sin(lin), [-0.3, 0.3]).astype(np.int32))
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    from gpr_tpu.models.classify_multi_stream import (
        stream_multiclass_log_evidence,
    )

    for impl in ("ift", "unroll"):
        def f(p, z, X, labels, impl=impl):
            return stream_multiclass_log_evidence(
                SeIso, p, z, X, labels, 3, block_size=BLOCK,
                newton_iters=8, grad_impl=impl,
            )

        vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
        t0 = time.perf_counter()
        out = vg(p, Z, X, labels)
        sync(out)
        first = time.perf_counter() - t0
        per = []
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [vg(p, Z, X, labels) for _ in range(4)]
            sync(outs[-1])
            per.append((time.perf_counter() - t0) / 4)
        ev = float(jax.tree.leaves(out)[0])
        print(f"stream-multiclass[{impl}] (8 Newton, C=3): "
              f"{min(per)*1e3:.0f} ms/iter (first {first:.1f}s, "
              f"ev {ev:.1f})", flush=True)


if __name__ == "__main__":
    main()
