"""TPU timing probe (round 5): IFT vs unrolled gradients, bench shape.

Measures value_and_grad of the non-Gaussian evidences at n=1M x 8, m=300
f32 under both grad routes (VERDICT r4 #1: the unrolled route measured
1.17-2.77 s/iter in BENCH_r04; the IFT backward should cut the reverse
pass by ~the sweep count).  Same-session pairs only — tunnel drift makes
cross-session comparisons +-30%.

Measured same-session (TPU v5e-1): classify 486 vs 1166 ms (2.40x),
poisson 618 vs 1528 (2.47x), ordinal 576 vs 1346 (2.34x), multiclass
782 vs 2750 (3.52x) — every family clears VERDICT r4's >= 2x bar.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_ift_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso

N, D, M = 1_000_000, 8, 300


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def time_vg(vg, args, reps=4, rounds=2):
    t0 = time.perf_counter()
    out = vg(*args)
    sync(out)
    first = time.perf_counter() - t0
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [vg(*args) for _ in range(reps)]
        sync(outs[-1])
        per.append((time.perf_counter() - t0) / reps)
    return min(per), first, float(jax.tree.leaves(out)[0])


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    lin = np.asarray(X) @ (np.arange(D) * 0.3 + 0.2)
    y_bin = jnp.asarray(np.sign(np.sin(lin)), dt)
    y_cnt = jnp.asarray(rng.poisson(np.exp(np.clip(np.sin(lin), -2, 2))),
                        dt)
    labels = jnp.asarray(
        np.digitize(np.sin(lin), [-0.3, 0.3]).astype(np.int32))
    y_ord = labels  # 3 ordered categories reused for the ordinal leg
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    from gpr_tpu.models.classify import classify_log_evidence
    from gpr_tpu.models.classify_multi import multiclass_log_evidence
    from gpr_tpu.models.ordinal import (
        default_cutpoint_raw,
        ordinal_log_evidence,
    )
    from gpr_tpu.models.poisson import poisson_log_evidence

    legs = []

    def add(name, fn, args):
        legs.append((name, fn, args))

    for impl in ("ift", "unroll"):
        add(f"classify[{impl}] (15 Newton)",
            lambda p, z, X, y, impl=impl: classify_log_evidence(
                SeIso, p, z, X, y, newton_iters=15, grad_impl=impl),
            (p, Z, X, y_bin))
    for impl in ("ift", "unroll"):
        add(f"poisson[{impl}] (20 Newton)",
            lambda p, z, X, y, impl=impl: poisson_log_evidence(
                SeIso, p, z, X, y, newton_iters=20, grad_impl=impl),
            (p, Z, X, y_cnt))
    cut0 = jnp.asarray(default_cutpoint_raw(3, dt))
    for impl in ("ift", "unroll"):
        add(f"ordinal[{impl}] (15 Newton, K=3)",
            lambda p, z, X, y, c, impl=impl: ordinal_log_evidence(
                SeIso, p, z, X, y, c, newton_iters=15, grad_impl=impl),
            (p, Z, X, y_ord, cut0))
    for impl in ("ift", "unroll"):
        add(f"multiclass[{impl}] (8 Newton, C=3)",
            lambda p, z, X, y, impl=impl: multiclass_log_evidence(
                SeIso, p, z, X, y, 3, newton_iters=8, grad_impl=impl),
            (p, Z, X, labels))

    for name, fn, args in legs:
        vg = jax.jit(jax.value_and_grad(fn, argnums=(0, 1)))
        per, first, ev = time_vg(vg, args)
        print(f"{name}: {per*1e3:.0f} ms/iter (first {first:.1f}s, "
              f"ev {ev:.1f})", flush=True)


if __name__ == "__main__":
    main()
