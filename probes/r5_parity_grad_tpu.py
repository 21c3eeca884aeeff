"""Round-5 probe: the f64 parity mode's TRAINING price on the TPU.

probes/r5_accurate_fix.py leg E measured the f64 parity FORWARD
(+0.062 nats = 2.9e-8 relative, 1.62 s/eval).  This measures the full
evidence+GRADIENT step through the production streaming custom VJP at
f64 — the number a user pays to TRAIN at reference parity on the
hardware — plus the f32 fast e+g in the same session for the ratio.

Shape: 1M x 8, m=300, block 16384, se_iso, explicit jitter 1e-6.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_parity_grad_tpu.py

RESULTS (v5e-1, 2026-08-20; degraded-tunnel session — f32 read 60.7 ms
where the same-day bench pipeline read 34.3, so quote the RATIO):

  f32 fast e+g:      60.7 ms/iter  (ev -2123415.8)
  f64 parity e+g:  4633.8 ms/iter  (ev -2123659.34 vs truth -2123659.40)

The production streaming custom VJP runs unchanged at f64: one full
training iteration at reference parity (+0.06 nats = 3e-8) costs ~76x
the f32 fast iteration on this chip — i.e. parity TRAINING at 1M rows
is ~4.6 s/iter, entirely usable for a final polish phase (cf. the
existing host f64 -polish, which subsamples; this is full-data).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso

N, D, M, BLOCK = 1_000_000, 8, 300, 16384


def timed(vg, args, reps=4):
    t0 = time.perf_counter()
    out = vg(*args)
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)
    first = time.perf_counter() - t0
    per = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [vg(*args) for _ in range(reps)]
        for leaf in jax.tree.leaves(outs[-1]):
            np.asarray(leaf)
        per.append((time.perf_counter() - t0) / reps)
    return min(per), first, float(jax.tree.leaves(out)[0])


def main():
    from gpr_tpu.models.streaming import streaming_log_evidence

    config.matmul_precision = "high"
    rng = np.random.default_rng(0)
    Xn = rng.standard_normal((N, D)).astype(np.float32)
    yn = rng.standard_normal(N).astype(np.float32)
    Zn = rng.standard_normal((M, D)).astype(np.float32)

    def f(params, z, sigma2, X, y):
        return streaming_log_evidence(
            SeIso, params, z, sigma2, X, y, block_size=BLOCK, jitter=1e-6
        )

    # f32 fast e+g (same session, for the ratio)
    X, y, Z = jnp.asarray(Xn), jnp.asarray(yn), jnp.asarray(Zn)
    p32 = SeIso.Params(log_ell=jnp.asarray(0.5, jnp.float32),
                       log_sf2=jnp.asarray(0.0, jnp.float32))
    vg32 = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
    per, first, ev = timed(vg32, (p32, Z, jnp.asarray(0.1, jnp.float32),
                                  X, y))
    print(f"f32 fast e+g:   {per*1e3:7.1f} ms/iter (first {first:.1f}s, "
          f"ev {ev:.1f})", flush=True)

    # f64 parity e+g
    jax.config.update("jax_enable_x64", True)
    X64 = jnp.asarray(Xn, jnp.float64)
    y64 = jnp.asarray(yn, jnp.float64)
    Z64 = jnp.asarray(Zn, jnp.float64)
    p64 = SeIso.Params(log_ell=jnp.asarray(0.5, jnp.float64),
                       log_sf2=jnp.asarray(0.0, jnp.float64))
    vg64 = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
    per, first, ev = timed(vg64, (p64, Z64, jnp.asarray(0.1, jnp.float64),
                                  X64, y64), reps=2)
    print(f"f64 parity e+g: {per*1e3:7.1f} ms/iter (first {first:.1f}s, "
          f"ev {ev:.2f}; f64 truth -2123659.40)", flush=True)


if __name__ == "__main__":
    main()
