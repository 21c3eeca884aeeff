"""Round-5 probe: the iterative exact GP at n >= 100k with the
residual-replacement pcg (models/iterative.py), after
probes/r4_iterative_tpu.py measured the f32 recursive residual DIVERGING
at n >= 50k (relres 3.16 at 50k / 13.8 at 100k after 200 iters): once the
per-matvec rounding noise (~lambda_max * eps ~ 1e4 * 1e-7) reaches the
residual scale, the recursion drifts and the old stopping rule reported
garbage.  pcg now re-syncs r = b - A x every 50 iterations and reports
the TRUE final relres.

Legs (f32, se_iso, d=8, m=1024 anchors, block 8192, sigma2=0.1):
  1. n=100k alpha solve, tol 1e-3  (dense K = 40 GB — impossible on chip)
  2. n=200k alpha solve, tol 1e-3
  3. n=100k predictive variances for 256 test points
  4. n=100k evidence_grads_iter (8 Hutchinson probes) — the SGD step

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_iterative_tpu.py

RESULTS (v5e-1, 2026-08-20, m=1024 anchors, tol 1e-3, f32; reproduced
across two sessions to 0.1%):

  iter alpha n=100k b=8192:        21.45 s   194 iters, TRUE relres 8.0e-4
  iter variances 256 pts @ 100k:   30.7 s    112 iters, relres 7.6e-4,
                                             var range [0.1001, 0.1489]
  evidence_grads_iter n=100k p=8:   3.34 s   13 iters (the SGD step)

Findings:
  * The r4 f32 divergence at n >= 50k is FIXED in effect: the residual
    replacement reports TRUE relres 8e-4 at 100k where r4 measured the
    drifted recursion at 13.8.
  * evidence_grads_iter needed jax.checkpoint on the kernel_matvec scan
    body: reverse mode otherwise stacks every (block, n) tile — 42.6 GB
    at this shape, AOT-allocation failure (fixed in models/iterative.py;
    gradients bit-identical on the CPU smoke).
  * Single-chip capacity: the n=200k alpha solve KILLS the v5e worker at
    block 8192 (6.5 GB tile), 4096, AND 2048 (1.6 GB tile) — three
    crashes, the last well inside HBM arithmetic, so the limit is a
    worker/runtime fault, not tile size.  n ~ 1e5 is the practical
    single-chip bound for the iterative exact path on this stack; past
    it, shard rows (parallel.iter_sharded.sharded_iter_solve — in the
    driver dryrun) or train sparse and predict exactly at n <= 1e5.
  * Probe hygiene held: the 200k attempt runs LAST, so the crash cost
    nothing.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models import (
    evidence_grads_iter,
    iter_trained,
    predict_variances_iter,
)

D, M, BLOCK = 8, 1024, 8192
PARAMS = SeIso.Params(log_ell=jnp.asarray(1.0, jnp.float32),
                      log_sf2=jnp.asarray(0.0, jnp.float32))
S2 = 0.1


def _data(n, seed=0):
    key = jax.random.PRNGKey(seed)
    X = jax.random.normal(key, (n, D), jnp.float32)
    y = jnp.sin(X.sum(axis=1)) + 0.1 * jax.random.normal(
        jax.random.fold_in(key, 1), (n,), jnp.float32
    )
    return X, y


def _timed(label, fn, reps=2):
    t0 = time.time()
    out = fn()
    out = jax.tree.map(np.asarray, out)
    t_first = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        jax.tree.map(np.asarray, out)
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts):.3f} s (first {t_first:.1f}s)", flush=True)
    return out


def main():
    # every leg is wrapped in jax.jit: on the remote tunnel the eager path
    # compiles each lax primitive as its own executable (first attempt of
    # this probe hung >25 min in that mode); one jit = one AOT compile
    print("device:", jax.devices()[0].device_kind, flush=True)

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def leg_alpha(X, y, block):
        return iter_trained(SeIso, PARAMS, X, y, S2, n_inducing=M,
                            tol=1e-3, max_iter=400, block_size=block)

    # the matvec tile is (block, n) floats: block 8192 at n=200k is 6.5 GB
    # and CRASHED the v5e worker (first run of this probe); block 4096
    # (3.3 GB tile) crashed it too on the second run — the 200k leg is
    # LAST (below) so a worker kill cannot take the n=100k measurements
    # with it (probe-hygiene rule, classify_multi_stream_big_tpu.py)
    X, y = _data(100_000)
    tr = _timed("iter alpha n=100k b=8192", lambda: leg_alpha(X, y, BLOCK))
    print(f"  iters={int(tr.iters)} TRUE relres={float(tr.relres):.2e}",
          flush=True)

    Xs = _data(256, seed=7)[0]

    @jax.jit
    def leg_var(tr, X, Xs):
        return predict_variances_iter(SeIso, PARAMS, tr, X, Xs,
                                      tol=1e-3, max_iter=400,
                                      block_size=BLOCK)

    var, info = _timed(
        "iter variances 256 pts @ n=100k", lambda: leg_var(tr, X, Xs)
    )
    print(f"  iters={int(info['iters'])} TRUE relres "
          f"{float(jnp.max(info['relres'])):.2e} var range "
          f"[{float(var.min()):.4f}, {float(var.max()):.4f}]", flush=True)

    @jax.jit
    def leg_grads(X, y):
        return evidence_grads_iter(SeIso, PARAMS, X, y, S2,
                                   jax.random.PRNGKey(2), n_probes=8,
                                   n_inducing=M, tol=1e-3, max_iter=400,
                                   block_size=BLOCK)

    (gp, gs), info = _timed(
        "evidence_grads_iter n=100k p=8", lambda: leg_grads(X, y)
    )
    print(f"  iters={int(info['iters'])} g_log_ell={float(gp.log_ell):+.3e} "
          f"g_sigma2={float(gs):+.3e}", flush=True)

    # 200k attempt LAST (may kill the worker; nothing depends on it)
    X2, y2 = _data(200_000)
    tr2 = _timed("iter alpha n=200k b=2048",
                 lambda: leg_alpha(X2, y2, 2048))
    print(f"  iters={int(tr2.iters)} TRUE relres={float(tr2.relres):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
