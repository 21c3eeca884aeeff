"""TPU timings for the iterative exact GP (models/iterative.py).

Question: past the dense-chol ceiling (n ~ 20k; probes/r4_exact_tpu.py
measured XLA's TPU potrf at ~5 TF/s, 2.03 s/evidence+grad at 20k), what
does EXACT posterior inference cost via FITC-preconditioned CG, where every
flop is a blocked MXU GEMM and K is never materialized?

Legs (f32, se_iso, d=8, m=512 preconditioner, block 8192):
  1. n=16k   iterative alpha solve vs dense exact alpha (same session,
             correctness cross-check at a shape both paths can do)
  2. n=50k   alpha solve (dense K would be 10 GB — marginal on v5e HBM)
  3. n=100k  alpha solve (dense K = 40 GB — impossible on one chip)
  4. n=50k   predictive variances for 256 test points (batched CG columns)
  5. n=50k   evidence_grads_iter (8 probes) — the stochastic training step

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r4_iterative_tpu.py

RESULTS: recorded below after the run.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models import (
    calc_exact,
    evidence_grads_iter,
    exact_trained,
    iter_trained,
    predict_variances_iter,
)

D, M, BLOCK = 8, 512, 8192
PARAMS = SeIso.Params(log_ell=jnp.asarray(1.0, jnp.float32),
                      log_sf2=jnp.asarray(0.0, jnp.float32))
S2 = 0.05


def _data(n, seed=0):
    key = jax.random.PRNGKey(seed)
    X = jax.random.normal(key, (n, D), jnp.float32)
    y = jnp.sin(X.sum(axis=1)) + 0.1 * jax.random.normal(
        jax.random.fold_in(key, 1), (n,), jnp.float32
    )
    return X, y


def _timed(label, fn, reps=3):
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
    print("device:", jax.devices()[0].device_kind, flush=True)

    # --- leg 1: 16k cross-check vs dense ---
    X, y = _data(16_000)
    tr = _timed(
        "iter alpha n=16k",
        lambda: iter_trained(SeIso, PARAMS, X, y, S2, n_inducing=M,
                             tol=1e-4, max_iter=200, block_size=BLOCK),
    )
    print(f"  iters={int(tr.iters)} relres={float(tr.relres):.2e}",
          flush=True)
    dense = _timed(
        "dense alpha n=16k",
        lambda: exact_trained(calc_exact(SeIso, PARAMS, X, S2), y),
        reps=2,
    )
    rel = float(jnp.linalg.norm(tr.alpha - dense.alpha)
                / jnp.linalg.norm(dense.alpha))
    print(f"  |alpha_iter - alpha_dense| / |alpha_dense| = {rel:.2e}",
          flush=True)

    # --- legs 2-3: past the dense ceiling ---
    for n in (50_000, 100_000):
        X, y = _data(n)
        tr = _timed(
            f"iter alpha n={n//1000}k",
            lambda: iter_trained(SeIso, PARAMS, X, y, S2, n_inducing=M,
                                 tol=1e-4, max_iter=200, block_size=BLOCK),
        )
        print(f"  iters={int(tr.iters)} relres={float(tr.relres):.2e}",
              flush=True)

    # --- leg 4: variances at 50k ---
    X, y = _data(50_000)
    tr = iter_trained(SeIso, PARAMS, X, y, S2, n_inducing=M, tol=1e-4,
                      max_iter=200, block_size=BLOCK)
    Xs = _data(256, seed=7)[0]
    var, info = _timed(
        "iter variances 256 pts @ n=50k",
        lambda: predict_variances_iter(SeIso, PARAMS, tr, X, Xs,
                                       tol=1e-3, max_iter=200,
                                       block_size=BLOCK),
    )
    print(f"  iters={int(info['iters'])} var range "
          f"[{float(var.min()):.4f}, {float(var.max()):.4f}]", flush=True)

    # --- leg 5: stochastic evidence gradient at 50k ---
    (gp, gs), info = _timed(
        "evidence_grads_iter n=50k p=8",
        lambda: evidence_grads_iter(SeIso, PARAMS, X, y, S2,
                                    jax.random.PRNGKey(2), n_probes=8,
                                    n_inducing=M, tol=1e-3, max_iter=200,
                                    block_size=BLOCK),
    )
    print(f"  iters={int(info['iters'])} g_log_ell={float(gp.log_ell):+.3e} "
          f"g_sigma2={float(gs):+.3e}", flush=True)


if __name__ == "__main__":
    main()
