"""Round-5 probe: attribute the accurate-mode residual (+5.9 nats in
BENCH_r04) below the floor r4_tpu_error_split.py reached.

Accurate mode = matmul HIGHEST (fwd), jitter 1e-6.  With every GEMM at
6-pass bf16 (~f32-exact per element), what remains is (hypotheses):
  (k) kernel elementwise rounding — the f32 exp/sqdist entries themselves,
  (s) the O(n) f32 scalar reductions (log-det sum, y'Sy, within/across
      blocks),
  (g) f32 accumulation of gram/u_vec ACROSS the 61 block partials,
  (e) the m x m epilogue (chol/logdet/solve) in f32.

Method: a host f64 mirror computes the exact stats from the SAME f32
inputs, twice — (A) kernel entries computed in f64, (B) kernel entries
computed in f64 then ROUNDED TO F32 before the exact downstream — so
(B)-(A) isolates (k).  The device's accurate-mode stats are then swapped
one at a time into the host-f64 stat set; each swap's evidence delta is
that stat's contribution.  The f64 epilogue on full-device stats vs the
device evidence isolates (e).

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_accurate_residual.py
"""

import sys
import time

import numpy as np
import scipy.linalg as sla

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.fitc import calc_inducing
from gpr_tpu.models.streaming import evidence_from_stats, stream_stats

N, D, M = 1_000_000, 8, 300
BLOCK = 16384


def host_stats(Xn, yn, Zn, log_ell, log_sf2, sigma2, round_kernel):
    """Exact f64 stream stats from f32 inputs; optionally round kernel
    entries (and the prior diag r) to f32 first to isolate elementwise
    kernel rounding."""
    ell2 = np.exp(2.0 * log_ell)
    sf2 = np.exp(log_sf2)

    def cross(A, B):
        d2 = ((A * A).sum(1)[:, None] - 2.0 * (A @ B.T)
              + (B * B).sum(1)[None, :])
        k = sf2 * np.exp(np.maximum(d2, 0.0) * (-0.5 / ell2))
        return k.astype(np.float32).astype(np.float64) if round_kernel else k

    km = cross(Zn, Zn)
    np.fill_diagonal(km, np.float32(sf2) if round_kernel else sf2)
    jit = 1e-6  # accurate mode keeps the reference's absolute jitter
    u = sla.cholesky(km + jit * np.eye(M), lower=False)
    u_inv = sla.solve_triangular(u, np.eye(M), lower=False)

    gram = np.zeros((M, M))
    uvec = np.zeros(M)
    lds = 0.0
    yiy = 0.0
    for i in range(0, N, BLOCK):
        xb, yb = Xn[i:i + BLOCK], yn[i:i + BLOCK]
        v = cross(xb, Zn) @ u_inv
        r = sf2 - (v * v).sum(1)
        s = r + sigma2
        is_ = 1.0 / s
        a = v * np.sqrt(is_)[:, None]
        gram += a.T @ a
        uvec += v.T @ (is_ * yb)
        lds += np.log(s).sum()
        yiy += (is_ * yb * yb).sum()
    return gram, uvec, lds, yiy


def epilogue(gram, uvec, lds, yiy):
    rt = sla.cholesky(np.eye(M) + gram, lower=False)
    t = sla.solve_triangular(rt.T, uvec, lower=True)
    l1 = -0.5 * (2.0 * np.log(np.diag(rt)).sum() + lds
                 + N * np.log(2.0 * np.pi))
    l2 = -0.5 * (yiy - t @ t)
    return l1 + l2


def main():
    config.matmul_precision = "highest"
    config.cholesky_jitter = 1e-6
    dt = jnp.float32
    rng = np.random.default_rng(0)
    Xn = rng.standard_normal((N, D)).astype(np.float32)
    yn = rng.standard_normal(N).astype(np.float32)
    Zn = rng.standard_normal((M, D)).astype(np.float32)
    X, y, Z = jnp.asarray(Xn), jnp.asarray(yn), jnp.asarray(Zn)
    params = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                          log_sf2=jnp.asarray(0.0, dt))
    sigma2 = 0.1

    print("host f64 mirror (exact kernel)...", flush=True)
    t0 = time.perf_counter()
    gA, uA, ldsA, yiyA = host_stats(
        Xn.astype(np.float64), yn.astype(np.float64),
        Zn.astype(np.float64), 0.5, 0.0, sigma2, round_kernel=False)
    evA = epilogue(gA, uA, ldsA, yiyA)
    print(f"  {time.perf_counter()-t0:.0f}s  TRUTH(f32 inputs, f64 math) "
          f"= {evA:.2f}", flush=True)

    print("host f64 mirror (kernel rounded to f32)...", flush=True)
    gB, uB, ldsB, yiyB = host_stats(
        Xn.astype(np.float64), yn.astype(np.float64),
        Zn.astype(np.float64), 0.5, 0.0, sigma2, round_kernel=True)
    evB = epilogue(gB, uB, ldsB, yiyB)
    print(f"  kernel-elementwise contribution (B - A): {evB - evA:+.2f}",
          flush=True)

    # device accurate-mode stats
    @jax.jit
    def f(params, z, sigma2, X, y):
        # jitter must be EXPLICIT: the f32 default is diag-scaled (+56.5
        # nats at this shape) regardless of config.cholesky_jitter, and
        # the host mirror above uses the reference's absolute 1e-6 — the
        # first run of this probe conflated the two (total read +62.4 with
        # the bias buried in the log_det_s/y_is_y swaps)
        inducing = calc_inducing(SeIso, params, z, 1e-6)
        stats = stream_stats(SeIso, params, inducing, sigma2, X, y,
                             block_size=BLOCK)
        return stats, evidence_from_stats(inducing, stats)

    t0 = time.perf_counter()
    stats, ev = f(params, Z, jnp.asarray(sigma2, dt), X, y)
    ev_dev = float(np.asarray(ev))
    print(f"device accurate-mode evidence {ev_dev:.2f} "
          f"(err vs A {ev_dev - evA:+.2f}; first "
          f"{time.perf_counter()-t0:.0f}s)", flush=True)

    # NOTE: the production path whitens (gram is over a = v sqrt(is)) —
    # confirm the device gram matches that convention before swapping.
    gD = np.asarray(stats.gram, np.float64)
    uD = np.asarray(stats.u_vec, np.float64)
    ldsD = float(stats.log_det_s)
    yiyD = float(stats.y_is_y)

    ev_all_dev64 = epilogue(gD, uD, ldsD, yiyD)
    print(f"f64 epilogue on device stats: {ev_all_dev64:.2f} -> device "
          f"epilogue rounding {ev_dev - ev_all_dev64:+.2f}", flush=True)

    base = (gB, uB, ldsB, yiyB)
    names = ["gram", "u_vec", "log_det_s", "y_is_y"]
    devs = [gD, uD, ldsD, yiyD]
    for i, nm in enumerate(names):
        swapped = list(base)
        swapped[i] = devs[i]
        dv = epilogue(*swapped) - evB
        print(f"  swap {nm:10s} -> device: {dv:+.3f}", flush=True)
    print(f"residual closure check: sum of swaps + (B-A) + epilogue-rounding "
          f"should be ~= total {ev_dev - evA:+.2f}", flush=True)


if __name__ == "__main__":
    main()
