"""Round-5 probe: close the accurate-mode residual (+5.9 nats, BENCH_r04)
using the r5 tile-diff attribution (kernel entries +2.07 of the +2.9
sum-log-s stage total; u_inv f32 prep +0.86; GEMM/reduce ~0).

Device configs at the bench shape (1M x 8, m=300, block 16384, matmul
HIGHEST, explicit jitter 1e-6):
  A  accurate baseline            (r5_acc2 measured +5.90)
  B  + sqdist_impl='direct'       (1-ulp kernel entries, VPU elementwise)
  C  + refined prep: one mixed-precision Cholesky-factor refinement step
     (U2 = U + (0.5 diag + triu)(U'^-T E U^-1) U, E = A - U'U at HIGHEST)
     plus one Newton step on the triangular inverse (W2 = W + W(I - U2 W))

Each config reports the evidence error vs the f64 mirror truth
(-2123659.40 for this seed) via an f64 host epilogue on the device stats
(epilogue rounding measured +0.02, negligible), plus forward wall time.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_accurate_fix.py

RESULTS: recorded below after the run.
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
from gpr_tpu.models.stream_grad import _forward_scan
from gpr_tpu.models.streaming import _pad_blocks
from gpr_tpu.numerics.linalg import (
    cholesky_upper,
    inv_tri_upper,
    solve_tri,
)

N, D, M, BLOCK = 1_000_000, 8, 300, 16384


def epilogue64(gram, uvec, lds, yiy):
    rt = sla.cholesky(np.eye(M) + gram, lower=False)
    t = sla.solve_triangular(rt.T, uvec, lower=True)
    return (-0.5 * (2.0 * np.log(np.diag(rt)).sum() + lds
                    + N * np.log(2.0 * np.pi))
            - 0.5 * (yiy - t @ t))


def main():
    config.matmul_precision = "highest"
    dt = jnp.float32
    rng = np.random.default_rng(0)
    Xn = rng.standard_normal((N, D)).astype(np.float32)
    yn = rng.standard_normal(N).astype(np.float32)
    Zn = rng.standard_normal((M, D)).astype(np.float32)
    X, y, Z = jnp.asarray(Xn), jnp.asarray(yn), jnp.asarray(Zn)
    params = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                          log_sf2=jnp.asarray(0.0, dt))
    sigma2 = jnp.asarray(0.1, dt)

    # f64 mirror truth (same recipe as r5_accurate_residual.py case A)
    ell2 = np.exp(2 * 0.5); sf2 = 1.0
    def cross(A, B):
        d2 = ((A * A).sum(1)[:, None] - 2.0 * (A @ B.T)
              + (B * B).sum(1)[None, :])
        return sf2 * np.exp(np.maximum(d2, 0.0) * (-0.5 / ell2))
    Z64 = Zn.astype(np.float64); X64 = Xn.astype(np.float64)
    y64 = yn.astype(np.float64)
    km64 = cross(Z64, Z64); np.fill_diagonal(km64, sf2)
    u64 = sla.cholesky(km64 + 1e-6 * np.eye(M), lower=False)
    ui64 = sla.solve_triangular(u64, np.eye(M), lower=False)
    g = np.zeros((M, M)); uv = np.zeros(M); lds = 0.0; yiy = 0.0
    for i in range(0, N, BLOCK):
        v = cross(X64[i:i + BLOCK], Z64) @ ui64
        s = sf2 - (v * v).sum(1) + 0.1
        a = v / np.sqrt(s)[:, None]
        g += a.T @ a; uv += v.T @ (y64[i:i + BLOCK] / s)
        lds += np.log(s).sum(); yiy += (y64[i:i + BLOCK] ** 2 / s).sum()
    truth = epilogue64(g, uv, lds, yiy)
    print(f"f64 mirror truth: {truth:.2f}", flush=True)

    def prep_plain(params, z):
        ind = calc_inducing(SeIso, params, z, 1e-6)
        return inv_tri_upper(ind.chol_km)

    def prep_refined(params, z):
        km = SeIso.k_upper_inputs(params, z)
        A = km + 1e-6 * jnp.eye(M, dtype=km.dtype)
        U = cholesky_upper(A, 0.0)
        # factor refinement: E = A - U'U (HIGHEST GEMM), theta = U'^-T E U^-1
        E = A - jnp.matmul(U.T, U, precision=jax.lax.Precision.HIGHEST)
        Y = solve_tri(U, E, trans=True)      # U' Y = E
        Th = solve_tri(U, Y.T, trans=True).T  # theta = Y U^-1 (symmetric E)
        S = jnp.triu(Th, 1) + 0.5 * jnp.diag(jnp.diag(Th))
        U2 = U + jnp.matmul(S, U, precision=jax.lax.Precision.HIGHEST)
        W = inv_tri_upper(U2)
        R = jnp.eye(M, dtype=km.dtype) - jnp.matmul(
            U2, W, precision=jax.lax.Precision.HIGHEST)
        return W + jnp.matmul(W, R, precision=jax.lax.Precision.HIGHEST)

    def run(name, sq_impl, prep):
        config.sqdist_impl = sq_impl

        @jax.jit
        def f(params, z, sigma2, X, y):
            u_inv = prep(params, z)
            xb, yb, maskb = _pad_blocks(X, y, None, BLOCK)
            return _forward_scan(SeIso, params, z, u_inv, sigma2,
                                 xb, yb, maskb, 1)

        t0 = time.perf_counter()
        out = f(params, Z, sigma2, X, y)
        stats = [np.asarray(o, np.float64) for o in out[:4]]
        first = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [f(params, Z, sigma2, X, y) for _ in range(8)]
            np.asarray(outs[-1][2])
            times.append((time.perf_counter() - t0) / 8)
        ev = epilogue64(*stats)
        print(f"{name:34s} err {ev-truth:+7.3f}  fwd {min(times)*1e3:6.1f} ms"
              f"  (first {first:.0f}s)", flush=True)
        config.sqdist_impl = "gemm"

    run("A accurate baseline", "gemm", prep_plain)
    run("B + direct sqdist", "direct", prep_plain)
    run("C + refined prep", "direct", prep_refined)


if __name__ == "__main__":
    main()
