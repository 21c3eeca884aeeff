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

RESULTS (v5e-1, 2026-08-20, two sessions, same numbers to 0.1 nat / 5%;
truth -2123659.40, so 1e-6 relative = 2.12 nats):

  A accurate baseline        err +5.876   fwd 22.0-22.5 ms
  B + direct sqdist          err +5.876   fwd 25.7-25.9 ms
  C + refined prep           err +5.439   fwd 25.8-26.5 ms
  D f64 s-stage, f32 tiles   err +6.129   fwd 25.6 ms
  E full f64 forward         err +0.062   fwd 1621.5 ms  (first 21s)

Verdict (this closes VERDICT r4 #2):
  * The accurate-mode residual is NOT in the reductions: direct
    (elementwise) sqdist changes nothing (B == A to 3 decimals), and
    computing the whole s-stage (r/s/is/log-sum/y_is_y inputs) in f64
    from the f32 V tiles is no better (D, +6.13 — the f32 s-stage
    arithmetic was actually partially cancelling entry error).  The
    error lives in the f32 kernel/V ENTRIES themselves, consistent with
    the r5_accurate_residual B-A swap: representing the kernel entries
    in f32 already costs +2.07 nats (0.98e-6) — the ~1e-6 bar sits AT
    the f32-tile representation floor, and no f32-tile pipeline can go
    meaningfully below it (split-operand GEMMs measured 10x worse,
    probes/r5_split_gemm.py).
  * Full f64 on the TPU (the axon backend emulates f64; the production
    _forward_scan runs unchanged under x64) reaches +0.06 nats =
    2.9e-8 relative — the parity bar met ON HARDWARE at a measured 74x
    the f32 forward cost.  That is the honest menu: fast f32 22 ms
    (+307), accurate f32 22.5 ms HIGHEST (+5.9 = 2.8e-6, gradient path
    +42%), refined-prep 26 ms (+5.4), f64 parity 1.62 s (+0.06).
    bench.py prints the parity leg every round; MANUAL section 7
    documents the menu.
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

    # --- round-5 session-3 legs: f64 islands -------------------------------
    # B/C above measured: the f32 kernel-entry REPRESENTATION floor (+2.07
    # by the r5_accurate_residual B-A swap) cannot be beaten by any f32-tile
    # pipeline; direct sqdist moved nothing.  So measure what f64 on-device
    # actually costs (the axon backend emulates f64).
    from gpr_tpu.numerics.linalg import rows_sqr_norm
    from gpr_tpu.models.streaming import _pad_blocks as _pb

    def run_hybrid(name):
        """D: tiles f32 (GEMM HIGHEST), s-stage in f64: r/s/is/log-sums and
        the u_vec/y_is_y inputs at f64; the gram GEMM stays f32.  Needs the
        x64 ctx for the f64 dtypes to be real (f32 inputs stay f32)."""
        config.sqdist_impl = "gemm"
        jax.config.update("jax_enable_x64", True)

        @jax.jit
        def f(params, z, sigma2, X, y):
            u_inv = prep_plain(params, z)
            xb, yb, maskb = _pad_blocks(X, y, None, BLOCK)

            def body(carry, blk):
                x_b, y_b, m_b = blk
                knm = SeIso.k_cross(params, x_b, z)
                kd = SeIso.k_diag(params, x_b)
                v = jnp.matmul(knm, u_inv,
                               precision=jax.lax.Precision.HIGHEST)
                v64 = v.astype(jnp.float64)
                r = kd.astype(jnp.float64) - rows_sqr_norm(v64)
                live = m_b > 0
                s = jnp.where(live, r + jnp.float64(sigma2), 1.0)
                is64 = m_b.astype(jnp.float64) / s
                a = v * jnp.sqrt(is64).astype(jnp.float32)[:, None]
                g, uv, lds, yiy = carry
                y64 = y_b.astype(jnp.float64)
                return (
                    g + jnp.matmul(a.T, a,
                                   precision=jax.lax.Precision.HIGHEST
                                   ).astype(jnp.float64),
                    uv + jnp.matmul(v.T, (is64 * y64).astype(jnp.float32),
                                    precision=jax.lax.Precision.HIGHEST
                                    ).astype(jnp.float64),
                    lds + jnp.sum(jnp.where(live, jnp.log(s), 0.0)),
                    yiy + jnp.sum(is64 * y64 * y64),
                ), None

            m = z.shape[0]
            init = (jnp.zeros((m, m), jnp.float64),
                    jnp.zeros((m,), jnp.float64),
                    jnp.zeros((), jnp.float64), jnp.zeros((), jnp.float64))
            out, _ = jax.lax.scan(body, init, (xb, yb, maskb))
            return out

        t0 = time.perf_counter()
        out = f(params, Z, sigma2, X, y)
        stats = [np.asarray(o, np.float64) for o in out]
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
        jax.config.update("jax_enable_x64", False)

    run_hybrid("D f64 s-stage, f32 tiles")

    def run_full64(name):
        """E: the production _forward_scan at f64 end to end (x64 ctx)."""
        jax.config.update("jax_enable_x64", True)
        if True:  # (was the enable_x64 ctx; gone in jax 0.9 — config.update)
            X64 = jnp.asarray(Xn, jnp.float64)
            y64 = jnp.asarray(yn, jnp.float64)
            Z64j = jnp.asarray(Zn, jnp.float64)
            p64 = SeIso.Params(log_ell=jnp.asarray(0.5, jnp.float64),
                               log_sf2=jnp.asarray(0.0, jnp.float64))

            @jax.jit
            def f(params, z, sigma2, X, y):
                u_inv = prep_plain(params, z)
                xb, yb, maskb = _pb(X, y, None, BLOCK)
                return _forward_scan(SeIso, params, z, u_inv, sigma2,
                                     xb, yb, maskb, 1)

            t0 = time.perf_counter()
            out = f(p64, Z64j, jnp.asarray(0.1, jnp.float64), X64, y64)
            stats = [np.asarray(o, np.float64) for o in out[:4]]
            first = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [f(p64, Z64j, jnp.asarray(0.1, jnp.float64), X64,
                          y64) for _ in range(4)]
                np.asarray(outs[-1][2])
                times.append((time.perf_counter() - t0) / 4)
            ev = epilogue64(*stats)
            print(f"{name:34s} err {ev-truth:+7.3f}  fwd "
                  f"{min(times)*1e3:6.1f} ms  (first {first:.0f}s)",
                  flush=True)

    run_full64("E full f64 forward")


if __name__ == "__main__":
    main()
