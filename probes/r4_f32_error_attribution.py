"""Round-4 probe: attribute the f32 evidence error at the bench shape.

BENCH r2/r4 stderr shows the on-TPU f32 evidence lands +203 (dense) / +307
(streaming) nats above the f64 truth -2123659.4 at 1M x 8 m=300 — 1.4e-4
relative.  VERDICT r3 item 3 asks WHERE it comes from: the Gram GEMM, the
O(n) scalar reductions, the kernel eval, or the per-row s = r + sigma2
elementwise chain.

Method: a numpy mirror of the streaming whitened computation
(models/streaming.py stream_stats + epilogue) where every STAGE can run in
f32 or f64 independently:

  kernel — sqdist expansion + exp            (per-tile, elementwise + GEMM)
  vgemm  — V = Knm @ U^-1                    (the forward GEMM)
  srow   — r = kd - rowsq(V), s, log s, 1/s  (per-row elementwise)
  accum  — gram/u_vec GEMM accumulation + scalar reductions across tiles
  epilog — chol(I+G), solves, log dets       (O(m^3))

All-f64 must reproduce the cached truth; all-f32 should land near the TPU's
+307; upgrading ONE stage to f64 at a time attributes the error.  numpy f32
GEMMs are not bit-identical to the TPU's 3-pass bf16 f32-HIGH, but both
carry ~f32-level per-element error, so the DECOMPOSITION carries over.

Run (CPU, ~10 min): python probes/r4_f32_error_attribution.py
"""

import sys
import time

import numpy as np
import scipy.linalg as sla

N, D, M = 1_000_000, 8, 300
BLOCK = 16384
LOG_ELL, LOG_SF2, SIGMA2 = 0.5, 0.0, 0.1
TRUTH = -2123659.4  # bench.py cached f64 truth at this exact config


def evidence(stage_dtypes):
    """Streaming whitened evidence with per-stage dtypes."""
    dk = stage_dtypes.get("kernel", np.float32)
    dv = stage_dtypes.get("vgemm", np.float32)
    ds = stage_dtypes.get("srow", np.float32)
    da = stage_dtypes.get("accum", np.float32)
    de = stage_dtypes.get("epilog", np.float32)

    rng = np.random.default_rng(0)
    # identical f32 data to bench.py
    X = rng.standard_normal((N, D)).astype(np.float32)
    y = rng.standard_normal(N).astype(np.float32)
    Z = rng.standard_normal((M, D)).astype(np.float32)

    ell2 = np.exp(2.0 * LOG_ELL)
    sf2 = np.exp(LOG_SF2)
    q = -0.5 / ell2

    def cross(A, B, dt):
        A, B = A.astype(dt), B.astype(dt)
        d2 = ((A * A).sum(1)[:, None] - 2.0 * A @ B.T
              + (B * B).sum(1)[None, :])
        return (sf2 * np.exp(np.maximum(d2, 0.0) * q)).astype(dt)

    # inducing factor in the EPILOG dtype (matches calc_inducing: one m x m
    # chol, f32 jitter policy diag-scaled ~1.2e-7*sf2 — negligible here)
    km = cross(Z, Z, de)
    np.fill_diagonal(km, sf2)
    jit = 1e-6 if de == np.float64 else 32 * np.finfo(np.float32).eps * sf2
    u = sla.cholesky((km + jit * np.eye(M, dtype=de)).astype(de), lower=False)
    u_inv = sla.solve_triangular(u, np.eye(M, dtype=de), lower=False)

    gram = np.zeros((M, M), da)
    uvec = np.zeros(M, da)
    lds = da(0.0)
    yiy = da(0.0)
    for i0 in range(0, N, BLOCK):
        xb = X[i0:i0 + BLOCK]
        yb = y[i0:i0 + BLOCK]
        knm = cross(xb, Z, dk)
        v = (knm.astype(dv) @ u_inv.astype(dv)).astype(dv)
        r = (sf2 - (v.astype(ds) * v.astype(ds)).sum(1)).astype(ds)
        s = (r + ds(SIGMA2)).astype(ds)
        is_ = (ds(1.0) / s).astype(ds)
        sqrt_is = np.sqrt(is_).astype(ds)
        a = (v.astype(ds) * sqrt_is[:, None]).astype(da)
        gram += a.T @ a
        uvec += v.astype(da).T @ (is_.astype(da) * yb.astype(da))
        lds += np.log(s).astype(da).sum(dtype=da)
        yiy += (is_.astype(da) * yb.astype(da) * yb.astype(da)).sum(dtype=da)

    bt = np.eye(M, dtype=de) + gram.astype(de)
    rt = sla.cholesky(bt, lower=False)
    t = sla.solve_triangular(rt.T, uvec.astype(de), lower=True)
    l1 = -0.5 * (2.0 * np.log(np.diag(rt)).sum() + float(lds)
                 + N * np.log(2.0 * np.pi))
    l2 = -0.5 * (float(yiy) - float(t @ t))
    return l1 + l2


def main():
    f32, f64 = np.float32, np.float64
    cases = [
        ("all f64 (truth check)", {k: f64 for k in
                                   ("kernel", "vgemm", "srow", "accum",
                                    "epilog")}),
        ("all f32 (TPU mirror)", {}),
        ("kernel->f64", {"kernel": f64}),
        ("vgemm->f64", {"vgemm": f64}),
        ("srow->f64", {"srow": f64}),
        ("accum->f64", {"accum": f64}),
        ("epilog->f64", {"epilog": f64}),
        ("kernel+vgemm->f64", {"kernel": f64, "vgemm": f64}),
        ("srow+accum->f64", {"srow": f64, "accum": f64}),
    ]
    for name, st in cases:
        t0 = time.perf_counter()
        l = evidence(st)
        print(f"{name:24s} evidence {l:.1f}  err vs truth "
              f"{l - TRUTH:+8.1f}  ({time.perf_counter() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
