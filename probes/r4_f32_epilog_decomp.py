"""Round-4 follow-up: decompose the EPILOG stage of the f32 evidence error.

probes/r4_f32_error_attribution.py found that in a pure-f32 numpy mirror of
the streaming evidence, kernel/vgemm/srow/accum stages contribute < 0.1 nat
and the ENTIRE +17.7-nat error sits in the "epilog" stage — but that stage
conflated three things:

  (j) the jitter POLICY: f32 runs use the diag-scaled 32*eps*sf2 ~ 3.8e-6
      vs f64's absolute 1e-6 (a deliberate, documented model difference,
      PARITY_NOTES #9),
  (i) the inducing factor arithmetic: chol(Kmm + jit I), triangular inverse,
  (f) the final epilogue arithmetic: chol(I + G), solves, log dets, quad.

This probe varies them independently.  If (j) dominates, the f32 "error" is
mostly a slightly-more-regularized MODEL, not rounding — and the bench's
accuracy line should report the rounding part against a truth computed AT
the f32 jitter, separately from the jitter bias.

Run (CPU, ~4 min): python probes/r4_f32_epilog_decomp.py
"""

import time

import numpy as np
import scipy.linalg as sla

N, D, M = 1_000_000, 8, 300
BLOCK = 16384
LOG_ELL, LOG_SF2, SIGMA2 = 0.5, 0.0, 0.1
TRUTH = -2123659.4  # all-f64, jitter 1e-6 (bench.py cached)

JIT_F64 = 1e-6
JIT_F32 = 32 * np.finfo(np.float32).eps * np.exp(LOG_SF2)


def evidence(d_ind, d_fin, jit):
    """All streaming stages in f32 (measured irrelevant); the inducing
    factor in d_ind, the final epilogue in d_fin, explicit jitter."""
    f32 = np.float32
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, D)).astype(f32)
    y = rng.standard_normal(N).astype(f32)
    Z = rng.standard_normal((M, D)).astype(f32)

    ell2 = np.exp(2.0 * LOG_ELL)
    sf2 = np.exp(LOG_SF2)
    q = -0.5 / ell2

    def cross(A, B, dt):
        A, B = A.astype(dt), B.astype(dt)
        d2 = ((A * A).sum(1)[:, None] - 2.0 * A @ B.T
              + (B * B).sum(1)[None, :])
        return (sf2 * np.exp(np.maximum(d2, 0.0) * q)).astype(dt)

    km = cross(Z, Z, d_ind)
    np.fill_diagonal(km, sf2)
    u = sla.cholesky(
        (km + jit * np.eye(M, dtype=d_ind)).astype(d_ind), lower=False
    )
    u_inv = sla.solve_triangular(u, np.eye(M, dtype=d_ind), lower=False)
    u_inv32 = u_inv.astype(f32)

    gram = np.zeros((M, M), f32)
    uvec = np.zeros(M, f32)
    lds = f32(0.0)
    yiy = f32(0.0)
    for i0 in range(0, N, BLOCK):
        xb = X[i0:i0 + BLOCK]
        yb = y[i0:i0 + BLOCK]
        knm = cross(xb, Z, f32)
        v = knm @ u_inv32
        r = (sf2 - (v * v).sum(1)).astype(f32)
        s = (r + f32(SIGMA2)).astype(f32)
        is_ = (f32(1.0) / s).astype(f32)
        sqrt_is = np.sqrt(is_).astype(f32)
        a = v * sqrt_is[:, None]
        gram += a.T @ a
        uvec += v.T @ (is_ * yb)
        lds += np.log(s).sum(dtype=f32)
        yiy += (is_ * yb * yb).sum(dtype=f32)

    bt = np.eye(M, dtype=d_fin) + gram.astype(d_fin)
    rt = sla.cholesky(bt, lower=False)
    t = sla.solve_triangular(rt.T, uvec.astype(d_fin), lower=True)
    l1 = -0.5 * (2.0 * np.log(np.diag(rt)).sum() + float(lds)
                 + N * np.log(2.0 * np.pi))
    l2 = -0.5 * (float(yiy) - float(t @ t))
    return l1 + l2


def main():
    f32, f64 = np.float32, np.float64
    cases = [
        ("ind f32, fin f32, jit f32 (mirror)", f32, f32, JIT_F32),
        ("ind f32, fin f32, jit 1e-6", f32, f32, JIT_F64),
        ("ind f64, fin f32, jit f32", f64, f32, JIT_F32),
        ("ind f64, fin f32, jit 1e-6", f64, f32, JIT_F64),
        ("ind f32, fin f64, jit f32", f32, f64, JIT_F32),
        ("ind f64, fin f64, jit f32", f64, f64, JIT_F32),
        ("ind f64, fin f64, jit 1e-6", f64, f64, JIT_F64),
    ]
    for name, di, df, jit in cases:
        t0 = time.perf_counter()
        l = evidence(di, df, jit)
        print(f"{name:38s} evidence {l:.1f}  err vs truth "
              f"{l - TRUTH:+8.1f}  ({time.perf_counter() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
