"""Round-4 probe: split the ON-TPU +307-nat f32 evidence error.

The numpy mirrors (probes/r4_f32_error_attribution.py, r4_f32_epilog_decomp
.py) show pure-f32 arithmetic reproduces only ~+18 nats of the TPU's +307,
all of it in the epilogue/jitter — so the rest must come from what the TPU
does DIFFERENTLY from per-element f32: the 3-pass bf16 f32-HIGH GEMMs and
the on-device inducing factor.  This probe splits the real error in place:

  ev_dev                         device evidence (f32 epilogue on device)
  ev_host64(stats_dev)           f64 HOST epilogue on the DEVICE-accumulated
                                 stats (the epilogue needs only StreamStats)
  TRUTH_F32JIT                   full-f64 evidence AT the f32 jitter policy
  TRUTH                          full-f64 evidence at jitter 1e-6

  dev-epilogue rounding  = ev_dev - ev_host64(stats_dev)
  device streaming error = ev_host64(stats_dev) - TRUTH_F32JIT
  jitter bias            = TRUTH_F32JIT - TRUTH

Run: python probes/r4_tpu_error_split.py   (TPU, one compile ~1 min)
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
# the manual mirror reshapes (no padding), so its block must divide N;
# 20000 x 50 blocks is close enough to the production 16384 for attribution
MBLOCK = 20000
TRUTH = -2123659.4  # all-f64, jitter 1e-6 (bench.py cached)
TRUTH_F32JIT = None  # filled from r4_f32_epilog_decomp.py output if known


def host_epilogue_f64(stats):
    g = np.asarray(stats.gram, np.float64)
    u = np.asarray(stats.u_vec, np.float64)
    lds = float(stats.log_det_s)
    yiy = float(stats.y_is_y)
    n = float(stats.n)
    rt = sla.cholesky(np.eye(M) + g, lower=False)
    t = sla.solve_triangular(rt.T, u, lower=True)
    l1 = -0.5 * (2.0 * np.log(np.diag(rt)).sum() + lds
                 + n * np.log(2.0 * np.pi))
    l2 = -0.5 * (yiy - t @ t)
    return l1 + l2


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    dt = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    y = jnp.asarray(rng.standard_normal(N), dt)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    params = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                          log_sf2=jnp.asarray(0.0, dt))
    sigma2 = jnp.asarray(0.1, dt)

    @jax.jit
    def f(params, z, sigma2, X, y):
        inducing = calc_inducing(SeIso, params, z)
        stats = stream_stats(SeIso, params, inducing, sigma2, X, y,
                             block_size=BLOCK)
        ev = evidence_from_stats(inducing, stats)
        return stats, ev

    t0 = time.perf_counter()
    stats, ev = f(params, Z, sigma2, X, y)
    ev_dev = float(np.asarray(ev))
    print(f"first call {time.perf_counter() - t0:.1f}s", flush=True)

    ev_h64 = host_epilogue_f64(stats)
    print(f"ev_dev (f32 device epilogue)      {ev_dev:.1f}  "
          f"err vs truth {ev_dev - TRUTH:+8.1f}", flush=True)
    print(f"ev_host64(device stats)           {ev_h64:.1f}  "
          f"err vs truth {ev_h64 - TRUTH:+8.1f}", flush=True)
    print(f"device final-epilogue rounding    {ev_dev - ev_h64:+8.1f}",
          flush=True)
    print("jitter bias (from r4_f32_epilog_decomp): +17.7 of the total; "
          "the rest of ev_host64's error is the device streaming stages.",
          flush=True)

    # --- per-GEMM precision sweep: WHICH GEMM carries the error, and what
    # does escalating it to HIGHEST (6-pass) cost?  Manual mirror of the
    # stream body with independent precision knobs.
    from functools import partial

    HI = jax.lax.Precision.HIGHEST
    H = jax.lax.Precision.HIGH

    @partial(jax.jit, static_argnums=(5, 6, 7))
    def manual_ev(params, z, sigma2, X, y, p_sq, p_v, p_g):
        ell2 = jnp.exp(2.0 * params.log_ell)
        sf2 = jnp.exp(params.log_sf2)

        def cross(A, B, prec):
            d2 = ((A * A).sum(1)[:, None]
                  - 2.0 * jnp.matmul(A, B.T, precision=prec)
                  + (B * B).sum(1)[None, :])
            return sf2 * jnp.exp(jnp.maximum(d2, 0.0) * (-0.5 / ell2))

        m = z.shape[0]
        km = cross(z, z, p_sq).at[jnp.arange(m), jnp.arange(m)].set(sf2)
        jit = 32 * jnp.finfo(jnp.float32).eps * sf2
        u = jnp.linalg.cholesky(km + jit * jnp.eye(m, dtype=km.dtype)).T
        u_inv = jax.scipy.linalg.solve_triangular(
            u, jnp.eye(m, dtype=km.dtype), lower=False
        )

        xb = X.reshape(-1, MBLOCK, D)
        yb = y.reshape(-1, MBLOCK)

        def body(carry, blk):
            x_b, y_b = blk
            knm = cross(x_b, z, p_sq)
            v = jnp.matmul(knm, u_inv, precision=p_v)
            r = sf2 - jnp.sum(v * v, axis=1)
            s = r + sigma2
            is_ = 1.0 / s
            a = v * jnp.sqrt(is_)[:, None]
            gram, uvec, lds, yiy = carry
            gram = gram + jnp.matmul(a.T, a, precision=p_g)
            uvec = uvec + jnp.matmul(v.T, is_ * y_b, precision=p_g)
            lds = lds + jnp.sum(jnp.log(s))
            yiy = yiy + jnp.sum(is_ * y_b * y_b)
            return (gram, uvec, lds, yiy), None

        init = (jnp.zeros((m, m), km.dtype), jnp.zeros(m, km.dtype),
                jnp.zeros((), km.dtype), jnp.zeros((), km.dtype))
        (gram, uvec, lds, yiy), _ = jax.lax.scan(
            jax.checkpoint(body), init, (xb, yb)
        )
        bt = jnp.eye(m, dtype=km.dtype) + gram
        rt = jnp.linalg.cholesky(bt).T
        t = jax.scipy.linalg.solve_triangular(rt.T, uvec, lower=True)
        l1 = -0.5 * (2.0 * jnp.sum(jnp.log(jnp.diag(rt))) + lds
                     + N * jnp.log(2.0 * jnp.pi))
        l2 = -0.5 * (yiy - jnp.dot(t, t))
        return l1 + l2

    cases = [
        ("all HIGH (mirror of product)", H, H, H),
        ("sqdist -> HIGHEST", HI, H, H),
        ("vgemm -> HIGHEST", H, HI, H),
        ("gram/uvec -> HIGHEST", H, H, HI),
        ("all HIGHEST", HI, HI, HI),
    ]
    for name, p_sq, p_v, p_g in cases:
        t0 = time.perf_counter()
        evm = float(np.asarray(manual_ev(params, Z, sigma2, X, y,
                                         p_sq, p_v, p_g)))
        first = time.perf_counter() - t0
        per = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [manual_ev(params, Z, sigma2, X, y, p_sq, p_v, p_g)
                    for _ in range(8)]
            np.asarray(outs[-1])
            per.append((time.perf_counter() - t0) / 8)
        print(f"{name:30s} ev {evm:.1f}  err {evm - TRUTH:+8.1f}  "
              f"{min(per)*1e3:6.1f} ms/eval (first {first:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
