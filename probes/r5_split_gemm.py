"""Round-5 probe (VERDICT r4 #3): split-operand bf16 GEMM variants for the
forward sqdist and V/whitening GEMMs, vs XLA's HIGH (3-pass) and HIGHEST
(6-pass).

Variants (all operands split so each part is EXACTLY bf16-representable,
so DEFAULT-precision dots add no input rounding):

  high      jnp.matmul precision=HIGH            (fast-mode reference)
  highest   jnp.matmul precision=HIGHEST         (accurate-mode reference)
  s3        ah.bh + ah.bl + al.bh, 3 DEFAULT dots (explicit HIGH rebuild)
  s2f       ah.bh + ONE folded dot of [ah|al]x[bl;bh] over a doubled
            contraction axis — 2 launches, all 3 bf16 cross terms.  The
            fold is free only where the GEMM is NOT flop-bound (sqdist's
            k=d=8 contraction); at k=300 the doubled axis costs real MACs.
  s6f       3-way split (hi/mid/lo, 8+8+8 mantissa bits): 3 launches
            covering all 6 HIGHEST terms via folds — accurate-mode
            candidate at fewer launches than HIGHEST.

Measures, at the bench shape (1M x 8, m=300, block 16384, one real TPU):
per-variant end-to-end forward wall (min over batches) and the evidence
stat errors (sum log s, y'S^-1y proxy) vs a host f64 mirror.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_split_gemm.py

RESULTS (v5e-1, this probe, 2026-08-20; forward bare chain, min-of-4x4
pipelined; errors vs host f64 mirror lds -1134194.903 / yiy 3541090.638):

    high        16.2 ms   dlds  +138.4   dyiy   -607.9
    highest     20.8 ms   dlds    +3.3   dyiy    -15.4
    s3          15.8 ms   dlds -1348.8   dyiy  +7956.9
    s2f         15.2 ms   dlds -1348.8   dyiy  +7956.9
    s6f         19.4 ms   dlds -1316.5   dyiy  +7528.4

VERDICT: dead end, both directions.  (1) The hand-split variants are
~10x LESS accurate than XLA's native HIGH — whatever bf16_3x does on this
hardware, it is not the naive 2-way operand split, and the folded
variants inherit the split's error, not HIGH's.  (2) The fold buys only
~5% wall over HIGH (15.2 vs 16.2 ms) — the k=8 sqdist GEMM is too small
a fraction of the chain for the launch saving to matter, and at k=300
the doubled contraction axis costs real MACs.  (3) HIGHEST's accuracy is
not reachable cheaper by XLA-level operand splitting; its +28% over HIGH
stands as the accurate-mode GEMM price.  Do not retry; the accurate-mode
lever is the kernel-entry path (sqdist_impl='direct'), not GEMM splits.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.fitc import calc_inducing
from gpr_tpu.numerics.linalg import inv_tri_upper

N, D, M, BLOCK = 1_000_000, 8, 300, 16384


def _split2(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _split3(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    rem = x - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, mid, rem - mid


def _dot(u, v):
    return jax.lax.dot_general(
        u, v, (((u.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def mm_high(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGH)


def mm_highest(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def mm_s3(a, b):
    ah, al = _split2(a)
    bh, bl = _split2(b)
    return _dot(ah, bh) + _dot(ah, bl) + _dot(al, bh)


def mm_s2f(a, b):
    ah, al = _split2(a)
    bh, bl = _split2(b)
    afold = jnp.concatenate([ah, al], axis=-1)
    bfold = jnp.concatenate([bl, bh], axis=0)
    return _dot(ah, bh) + _dot(afold, bfold)


def mm_s6f(a, b):
    ah, am, al = _split3(a)
    bh, bm, bl = _split3(b)
    p1 = _dot(ah, bh)
    p2 = _dot(jnp.concatenate([ah, am], axis=-1),
              jnp.concatenate([bm, bh], axis=0))
    p3 = _dot(jnp.concatenate([ah, am, al], axis=-1),
              jnp.concatenate([bl, bm, bh], axis=0))
    return p1 + p2 + p3


VARIANTS = {
    "high": mm_high,
    "highest": mm_highest,
    "s3": mm_s3,
    "s2f": mm_s2f,
    "s6f": mm_s6f,
}


def make_forward(mm):
    """Bare streaming forward: sqdist GEMM -> exp -> V GEMM -> stats.
    gram/u_vec accumulation GEMMs stay at HIGH (measured insensitive,
    config.acc_precision notes)."""

    def fwd(params, z, u_inv, sigma2, xb, yb):
        ell2 = jnp.exp(2.0 * params.log_ell)
        sf2 = jnp.exp(params.log_sf2)

        def body(carry, blk):
            x_b, y_b = blk
            a2 = jnp.sum(jnp.square(x_b), axis=-1)
            b2 = jnp.sum(jnp.square(z), axis=-1)
            d2 = jnp.maximum(
                a2[:, None] - 2.0 * mm(x_b, z.T) + b2[None, :], 0.0
            )
            knm = sf2 * jnp.exp(d2 * (-0.5 / ell2))
            v = mm(knm, u_inv)
            r = sf2 - jnp.sum(v * v, axis=-1)
            s = r + sigma2
            is_ = 1.0 / s
            a = v * jnp.sqrt(is_)[:, None]
            gram, u_vec, lds, yiy = carry
            gram = gram + mm_high(a.T, a)
            u_vec = u_vec + mm_high(v.T, (is_ * y_b)[:, None])[:, 0]
            lds = lds + jnp.sum(jnp.log(s))
            yiy = yiy + jnp.sum(is_ * y_b * y_b)
            return (gram, u_vec, lds, yiy), None

        init = (jnp.zeros((M, M), jnp.float32), jnp.zeros((M,), jnp.float32),
                jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        (gram, u_vec, lds, yiy), _ = jax.lax.scan(body, init, (xb, yb))
        return gram, u_vec, lds, yiy

    return jax.jit(fwd)


def main():
    config.matmul_precision = "highest"
    dt = jnp.float32
    rng = np.random.default_rng(0)
    Xn = rng.standard_normal((N, D)).astype(np.float32)
    yn = rng.standard_normal(N).astype(np.float32)
    Zn = rng.standard_normal((M, D)).astype(np.float32)
    params = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                          log_sf2=jnp.asarray(0.0, dt))
    sigma2 = 0.1

    @jax.jit
    def prep(params, z):
        ind = calc_inducing(SeIso, params, z, 1e-6)
        return ind.z, inv_tri_upper(ind.chol_km)

    z, u_inv = prep(params, jnp.asarray(Zn))
    nb = N // BLOCK  # truncate to whole blocks (999424 of 1M; the mirror
    # below loops the same truncated range so the error columns match)
    ntr = nb * BLOCK
    xb = jnp.asarray(Xn[:ntr].reshape(nb, BLOCK, D))
    yb = jnp.asarray(yn[:ntr].reshape(nb, BLOCK))

    # host f64 mirror for the two O(n) stats
    import scipy.linalg as sla
    ell2 = np.exp(2 * 0.5); sf2 = 1.0
    def cross(A, B):
        d2 = ((A * A).sum(1)[:, None] - 2.0 * (A @ B.T)
              + (B * B).sum(1)[None, :])
        return sf2 * np.exp(np.maximum(d2, 0.0) * (-0.5 / ell2))
    Z64 = Zn.astype(np.float64); X64 = Xn.astype(np.float64)
    y64 = yn.astype(np.float64)
    km = cross(Z64, Z64); np.fill_diagonal(km, sf2)
    u = sla.cholesky(km + 1e-6 * np.eye(M), lower=False)
    ui64 = sla.solve_triangular(u, np.eye(M), lower=False)
    lds64 = 0.0; yiy64 = 0.0
    for i in range(0, ntr, BLOCK):
        v = cross(X64[i:i + BLOCK], Z64) @ ui64
        s = sf2 - (v * v).sum(1) + sigma2
        lds64 += np.log(s).sum(); yiy64 += (y64[i:i + BLOCK] ** 2 / s).sum()
    print(f"host f64: lds {lds64:.3f} yiy {yiy64:.3f}", flush=True)

    for name, mm in VARIANTS.items():
        fwd = make_forward(mm)
        t0 = time.perf_counter()
        out = fwd(params, z, u_inv, jnp.asarray(sigma2, dt), xb, yb)
        lds = float(np.asarray(out[2])); yiy = float(np.asarray(out[3]))
        first = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            outs = [fwd(params, z, u_inv, jnp.asarray(sigma2, dt), xb, yb)
                    for _ in range(4)]
            np.asarray(outs[-1][2])
            times.append((time.perf_counter() - t0) / 4)
        print(f"{name:8s} {min(times)*1e3:7.1f} ms  "
              f"dlds {lds-lds64:+9.3f}  dyiy {yiy-yiy64:+9.3f}  "
              f"(first {first:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
