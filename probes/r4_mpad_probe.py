"""Round-4 probe: does padding the ENGINE's inducing set m=300 -> 384 win?

Background (VERDICT r3, BASELINE.md MXU bar): the bare 3-GEMM chain at m=300
sustains ~36 TF/s useful = ~55% of the 3-pass f32 ceiling because of the
300->384 lane pad, while the m=384 chain reaches ~50 TF/s = 77%.  But note
the arithmetic: wall time per block is 2*B*m^2*3/rate, so
  m=300: 2*B*90000*3/36e12    vs    m=384: 2*B*147456*3/50e12
— the m=384 chain does 1.64x the flops at 1.39x the rate = 18% MORE wall
time.  XLA evidently recovers part of the pad at m=300 (the bench comment:
time grows superlinearly-but-not-quadratically).  This probe settles it on
the PRODUCT path (streaming evidence+gradient, grad_variant='ug'): pad with
inert inducing columns and measure end to end.

Two exact padding constructions (both leave the evidence mathematically
equal to the m=300 model):
  (a) "far"  — zero code change: append fake inducing points at distance
      ~1e4; their kernel columns underflow to exactly 0 in f32, so
      Km_pad = blockdiag(Km, sf2 I), V_pad = [V, 0], and every whitened
      statistic is the m=300 one embedded in zeros.
  (b) "wrap" — a wrapper family that evaluates the kernel at m=300 and
      concatenates explicit zero columns (skips the wasted kernel exp but
      adds a per-tile concat).

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r4_mpad_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.streaming import streaming_log_evidence

N, D, M = 1_000_000, 8, 300
BLOCK = 16384


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def timeit(fn, *args, iters=16, batches=3):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    first = time.perf_counter() - t0
    per_batch = []
    for _ in range(batches):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        per_batch.append((time.perf_counter() - t0) / iters)
    return min(per_batch), first, out


def make_padded(base, m_real, m_pad):
    """Family wrapper: kernel evaluated at m_real, zero columns appended so
    all (B, m)/(m, m) GEMMs run at the 128-lane multiple.  Exact: the pad
    block of Km is I (chol = I, u_inv = I), so V/whitened stats gain only
    structural zeros."""
    pad = m_pad - m_real

    class PaddedFam:
        name = f"{base.name}_pad{m_pad}"
        Params = base.Params
        learn_inducing_default = True

        @staticmethod
        def k_cross(params, X, Z):
            k = base.k_cross(params, X, Z[:m_real])
            return jnp.concatenate(
                [k, jnp.zeros((X.shape[0], pad), k.dtype)], axis=1
            )

        @staticmethod
        def k_diag(params, X):
            return base.k_diag(params, X)

        @staticmethod
        def k_upper(params, Z):
            km = base.k_upper(params, Z[:m_real])
            out = jnp.eye(m_pad, dtype=km.dtype)
            return out.at[:m_real, :m_real].set(km)

        @staticmethod
        def k_cross_vjp(params, X, Z, knm, knm_bar, kd_bar):
            p_bar, z_bar = base.k_cross_vjp(
                params, X, Z[:m_real], knm[:, :m_real],
                knm_bar[:, :m_real], kd_bar,
            )
            return p_bar, jnp.zeros_like(Z).at[:m_real].set(z_bar)

    return PaddedFam


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

    def make_f(fam):
        def f(params, z, sigma2, X, y):
            return streaming_log_evidence(
                fam, params, z, sigma2, X, y, block_size=BLOCK,
                grad_variant="ug",
            )
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))

    # baseline m=300
    vg = make_f(SeIso)
    t0, first0, out0 = timeit(vg, params, Z, sigma2, X, y)
    print(f"m=300 baseline: {t0*1e3:.1f} ms/iter (first {first0:.1f}s, "
          f"evidence {float(out0[0]):.1f})", flush=True)

    for m_pad in (384,):
        # (a) far fake points: zero code change
        z_far = jnp.concatenate(
            [Z, 1e4 + jnp.arange(m_pad - M, dtype=dt)[:, None]
             * jnp.ones((1, D), dt)]
        )
        ta, fa, outa = timeit(vg, params, z_far, sigma2, X, y)
        print(f"m={m_pad} far-points: {ta*1e3:.1f} ms/iter (first {fa:.1f}s, "
              f"evidence {float(outa[0]):.1f}, delta vs base "
              f"{float(outa[0]) - float(out0[0]):+.2f})", flush=True)

        # (b) wrapper family with explicit zero columns
        fam_p = make_padded(SeIso, M, m_pad)
        z_pad = jnp.concatenate([Z, jnp.zeros((m_pad - M, D), dt)])
        vgp = make_f(fam_p)
        tb, fb, outb = timeit(vgp, params, z_pad, sigma2, X, y)
        print(f"m={m_pad} zero-concat: {tb*1e3:.1f} ms/iter (first {fb:.1f}s, "
              f"evidence {float(outb[0]):.1f}, delta vs base "
              f"{float(outb[0]) - float(out0[0]):+.2f})", flush=True)

        # gradient parity on the real coordinates (hyper grads must match)
        g0 = out0[1][0]
        gb = outb[1][0]
        print(f"  hyper-grad rel err (zero-concat vs base): "
              f"log_ell {abs(float(gb.log_ell - g0.log_ell) / float(g0.log_ell)):.2e} "
              f"log_sf2 {abs(float(gb.log_sf2 - g0.log_sf2) / float(g0.log_sf2)):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
