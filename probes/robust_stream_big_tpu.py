"""TPU probe: the robust (Student-t) family past the HBM ceiling.

n = 16M x 8, m = 300, f32: the materialized V (and Knm) would be
19.2 GiB each — more than the chip's 16 GB HBM — so this exercises the
streaming per-row-noise evidence (M-step) and the blocked exact E-step
moments end to end at a size the materialized path cannot represent.
Data is generated ON DEVICE (the tunnel lesson: a GB-scale host
transfer starves the tunnel, NEXT.md round-3 notes).

Run: PYTHONPATH=/root/.axon_site:/root/repo \
       python probes/robust_stream_big_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.robust import t_em_sweeps, t_lambda_update, t_posterior_moments
from gpr_tpu.models.streaming import streaming_log_evidence

N, D, M, BS = 16_000_000, 8, 300, 32_768
NU = 4.0


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    dt = jnp.float32

    @jax.jit
    def gen(key):
        kx, kn, kb = jax.random.split(key, 3)
        X = jax.random.normal(kx, (N, D), dt)
        f = jnp.sin(X @ jnp.full((D,), 0.15, dt))
        y = f + 0.1 * jax.random.normal(kn, (N,), dt)
        # 0.1% gross corruption
        bad = jax.random.uniform(kb, (N,)) < 1e-3
        y = y + jnp.where(bad, 5.0, 0.0)
        return X, y, bad

    X, y, bad = gen(jax.random.PRNGKey(0))
    sync((X[0], y[0]))
    print(f"data on device: {N} x {D} "
          f"({X.nbytes/2**30:.2f} GiB X; V would be "
          f"{N*M*4/2**30:.1f} GiB)", flush=True)

    Z = jax.random.normal(jax.random.PRNGKey(7), (M, D), dt)
    p = SeIso.Params(log_ell=jnp.asarray(1.1, dt), log_sf2=jnp.asarray(0.0, dt))
    sigma2 = jnp.asarray(0.01, dt)

    # E-step: blocked exact moments + scale update (one sweep).  X/y MUST
    # be jit arguments, never closed over (CLAUDE.md: closures lower to
    # embedded constants and the remote compiler rejects them at MB scale
    # — here the first attempt died with HTTP 413)
    @jax.jit
    def e_step(lam, X, y):
        mu, var, _ = t_posterior_moments(
            SeIso, p, Z, sigma2, X, y, lam, block_size=BS
        )
        return t_lambda_update(y, mu, var, sigma2, NU)

    lam = jnp.ones((N,), dt)
    t0 = time.perf_counter()
    lam = e_step(lam, X, y)
    sync(lam)
    print(f"E-step (blocked): first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    lam = e_step(e_step(lam, X, y), X, y)
    sync(lam)
    print(f"E-step: {(time.perf_counter()-t0)/2:.2f} s/sweep", flush=True)
    flagged = jnp.sum(lam < 0.1)
    missed = jnp.sum(jnp.where(bad, lam, 0.0) > 0.1)
    print(f"outliers: ~{N//1000} injected, {int(flagged)} flagged, "
          f"{int(missed)} missed", flush=True)

    # M-step objective: streaming hetero evidence + grad
    def mf(p, z, ls2, lam, X, y):
        return -streaming_log_evidence(
            SeIso, p, z, jnp.exp(ls2) / lam, X, y, block_size=BS
        ) / N

    vg = jax.jit(jax.value_and_grad(mf, argnums=(0, 1, 2)))
    ls2 = jnp.log(sigma2)
    t0 = time.perf_counter()
    out = vg(p, Z, ls2, lam, X, y)
    sync(out)
    print(f"M-step evidence+grad (streaming): first "
          f"{time.perf_counter()-t0:.1f}s, f={float(out[0]):.4f}",
          flush=True)
    for leaf in jax.tree.leaves(out[1]):
        assert bool(jnp.all(jnp.isfinite(leaf))), "grad NaN at 16M"
    t0 = time.perf_counter()
    outs = [vg(p, Z, ls2, lam, X, y) for _ in range(2)]
    sync(outs[-1])
    print(f"M-step evidence+grad: {(time.perf_counter()-t0)/2:.2f} s/iter",
          flush=True)


if __name__ == "__main__":
    main()
