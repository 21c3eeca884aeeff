"""TPU timing probe: Student-t robust regression at the bench shape.

Times the two alternating pieces of the VB-EM at n=1M x 8, m=300 f32:
the M-step objective (value_and_grad of the heteroskedastic-noise
evidence — one extra (n,) division vs the plain evidence) and the
E-step (one exact posterior-moments pass + the closed-form scale
update, jitted as t_em_sweeps).  Also checks outlier identification at
scale: 0.1% of rows get +8 sigma corruption; their lam_hat must all
fall below 0.1.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/robust_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.fitc import log_evidence
from gpr_tpu.models.robust import t_em_sweeps

N, D, M = 1_000_000, 8, 300
NU = 4.0


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    # a smooth (m=300-representable) latent, so lam reflects the injected
    # corruption and not model misfit
    f_true = np.sin(np.asarray(X) @ np.full(D, 0.15))
    yn = f_true + 0.1 * rng.standard_normal(N)
    bad = rng.choice(N, N // 1000, replace=False)
    yn[bad] += rng.choice([-1.0, 1.0], len(bad)) * rng.uniform(3.0, 6.0, len(bad))
    y = jnp.asarray(yn, dt)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    # ell must be long enough that m=300 covers the prior in 8-D: FITC's
    # per-point diag slack r_i is a COMPETING explanation for an outlier
    # (it is idiosyncratic prior variance), so identification requires
    # r_i << injected deviation^2 (see models/robust.py docstring) —
    # at ell=1.65 here r ~ sf2 and half the injections were absorbed
    p = SeIso.Params(log_ell=jnp.asarray(1.1, dt),
                     log_sf2=jnp.asarray(0.0, dt))
    sigma2 = jnp.asarray(0.01, dt)

    # E-step: jitted EM sweeps (posterior moments + scale update)
    em = jax.jit(
        lambda p, z, s2, X, y: t_em_sweeps(
            SeIso, p, z, s2, X, y, nu=NU, sweeps=1
        )[0]
    )
    t0 = time.perf_counter()
    lam = em(p, Z, sigma2, X, y)
    sync(lam)
    print(f"E-step: first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    outs = [em(p, Z, sigma2, X, y) for _ in range(3)]
    sync(outs[-1])
    print(f"E-step (1 sweep): {(time.perf_counter()-t0)/3*1e3:.0f} ms",
          flush=True)
    lam3 = jax.jit(
        lambda p, z, s2, X, y: t_em_sweeps(
            SeIso, p, z, s2, X, y, nu=NU, sweeps=3
        )[0]
    )(p, Z, sigma2, X, y)
    lam_np = np.asarray(lam3)
    n_flag = int((lam_np < 0.1).sum())
    frac = float((lam_np[bad] < 0.1).mean())
    print(f"outliers: {len(bad)} injected, {n_flag} rows below lam 0.1 "
          f"({frac:.1%} of injected), worst injected lam "
          f"{float(lam_np[bad].max()):.4f}", flush=True)
    # the smallest (3 sigma-ish) injections on higher-r rows land ~0.3
    assert frac > 0.99, "missed injected outliers"
    assert float(lam_np[bad].max()) < 0.5, "an injected outlier at full weight"

    # M-step objective: value_and_grad of the hetero evidence
    def mf(p, z, ls2, X, y, lam):
        return -log_evidence(SeIso, p, z, jnp.exp(ls2) / lam, X, y) / N

    vg = jax.jit(jax.value_and_grad(mf, argnums=(0, 1, 2)))
    ls2 = jnp.log(sigma2)
    t0 = time.perf_counter()
    out = vg(p, Z, ls2, X, y, lam3)
    sync(out)
    first = time.perf_counter() - t0
    for leaf in jax.tree.leaves(out[1]):
        assert bool(jnp.all(jnp.isfinite(leaf))), "M-step grad NaN"
    per = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [vg(p, Z, ls2, X, y, lam3) for _ in range(3)]
        sync(outs[-1])
        per.append((time.perf_counter() - t0) / 3)
    print(f"M-step evidence+grad (hetero noise): {min(per)*1e3:.0f} "
          f"ms/iter (first {first:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
