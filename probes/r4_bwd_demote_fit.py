"""Round-4 probe: does demoting ui_bar+vg change a real fit's outcome?

r4_bwd_demote.py measured per-site gradient errors: ui_bar and vg demotions
cost Z-grad rel-err 5.1e-3 / 2.9e-3 (vs the fast baseline's own 1.8e-3
distance from accurate mode) and save ~7-10% each; knm_bar is poison
(1e-1, rejected).  This probe runs bench.py's f32-fit secondary replica
(fit40, same rng draw order) with and without {ui_bar, vg} demotion, plus
the demoted evidence+grad timing, to decide adoption on OUTCOMES (final f,
|g|, hypers, evals) rather than gradient-norm proxies.

Run: python probes/r4_bwd_demote_fit.py  (TPU)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.streaming import streaming_log_evidence
from gpr_tpu.optim import make_pack
from gpr_tpu.optim.lbfgs_device import fit

N, D, M = 1_000_000, 8, 300
BLOCK = 16384


def main():
    config.matmul_precision = "high"
    config.acc_precision = "default"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, D)), dtype)
    _y = rng.standard_normal(N)
    Z = jnp.asarray(rng.standard_normal((M, D)), dtype)
    _tproj = rng.standard_normal((D, D))
    yf = jnp.asarray(
        np.sin(np.asarray(X) @ (np.arange(D) * 0.3 + 0.2))
        + 0.3 * rng.standard_normal(N), dtype)
    params = SeIso.Params(log_ell=jnp.asarray(0.5, dtype),
                          log_sf2=jnp.asarray(0.0, dtype))
    sigma2 = jnp.asarray(0.1, dtype)

    # evidence+grad timing with the pair demoted (bench rng objective)
    yb = jnp.asarray(rng.standard_normal(N), dtype)  # fresh; timing only
    config.bwd_demote_sites = ("ui_bar", "vg")

    def f(params, z, sigma2, X, y):
        return streaming_log_evidence(
            SeIso, params, z, sigma2, X, y, block_size=BLOCK,
            grad_variant="ug",
        )

    vg_fn = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
    t0 = time.perf_counter()
    out = vg_fn(params, Z, sigma2, X, yb)
    np.asarray(out[0])
    first = time.perf_counter() - t0
    per = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [vg_fn(params, Z, sigma2, X, yb) for _ in range(8)]
        np.asarray(outs[-1][0])
        per.append((time.perf_counter() - t0) / 8)
    print(f"ui_bar+vg demoted: {min(per)*1e3:.1f} ms/iter evidence+grad "
          f"(first {first:.0f}s)", flush=True)

    for name, sites in [("baseline", ()), ("demoted", ("ui_bar", "vg"))]:
        config.bwd_demote_sites = sites
        packf = make_pack(SeIso, params, Z, 1.0)
        t0 = time.perf_counter()
        p, z, s2, st = fit(
            SeIso, X, yf, packf, variational=True,
            streaming_block_size=BLOCK, max_iter=40, epsabs=1e-4,
        )
        dt = time.perf_counter() - t0
        print(f"fit40[{name:8s}]: {dt:.0f}s iters={int(st.n_iter)} "
              f"evals={int(st.n_evals)} f={float(st.f):.5f} "
              f"|g|={float(jnp.linalg.norm(st.g)):.2e} "
              f"failed={bool(st.failed)} log_ell={float(p.log_ell):.3f} "
              f"log_sf2={float(p.log_sf2):.3f} sigma2={float(s2):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
