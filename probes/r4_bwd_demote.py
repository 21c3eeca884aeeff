"""Round-4 probe: which streaming-backward GEMM sites tolerate single-pass?

Following r4_fast_acc_default.py (forward accumulation GEMMs at DEFAULT:
measured free, adopted in the bench fast mode), this measures each backward
'ug'-variant site (config.bwd_demote_sites) at the bench shape:
per-component gradient rel-err vs the accurate-mode reference, and ms/iter.
The known dead end was ALL backward GEMMs at DEFAULT (0.3 rel-err on Z
grads); per-site sensitivity has never been measured.

Run: python probes/r4_bwd_demote.py  (TPU)
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

N, D, M = 1_000_000, 8, 300
BLOCK = 16384
H = jax.lax.Precision.HIGH


def rel(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


def rel_tree(g, g_ref):
    gp, gz, gs = g
    rp, rz, rs = g_ref
    pe = max(rel(np.asarray(x), np.asarray(y))
             for x, y in zip(jax.tree_util.tree_leaves(gp),
                             jax.tree_util.tree_leaves(rp)))
    return pe, rel(gz, rz), rel(gs, rs)


def main():
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

    # gradient reference: the accurate mode
    config.matmul_precision = "highest"
    config.acc_precision = "high"
    config.bwd_demote_sites = ()

    def f_ref(params, z, sigma2, X, y):
        return streaming_log_evidence(
            SeIso, params, z, sigma2, X, y, block_size=BLOCK,
            grad_variant="ug", grad_precision=H, jitter=1e-6,
        )

    _, g_ref = jax.jit(jax.value_and_grad(f_ref, argnums=(0, 1, 2)))(
        params, Z, sigma2, X, y)
    g_ref = jax.device_get(g_ref)
    print("reference grads ready", flush=True)

    cases = [
        ("fast baseline (no demotion)", ()),
        ("+ui_bar", ("ui_bar",)),
        ("+vg", ("vg",)),
        ("+knm_bar", ("knm_bar",)),
        ("+all three", ("ui_bar", "vg", "knm_bar")),
    ]
    for name, sites in cases:
        config.matmul_precision = "high"
        config.acc_precision = "default"
        config.bwd_demote_sites = sites

        def f(params, z, sigma2, X, y):
            return streaming_log_evidence(
                SeIso, params, z, sigma2, X, y, block_size=BLOCK,
                grad_variant="ug",
            )

        vg_fn = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
        t0 = time.perf_counter()
        _, g = vg_fn(params, Z, sigma2, X, y)
        g = jax.device_get(g)
        first = time.perf_counter() - t0
        pe, ze, se = rel_tree(g, g_ref)
        per = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [vg_fn(params, Z, sigma2, X, y) for _ in range(8)]
            np.asarray(outs[-1][0])
            per.append((time.perf_counter() - t0) / 8)
        print(f"{name:30s} rel-err p {pe:.2e} Z {ze:.2e} s2 {se:.2e}  "
              f"{min(per)*1e3:6.1f} ms/iter (first {first:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
