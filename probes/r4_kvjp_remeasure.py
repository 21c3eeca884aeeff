"""Re-measure: is a hand-fused k_cross_vjp worth building for product
combinators?  (NEXT.md round-4 session-4 open item.)

Method: the hand pullback exists for se_iso; product combinators fall back
to the generic jax.vjp of k_cross.  Timing se_iso's streaming evidence+grad
WITH the hand pullback vs with it DISABLED (same kernel, same session)
bounds what a fused combinator pullback could possibly buy; timing
prod(se_iso, lin_one) and the ICM family gives the combinator baselines the
bound applies to.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r4_kvjp_remeasure.py

RESULTS (v5e-1, f32 HIGH, 1M x 8 m=300, min of 10, same session,
2026-08-19; absolute numbers inflated ~2x by a concurrent CPU test-suite
run competing for the dispatch host — the within-session RELATIVE
comparison is what the probe is for):

    se_iso hand-fused vjp:          84.6 ms/iter
    se_iso generic AD vjp:          87.8 ms/iter   (+3.8%)
    prod(se_iso,lin_one) generic:   92.7 ms/iter

VERDICT: the hand pullback buys only ~3.6-3.8% over generic AD at the
bench shape, so a fused combinator k_cross_vjp has a ceiling of ~4% on
a kernel ~10% more expensive — NOT worth building.  Closes the NEXT.md
round-4 session-4 open item; the generic AD path stays the combinator
design.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso, LinOne, product_family
from gpr_tpu.models.streaming import streaming_log_evidence

N, D, M, BLOCK = 1_000_000, 8, 300, 65536


class SeIsoAD:
    """se_iso with the hand-fused pullback hidden: forces the generic
    jax.vjp path the combinators use."""

    name = "se_iso_ad_probe"
    Params = SeIso.Params
    learn_inducing_default = True
    default_params = SeIso.default_params
    inducing_from_inputs = SeIso.inducing_from_inputs
    k_upper = SeIso.k_upper
    k_diag = SeIso.k_diag
    k_cross = SeIso.k_cross
    k_upper_inputs = SeIso.k_upper_inputs
    k_one = SeIso.k_one


def bench(fam, params, z, reps=10):
    def f(params, z, log_s2, X, y):
        return -streaming_log_evidence(
            fam, params, z, jnp.exp(log_s2), X, y, block_size=BLOCK
        )

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (N, D), jnp.float32)
    y = jnp.sin(X.sum(axis=1))
    t0 = time.time()
    out = vg(params, z, jnp.asarray(-1.0, jnp.float32), X, y)
    v0 = float(np.asarray(out[0]))
    t_first = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = vg(params, z, jnp.asarray(-1.0, jnp.float32), X, y)
        np.asarray(out[0])
        ts.append(time.time() - t0)
    return v0, t_first, min(ts)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    key = jax.random.PRNGKey(1)
    Xz = jax.random.normal(key, (M, D), jnp.float32)

    p_iso = SeIso.Params(log_ell=jnp.asarray(0.5, jnp.float32),
                         log_sf2=jnp.asarray(0.0, jnp.float32))
    for label, fam, params in (
        ("se_iso hand-fused vjp", SeIso, p_iso),
        ("se_iso generic AD vjp", SeIsoAD, p_iso),
    ):
        v, tf, t = bench(fam, params, Xz)
        print(f"{label}: {t*1e3:.1f} ms/iter (first {tf:.1f}s, -l {v:.1f})",
              flush=True)

    prod = product_family(SeIso, LinOne)
    p_prod = prod.default_params(Xz, M, jax.random.PRNGKey(2))
    v, tf, t = bench(prod, p_prod, Xz)
    print(f"prod(se_iso,lin_one) generic AD: {t*1e3:.1f} ms/iter "
          f"(first {tf:.1f}s, -l {v:.1f})", flush=True)


if __name__ == "__main__":
    main()
