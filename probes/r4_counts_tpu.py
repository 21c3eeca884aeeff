"""TPU timing probe: negative-binomial and binomial Laplace at the bench
shape (round 4 — the session that gave both families their CLI surface).

value_and_grad of negbin_log_evidence (incl. d/d log r through the pack
convention) and binomial_log_evidence, 20/15 Newton steps at n=1M x 8,
m=300 f32 — same GEMM structure per step as the Poisson probe
(probes/poisson_tpu.py: 1.55 s/iter for reference).

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r4_counts_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.binomial import binomial_log_evidence
from gpr_tpu.models.negbin import negbin_log_evidence

N, D, M = 1_000_000, 8, 300


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def bench(name, vg, *args):
    t0 = time.perf_counter()
    out = vg(*args)
    sync(out)
    first = time.perf_counter() - t0
    per = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [vg(*args) for _ in range(3)]
        sync(outs[-1])
        per.append((time.perf_counter() - t0) / 3)
    ev = out[0] if isinstance(out, tuple) else out
    print(f"{name}: {min(per)*1e3:.0f} ms/iter "
          f"(first {first:.1f}s, ev {float(ev):.1f})", flush=True)


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    f_true = np.sin(np.asarray(X) @ (np.arange(D) * 0.3 + 0.2))
    mu = np.exp(f_true)
    y_nb = jnp.asarray(
        rng.poisson(rng.gamma(1.5, mu / 1.5)).astype(np.float32)
    )
    trials = jnp.asarray(rng.integers(1, 20, N).astype(np.float32))
    y_bin = jnp.asarray(rng.binomial(
        np.asarray(trials).astype(np.int64),
        1.0 / (1.0 + np.exp(-f_true))).astype(np.float32))
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    def f_nb(p, z, log_r, X, y):
        return negbin_log_evidence(SeIso, p, z, X, y, jnp.exp(log_r),
                                   newton_iters=20)

    vg_nb = jax.jit(jax.value_and_grad(f_nb, argnums=(0, 1, 2)))
    bench("negbin evidence+grad (20 Newton steps, incl. d/d log r)",
          vg_nb, p, Z, jnp.asarray(0.7, dt), X, y_nb)

    def f_bin(p, z, X, y, trials):
        return binomial_log_evidence(SeIso, p, z, X, y, trials,
                                     newton_iters=15)

    vg_bin = jax.jit(jax.value_and_grad(f_bin, argnums=(0, 1)))
    bench("binomial evidence+grad (15 Newton steps)",
          vg_bin, p, Z, X, y_bin, trials)


if __name__ == "__main__":
    main()
