"""TPU timing probe: multi-output ICM at the bench shape (round 4).

value_and_grad of the streaming evidence with the ICM kernel
(T=4 tasks, rank 2, se_iso features) at n=1M x (8 features + task id),
m=300 f32 — compared against plain se_iso in the SAME session so tunnel
drift cancels.  The task factor should cost ~nothing: it adds one
(n,R)x(R,m) GEMM and one equality mask per block to the se_iso chain.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r4_icm_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso, icm_family
from gpr_tpu.models import streaming_log_evidence

N, D, M, T, R = 1_000_000, 8, 300, 4, 2


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
    print(f"{name}: {min(per)*1e3:.1f} ms/iter "
          f"(first {first:.1f}s, ev {float(ev):.1f})", flush=True)


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.float32
    Xf = rng.standard_normal((N, D)).astype(np.float32)
    tid = rng.integers(0, T, N).astype(np.float32)
    X = jnp.asarray(np.c_[Xf, tid])
    y = jnp.asarray(np.sin(Xf @ (np.arange(D) * 0.3 + 0.2))
                    + 0.1 * rng.standard_normal(N), dt)
    Zf = rng.standard_normal((M, D)).astype(np.float32)
    Z_icm = jnp.asarray(np.c_[Zf, rng.integers(0, T, M).astype(np.float32)])
    Z_se = jnp.asarray(Zf)

    fam = icm_family(SeIso, D, T, R)
    p_icm = fam.default_params(X, M, jax.random.PRNGKey(0))
    p_se = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                        log_sf2=jnp.asarray(0.0, dt))

    def f_icm(p, z, X, y):
        return streaming_log_evidence(fam, p, z, 0.1, X, y,
                                      block_size=65536)

    def f_se(p, z, X, y):
        return streaming_log_evidence(SeIso, p, z, 0.1, X, y,
                                      block_size=65536)

    vg_se = jax.jit(jax.value_and_grad(f_se, argnums=(0, 1)))
    bench("se_iso evidence+grad (baseline, same session)",
          vg_se, p_se, Z_se, X[:, :D], y)

    vg = jax.jit(jax.value_and_grad(f_icm, argnums=(0, 1)))
    bench(f"ICM (T={T}, R={R}) evidence+grad", vg, p_icm, Z_icm, X, y)

    # isolate the combinator overhead: cols(se_iso) alone runs the SAME
    # generic-AD kernel pullback as the product but no task algebra
    from gpr_tpu.kernels import cols_family

    fam_c = cols_family(SeIso, 0, D)
    p_c = fam_c.default_params(X, M, jax.random.PRNGKey(1))

    def f_cols(p, z, X, y):
        return streaming_log_evidence(fam_c, p, z, 0.1, X, y,
                                      block_size=65536)

    vg_c = jax.jit(jax.value_and_grad(f_cols, argnums=(0, 1)))
    bench("cols(se_iso) evidence+grad (AD pullback, no task work)",
          vg_c, p_c, Z_icm, X, y)


if __name__ == "__main__":
    main()
