"""TPU probe: streaming classification BEYOND the materialized path's HBM
ceiling.

n = 16M x 8, m = 300, f32: the materialized V = Knm U^-1 would be
19.2 GB — more than the v5e chip's 16 GB HBM, so the materialized
classifier cannot run at all.  The streaming Newton
(models/classify_stream.py) holds only (n,) vectors (~64 MB each) plus
one (block, m) tile, so it just runs.  Data is generated ON DEVICE
(a host transfer of this size would starve the tunnel — measured round-3
lesson).

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/classify_stream_big_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify import classify_log_evidence

N, D, M = 16_000_000, 8, 300
BLOCK = 65536


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}; "
          f"n={N:,} (materialized V would be "
          f"{N * M * 4 / 2**30:.1f} GiB)", flush=True)
    dt = jnp.float32

    @jax.jit
    def make_data(key):
        kx, = jax.random.split(key, 1)
        X = jax.random.normal(kx, (N, D), dt)
        w = jnp.arange(D, dtype=dt) * 0.3 + 0.2
        y = jnp.sign(jnp.sin(X @ w)) + (jnp.sin(X @ w) == 0)
        return X, y

    X, y = make_data(jax.random.PRNGKey(0))
    sync((jnp.sum(X[:2]),))
    rng = np.random.default_rng(0)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    def f(p, z, X, y):
        return classify_log_evidence(SeIso, p, z, X, y, newton_iters=15,
                                     block_size=BLOCK)

    fwd = jax.jit(f)
    t0 = time.perf_counter()
    ev = fwd(p, Z, X, y)
    sync(ev)
    print(f"stream fwd @16M: first {time.perf_counter()-t0:.1f}s "
          f"ev {float(ev):.1f}", flush=True)
    t0 = time.perf_counter()
    ev = fwd(p, Z, X, y)
    sync(ev)
    print(f"stream evidence fwd @16M: {time.perf_counter()-t0:.1f} s",
          flush=True)

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
    t0 = time.perf_counter()
    out = vg(p, Z, X, y)
    sync(out)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = vg(p, Z, X, y)
    sync(out)
    per = time.perf_counter() - t0
    print(f"stream evidence+grad @16M (15 Newton steps): {per:.1f} s/iter "
          f"(first {first:.1f}s, ev {float(out[0]):.1f})", flush=True)
    for leaf in jax.tree.leaves(out[1]):
        assert bool(jnp.all(jnp.isfinite(leaf))), "non-finite grads"
    print("grads finite", flush=True)


if __name__ == "__main__":
    main()
