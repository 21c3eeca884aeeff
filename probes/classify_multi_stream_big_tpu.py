"""TPU probe: streaming MULTI-CLASS beyond the materialized path's HBM
ceiling.

n = 16M x 8, m = 300, C = 3, f32: the materialized V = Knm U^-1 would be
19.2 GB — more than the v5e chip's 16 GB HBM, so the materialized softmax
classifier (models/classify_multi.py) cannot run at all.  The streaming
Newton (models/classify_multi_stream.py) holds only (n, C) panels
(~192 MB each) plus one (block, m) tile, so it runs.  Data is generated
ON DEVICE (a host transfer of this size would starve the tunnel —
measured round-3 lesson) and threaded as jit arguments (closed-over
arrays die with remote-compile HTTP 413).

MEASURED (v5e-1, 2026-08-19): fwd @16M first compile 42.2 s, then
19.9 s/eval — linear 16.7x the 1M probe's 1.19 s, past the ceiling
where the materialized path cannot exist.  The GRADIENT leg at 16M
C=3 is past v5e HBM: the reverse pass saves (n, C) panels per Newton
step across six sweeps (~3x the binary probe's footprint, which fit at
15 steps) and the first vg dispatch CRASHED THE TPU WORKER — and an
in-process retry cannot work, the backend stays UNAVAILABLE for the
rest of the process (and the tunnel needs minutes to recover: mind the
next bench run).  So: multi-class streaming at n >> HBM is a
forward/serving capability on one v5e chip; training at that scale is
what the data mesh is for (shard n 16-way and each shard's reverse
pass is back under the 1M-probe footprint).  The grad leg is therefore
OPT-IN here (argv "grad"), default is the forward demo only.

Run: PYTHONPATH=/root/.axon_site:/root/repo \
       python probes/classify_multi_stream_big_tpu.py [grad]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify_multi_stream import (
    stream_multiclass_log_evidence,
)

N, D, M, C = 16_000_000, 8, 300, 3
BLOCK = 65536


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}; "
          f"n={N:,} C={C} (materialized V would be "
          f"{N * M * 4 / 2**30:.1f} GiB)", flush=True)
    dt = jnp.float32

    @jax.jit
    def make_data(key):
        kx, = jax.random.split(key, 1)
        X = jax.random.normal(kx, (N, D), dt)
        w = jnp.arange(D, dtype=dt) * 0.3 + 0.2
        score = X @ w
        labels = (score > -1.0).astype(jnp.int32) + (score > 1.0)
        return X, labels

    X, labels = make_data(jax.random.PRNGKey(0))
    sync((jnp.sum(X[:2]),))
    rng = np.random.default_rng(0)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    def make_f(iters):
        def f(p, z, X, labels):
            return stream_multiclass_log_evidence(
                SeIso, p, z, X, labels, C, newton_iters=iters,
                block_size=BLOCK,
            )
        return f

    fwd = jax.jit(make_f(15))
    t0 = time.perf_counter()
    ev = fwd(p, Z, X, labels)
    sync(ev)
    print(f"stream multiclass fwd @16M: first {time.perf_counter()-t0:.1f}s "
          f"ev {float(ev):.1f}", flush=True)
    t0 = time.perf_counter()
    ev = fwd(p, Z, X, labels)
    sync(ev)
    print(f"stream multiclass evidence fwd @16M: "
          f"{time.perf_counter()-t0:.1f} s", flush=True)

    if "grad" not in sys.argv[1:]:
        print("grad leg skipped (opt-in: pass 'grad'): measured to "
              "exceed v5e HBM at 16M C=3 — it crashes the TPU worker, "
              "see module docstring", flush=True)
        return

    # One attempt only: a failure leaves the backend UNAVAILABLE for
    # this whole process (measured), so retry loops are useless here.
    vg = jax.jit(jax.value_and_grad(make_f(15), argnums=(0, 1)))
    t0 = time.perf_counter()
    out = vg(p, Z, X, labels)
    sync(out)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = vg(p, Z, X, labels)
    sync(out)
    per = time.perf_counter() - t0
    print(f"stream multiclass evidence+grad @16M (15 Newton steps): "
          f"{per:.1f} s/iter (first {first:.1f}s, ev {float(out[0]):.1f})",
          flush=True)
    for leaf in jax.tree.leaves(out[1]):
        assert bool(jnp.all(jnp.isfinite(leaf))), "non-finite grads"
    print("grads finite", flush=True)


if __name__ == "__main__":
    main()
