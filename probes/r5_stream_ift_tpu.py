"""TPU probe (round 5): streaming Laplace IFT vs unrolled at the bench
shape (classify, block 32768) — the streaming analogue of r5_ift_tpu.py.

Measured same-session (TPU v5e-1, 1M x 8, m=300, 15 Newton): IFT 864
ms/iter vs unroll 2986 ms/iter (3.5x), identical evidence (-725359.5).

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_stream_ift_tpu.py
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

N, D, M, BLOCK = 1_000_000, 8, 300, 32768


def sync(o):
    for leaf in jax.tree.leaves(o):
        np.asarray(leaf)


def main():
    config.matmul_precision = "high"
    rng = np.random.default_rng(0)
    dt = jnp.float32
    X = jnp.asarray(rng.standard_normal((N, D)), dt)
    y = jnp.asarray(np.sign(np.sin(np.asarray(X) @ (np.arange(D) * 0.3
                                                    + 0.2))), dt)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    from gpr_tpu.models.classify_stream import stream_classify_log_evidence

    for impl in ("ift", "unroll"):
        def f(p, z, X, y, impl=impl):
            return stream_classify_log_evidence(
                SeIso, p, z, X, y, block_size=BLOCK, newton_iters=15,
                grad_impl=impl,
            )

        vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
        t0 = time.perf_counter()
        out = vg(p, Z, X, y)
        sync(out)
        first = time.perf_counter() - t0
        per = []
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [vg(p, Z, X, y) for _ in range(3)]
            sync(outs[-1])
            per.append((time.perf_counter() - t0) / 3)
        print(f"stream-classify[{impl}] (15 Newton, block {BLOCK}): "
              f"{min(per)*1e3:.0f} ms/iter (first {first:.1f}s, "
              f"ev {float(out[0]):.1f})", flush=True)


if __name__ == "__main__":
    main()
