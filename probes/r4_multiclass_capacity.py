"""Round-4 probe: largest streaming multi-class GRADIENT on one v5e.

VERDICT r3 item 5: the 16M C=3 streaming softmax FORWARD runs (19.9 s/eval,
probes/classify_multi_stream_big_tpu.py) but its gradient crashes the v5e
worker — the Newton scan's checkpointed carries plus one step's backward
internals exceed HBM.  This probe finds the boundary empirically so the
manual's capacity section can state a measured single-chip training limit
(training past it is what the data mesh is for).

Probe-lesson hygiene (NEXT.md round-3 session-6): a worker OOM leaves the
backend UNAVAILABLE in-process and the tunnel needs ~minutes to recover, so
EVERY n gets its own subprocess, ascending, with a recovery pause after any
failure; the parent stops at the first failing n (footprint is monotone in
n at fixed iters/block).

Run: python probes/r4_multiclass_capacity.py            (parent sweep)
     python probes/r4_multiclass_capacity.py --child N  (one attempt)
"""

import subprocess
import sys
import time

N_SWEEP = [2_000_000, 4_000_000, 8_000_000, 12_000_000]
D, M, C = 8, 300, 3
BLOCK = 65536
NEWTON_ITERS = 15
RECOVERY_S = 300.0


def child(n):
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from gpr_tpu.config import config
    from gpr_tpu.kernels import SeIso
    from gpr_tpu.models.classify_multi_stream import (
        stream_multiclass_log_evidence,
    )

    config.matmul_precision = "high"
    dt = jnp.float32

    @jax.jit
    def make_data(key):
        X = jax.random.normal(key, (n, D), dt)
        w = jnp.arange(D, dtype=dt) * 0.3 + 0.2
        score = X @ w
        labels = (score > -1.0).astype(jnp.int32) + (score > 1.0)
        return X, labels

    X, labels = make_data(jax.random.PRNGKey(0))
    np.asarray(jnp.sum(X[:2]))  # force completion (tunnel: block_until_ready lies)
    rng = np.random.default_rng(0)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                     log_sf2=jnp.asarray(0.0, dt))

    def f(p, z, X, labels):
        return stream_multiclass_log_evidence(
            SeIso, p, z, X, labels, C, newton_iters=NEWTON_ITERS,
            block_size=BLOCK,
        )

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
    t0 = time.perf_counter()
    out = vg(p, Z, X, labels)
    ev = float(np.asarray(out[0]))
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = vg(p, Z, X, labels)
    ev = float(np.asarray(out[0]))
    per = time.perf_counter() - t0
    for leaf in jax.tree.leaves(out[1]):
        assert bool(jnp.all(jnp.isfinite(leaf))), "non-finite grads"
    print(f"OK n={n}: evidence+grad {per:.1f} s/iter "
          f"(first {first:.1f}s, ev {ev:.1f}, grads finite)", flush=True)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    for n in N_SWEEP:
        print(f"--- n={n:,} ({NEWTON_ITERS} Newton steps, block {BLOCK})",
              flush=True)
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, __file__, "--child", str(n)],
            capture_output=True, text=True, timeout=2400,
        )
        print(r.stdout, end="", flush=True)
        if r.returncode != 0:
            tail = "\n".join(r.stderr.strip().splitlines()[-6:])
            print(f"FAIL n={n} (rc={r.returncode}, "
                  f"{time.perf_counter() - t0:.0f}s):\n{tail}", flush=True)
            print(f"boundary: largest OK is the previous sweep point; "
                  f"waiting {RECOVERY_S:.0f}s for tunnel recovery", flush=True)
            time.sleep(RECOVERY_S)
            break


if __name__ == "__main__":
    main()
