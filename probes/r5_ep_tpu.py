"""TPU probe (round 5): EP stationary-gradient vs unrolled sweeps at the
bench shape.  Measured same-session: stationary 588 ms/iter vs unroll
2061 ms/iter (3.5x) at n=1M x 8, m=300, 20 damped sweeps, identical
evidence (-691842.4).

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_ep_tpu.py
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify_ep import ep_log_evidence
N, D, M = 1_000_000, 8, 300
def sync(o):
    for l in jax.tree.leaves(o): np.asarray(l)
config.matmul_precision = "high"
rng = np.random.default_rng(0)
dt = jnp.float32
X = jnp.asarray(rng.standard_normal((N, D)), dt)
y = jnp.asarray(np.sign(np.sin(np.asarray(X) @ (np.arange(D)*0.3+0.2))), dt)
Z = jnp.asarray(rng.standard_normal((M, D)), dt)
p = SeIso.Params(log_ell=jnp.asarray(0.5, dt), log_sf2=jnp.asarray(0.0, dt))
for impl in ("stationary", "unroll"):
    vg = jax.jit(jax.value_and_grad(
        lambda p, z, X, y, impl=impl: ep_log_evidence(
            SeIso, p, z, X, y, n_sweeps=20, grad_impl=impl),
        argnums=(0, 1)))
    t0 = time.perf_counter(); out = vg(p, Z, X, y); sync(out)
    first = time.perf_counter() - t0
    per = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [vg(p, Z, X, y) for _ in range(4)]
        sync(outs[-1]); per.append((time.perf_counter()-t0)/4)
    print(f"ep[{impl}] (20 sweeps): {min(per)*1e3:.0f} ms/iter "
          f"(first {first:.1f}s, ev {float(out[0]):.1f})", flush=True)
