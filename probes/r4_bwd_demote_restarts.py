"""Round-4 probe: bench's f32 fit_restarts with the demoted backward.

The outcome-level test of config.bwd_demote_sites=("ui_bar", "vg"):
replicate bench.py's f32-fit secondary EXACTLY (same rng draw order, same
ladder, 60 iters) and compare probe evidences / final mean-NLL / sigma2
against the same-day bench baseline (BENCH r4 validation run:
probes=[1.1548, 1.1509, 1.148, 0.9856], mean-NLL=0.9562, |g|=2.66e-01,
sigma2=0.591, 94 s).  Matching probe values certify the demoted gradients
steer the optimizer to the same basins.

Run: python probes/r4_bwd_demote_restarts.py  (TPU)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.optim import make_pack
from gpr_tpu.optim.lbfgs_device import fit_restarts

N, D, M = 1_000_000, 8, 300


def main():
    config.matmul_precision = "high"
    config.acc_precision = "default"
    config.bwd_demote_sites = ("ui_bar", "vg")
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    # bench.py rng draw order: X, y, Z, tproj (se_fat leg), yf
    X = jnp.asarray(rng.standard_normal((N, D)), dtype)
    _y = rng.standard_normal(N)
    Z = jnp.asarray(rng.standard_normal((M, D)), dtype)
    _tproj = rng.standard_normal((D, D))
    yf = jnp.asarray(
        np.sin(np.asarray(X) @ (np.arange(D) * 0.3 + 0.2))
        + 0.3 * rng.standard_normal(N), dtype)
    params = SeIso.Params(log_ell=jnp.asarray(0.5, dtype),
                          log_sf2=jnp.asarray(0.0, dtype))
    packf = make_pack(SeIso, params, Z, 1.0)
    ladder = (-1.5, -0.5, 0.5, 1.5)
    x0s = [
        make_pack(
            SeIso,
            SeIso.Params(log_ell=jnp.asarray(le, dtype),
                         log_sf2=jnp.asarray(0.0, dtype)),
            Z, 1.0,
        ).x0
        for le in ladder
    ]
    t0 = time.perf_counter()
    _, _, s2f, st, probe_fs = fit_restarts(
        SeIso, X, yf, packf, x0s, probe_iters=12, variational=True,
        streaming_block_size=16384, max_iter=60, epsabs=1e-4,
    )
    print(f"DEMOTED fit_restarts (ladder {ladder}, 60 iters): "
          f"probes={[round(f, 4) for f in probe_fs]} "
          f"iters={int(st.n_iter)} evals={int(st.n_evals)} "
          f"mean-NLL={float(st.f):.4f} "
          f"|grad|={float(jnp.linalg.norm(st.g)):.2e} "
          f"sigma2={float(s2f):.3f} ({time.perf_counter()-t0:.0f}s)",
          flush=True)
    print("baseline (same-day bench): probes=[1.1548, 1.1509, 1.148, "
          "0.9856] mean-NLL=0.9562 |grad|=2.66e-01 sigma2=0.591 (94s)",
          flush=True)


if __name__ == "__main__":
    main()
