"""Round-5 probe: why does the bench HMC land at accept=0.48 vs target
0.8 (VERDICT r4 #5)?

Two candidate causes, separable by experiment at the bench leg's shape
(n=1e5, m=300, 8 leapfrog, 1 chain):

  (w) under-adaptation — the bench leg runs only n_warmup=20 dual-
      averaging steps; Hoffman & Gelman's schedule is nowhere near its
      stationary point that early.  Test: same config with n_warmup
      20 / 60 / 150.
  (f) f32 evidence roughness — the deterministic per-x rounding of the
      total evidence (~0.06-nat resolution at |L|~2e5, plus GEMM noise)
      acts as a rough potential the MH step cannot resolve.  Test: the
      150-warmup config again with matmul HIGHEST (the accurate-mode
      GEMMs cut the 1M evidence error 307 -> 5.9 nats, so roughness
      shrinks ~50x).

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/r5_hmc_accept.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.optim import make_objective, make_pack
from gpr_tpu.optim.hmc import hmc

N, D, M = 1_000_000, 8, 300
NH = 100_000


def main():
    dt = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, D)), dt)[:NH]
    y = jnp.asarray(rng.standard_normal(N), dt)[:NH]
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    params = SeIso.Params(log_ell=jnp.asarray(0.5, dt),
                          log_sf2=jnp.asarray(0.0, dt))
    pack = make_pack(SeIso, params, Z, 0.1, learn_inducing=False)

    from gpr_tpu.optim.hmc import make_accept_energy

    # MEASURED (r5, this probe, first run — cases without energy_fn):
    #   HIGH   n_warmup=20   accept=0.48 step=0.0043  (bench repro)
    #   HIGH   n_warmup=60   accept=0.55 step=0.0014
    #   HIGH   n_warmup=150  accept=0.54 step~0       <- noise floor: accept
    #                        pins ~0.5 even as step -> 0, so more warmup
    #                        cannot fix it (roughness, not under-adaptation)
    #   HIGHEST n_warmup=150 accept=0.98 step~0       <- smooth potential
    # Fix validated below: HIGH forces + HIGHEST accept energy
    # (hmc(energy_fn=...), the surrogate-gradient construction).
    cases = [
        ("HIGH, n_warmup=20 (bench repro)", "high", 20, False),
        ("HIGH forces + HIGHEST accept, w=20", "high", 20, True),
        ("HIGH forces + HIGHEST accept, w=60", "high", 60, True),
    ]
    for name, prec, n_w, use_energy in cases:
        config.matmul_precision = prec
        raw, _ = make_objective(SeIso, X, y, pack, variational=True,
                                return_raw=True)
        efn = make_accept_energy(SeIso, X, y, pack, variational=True) \
            if use_energy else None
        t0 = time.perf_counter()
        res = hmc(
            raw, pack.x0, jax.random.PRNGKey(6), data=(X, y),
            n_samples=20, n_warmup=n_w, n_leapfrog=8, n_chains=1,
            chain_jitter=0.05, init_step=0.02, energy_fn=efn,
        )
        wall = time.perf_counter() - t0
        ess_s = float(res.ess.min()) / wall
        print(f"{name:36s} accept={float(res.accept_rate[0]):.2f} "
              f"step={float(res.step_size[0]):.4f} min-ESS {ess_s:.2f}/s "
              f"({wall:.0f}s)", flush=True)
    config.matmul_precision = "high"


if __name__ == "__main__":
    main()
