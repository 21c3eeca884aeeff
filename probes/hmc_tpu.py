"""TPU timing probe: HMC over the hyper posterior at the bench shape.

Fully Bayesian hyperparameters at n = 1M x 8, m = 300, f32: one HMC
transition is n_leapfrog evidence gradients (the same ~40 ms graph as the
bench headline), so the expected cost is ~n_leapfrog x headline plus MH
overhead.  The probe times warmup and sampling transitions separately and
reports s/draw and effective evidence-grads/s, plus the f32 accept-step
resolution at this |L| (~2e6 -> ~0.25 nats), which is why the probe runs
the normalize-free potential on a mean-scale-friendly shape but keeps
n_leapfrog small.

Run: PYTHONPATH=/root/.axon_site:/root/repo python probes/hmc_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gpr_tpu.config import config
from gpr_tpu.kernels import SeIso
from gpr_tpu.optim import make_pack, make_objective
from gpr_tpu.optim.hmc import hmc

N, D, M = 1_000_000, 8, 300
N_LEAPFROG = 8
N_WARMUP = 12
N_SAMPLES = 12


def main():
    config.matmul_precision = "high"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    dt = jnp.float32

    # Generate on device (CLAUDE.md: never host-transfer GB-scale arrays).
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kx, (N, D), dt)
    w = jnp.full((D,), 0.15, dt)
    y = jnp.sin(X @ w) + 0.1 * jax.random.normal(ky, (N,), dt)
    rng = np.random.default_rng(1)
    Z = jnp.asarray(rng.standard_normal((M, D)), dt)
    p0 = SeIso.Params(log_ell=jnp.asarray(1.1, dt), log_sf2=jnp.asarray(0.0, dt))

    # Hyper-only posterior (inducing fixed): 3 coordinates, the regime a
    # user samples after fit_restarts has placed Z.
    pack = make_pack(SeIso, p0, Z, 0.01, learn_inducing=False)
    # return_raw: hmc() must receive the (x, X, y) form and thread the data
    # through as operands (data=) — a closure-captured 32 MB X lowers to an
    # embedded HLO constant and the remote compiler rejects it (HTTP 413).
    raw, _ = make_objective(SeIso, X, y, pack, variational=True,
                            return_raw=True)
    neg_l_and_grad = lambda x: raw(x, X, y)  # noqa: E731 - direct probes

    t0 = time.perf_counter()
    u, g = neg_l_and_grad(pack.x0)
    np.asarray(u)
    t_compile = time.perf_counter() - t0
    print(f"objective compile+first eval: {t_compile:.1f} s  "
          f"U = {float(u):.1f}  (f32 accept resolution ~ "
          f"{abs(float(u)) * 1.2e-7:.3f} nats)", flush=True)

    t0 = time.perf_counter()
    res = hmc(
        raw, pack.x0, jax.random.PRNGKey(7), data=(X, y),
        n_samples=N_SAMPLES, n_warmup=N_WARMUP, n_leapfrog=N_LEAPFROG,
        n_chains=1, chain_jitter=0.05, init_step=0.02,
    )
    wall = time.perf_counter() - t0
    n_trans = N_WARMUP + N_SAMPLES
    grads = n_trans * N_LEAPFROG
    print(f"hmc wall (incl. sampler compile): {wall:.1f} s for {n_trans} "
          f"transitions x {N_LEAPFROG} leapfrog", flush=True)

    # Steady-state cost: re-run the already-compiled sampler.
    t0 = time.perf_counter()
    res = hmc(
        raw, pack.x0, jax.random.PRNGKey(8), data=(X, y),
        n_samples=N_SAMPLES, n_warmup=N_WARMUP, n_leapfrog=N_LEAPFROG,
        n_chains=1, chain_jitter=0.05, init_step=0.02,
    )
    wall = time.perf_counter() - t0
    print(f"hmc wall (compiled): {wall:.1f} s = {wall / n_trans * 1e3:.0f} "
          f"ms/draw, {grads / wall:.1f} evidence-grads/s", flush=True)
    print(f"accept={float(res.accept_rate[0]):.3f} "
          f"step={float(res.step_size[0]):.4f} "
          f"sigma2 draws median={float(np.median(np.exp(res.flat[:, 0]))):.4f}",
          flush=True)

    # The f32 evidence noise floor that gates MH at this n: U along a tiny
    # hyper segment should be smooth to << 1 nat; its jagged residual is
    # what the accept step sees as fake energy error.  (First measurement:
    # accept collapsed to 0.083 even as the adapted step -> 0.)
    ts = jnp.linspace(0.0, 1e-4, 16, dtype=dt)
    us = np.array([float(neg_l_and_grad(pack.x0.at[1].add(t))[0]) for t in ts])
    resid = us - np.polyval(np.polyfit(np.asarray(ts), us, 2), np.asarray(ts))
    print(f"f32 U noise floor at n=1e6 (rms residual off a smooth fit "
          f"along log_ell): {resid.std():.2f} nats "
          f"(MH needs << 1)", flush=True)

    # The scale where full-evidence f32 MH is healthy: n = 1e5.
    n_small = 100_000
    pack_s = make_pack(SeIso, p0, Z, 0.01, learn_inducing=False)
    raw_s, _ = make_objective(
        SeIso, X[:n_small], y[:n_small], pack_s, variational=True,
        return_raw=True,
    )
    t0 = time.perf_counter()
    res_s = hmc(
        raw_s, pack_s.x0, jax.random.PRNGKey(9),
        data=(X[:n_small], y[:n_small]),
        n_samples=40, n_warmup=40, n_leapfrog=N_LEAPFROG,
        n_chains=1, chain_jitter=0.05, init_step=0.02,
    )
    wall_s = time.perf_counter() - t0
    print(f"n=1e5: {wall_s:.1f} s for 80 transitions (incl. compile), "
          f"accept={float(res_s.accept_rate[0]):.3f} "
          f"step={float(res_s.step_size[0]):.4f}", flush=True)
    print(f"n=1e5 draws (log s2, log ell, log sf2) mean: "
          f"{np.asarray(res_s.flat).mean(0).round(3)} "
          f"(true log s2 = {np.log(0.01):.2f})", flush=True)

    # Streaming (compensated two-sum accumulation, models/stream_grad.py):
    # if the cross-tile rounding dominates the dense path's U noise floor,
    # block_size= is the design answer for f32 HMC at large n.
    raw_st, _ = make_objective(
        SeIso, X, y, pack, variational=True, block_size=65536,
        return_raw=True,
    )
    neg_st = lambda x: raw_st(x, X, y)  # noqa: E731 - direct probes
    t0 = time.perf_counter()
    u_st = neg_st(pack.x0)
    np.asarray(u_st)
    print(f"streaming objective compile+first eval: "
          f"{time.perf_counter() - t0:.1f} s  U = {float(u_st):.1f}",
          flush=True)
    us_st = np.array(
        [float(neg_st(pack.x0.at[1].add(t))[0]) for t in ts]
    )
    resid_st = us_st - np.polyval(
        np.polyfit(np.asarray(ts), us_st, 2), np.asarray(ts)
    )
    print(f"f32 U noise floor at n=1e6, STREAMING: {resid_st.std():.3f} "
          f"nats (dense above)", flush=True)
    t0 = time.perf_counter()
    res_st = hmc(
        raw_st, pack.x0, jax.random.PRNGKey(10), data=(X, y),
        n_samples=N_SAMPLES, n_warmup=N_WARMUP, n_leapfrog=N_LEAPFROG,
        n_chains=1, chain_jitter=0.05, init_step=0.02,
    )
    wall_st = time.perf_counter() - t0
    print(f"streaming hmc (incl. sampler compile): {wall_st:.1f} s for "
          f"{n_trans} transitions, accept={float(res_st.accept_rate[0]):.3f} "
          f"step={float(res_st.step_size[0]):.4f}", flush=True)
    print(f"streaming draws mean: "
          f"{np.asarray(res_st.flat).mean(0).round(3)}", flush=True)


if __name__ == "__main__":
    main()
