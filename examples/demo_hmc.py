"""Bayesian-hyperparameter demo: HMC posterior vs the ML point estimate.

Fits the reference's 1-D synthetic (test/gen_data.ml) with a deliberately
small dataset (n=120), where hyper uncertainty is REAL: the ML point
estimate picks one (ell, sf2, sigma2) and its intervals ignore that other
hypers explain the data almost as well.  The demo

1. trains the ML fit (optim.train),
2. samples the hyper posterior with 4 vmapped HMC chains
   (optim.hmc.sample_posterior) and prints R-hat/ESS/acceptance,
3. prints the posterior spread of each hyper next to the ML point,
4. compares 2-sigma predictive coverage of the TRUE function: ML intervals
   vs the HMC mixture (predict_hmc_mixture) — the mixture widens exactly
   where the evidence surface is flat and covers better OUT of the data
   range.

Run: python examples/demo_hmc.py   (CPU f64, ~2 minutes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from gpr_tpu.kernels import SeIso  # noqa: E402
from gpr_tpu.models.fitc import calc_model, calc_trained  # noqa: E402
from gpr_tpu.models.predict import (  # noqa: E402
    co_variance_predictor,
    mean_predictor,
    predict_means,
    predict_variances,
)
from gpr_tpu.optim import (  # noqa: E402
    field_priors,
    make_pack,
    normal,
    predict_hmc_mixture,
    sample_posterior,
    train,
)


def f_true(x):
    return np.sin(3 * x) / np.where(np.abs(x) < 1e-12, 1e-12, x) + np.abs(
        x - 3
    ) / (x * x + 1)


def main():
    rng = np.random.default_rng(3)
    n, m = 40, 8
    x = np.sort(rng.uniform(-5, 5, n))
    y = f_true(x) + 0.4 * rng.standard_normal(n)
    X, yj = jnp.asarray(x[:, None]), jnp.asarray(y)

    # 1. ML fit.
    res = train(SeIso, X, yj, n_rand_inducing=m, variational=True,
                key=jax.random.PRNGKey(0))
    p_ml, z_ml, s2_ml = res.kernel_params, res.inducing, float(res.sigma2)
    print(f"ML point:  log_ell={float(p_ml.log_ell):+.3f}  "
          f"log_sf2={float(p_ml.log_sf2):+.3f}  sigma2={s2_ml:.4f}")

    # 2. Hyper posterior around the trained inducing set.
    pack = make_pack(SeIso, p_ml, z_ml, s2_ml, learn_inducing=False)
    prior = field_priors({"log_ell": normal(0.0, 2.0),
                          "log_sf2": normal(0.0, 2.0)})
    post = sample_posterior(
        SeIso, X, yj, pack, jax.random.PRNGKey(0),
        log_prior=prior, variational=True,
        n_chains=4, n_warmup=400, n_samples=400, n_leapfrog=16,
        chain_jitter=0.1, init_step=0.05,
    )
    print(f"HMC: accept={np.asarray(post.accept_rate).mean():.2f}  "
          f"rhat_max={post.rhat.max():.3f}  ess_min={post.ess.min():.0f}")
    draws = np.asarray(post.flat)
    names = ["log_s2 ", "log_ell", "log_sf2"]
    for j, nm in enumerate(names):
        lo, hi = np.percentile(draws[:, j], [5, 95])
        print(f"  {nm}: posterior 90% [{lo:+.3f}, {hi:+.3f}]  "
              f"median {np.median(draws[:, j]):+.3f}")

    # 3. Coverage: ML intervals vs the HMC mixture, including extrapolation.
    xt = np.linspace(-6.5, 6.5, 200)
    Xt = jnp.asarray(xt[:, None])
    ft = f_true(xt)

    model = calc_model(SeIso, p_ml, X, z_ml, s2_ml, variational=True)
    trained = calc_trained(model, yj)
    mu_ml = np.asarray(
        predict_means(SeIso, p_ml, mean_predictor(trained), Xt)
    )
    var_ml = np.asarray(predict_variances(
        SeIso, p_ml, co_variance_predictor(model), Xt, s2_ml
    ))
    mu_mix, var_mix = predict_hmc_mixture(
        SeIso, pack, post.samples, X, yj, Xt, variational=True, thin=20
    )
    mu_mix, var_mix = np.asarray(mu_mix), np.asarray(var_mix)

    inside = (xt >= x.min()) & (xt <= x.max())
    for name, msk in [("interpolation", inside), ("extrapolation", ~inside)]:
        c_ml = np.mean(np.abs(mu_ml[msk] - ft[msk]) <= 2 * np.sqrt(var_ml[msk]))
        c_mx = np.mean(
            np.abs(mu_mix[msk] - ft[msk]) <= 2 * np.sqrt(var_mix[msk])
        )
        w = np.sqrt(var_mix[msk]).mean() / np.sqrt(var_ml[msk]).mean()
        print(f"{name}: 2-sigma coverage of truth  ML {c_ml:.2f}  "
              f"HMC mixture {c_mx:.2f}  (mixture intervals {w:.2f}x wider)")


if __name__ == "__main__":
    main()
