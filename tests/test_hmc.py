"""HMC hyper-posterior sampler: calibration on analytic targets (moments,
mass adaptation, R-hat/ESS diagnostics), determinism, and the GP workflow —
sample_posterior over the evidence + predict_hmc_mixture coverage.

The reference has no Bayesian-hyperparameter capability (pure ML via GSL
BFGS2, lib/fitc_gp.ml:1532-1671); these tests validate the extension against
ground truth instead of an upstream oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.optim import (
    field_priors,
    hmc,
    make_pack,
    normal,
    predict_hmc_mixture,
    sample_posterior,
)


def _gauss_target(mu, sig):
    mu = jnp.asarray(mu)
    sig = jnp.asarray(sig)

    def u(x):
        z = (x - mu) / sig
        return 0.5 * jnp.sum(z * z)

    return jax.value_and_grad(u)


def test_gaussian_target_moments():
    mu = np.array([1.0, -2.0, 0.5])
    sig = np.array([0.5, 1.5, 1.0])
    res = hmc(
        _gauss_target(mu, sig),
        jnp.zeros(3),
        jax.random.PRNGKey(0),
        n_samples=400,
        n_warmup=300,
        n_leapfrog=8,
        n_chains=4,
    )
    draws = np.asarray(res.flat)
    assert draws.shape == (1600, 3)
    # Monte-Carlo s.e. of the mean is sig/sqrt(ess); allow 4x with a floor.
    se = sig / np.sqrt(np.maximum(res.ess, 10.0))
    np.testing.assert_array_less(np.abs(draws.mean(0) - mu), 4 * se + 0.05)
    np.testing.assert_allclose(draws.std(0), sig, rtol=0.25)
    assert np.all(res.rhat < 1.05)
    assert np.all(res.ess > 50)
    acc = np.asarray(res.accept_rate)
    assert np.all((acc > 0.5) & (acc <= 1.0))


def test_mass_adaptation_handles_scale_separation():
    # Scales 100x apart: without the adapted diagonal mass a single step
    # size cannot traverse both coordinates.
    mu = np.array([0.0, 0.0])
    sig = np.array([0.05, 5.0])
    res = hmc(
        _gauss_target(mu, sig),
        jnp.zeros(2),
        jax.random.PRNGKey(1),
        n_samples=500,
        n_warmup=500,
        n_leapfrog=16,
        n_chains=4,
        chain_jitter=0.01,
    )
    draws = np.asarray(res.flat)
    np.testing.assert_allclose(draws.std(0), sig, rtol=0.3)
    # The inverse mass should mirror the variance ratio (~1e4) within an
    # order of magnitude.
    ratio = np.asarray(res.inv_mass)[:, 1] / np.asarray(res.inv_mass)[:, 0]
    assert np.all(ratio > 1e2)
    assert np.all(res.rhat < 1.1)


def test_correlated_gaussian():
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def u(x):
        return 0.5 * x @ prec @ x

    res = hmc(
        jax.value_and_grad(u),
        jnp.zeros(2),
        jax.random.PRNGKey(2),
        n_samples=600,
        n_warmup=400,
        n_leapfrog=16,
        n_chains=4,
    )
    draws = np.asarray(res.flat)
    emp = np.cov(draws.T)
    np.testing.assert_allclose(emp, cov, atol=0.2)
    assert np.all(res.rhat < 1.1)


def test_determinism_and_shapes():
    f = _gauss_target(np.zeros(2), np.ones(2))
    kwargs = dict(n_samples=50, n_warmup=50, n_leapfrog=4, n_chains=2)
    r1 = hmc(f, jnp.zeros(2), jax.random.PRNGKey(7), **kwargs)
    r2 = hmc(f, jnp.zeros(2), jax.random.PRNGKey(7), **kwargs)
    np.testing.assert_array_equal(np.asarray(r1.samples), np.asarray(r2.samples))
    assert r1.samples.shape == (2, 50, 2)
    assert r1.potential.shape == (2, 50)
    assert r1.inv_mass.shape == (2, 2)


def test_divergence_guard_rejects_nonfinite():
    # A potential that blows up past |x| > 2: proposals landing there must
    # be rejected, never stored.
    def u(x):
        v = jnp.sum(x * x)
        return jnp.where(v > 4.0, jnp.inf, 0.5 * v)

    res = hmc(
        jax.value_and_grad(u),
        jnp.zeros(1),
        jax.random.PRNGKey(3),
        n_samples=200,
        n_warmup=200,
        n_leapfrog=8,
        n_chains=2,
        chain_jitter=0.1,
    )
    draws = np.asarray(res.flat)
    assert np.all(np.isfinite(draws))
    assert np.all(draws * draws <= 4.0 + 1e-9)


@pytest.mark.slow
def test_gp_posterior_and_mixture(rng):
    # 1-D GP with known hypers; the posterior over (log sigma2, log_ell,
    # log_sf2) should concentrate near truth and the mixture predictive
    # should cover the true function.
    n, m = 80, 8
    x = np.sort(rng.uniform(-4, 4, n))
    f = np.sin(1.5 * x)
    y = f + 0.15 * rng.standard_normal(n)
    X = jnp.asarray(x[:, None])
    yj = jnp.asarray(y)
    z0 = jnp.asarray(np.linspace(-3.8, 3.8, m)[:, None])
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    pack = make_pack(SeIso, p0, z0, 0.05, learn_inducing=False)
    prior = field_priors(
        {"log_ell": normal(0.0, 1.5), "log_sf2": normal(0.0, 1.5)},
        sigma2_prior=lambda s2: normal(np.log(0.05), 2.0)(jnp.log(s2)),
    )
    res = sample_posterior(
        SeIso, X, yj, pack, jax.random.PRNGKey(11),
        log_prior=prior, variational=True,
        n_samples=300, n_warmup=300, n_leapfrog=16, n_chains=2,
        chain_jitter=0.1, init_step=0.05,
    )
    assert np.all(res.rhat < 1.2)
    draws = np.asarray(res.flat)
    sigma2_draws = np.exp(draws[:, 0])
    # Noise variance identified near the true 0.15^2 = 0.0225.
    assert 0.25 * 0.0225 < np.median(sigma2_draws) < 4 * 0.0225

    xt = np.linspace(-3.5, 3.5, 40)
    mean, var = predict_hmc_mixture(
        SeIso, pack, res.samples, X, yj, jnp.asarray(xt[:, None]),
        variational=True, thin=10,
    )
    mean, var = np.asarray(mean), np.asarray(var)
    assert np.all(np.isfinite(mean)) and np.all(var > 0)
    ft = np.sin(1.5 * xt)
    cover = np.mean(np.abs(mean - ft) <= 2 * np.sqrt(var))
    assert cover > 0.85
    # Law of total variance: mixing can only widen the average interval
    # relative to the per-draw variances it averages.
    sub = res.samples.reshape(-1, draws.shape[-1])[::10]
    per_draw_vars = []
    for s in np.asarray(sub):
        _, v = predict_hmc_mixture(
            SeIso, pack, s[None, :], X, yj, jnp.asarray(xt[:, None]),
            variational=True,
        )
        per_draw_vars.append(np.asarray(v))
    assert np.all(var >= np.mean(per_draw_vars, axis=0) - 1e-9)
