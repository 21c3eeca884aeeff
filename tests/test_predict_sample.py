"""Prediction at model inputs, FITC/FIC covariance consistency, samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.models import (
    calc_model,
    calc_trained,
    co_variance_predictor,
    cov_sample,
    cov_sampler,
    covariances_fic,
    covariances_fic_model_inputs,
    covariances_fitc,
    covariances_fitc_model_inputs,
    mean_predictor,
    predict_mean_one,
    predict_means,
    predict_variance_one,
    predict_variances,
    sample,
    sampler,
    variances_model_inputs,
)

SIGMA2 = 0.3


@pytest.fixture
def setup(rng):
    X = jnp.asarray(rng.standard_normal((40, 2)))
    Z = jnp.asarray(rng.standard_normal((7, 2)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    model = calc_model(SeIso, p, X, Z, SIGMA2)
    trained = calc_trained(model, y)
    return p, X, Z, y, model, trained


def test_model_inputs_variances_match_predictor_path(setup):
    p, X, Z, y, model, trained = setup
    fast = variances_model_inputs(model, predictive=False)
    cvp = co_variance_predictor(model)
    slow = predict_variances(SeIso, p, cvp, X, SIGMA2, predictive=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=1e-9,
                               atol=1e-12)


def test_covariances_model_inputs_consistency(setup):
    """Diagonals of the model-input covariances must equal the variances —
    the invariant the upstream scaled-Q1 path violates (PARITY_NOTES.md #1)."""
    p, X, Z, y, model, trained = setup
    cvp = co_variance_predictor(model)

    cov_fitc = covariances_fitc_model_inputs(model, SeIso, p, X,
                                             predictive=False)
    np.testing.assert_allclose(
        np.asarray(jnp.diag(cov_fitc)),
        np.asarray(variances_model_inputs(model, predictive=False)),
        rtol=1e-8, atol=1e-10,
    )
    # and equals the predictor-path FITC covariance at the same points
    cov_pred = covariances_fitc(SeIso, p, cvp, X, SIGMA2, predictive=False)
    np.testing.assert_allclose(np.asarray(cov_fitc), np.asarray(cov_pred),
                               rtol=1e-8, atol=1e-10)

    cov_fic = covariances_fic_model_inputs(model, predictive=False)
    np.testing.assert_allclose(
        np.asarray(jnp.diag(cov_fic)),
        np.asarray(variances_model_inputs(model, predictive=False)),
        rtol=1e-8, atol=1e-10,
    )
    cov_fic_pred = covariances_fic(SeIso, p, cvp, X, SIGMA2, predictive=False)
    np.testing.assert_allclose(np.asarray(cov_fic), np.asarray(cov_fic_pred),
                               rtol=1e-8, atol=1e-10)


def test_fitc_fic_difference_is_offdiagonal_prior(setup):
    """FITC and FIC covariances share diagonal and differ off-diagonally by
    (Kt - Qt)'s off-diagonal part (fitc_gp.ml:566-624)."""
    p, X, Z, y, model, trained = setup
    cvp = co_variance_predictor(model)
    Xs = X[:9]
    cf = covariances_fitc(SeIso, p, cvp, Xs, SIGMA2, predictive=False)
    ci = covariances_fic(SeIso, p, cvp, Xs, SIGMA2, predictive=False)
    np.testing.assert_allclose(np.asarray(jnp.diag(cf)),
                               np.asarray(jnp.diag(ci)), rtol=1e-8, atol=1e-9)
    assert float(jnp.max(jnp.abs(cf - ci))) > 1e-6  # genuinely different


def test_single_point_matches_batch(setup):
    p, X, Z, y, model, trained = setup
    mp = mean_predictor(trained)
    cvp = co_variance_predictor(model)
    x0 = X[3]
    np.testing.assert_allclose(
        float(predict_mean_one(SeIso, p, mp, x0)),
        float(predict_means(SeIso, p, mp, X)[3]), rtol=1e-12,
    )
    np.testing.assert_allclose(
        float(predict_variance_one(SeIso, p, cvp, x0, SIGMA2)),
        float(predict_variances(SeIso, p, cvp, X, SIGMA2)[3]), rtol=1e-12,
    )


def test_scalar_sampler_statistics():
    s = sampler(2.0, 0.25, 0.75, predictive=True)  # stddev = 1
    draws = sample(jax.random.PRNGKey(0), s, n=20000)
    assert abs(float(jnp.mean(draws)) - 2.0) < 0.03
    assert abs(float(jnp.std(draws)) - 1.0) < 0.03
    s2 = sampler(2.0, 0.25, 0.75, predictive=False)
    np.testing.assert_allclose(float(s2.stddev), 0.5, rtol=1e-12)


def test_cov_sampler_statistics(setup):
    p, X, Z, y, model, trained = setup
    mp = mean_predictor(trained)
    cvp = co_variance_predictor(model)
    Xs = X[:5]
    means = predict_means(SeIso, p, mp, Xs)
    cov = covariances_fitc(SeIso, p, cvp, Xs, SIGMA2, predictive=False)
    cs = cov_sampler(means, cov, SIGMA2, predictive=False)
    draws = cov_sample(jax.random.PRNGKey(1), cs, n=60000)  # (5, 60000)
    emp_mean = jnp.mean(draws, axis=1)
    emp_cov = jnp.cov(np.asarray(draws))
    np.testing.assert_allclose(np.asarray(emp_mean), np.asarray(means),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(emp_cov), np.asarray(cov),
                               atol=0.02)
    # single draw shape
    one = cov_sample(jax.random.PRNGKey(2), cs)
    assert one.shape == (5,)


def test_fic_blocked_sampling_moments(setup):
    """Low-rank streamed FIC sampling reproduces the dense FIC posterior
    moments without forming the t x t covariance."""
    from gpr_tpu.models.sample import sample_fic_blocked

    p, X, Z, y, model, trained = setup
    cvp = co_variance_predictor(model)
    Xs = X[:6]
    cov_ref = covariances_fic(SeIso, p, cvp, Xs, SIGMA2, predictive=False)
    draws = sample_fic_blocked(
        jax.random.PRNGKey(3), SeIso, p, cvp, Xs, SIGMA2, 60000,
        predictive=False, block_size=4,
    )
    assert draws.shape == (6, 60000)
    emp = jnp.cov(np.asarray(draws))
    np.testing.assert_allclose(np.asarray(emp), np.asarray(cov_ref), atol=0.02)
    np.testing.assert_allclose(np.asarray(jnp.mean(draws, axis=1)),
                               np.zeros(6), atol=0.02)


def test_fic_blocked_sampling_large_t(setup):
    """Sampling 50k joint test points runs in low-rank time/memory."""
    from gpr_tpu.models.sample import sample_fic_blocked

    p, X, Z, y, model, trained = setup
    cvp = co_variance_predictor(model)
    rng2 = np.random.default_rng(0)
    Xbig = jnp.asarray(rng2.standard_normal((50_000, 2)))
    draws = sample_fic_blocked(
        jax.random.PRNGKey(5), SeIso, p, cvp, Xbig, SIGMA2, 3,
        block_size=8192,
    )
    assert draws.shape == (50_000, 3)
    assert bool(jnp.all(jnp.isfinite(draws)))
