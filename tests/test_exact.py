"""Exact dense GP (models/exact.py) — an extension beyond the reference's
sparse-only engine.  Checks: the evidence against a from-scratch numpy
computation, the Titsias bound (variational FITC <= exact, -> equality at
Z = X), closed-form LOO against brute-force refits, FD gradients, and the
prediction/covariance surface."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.models import (
    calc_exact,
    calc_model,
    calc_trained,
    covariances_exact,
    exact_trained,
    fit_exact,
    log_evidence,
    log_evidence_exact,
    loo_log_likelihood,
    loo_objective_exact,
    loo_posterior,
    predict_means_exact,
    predict_variances_exact,
)


def _data(rng, n=40, d=2):
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(axis=1)) +
                    0.1 * rng.standard_normal(n))
    p = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.2))
    return X, y, p


def _numpy_evidence(X, y, p, sigma2):
    """Independent dense formula: slogdet + solve, no repo code."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ell2 = math.exp(2.0 * float(p.log_ell))
    sf2 = math.exp(float(p.log_sf2))
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    K = sf2 * np.exp(-0.5 * d2 / ell2)
    A = K + sigma2 * np.eye(len(y))
    sign, logdet = np.linalg.slogdet(A)
    assert sign > 0
    alpha = np.linalg.solve(A, y)
    return -0.5 * (y @ alpha + logdet + len(y) * math.log(2 * math.pi))


def test_exact_evidence_vs_numpy(rng):
    X, y, p = _data(rng)
    got = float(log_evidence_exact(SeIso, p, X, y, 0.05))
    want = _numpy_evidence(X, y, p, 0.05)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_variational_fitc_bounds_exact(rng):
    """Titsias: variational evidence <= exact, equality at Z = X."""
    X, y, p = _data(rng, n=30)
    exact = float(log_evidence_exact(SeIso, p, X, y, 0.05))
    z_sub = SeIso.inducing_from_inputs(p, X[:8])
    lb_sub = float(log_evidence(SeIso, p, z_sub, 0.05, X, y,
                                variational=True))
    z_all = SeIso.inducing_from_inputs(p, X)
    lb_all = float(log_evidence(SeIso, p, z_all, 0.05, X, y,
                                variational=True, jitter=1e-10))
    assert lb_sub < exact
    assert lb_all <= exact + 1e-6
    np.testing.assert_allclose(lb_all, exact, atol=1e-4)


def test_loo_matches_brute_force(rng):
    """Closed-form LOO == n refits on the remaining n-1 points."""
    X, y, p = _data(rng, n=25)
    sigma2 = 0.05
    tr = exact_trained(calc_exact(SeIso, p, X, sigma2), y)
    mu, var = loo_posterior(tr)
    mu, var = np.asarray(mu), np.asarray(var)

    for i in [0, 7, 24]:
        keep = np.arange(25) != i
        tr_i = exact_trained(
            calc_exact(SeIso, p, X[keep], sigma2), y[keep]
        )
        m_i = float(predict_means_exact(SeIso, p, tr_i, X[i:i + 1])[0])
        v_i = float(predict_variances_exact(SeIso, p, tr_i, X[i:i + 1],
                                            predictive=True)[0])
        np.testing.assert_allclose(mu[i], m_i, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(var[i], v_i, rtol=1e-8)

    # and the pseudo-likelihood assembles them
    want = -0.5 * np.sum(np.log(var) + (np.asarray(y) - mu) ** 2 / var
                         + math.log(2 * math.pi))
    np.testing.assert_allclose(float(loo_log_likelihood(tr)), want, rtol=1e-10)


@pytest.mark.parametrize("objective", ["evidence", "loo"])
def test_exact_fd_gradients(rng, objective):
    X, y, p = _data(rng, n=30)
    obj = {"evidence": log_evidence_exact, "loo": loo_objective_exact}[objective]

    def f(log_ell, sigma2):
        pp = SeIso.Params(log_ell=log_ell, log_sf2=p.log_sf2)
        return obj(SeIso, pp, X, y, sigma2)

    g_ell, g_s2 = jax.grad(f, argnums=(0, 1))(p.log_ell, 0.05)
    eps = 1e-6
    fd_ell = (f(p.log_ell + eps, 0.05) - f(p.log_ell - eps, 0.05)) / (2 * eps)
    fd_s2 = (f(p.log_ell, 0.05 + eps) - f(p.log_ell, 0.05 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g_ell), float(fd_ell), rtol=1e-5)
    np.testing.assert_allclose(float(g_s2), float(fd_s2), rtol=1e-5)


def test_exact_predictions_and_covariance(rng):
    X, y, p = _data(rng, n=35)
    tr = exact_trained(calc_exact(SeIso, p, X, 0.05), y)
    # identity: mu(train) = K A^-1 y = y - sigma2 * alpha, exact at any noise
    mu = predict_means_exact(SeIso, p, tr, X)
    np.testing.assert_allclose(
        np.asarray(mu), np.asarray(y - 0.05 * tr.alpha), atol=1e-8
    )
    Xs = jnp.asarray(np.linspace(-2, 2, 9)[:, None].repeat(2, axis=1))
    var = predict_variances_exact(SeIso, p, tr, Xs, predictive=False)
    assert np.all(np.asarray(var) > -1e-10)
    cov = covariances_exact(SeIso, p, tr, Xs)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(cov)),
                               np.asarray(var), rtol=1e-6, atol=1e-10)
    # covariance is symmetric PSD
    c = np.asarray(cov)
    np.testing.assert_allclose(c, c.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(c) > -1e-8)


def test_exact_matches_fitc_trained_surface(rng):
    """FITC with Z = X reproduces the exact posterior mean."""
    X, y, p = _data(rng, n=30)
    tr = exact_trained(calc_exact(SeIso, p, X, 0.05), y)
    z = SeIso.inducing_from_inputs(p, X)
    m = calc_model(SeIso, p, X, z, 0.05, jitter=1e-10)
    ft = calc_trained(m, y)
    from gpr_tpu.models import mean_predictor, predict_means
    mu_f = predict_means(SeIso, p, mean_predictor(ft), X)
    mu_e = predict_means_exact(SeIso, p, tr, X)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_e), atol=1e-5)


def test_fit_exact_improves_and_fits(rng):
    X, y, p0 = _data(rng, n=60)
    l0 = float(log_evidence_exact(SeIso, p0, X, y, 1.0))
    tr, params, sigma2 = fit_exact(SeIso, p0, X, y, 1.0, max_iter=60)
    assert float(tr.l) > l0 + 10.0
    mu = predict_means_exact(SeIso, params, tr, X)
    smse = float(np.mean((np.asarray(mu) - np.asarray(y)) ** 2)
                 / np.var(np.asarray(y)))
    assert smse < 0.3


def test_fit_exact_loo_objective_runs(rng):
    X, y, p0 = _data(rng, n=40)
    tr0 = exact_trained(calc_exact(SeIso, p0, X, 1.0), y)
    l0 = float(loo_log_likelihood(tr0))
    tr, params, sigma2 = fit_exact(SeIso, p0, X, y, 1.0, objective="loo",
                                   max_iter=40)
    assert float(loo_log_likelihood(tr)) > l0
