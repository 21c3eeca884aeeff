"""Closed-form LOO of the sparse FITC model (models/loo.py) — pinned
against (a) the brute-force Gaussian-conditional definition computed from
a from-scratch numpy FITC joint covariance, (b) the dense-exact LOO at
Z = X, and (c) finite differences of the objective."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import SeIso
from gpr_tpu.models import (
    calc_exact,
    calc_model,
    calc_trained,
    exact_trained,
    loo_log_likelihood,
    loo_log_likelihood_fitc,
    loo_objective_fitc,
    loo_posterior,
    loo_posterior_fitc,
)


def _data(rng, n=30, d=2):
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(axis=1)) +
                    0.1 * rng.standard_normal(n))
    p = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.2))
    return X, y, p


def _fitc_joint_numpy(X, Z, p, sigma2, jitter):
    """From-scratch FITC marginal covariance A = Qnn + diag(r) + s2 I."""
    X = np.asarray(X, np.float64)
    Z = np.asarray(Z, np.float64)
    ell2 = math.exp(2.0 * float(p.log_ell))
    sf2 = math.exp(float(p.log_sf2))

    def k(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return sf2 * np.exp(-0.5 * d2 / ell2)

    km = k(Z, Z) + jitter * np.eye(len(Z))
    knm = k(X, Z)
    qnn = knm @ np.linalg.solve(km, knm.T)
    r = sf2 - np.diag(qnn)
    return qnn + np.diag(r) + sigma2 * np.eye(len(X))


def test_loo_fitc_matches_brute_force_gaussian(rng):
    X, y, p = _data(rng)
    Z = SeIso.inducing_from_inputs(p, X[:7])
    sigma2, jitter = 0.05, 1e-10
    tr = calc_trained(calc_model(SeIso, p, X, Z, sigma2, jitter=jitter), y)
    mu, var = loo_posterior_fitc(tr)

    A = _fitc_joint_numpy(X, Z, p, sigma2, jitter)
    yv = np.asarray(y, np.float64)
    Ainv = np.linalg.inv(A)
    alpha = Ainv @ yv
    c = np.diag(Ainv)
    np.testing.assert_allclose(np.asarray(var), 1.0 / c, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(mu), yv - alpha / c, rtol=1e-7,
                               atol=1e-9)

    # and the assembled pseudo-likelihood
    want = -0.5 * np.sum(np.log(1.0 / c) + (alpha / c) ** 2 * c
                         + math.log(2 * math.pi))
    np.testing.assert_allclose(float(loo_log_likelihood_fitc(tr)), want,
                               rtol=1e-9)


def test_loo_fitc_equals_exact_at_full_inducing(rng):
    """Z = X makes r -> 0 and A -> K + sigma2 I: sparse LOO == dense LOO."""
    X, y, p = _data(rng, n=25)
    sigma2 = 0.05
    Z = SeIso.inducing_from_inputs(p, X)
    tr_f = calc_trained(calc_model(SeIso, p, X, Z, sigma2, jitter=1e-11), y)
    tr_e = exact_trained(calc_exact(SeIso, p, X, sigma2), y)
    mu_f, var_f = loo_posterior_fitc(tr_f)
    mu_e, var_e = loo_posterior(tr_e)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_e),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_e),
                               rtol=1e-5)
    np.testing.assert_allclose(float(loo_log_likelihood_fitc(tr_f)),
                               float(loo_log_likelihood(tr_e)), rtol=1e-6)


def test_loo_fitc_objective_fd_gradients(rng):
    X, y, p = _data(rng, n=40)
    Z = SeIso.inducing_from_inputs(p, X[:6])

    def f(log_ell, sigma2):
        pp = SeIso.Params(log_ell=log_ell, log_sf2=p.log_sf2)
        return loo_objective_fitc(SeIso, pp, Z, sigma2, X, y)

    g_ell, g_s2 = jax.grad(f, argnums=(0, 1))(p.log_ell, 0.05)
    eps = 1e-6
    fd_ell = (f(p.log_ell + eps, 0.05) - f(p.log_ell - eps, 0.05)) / (2 * eps)
    fd_s2 = (f(p.log_ell, 0.05 + eps) - f(p.log_ell, 0.05 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g_ell), float(fd_ell), rtol=1e-5)
    np.testing.assert_allclose(float(g_s2), float(fd_s2), rtol=1e-5)
    # factorizations agree
    a = loo_objective_fitc(SeIso, p, Z, 0.05, X, y, factorization="qr")
    b = loo_objective_fitc(SeIso, p, Z, 0.05, X, y, factorization="chol")
    np.testing.assert_allclose(float(a), float(b), rtol=1e-10)


def test_loo_fitc_variance_exceeds_insample(rng):
    """LOO predictive variance must dominate the in-sample predictive
    variance at every point (removing a row can only widen it)."""
    X, y, p = _data(rng, n=35)
    Z = SeIso.inducing_from_inputs(p, X[:8])
    tr = calc_trained(calc_model(SeIso, p, X, Z, 0.05, jitter=1e-10), y)
    _, var_loo = loo_posterior_fitc(tr)
    from gpr_tpu.models import variances_model_inputs
    var_in = variances_model_inputs(tr.model, predictive=True)
    assert np.all(np.asarray(var_loo) >= np.asarray(var_in) - 1e-10)


def test_fit_sparse_loo_objective_improves(rng):
    """optim.lbfgs_device.fit(objective='loo') must raise the LOO
    pseudo-likelihood of the sparse model."""
    from gpr_tpu.optim import make_pack
    from gpr_tpu.optim.lbfgs_device import fit

    X, y, p0 = _data(rng, n=80)
    Z = SeIso.inducing_from_inputs(p0, X[:10])
    pack = make_pack(SeIso, p0, Z, 1.0)
    l0 = float(loo_objective_fitc(SeIso, p0, Z, 1.0, X, y))
    pp, zz, s2, st = fit(SeIso, X, y, pack, objective="loo", max_iter=60,
                         epsabs=1e-6)
    l1 = float(loo_objective_fitc(SeIso, pp, zz, s2, X, y))
    assert l1 > l0 + 5.0, (l0, l1)
    # streaming + loo is rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fit(SeIso, X, y, pack, objective="loo", streaming_block_size=16)
