"""PITC evidence: block_size=1 == FITC, one block == exact GP, dense
oracle with an arbitrary partition (incl. padded final block), gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.pitc import pitc_coeffs, pitc_log_evidence
from gpr_tpu.models.streaming import (
    predict_means_blocked,
    predict_variances_blocked,
    streaming_log_evidence,
)

SIGMA2 = 0.3


def data(rng, n=200, m=9, d=2):
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    return X, Z, y, p


def dense_pitc_oracle(X, Z, y, p, sigma2, block_size, jitter=1e-6):
    """Straight dense evaluation of log N(y; 0, Q + S) with S block-diagonal
    over the same consecutive partition the streaming scan uses."""
    X = np.asarray(X, np.float64)
    Z = np.asarray(Z, np.float64)
    y = np.asarray(y, np.float64)
    ell2 = np.exp(2.0 * float(p.log_ell))
    sf2 = np.exp(float(p.log_sf2))

    def k(a, b):
        d2 = ((a * a).sum(1)[:, None] - 2 * a @ b.T + (b * b).sum(1)[None, :])
        return sf2 * np.exp(-0.5 * np.maximum(d2, 0) / ell2)

    n = X.shape[0]
    km = k(Z, Z) + jitter * np.eye(Z.shape[0])
    np.fill_diagonal(km, sf2 + jitter)
    knm = k(X, Z)
    q = knm @ np.linalg.solve(km, knm.T)
    knn = k(X, X)
    np.fill_diagonal(knn, sf2)
    cov = q + sigma2 * np.eye(n)
    for i0 in range(0, n, block_size):
        sl = slice(i0, min(i0 + block_size, n))
        cov[sl, sl] += knn[sl, sl] - q[sl, sl]
    sign, logdet = np.linalg.slogdet(cov)
    assert sign > 0
    alpha = np.linalg.solve(cov, y)
    return -0.5 * (logdet + y @ alpha + n * np.log(2 * np.pi))


def test_block_size_one_is_fitc(rng):
    X, Z, y, p = data(rng)
    fitc = streaming_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=50)
    pitc = pitc_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=1)
    np.testing.assert_allclose(float(pitc), float(fitc), rtol=1e-10)


def test_one_block_is_exact_gp(rng):
    X, Z, y, p = data(rng, n=120)
    pitc = pitc_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=120,
                             block_jitter=0.0)
    # exact GP log marginal, independent dense computation
    Xn = np.asarray(X, np.float64)
    ell2 = np.exp(2.0 * float(p.log_ell))
    sf2 = np.exp(float(p.log_sf2))
    d2 = ((Xn * Xn).sum(1)[:, None] - 2 * Xn @ Xn.T
          + (Xn * Xn).sum(1)[None, :])
    knn = sf2 * np.exp(-0.5 * np.maximum(d2, 0) / ell2)
    np.fill_diagonal(knn, sf2)
    cov = knn + SIGMA2 * np.eye(120)
    sign, logdet = np.linalg.slogdet(cov)
    yn = np.asarray(y, np.float64)
    exact = -0.5 * (logdet + yn @ np.linalg.solve(cov, yn)
                    + 120 * np.log(2 * np.pi))
    np.testing.assert_allclose(float(pitc), exact, rtol=1e-8)


@pytest.mark.parametrize("block_size", [32, 64, 60])  # 60: padded last block
def test_matches_dense_oracle(rng, block_size):
    X, Z, y, p = data(rng, n=200)
    pitc = pitc_log_evidence(SeIso, p, Z, SIGMA2, X, y,
                             block_size=block_size, block_jitter=0.0)
    oracle = dense_pitc_oracle(X, Z, y, p, SIGMA2, block_size)
    np.testing.assert_allclose(float(pitc), oracle, rtol=1e-8)


def test_accuracy_dial(rng):
    """Bigger blocks move the evidence monotonically-in-spirit toward the
    exact GP: the b=64 evidence must be closer to exact than FITC's."""
    X, Z, y, p = data(rng, n=192)
    exact = pitc_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=192,
                              block_jitter=0.0)
    fitc = pitc_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=1)
    mid = pitc_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=64)
    assert abs(float(mid) - float(exact)) < abs(float(fitc) - float(exact))


def test_gradients_finite_difference(rng):
    X, Z, y, p = data(rng, n=96, m=5)

    def f(log_ell, log_sf2, s2):
        return pitc_log_evidence(
            SeIso, SeIso.Params(log_ell=log_ell, log_sf2=log_sf2), Z, s2,
            X, y, block_size=32,
        )

    args = (p.log_ell, p.log_sf2, jnp.asarray(SIGMA2))
    grads = jax.grad(f, argnums=(0, 1, 2))(*args)
    eps = 1e-6
    for i, g in enumerate(grads):
        a = list(args)
        a[i] = args[i] + eps
        fp = float(f(*a))
        a[i] = args[i] - eps
        fm = float(f(*a))
        np.testing.assert_allclose(float(g), (fp - fm) / (2 * eps),
                                   rtol=1e-4, atol=1e-7)

    # inducing-coordinate gradients too (the SPGP axis)
    gz = jax.grad(
        lambda z: pitc_log_evidence(SeIso, p, z, SIGMA2, X, y, block_size=32)
    )(Z)
    zp = Z.at[2, 1].add(eps)
    zm = Z.at[2, 1].add(-eps)
    fd = (float(pitc_log_evidence(SeIso, p, zp, SIGMA2, X, y, block_size=32))
          - float(pitc_log_evidence(SeIso, p, zm, SIGMA2, X, y,
                                    block_size=32))) / (2 * eps)
    np.testing.assert_allclose(float(gz[2, 1]), fd, rtol=1e-4, atol=1e-7)


def test_predictions(rng):
    """PITC coefficients drive the shared streaming predictors; with one
    block they reproduce the exact GP posterior mean."""
    X, Z, y, p = data(rng, n=96, m=24)
    inducing, r_mat, coeffs = pitc_coeffs(
        SeIso, p, Z, SIGMA2, X, y, block_size=96, block_jitter=0.0,
    )
    Xs = jnp.asarray(np.random.default_rng(1).standard_normal((7, 2)))
    mu = predict_means_blocked(SeIso, p, Z, coeffs, Xs)
    var = predict_variances_blocked(SeIso, p, Z, inducing.chol_km, r_mat,
                                    Xs, SIGMA2)
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.asarray(var) > 0)

    # FITC (block 1) coefficients == streaming_coeffs
    from gpr_tpu.models.streaming import streaming_coeffs

    _, r1, c1 = pitc_coeffs(SeIso, p, Z, SIGMA2, X, y, block_size=1)
    _, r2, c2 = streaming_coeffs(SeIso, p, Z, SIGMA2, X, y, block_size=48)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-8,
                               atol=1e-12)


def test_pitc_one_block_exact_gp_lin_ard(rng):
    """Regression for the CI-fuzz find (round-3 s5): the within-block
    covariance must come from k_upper_inputs, not k_cross(x_b, x_b) —
    k_cross expects the pre-scaled lin_ard inducing rep on its second
    argument, so raw rows there silently dropped one 1/ell factor.  One
    block covering all rows == the exact dense GP evidence."""
    from scipy.stats import multivariate_normal

    from gpr_tpu.kernels import LinArd

    n = 18
    X = jnp.asarray(rng.standard_normal((n, 3)))
    z = LinArd.inducing_from_inputs(
        LinArd.Params(log_ells=jnp.asarray([0.3, -0.2, 0.1])), X[:5]
    )
    params = LinArd.Params(log_ells=jnp.asarray([0.3, -0.2, 0.1]))
    y = jnp.asarray(rng.standard_normal(n))
    sigma2 = 0.4
    lp = pitc_log_evidence(LinArd, params, z, sigma2, X, y, block_size=n)
    K = np.asarray(LinArd.k_upper_inputs(params, X)) + sigma2 * np.eye(n)
    truth = multivariate_normal.logpdf(np.asarray(y), np.zeros(n), K)
    np.testing.assert_allclose(float(lp), truth, rtol=1e-9)
