"""Engine-vs-oracle parity: the rebuild's acceptance gate.

Checks gpr_tpu's FITC/variational evidence, coefficients, and jax.grad
gradients against the independent numpy oracle (tests/oracle.py, a port of the
reference's test/oct.m), against central finite differences of our own
evidence, and against the exact dense GP in the m = n limit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.models import (
    calc_model,
    calc_trained,
    co_variance_predictor,
    covariances_fitc,
    log_evidence,
    mean_predictor,
    predict_means,
    predict_variances,
)
from oracle import dense_gp_posterior, fitc_oracle

LOG_ELL, LOG_SF2, SIGMA2 = 0.3, 0.4, 0.25


def make_data(rng, n=50, m=7, d=3):
    X = rng.standard_normal((n, d))
    Z = rng.standard_normal((m, d))
    y = np.sin(X.sum(axis=1)) + 0.1 * rng.standard_normal(n)
    return jnp.asarray(X), jnp.asarray(Z), jnp.asarray(y)


def params():
    return SeIso.Params(log_ell=jnp.asarray(LOG_ELL), log_sf2=jnp.asarray(LOG_SF2))


@pytest.mark.parametrize("variational", [False, True])
@pytest.mark.parametrize("factorization", ["qr", "chol"])
def test_evidence_matches_oracle(rng, variational, factorization):
    X, Z, y = make_data(rng)
    oracle = fitc_oracle(np.asarray(X), np.asarray(Z), np.asarray(y), SIGMA2,
                         LOG_ELL, LOG_SF2)
    model = calc_model(
        SeIso, params(), X, Z, SIGMA2,
        variational=variational, factorization=factorization,
    )
    trained = calc_trained(model, y)

    np.testing.assert_allclose(
        float(model.l1), oracle.vl1 if variational else oracle.l1, rtol=1e-10
    )
    np.testing.assert_allclose(float(trained.l2), oracle.l2, rtol=1e-10)
    np.testing.assert_allclose(
        float(trained.l), oracle.vl if variational else oracle.l, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(trained.coeffs), oracle.coeffs, rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(model.r), oracle.r_vec, rtol=1e-9,
                               atol=1e-12)


def test_qr_and_chol_paths_agree(rng):
    X, Z, y = make_data(rng, n=80, m=12, d=2)
    lq = log_evidence(SeIso, params(), Z, SIGMA2, X, y, factorization="qr")
    lc = log_evidence(SeIso, params(), Z, SIGMA2, X, y, factorization="chol")
    np.testing.assert_allclose(float(lq), float(lc), rtol=1e-12)


@pytest.mark.parametrize("variational", [False, True])
def test_gradients_match_oracle(rng, variational):
    """jax.grad vs the reference's analytic gradient formulas (oct.m:127-180).

    The oracle finite-differences the kernel matrices with forward eps=1e-6
    exactly as oct.m does, so agreement is bounded at ~1e-5.
    """
    X, Z, y = make_data(rng)
    oracle = fitc_oracle(np.asarray(X), np.asarray(Z), np.asarray(y), SIGMA2,
                         LOG_ELL, LOG_SF2)

    def f(p, sigma2):
        return log_evidence(SeIso, p, Z, sigma2, X, y, variational=variational)

    (dp, dsigma2) = jax.grad(f, argnums=(0, 1))(params(), SIGMA2)
    if variational:
        expect = (oracle.vdl_dlog_ell, oracle.vdl_dlog_sf2, oracle.vdl_dsigma2)
    else:
        expect = (oracle.dl_dlog_ell, oracle.dl_dlog_sf2, oracle.dl_dsigma2)
    np.testing.assert_allclose(float(dp.log_ell), expect[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(dp.log_sf2), expect[1], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(dsigma2), expect[2], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("variational", [False, True])
def test_gradients_match_finite_differences(rng, variational):
    """Central-FD self-test of the full gradient, including inducing points —
    the analogue of the reference's Test.self_test (fitc_gp.ml:1398-1462)."""
    X, Z, y = make_data(rng, n=30, m=5, d=2)

    def f(p, z, sigma2):
        return log_evidence(SeIso, p, z, sigma2, X, y, variational=variational)

    p0 = params()
    grads = jax.grad(f, argnums=(0, 1, 2))(p0, Z, SIGMA2)
    eps = 1e-6

    def fd(fun, x0):
        return (fun(x0 + eps) - fun(x0 - eps)) / (2 * eps)

    # scalar hypers
    d_ell = fd(lambda v: float(f(SeIso.Params(log_ell=v, log_sf2=p0.log_sf2),
                                 Z, SIGMA2)), LOG_ELL)
    d_sf2 = fd(lambda v: float(f(SeIso.Params(log_ell=p0.log_ell, log_sf2=v),
                                 Z, SIGMA2)), LOG_SF2)
    d_s2 = fd(lambda v: float(f(p0, Z, v)), SIGMA2)
    np.testing.assert_allclose(float(grads[0].log_ell), d_ell, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(grads[0].log_sf2), d_sf2, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(grads[2]), d_s2, rtol=1e-6, atol=1e-8)

    # every inducing-point coordinate (SPGP gradient, cov_se_iso.ml:261-327)
    dz_fd = np.zeros_like(np.asarray(Z))
    for i in range(Z.shape[0]):
        for j in range(Z.shape[1]):
            dz_fd[i, j] = fd(
                lambda v, i=i, j=j: float(f(p0, Z.at[i, j].set(v), SIGMA2)),
                float(Z[i, j]),
            )
    np.testing.assert_allclose(np.asarray(grads[1]), dz_fd, rtol=1e-5, atol=1e-7)


def test_m_equals_n_recovers_dense_gp(rng):
    """With Z = X, FITC collapses to the exact dense GP (r = 0): evidence,
    posterior means and variances must match textbook formulas."""
    n, d = 40, 2
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)))
    Xstar = jnp.asarray(rng.standard_normal((15, d)))

    model = calc_model(SeIso, params(), X, X, SIGMA2)
    trained = calc_trained(model, y)
    mean_ref, cov_ref, lml_ref = dense_gp_posterior(
        np.asarray(X), np.asarray(Xstar), np.asarray(y), SIGMA2, LOG_ELL, LOG_SF2
    )
    np.testing.assert_allclose(float(trained.l), lml_ref, rtol=1e-5)

    mp = mean_predictor(trained)
    cvp = co_variance_predictor(model)
    means = predict_means(SeIso, params(), mp, Xstar)
    np.testing.assert_allclose(np.asarray(means), mean_ref, rtol=1e-4, atol=1e-6)

    variances = predict_variances(SeIso, params(), cvp, Xstar, SIGMA2,
                                  predictive=False)
    np.testing.assert_allclose(np.asarray(variances), np.diag(cov_ref),
                               rtol=1e-3, atol=1e-5)

    cov = covariances_fitc(SeIso, params(), cvp, Xstar, SIGMA2, predictive=False)
    np.testing.assert_allclose(np.asarray(cov), cov_ref, rtol=1e-3, atol=1e-5)
