"""Laplace FITC classification vs a dense numpy oracle, + end-to-end fit."""

import jax
import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify import (
    classify_log_evidence,
    classify_predict,
    laplace_mode,
)


def data(rng, n=120, m=8, d=2):
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    # labels from a smooth latent rule, some noise
    latent = np.asarray(X[:, 0]) * 1.5 + np.sin(2 * np.asarray(X[:, 1]))
    y = jnp.asarray(np.sign(latent + 0.3 * rng.standard_normal(n)))
    p = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.3))
    return X, Z, y, p


def dense_laplace_oracle(K, y, iters=50):
    """GPML alg 3.1 with a DENSE prior covariance K (numpy, n x n)."""
    n = K.shape[0]
    f = np.zeros(n)
    for _ in range(iters):
        pi = 1.0 / (1.0 + np.exp(-f))
        w = np.maximum(pi * (1 - pi), 1e-12)
        sw = np.sqrt(w)
        B = np.eye(n) + (sw[:, None] * K) * sw[None, :]
        L = np.linalg.cholesky(B)
        b = w * f + (0.5 * (y + 1) - pi)
        c = np.linalg.solve(L, sw * (K @ b))
        a = b - sw * np.linalg.solve(L.T, c)
        f = K @ a
    pi = 1.0 / (1.0 + np.exp(-f))
    w = np.maximum(pi * (1 - pi), 1e-12)
    sw = np.sqrt(w)
    B = np.eye(n) + (sw[:, None] * K) * sw[None, :]
    _, logdet = np.linalg.slogdet(B)
    loglik = -np.logaddexp(0.0, -y * f).sum()
    return f, a, -0.5 * a @ f + loglik - 0.5 * logdet


def fitc_prior_dense(X, Z, p, jitter=1e-6):
    from gpr_tpu.models.classify import _fitc_prior

    _, v, d = _fitc_prior(SeIso, p, Z, X, jitter)
    v = np.asarray(v)
    return v @ v.T + np.diag(np.asarray(d))


def test_mode_and_evidence_match_dense_oracle(rng):
    X, Z, y, p = data(rng)
    K = fitc_prior_dense(X, Z, p)
    f_o, a_o, ev_o = dense_laplace_oracle(K, np.asarray(y))

    f_hat, a, *_ = laplace_mode(SeIso, p, Z, X, y, newton_iters=25)
    ev = classify_log_evidence(SeIso, p, Z, X, y, newton_iters=25)
    np.testing.assert_allclose(np.asarray(f_hat), f_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(a), a_o, atol=1e-9)
    np.testing.assert_allclose(float(ev), ev_o, rtol=1e-9)


def test_predictive_matches_dense_oracle(rng):
    X, Z, y, p = data(rng, n=100)
    K = fitc_prior_dense(X, Z, p)
    yn = np.asarray(y)
    f_o, a_o, _ = dense_laplace_oracle(K, yn)
    pi = 1.0 / (1.0 + np.exp(-f_o))
    w = np.maximum(pi * (1 - pi), 1e-12)

    Xs = jnp.asarray(rng.standard_normal((9, 2)))
    prob, mu, var = classify_predict(SeIso, p, Z, X, y, Xs, newton_iters=25)

    # dense reference: k* from the same FITC prior structure
    from gpr_tpu.models.classify import _fitc_prior

    _, v, d = _fitc_prior(SeIso, p, Z, X, 1e-6)
    _, vs, _ = _fitc_prior(SeIso, p, Z, Xs, 1e-6)
    kstar = np.asarray(vs) @ np.asarray(v).T  # (9, n)
    mu_o = kstar @ a_o
    Kinv_term = np.linalg.inv(K + np.diag(1.0 / w))
    kss = np.exp(float(p.log_sf2))
    var_o = kss - np.einsum("ij,jk,ik->i", kstar, Kinv_term, kstar)
    np.testing.assert_allclose(np.asarray(mu), mu_o, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), var_o, rtol=1e-6, atol=1e-9)
    assert np.all((np.asarray(prob) > 0) & (np.asarray(prob) < 1))


def test_gradients_finite_difference(rng):
    X, Z, y, p = data(rng, n=80, m=5)

    def f(log_ell, log_sf2):
        return classify_log_evidence(
            SeIso, SeIso.Params(log_ell=log_ell, log_sf2=log_sf2), Z, X, y,
        )

    g = jax.grad(f, argnums=(0, 1))(p.log_ell, p.log_sf2)
    eps = 1e-6
    for i, name in enumerate(["log_ell", "log_sf2"]):
        args = [p.log_ell, p.log_sf2]
        args[i] = args[i] + eps
        fp = float(f(*args))
        args[i] = args[i] - 2 * eps
        fm = float(f(*args))
        np.testing.assert_allclose(float(g[i]), (fp - fm) / (2 * eps),
                                   rtol=1e-4, atol=1e-7)


def test_train_classifier_end_to_end(rng):
    """Hyper training by evidence ascent improves held-out accuracy over a
    bad init and lands above 85% on this separable-ish task."""
    from gpr_tpu.optim import make_pack
    from gpr_tpu.optim.lbfgs_device import fit_packed_objective

    X, Z, y, _ = data(rng, n=240, m=10)
    Xte, _, yte, _ = data(rng, n=200, m=10)
    p_bad = SeIso.Params(log_ell=jnp.asarray(2.5), log_sf2=jnp.asarray(-2.0))
    pack = make_pack(SeIso, p_bad, Z, 1.0, learn_sigma2=False)

    def fg(x, X, y):
        def f(x):
            params, z, _ = pack.unpack(x)
            return -classify_log_evidence(SeIso, params, z, X, y) / X.shape[0]
        return jax.value_and_grad(f)(x)

    st = fit_packed_objective(fg, pack, (X, y), max_iter=40, epsabs=1e-4)
    assert not bool(st.failed)
    params, z, _ = pack.unpack(st.x)
    prob0, *_ = classify_predict(SeIso, p_bad, Z, X, y, Xte)
    prob1, *_ = classify_predict(SeIso, params, z, X, y, Xte)
    acc0 = float(jnp.mean((prob0 > 0.5) == (yte > 0)))
    acc1 = float(jnp.mean((prob1 > 0.5) == (yte > 0)))
    assert acc1 > 0.85, (acc0, acc1)
    assert float(st.f) < float(fg(pack.x0, X, y)[0])


def test_classify_stats(rng):
    """ClassifyStats vs hand-computed numpy values, plus the boundary
    behaviors: a perfect ranker has AUC 1 and a coin-flip AUC ~ 1/2."""
    from gpr_tpu.models import calc_classify_stats

    n = 400
    y = jnp.asarray(np.sign(rng.standard_normal(n)))
    # informative but imperfect probabilities
    logits = 2.0 * np.asarray(y) + rng.standard_normal(n)
    prob = jnp.asarray(1.0 / (1.0 + np.exp(-logits)))

    st = calc_classify_stats(y, prob)
    y01 = (np.asarray(y) > 0).astype(float)
    p = np.asarray(prob)
    np.testing.assert_allclose(float(st.base_rate), y01.mean(), rtol=1e-12)
    np.testing.assert_allclose(
        float(st.error_rate), np.mean((p > 0.5) != (y01 > 0.5)), rtol=1e-12)
    ll = -np.mean(y01 * np.log(p) + (1 - y01) * np.log1p(-p))
    np.testing.assert_allclose(float(st.log_loss), ll, rtol=1e-10)
    np.testing.assert_allclose(
        float(st.brier), np.mean((p - y01) ** 2), rtol=1e-10)
    b = y01.mean()
    prior = -(b * np.log(b) + (1 - b) * np.log1p(-b))
    np.testing.assert_allclose(float(st.msll), ll - prior, rtol=1e-9)
    # rank AUC vs the O(n^2) definition
    pos, neg = p[y01 > 0.5], p[y01 <= 0.5]
    auc_ref = np.mean(pos[:, None] > neg[None, :])
    np.testing.assert_allclose(float(st.auc), auc_ref, atol=1e-10)
    assert float(st.msll) < 0  # informative model beats the base rate

    perfect = calc_classify_stats(y, jnp.asarray(0.5 + 0.49 * np.asarray(y)))
    np.testing.assert_allclose(float(perfect.auc), 1.0)
    np.testing.assert_allclose(float(perfect.error_rate), 0.0)
    coin = calc_classify_stats(y, jnp.asarray(rng.uniform(0, 1, n)))
    assert abs(float(coin.auc) - 0.5) < 0.1
