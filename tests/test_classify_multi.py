"""Multi-class softmax Laplace vs a dense oracle.

The oracle builds the full (Cn, Cn) block-diagonal FITC prior explicitly
and runs the textbook Laplace computation with dense solves: Newton
iteration f <- (K^-1 + W)^-1 (W f + grad), evidence
Psi(f_hat) - 0.5 log|I + K W|, and the predictive Gaussian
Sigma = K** - K*' W^(1/2)(I + W^(1/2) K W^(1/2))^-1 W^(1/2) K* (the
W^-1-free form; W is singular by softmax construction).  The structured
implementation (models/classify_multi.py) must match: it never forms an
n x n object, so agreement validates both the m-space Woodbury algebra
and the determinant identity documented in its module docstring.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify import _fitc_prior
from gpr_tpu.models.classify_multi import (
    fit_classify_multi,
    multiclass_laplace_mode,
    multiclass_log_evidence,
    multiclass_predict,
)
from gpr_tpu.optim import make_pack

C = 3


def _setup(rng, n=24, m=5, d_in=2):
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    z = jnp.asarray(rng.standard_normal((m, d_in)))
    labels = jnp.asarray(rng.integers(0, C, n))
    params = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.4))
    return X, z, labels, params


def _dense_prior(params, z, X):
    """Dense per-class FITC prior K = V V' + diag(d) (shared)."""
    _, v, d = _fitc_prior(SeIso, params, z, X, None)
    k1 = np.asarray(v @ v.T + jnp.diag(d))
    n = k1.shape[0]
    kbig = np.zeros((C * n, C * n))
    for c in range(C):
        kbig[c * n:(c + 1) * n, c * n:(c + 1) * n] = k1
    return k1, kbig


def _softmax(f):
    e = np.exp(f - f.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def _dense_w(pi):
    """W = D - Pi Pi' as a (Cn, Cn) dense matrix, class-major stacking."""
    n = pi.shape[0]
    w = np.zeros((C * n, C * n))
    for i in range(n):
        p = pi[i]
        wi = np.diag(p) - np.outer(p, p)
        for c in range(C):
            for c2 in range(C):
                w[c * n + i, c2 * n + i] = wi[c, c2]
    return w


def _dense_mode(kbig, y1h, iters=200):
    """Newton to convergence with dense solves; returns (f_hat, a) stacked
    class-major as (Cn,) vectors."""
    cn = kbig.shape[0]
    n = cn // C
    kinv = np.linalg.inv(kbig)
    f = np.zeros(cn)
    for _ in range(iters):
        pi = _softmax(f.reshape(C, n).T)
        g = (y1h - pi).T.reshape(cn)
        w = _dense_w(pi)
        b = w @ f + g
        f_new = np.linalg.solve(kinv + w, b)
        # damped for safety on the first steps
        f = 0.5 * (f + f_new) if np.linalg.norm(f_new - f) > 10 else f_new
    a = kinv @ f
    return f, a


def test_multiclass_evidence_matches_dense_oracle(rng):
    X, z, labels, params = _setup(rng)
    n = X.shape[0]
    y1h = np.asarray(jax.nn.one_hot(labels, C))

    _, kbig = _dense_prior(params, z, X)
    f_hat_d, a_d = _dense_mode(kbig, y1h)

    # oracle evidence
    pi = _softmax(f_hat_d.reshape(C, n).T)
    loglik = float(np.sum(y1h * np.log(pi)))
    w = _dense_w(pi)
    sign, logdet = np.linalg.slogdet(np.eye(C * n) + kbig @ w)
    assert sign > 0
    ev_dense = -0.5 * float(a_d @ f_hat_d) + loglik - 0.5 * logdet

    # the structured mode must satisfy the dense stationarity condition
    f_hat, a, *_ = multiclass_laplace_mode(
        SeIso, params, z, X, labels, C, newton_iters=30
    )
    f_flat = np.asarray(f_hat).T.reshape(C * n)
    pi_s = _softmax(np.asarray(f_hat))
    grad_psi = (np.asarray(jax.nn.one_hot(labels, C)) - pi_s).T.reshape(
        C * n
    ) - np.linalg.inv(kbig) @ f_flat
    assert np.linalg.norm(grad_psi) < 1e-8

    ev = float(multiclass_log_evidence(
        SeIso, params, z, X, labels, C, newton_iters=30
    ))
    np.testing.assert_allclose(ev, ev_dense, rtol=1e-9)


def test_multiclass_predict_matches_dense_oracle(rng):
    X, z, labels, params = _setup(rng, n=20, m=4)
    n = X.shape[0]
    y1h = np.asarray(jax.nn.one_hot(labels, C))
    Xstar = jnp.asarray(rng.standard_normal((3, 2)))

    k1, kbig = _dense_prior(params, z, X)
    f_hat_d, a_d = _dense_mode(kbig, y1h)
    pi = _softmax(f_hat_d.reshape(C, n).T)
    w = _dense_w(pi)

    # dense cross/test covariances under the FITC test conditional
    inducing, v, d = _fitc_prior(SeIso, params, z, X, None)
    u_inv_t = np.asarray(
        jnp.linalg.solve(
            inducing.chol_km.T,
            SeIso.k_cross(params, Xstar, inducing.z).T,
        )
    )
    vstar = u_inv_t.T  # (t, m)
    kxs = vstar @ np.asarray(v).T  # (t, n): Q*n
    kss = np.asarray(SeIso.k_diag(params, Xstar))

    # W^-1-free predictive: (K + W^-1)^-1 = W^1/2 (I + W^1/2 K W^1/2)^-1 W^1/2
    evals, evecs = np.linalg.eigh(w)
    ws = evecs @ np.diag(np.sqrt(np.maximum(evals, 0.0))) @ evecs.T
    inner = np.linalg.inv(np.eye(C * n) + ws @ kbig @ ws)
    kinv_form = ws @ inner @ ws

    probs, mu, sigma = multiclass_predict(
        SeIso, params, z, X, labels, C, Xstar,
        newton_iters=30, n_samples=64,
    )
    mu = np.asarray(mu)
    sigma = np.asarray(sigma)

    for t in range(3):
        kstar = np.zeros((C * n, C))
        for c in range(C):
            kstar[c * n:(c + 1) * n, c] = kxs[t]
        mu_d = kstar.T @ a_d
        sig_d = kss[t] * np.eye(C) - kstar.T @ kinv_form @ kstar
        np.testing.assert_allclose(mu[t], mu_d, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(sigma[t], sig_d, rtol=1e-6, atol=1e-8)

    p = np.asarray(probs)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-6)
    assert (p > 0).all() and (p < 1).all()


@pytest.mark.slow
def test_multiclass_evidence_gradients(rng):
    """AD gradient through the unrolled Newton vs finite differences."""
    X, z, labels, params = _setup(rng, n=16, m=4)

    def f(log_ell, log_sf2, z):
        p = SeIso.Params(log_ell=log_ell, log_sf2=log_sf2)
        return multiclass_log_evidence(
            SeIso, p, z, X, labels, C, newton_iters=25
        )

    g = jax.grad(f, argnums=(0, 1, 2))(params.log_ell, params.log_sf2, z)
    eps = 1e-6
    for i, (name, val) in enumerate(
        [("log_ell", params.log_ell), ("log_sf2", params.log_sf2)]
    ):
        args = [params.log_ell, params.log_sf2, z]
        args[i] = val + eps
        up = f(*args)
        args[i] = val - eps
        dn = f(*args)
        fd = float((up - dn) / (2 * eps))
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-5,
                                   err_msg=name)
    # one inducing coordinate
    dz = np.zeros(z.shape)
    dz[1, 0] = eps
    fd = float(
        (f(params.log_ell, params.log_sf2, z + dz)
         - f(params.log_ell, params.log_sf2, z - dz)) / (2 * eps)
    )
    np.testing.assert_allclose(float(g[2][1, 0]), fd, rtol=2e-5)


@pytest.mark.slow
def test_multiclass_training_separates(rng):
    """3-class Gaussian blobs: training raises the evidence and the
    predicted classes match on held-out points."""
    centers = np.array([[2.0, 0.0], [-1.0, 2.0], [-1.0, -2.0]])
    n_per = 30
    Xn = np.concatenate([
        centers[c] + 0.5 * rng.standard_normal((n_per, 2)) for c in range(C)
    ])
    yn = np.repeat(np.arange(C), n_per)
    perm = rng.permutation(len(yn))
    X = jnp.asarray(Xn[perm])
    labels = jnp.asarray(yn[perm])

    params = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(1.0))
    z0 = X[:6]
    pack = make_pack(SeIso, params, z0, 1.0, learn_sigma2=False)
    ev0 = float(multiclass_log_evidence(SeIso, params, z0, X, labels, C))

    p_f, z_f, st = fit_classify_multi(
        SeIso, X, labels, pack, C, max_iter=25, epsabs=1e-4 / X.shape[0],
    )
    ev1 = float(multiclass_log_evidence(SeIso, p_f, z_f, X, labels, C))
    assert ev1 > ev0

    Xt = jnp.asarray(centers + 0.1 * rng.standard_normal((C, 2)))
    probs, _, _ = multiclass_predict(
        SeIso, p_f, z_f, X, labels, C, Xt, n_samples=256
    )
    assert (np.argmax(np.asarray(probs), axis=1) == np.arange(C)).all()
