"""Poisson-Laplace count regression vs a dense textbook oracle.

The oracle runs GPML Algorithm 3.1 with the Poisson likelihood on the
dense FITC prior (damped dense Newton to convergence, slogdet evidence,
W^(1/2)-form predictive); the structured implementation
(models/poisson.py) never builds an n x n object, so agreement validates
its m-space Woodbury route.  Gradients are finite-difference verified
through the unrolled Newton, and training on synthetic counts must beat
the init and recover the true rate field.
"""

import numpy as np
import pytest
from scipy.special import gammaln

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify import _fitc_prior
from gpr_tpu.models.poisson import (
    fit_poisson,
    poisson_laplace_mode,
    poisson_log_evidence,
    poisson_predict,
)
from gpr_tpu.optim import make_pack


def _setup(rng, n=28, m=5, d_in=2):
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    z = jnp.asarray(rng.standard_normal((m, d_in)))
    f_true = np.sin(np.asarray(X).sum(axis=1))
    y = jnp.asarray(rng.poisson(np.exp(f_true)).astype(np.float64))
    params = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.2))
    return X, z, y, params


def _dense_prior(params, z, X):
    _, v, d = _fitc_prior(SeIso, params, z, X, None)
    return np.asarray(v @ v.T + jnp.diag(d))


def _dense_mode(K, y, iters=300):
    n = len(y)
    kinv = np.linalg.inv(K)
    f = np.zeros(n)
    for _ in range(iters):
        w = np.exp(f)
        grad = y - w
        b = w * f + grad
        f_new = np.linalg.solve(kinv + np.diag(w), b)
        step = f_new - f
        # crude damping for global convergence
        t = 1.0
        while t > 1e-6:
            cand = f + t * step
            psi = (-0.5 * cand @ (kinv @ cand)
                   + np.sum(y * cand - np.exp(cand)))
            psi0 = (-0.5 * f @ (kinv @ f) + np.sum(y * f - np.exp(f)))
            if psi >= psi0:
                break
            t *= 0.5
        f = f + t * step
    return f, kinv @ f


def test_poisson_evidence_matches_dense_oracle(rng):
    X, z, y, params = _setup(rng)
    K = _dense_prior(params, z, X)
    yn = np.asarray(y)
    f_d, a_d = _dense_mode(K, yn)

    # structured mode satisfies the dense stationarity condition
    f_hat, a, *_ = poisson_laplace_mode(SeIso, params, z, X, y,
                                        newton_iters=40)
    resid = (yn - np.exp(np.asarray(f_hat))
             - np.linalg.inv(K) @ np.asarray(f_hat))
    assert np.linalg.norm(resid) < 1e-8

    w = np.exp(f_d)
    sign, logdet = np.linalg.slogdet(np.eye(len(yn)) + K * w[None, :])
    assert sign > 0
    loglik = float(np.sum(yn * f_d - np.exp(f_d) - gammaln(yn + 1.0)))
    ev_dense = -0.5 * float(a_d @ f_d) + loglik - 0.5 * logdet

    ev = float(poisson_log_evidence(SeIso, params, z, X, y,
                                    newton_iters=40))
    np.testing.assert_allclose(ev, ev_dense, rtol=1e-9)


def test_poisson_predict_matches_dense_oracle(rng):
    X, z, y, params = _setup(rng, n=22, m=4)
    Xstar = jnp.asarray(rng.standard_normal((5, 2)))
    K = _dense_prior(params, z, X)
    yn = np.asarray(y)
    f_d, a_d = _dense_mode(K, yn)
    w = np.exp(f_d)

    inducing, v, d = _fitc_prior(SeIso, params, z, X, None)
    u_inv_t = np.asarray(jnp.linalg.solve(
        inducing.chol_km.T, SeIso.k_cross(params, Xstar, inducing.z).T))
    vstar = u_inv_t.T
    kxs = vstar @ np.asarray(v).T
    kss = np.asarray(SeIso.k_diag(params, Xstar))
    ws = np.sqrt(w)
    binv = np.linalg.inv(np.eye(len(yn)) + (ws[:, None] * K * ws[None, :]))
    mu_d = kxs @ a_d
    var_d = kss - np.sum((kxs * ws[None, :]) @ binv
                         * (kxs * ws[None, :]), axis=1)
    rate_mean_d = np.exp(mu_d + 0.5 * var_d)

    rate_mean, rate_var, mu, var = poisson_predict(
        SeIso, params, z, X, y, Xstar, newton_iters=40)
    np.testing.assert_allclose(np.asarray(mu), mu_d, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var), var_d, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(rate_mean), rate_mean_d,
                               rtol=1e-7)
    assert bool(jnp.all(rate_var > 0))


def test_poisson_evidence_gradients(rng):
    """AD through the unrolled Newton vs finite differences, including
    the exposure-offset path."""
    X, z, y, params = _setup(rng, n=18, m=4)
    le = jnp.asarray(np.log(rng.uniform(0.5, 2.0, 18)))

    def f(log_ell, log_sf2, z):
        p = SeIso.Params(log_ell=log_ell, log_sf2=log_sf2)
        return poisson_log_evidence(SeIso, p, z, X, y, log_exposure=le,
                                    newton_iters=30)

    g = jax.grad(f, argnums=(0, 1, 2))(params.log_ell, params.log_sf2, z)
    # eps choice: the line search's bisected step s is piecewise constant
    # at ~3e-8 resolution, so an unlucky FD probe can land across a branch
    # flip (measured: eps=1e-6 gave a 3e-4-biased probe on this draw while
    # 1e-5 and 1e-7 both matched AD to ~1e-8)
    eps = 1e-5
    for i, val in enumerate([params.log_ell, params.log_sf2]):
        args = [params.log_ell, params.log_sf2, z]
        args[i] = val + eps
        up = f(*args)
        args[i] = val - eps
        dn = f(*args)
        np.testing.assert_allclose(float(g[i]), float((up - dn) / (2 * eps)),
                                   rtol=5e-5)
    dz = np.zeros(z.shape)
    dz[1, 1] = eps
    fd = float((f(params.log_ell, params.log_sf2, z + dz)
                - f(params.log_ell, params.log_sf2, z - dz)) / (2 * eps))
    np.testing.assert_allclose(float(g[2][1, 1]), fd, rtol=5e-5)


@pytest.mark.slow
def test_poisson_training_recovers_rates(rng):
    """1-D rate field: training raises the evidence and the predicted
    rates track the truth."""
    n = 150
    Xn = np.sort(rng.uniform(-3.0, 3.0, n))[:, None]
    f_true = 1.5 * np.sin(Xn[:, 0])
    y = jnp.asarray(rng.poisson(np.exp(f_true)).astype(np.float64))
    X = jnp.asarray(Xn)

    params = SeIso.Params(log_ell=jnp.asarray(1.5), log_sf2=jnp.asarray(-1.0))
    z0 = X[:: n // 8][:8]
    pack = make_pack(SeIso, params, z0, 1.0, learn_sigma2=False)
    ev0 = float(poisson_log_evidence(SeIso, params, z0, X, y))
    p_f, z_f, st = fit_poisson(SeIso, X, y, pack, max_iter=30,
                               epsabs=1e-4 / n)
    ev1 = float(poisson_log_evidence(SeIso, p_f, z_f, X, y))
    assert ev1 > ev0

    Xt = jnp.asarray(np.linspace(-2.5, 2.5, 9)[:, None])
    rate_mean, _, _, _ = poisson_predict(SeIso, p_f, z_f, X, y, Xt)
    true_rate = np.exp(1.5 * np.sin(np.asarray(Xt)[:, 0]))
    err = np.mean(np.abs(np.log(np.asarray(rate_mean)) - np.log(true_rate)))
    assert err < 0.5, err  # log-rate tracks the truth


@pytest.mark.slow
def test_sharded_poisson_evidence_matches_single(rng):
    """Poisson-Laplace over the 8-device mesh == single-device (value and
    grads), non-divisible n, with exposures."""
    from gpr_tpu.parallel import make_mesh, sharded_poisson_log_evidence
    from gpr_tpu.parallel.sharded import shard_batch

    X, z, y, params = _setup(rng, n=93)
    le = jnp.asarray(np.log(rng.uniform(0.5, 2.0, 93)))
    mesh = make_mesh()
    Xs, ys, mask = shard_batch(mesh, X, y)
    _, les, _ = shard_batch(mesh, X, le)

    single = poisson_log_evidence(SeIso, params, z, X, y, log_exposure=le,
                                  newton_iters=8)
    sharded = sharded_poisson_log_evidence(
        SeIso, mesh, params, z, Xs, ys, mask, log_exposure=les,
        newton_iters=8)
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-10)

    gd = jax.grad(
        lambda p, z: poisson_log_evidence(
            SeIso, p, z, X, y, log_exposure=le, newton_iters=5),
        argnums=(0, 1),
    )(params, z)
    gs = jax.jit(jax.grad(
        lambda p, z: sharded_poisson_log_evidence(
            SeIso, mesh, p, z, Xs, ys, mask, log_exposure=les,
            newton_iters=5),
        argnums=(0, 1),
    ))(params, z)
    # bisection-resolution-bounded parity (see test_classify_stream.py)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-12)
