"""Binomial Laplace vs a dense oracle, the Bernoulli identity, FD
gradients, and a proportion-recovery training check."""

import numpy as np
import pytest
from scipy.special import expit, gammaln

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.binomial import (
    binomial_laplace_mode,
    binomial_log_evidence,
    binomial_predict,
    fit_binomial,
)
from gpr_tpu.models.classify import _fitc_prior, classify_log_evidence
from gpr_tpu.optim import make_pack


def _setup(rng, n=26, m=5, d_in=2):
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    z = jnp.asarray(rng.standard_normal((m, d_in)))
    trials = jnp.asarray(rng.integers(1, 30, n).astype(np.float64))
    p_true = expit(np.sin(np.asarray(X).sum(axis=1)))
    y = jnp.asarray(rng.binomial(np.asarray(trials).astype(int),
                                 p_true).astype(np.float64))
    params = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.2))
    return X, z, y, trials, params


def _dense_prior(params, z, X):
    _, v, d = _fitc_prior(SeIso, params, z, X, None)
    return np.asarray(v @ v.T + jnp.diag(d))


def _loglik(f, y, trials):
    return np.sum(gammaln(trials + 1) - gammaln(y + 1)
                  - gammaln(trials - y + 1)
                  + y * f - trials * np.logaddexp(0.0, f))


def _dense_mode(K, y, trials, iters=200):
    n = len(y)
    kinv = np.linalg.inv(K)
    f = np.zeros(n)
    for _ in range(iters):
        p = expit(f)
        w = trials * p * (1.0 - p)
        b = w * f + (y - trials * p)
        f_new = np.linalg.solve(kinv + np.diag(w), b)
        step = f_new - f
        t = 1.0
        while t > 1e-6:
            cand = f + t * step
            if (-0.5 * cand @ (kinv @ cand) + _loglik(cand, y, trials)
                    >= -0.5 * f @ (kinv @ f) + _loglik(f, y, trials)):
                break
            t *= 0.5
        f = f + t * step
    return f, kinv @ f


def test_binomial_evidence_matches_dense_oracle(rng):
    X, z, y, trials, params = _setup(rng)
    K = _dense_prior(params, z, X)
    yn, tn = np.asarray(y), np.asarray(trials)
    f_d, a_d = _dense_mode(K, yn, tn)

    f_hat, a, *_ = binomial_laplace_mode(SeIso, params, z, X, y, trials,
                                         newton_iters=30)
    resid = (yn - tn * expit(np.asarray(f_hat))
             - np.linalg.inv(K) @ np.asarray(f_hat))
    assert np.linalg.norm(resid) < 1e-8

    p_d = expit(f_d)
    w = tn * p_d * (1.0 - p_d)
    sign, logdet = np.linalg.slogdet(np.eye(len(yn)) + K * w[None, :])
    assert sign > 0
    ev_dense = (-0.5 * float(a_d @ f_d) + _loglik(f_d, yn, tn)
                - 0.5 * logdet)
    ev = float(binomial_log_evidence(SeIso, params, z, X, y, trials,
                                     newton_iters=30))
    np.testing.assert_allclose(ev, ev_dense, rtol=1e-9)


def test_binomial_bernoulli_identity(rng):
    """trials == 1 IS the binary classifier: identical evidence (the
    binomial coefficient is zero at N = 1) — a second implementation
    cross-check for both modules."""
    X, z, _, _, params = _setup(rng, n=24, m=4)
    y01 = jnp.asarray(rng.integers(0, 2, 24).astype(np.float64))
    ones = jnp.ones_like(y01)
    ev_bin = float(binomial_log_evidence(SeIso, params, z, X, y01, ones,
                                         newton_iters=25))
    ev_cls = float(classify_log_evidence(SeIso, params, z, X,
                                         2.0 * y01 - 1.0, newton_iters=25))
    np.testing.assert_allclose(ev_bin, ev_cls, rtol=1e-10)


def test_binomial_evidence_gradients(rng):
    X, z, y, trials, params = _setup(rng, n=16, m=4)

    def f(log_ell, log_sf2, z):
        p = SeIso.Params(log_ell=log_ell, log_sf2=log_sf2)
        return binomial_log_evidence(SeIso, p, z, X, y, trials,
                                     newton_iters=25)

    g = jax.grad(f, argnums=(0, 1, 2))(params.log_ell, params.log_sf2, z)
    eps = 1e-5  # see tests/test_poisson.py's bisection-branch FD note
    for i, val in enumerate([params.log_ell, params.log_sf2]):
        args = [params.log_ell, params.log_sf2, z]
        args[i] = val + eps
        up = f(*args)
        args[i] = val - eps
        dn = f(*args)
        np.testing.assert_allclose(float(g[i]), float((up - dn) / (2 * eps)),
                                   rtol=5e-5)
    dz = np.zeros(z.shape)
    dz[2, 0] = eps
    fd = float((f(params.log_ell, params.log_sf2, z + dz)
                - f(params.log_ell, params.log_sf2, z - dz)) / (2 * eps))
    np.testing.assert_allclose(float(g[2][2, 0]), fd, rtol=5e-5)


def test_binomial_training_recovers_proportions(rng):
    """1-D proportion field with varying denominators: training raises
    the evidence and predicted probabilities track the truth."""
    n = 160
    Xn = np.sort(rng.uniform(-3.0, 3.0, n))[:, None]
    p_true = expit(2.0 * np.sin(Xn[:, 0]))
    trials = rng.integers(5, 40, n).astype(float)
    y = jnp.asarray(rng.binomial(trials.astype(int), p_true).astype(float))
    X, tr = jnp.asarray(Xn), jnp.asarray(trials)

    params = SeIso.Params(log_ell=jnp.asarray(1.0), log_sf2=jnp.asarray(0.0))
    z0 = X[:: n // 8][:8]
    pack = make_pack(SeIso, params, z0, 1.0, learn_sigma2=False)
    ev0 = float(binomial_log_evidence(SeIso, params, z0, X, y, tr))
    p_f, z_f, st = fit_binomial(SeIso, X, y, tr, pack, max_iter=25,
                                epsabs=1e-4 / n)
    ev1 = float(binomial_log_evidence(SeIso, p_f, z_f, X, y, tr))
    assert ev1 > ev0

    Xt = jnp.asarray(np.linspace(-2.5, 2.5, 9)[:, None])
    prob, _, _ = binomial_predict(SeIso, p_f, z_f, X, y, tr, Xt)
    truth = expit(2.0 * np.sin(np.asarray(Xt)[:, 0]))
    assert np.mean(np.abs(np.asarray(prob) - truth)) < 0.12


@pytest.mark.slow
def test_sharded_binomial_evidence_matches_single(rng):
    """Binomial-Laplace over the 8-device mesh == single-device (value and
    grads), non-divisible n."""
    from gpr_tpu.parallel import make_mesh, sharded_binomial_log_evidence
    from gpr_tpu.parallel.sharded import shard_batch

    X, z, y, trials, params = _setup(rng, n=93)
    mesh = make_mesh()
    Xs, ys, mask = shard_batch(mesh, X, y)
    _, ts, _ = shard_batch(mesh, X, trials)

    single = binomial_log_evidence(SeIso, params, z, X, y, trials,
                                   newton_iters=8)
    sharded = sharded_binomial_log_evidence(
        SeIso, mesh, params, z, Xs, ys, ts, mask, newton_iters=8)
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-10)

    gd = jax.grad(
        lambda p, z: binomial_log_evidence(
            SeIso, p, z, X, y, trials, newton_iters=5),
        argnums=(0, 1),
    )(params, z)
    gs = jax.jit(jax.grad(
        lambda p, z: sharded_binomial_log_evidence(
            SeIso, mesh, p, z, Xs, ys, ts, mask, newton_iters=5),
        argnums=(0, 1),
    ))(params, z)
    # bisection-resolution-bounded parity (see test_classify_stream.py)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-12)
