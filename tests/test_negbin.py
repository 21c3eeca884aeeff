"""Negative-binomial Laplace vs a dense textbook oracle, the Poisson
limit, FD gradients (including the dispersion), and an overdispersion
model-selection check (NB evidence must beat Poisson on NB data)."""

import numpy as np
import pytest
from scipy.special import expit, gammaln

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify import _fitc_prior
from gpr_tpu.models.negbin import (
    fit_negbin,
    negbin_laplace_mode,
    negbin_log_evidence,
    negbin_predict,
)
from gpr_tpu.models.poisson import poisson_log_evidence
from gpr_tpu.optim import make_pack


def _setup(rng, n=26, m=5, d_in=2, r=2.0):
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    z = jnp.asarray(rng.standard_normal((m, d_in)))
    f_true = np.sin(np.asarray(X).sum(axis=1))
    mu = np.exp(f_true)
    # NB draw: gamma-poisson mixture
    lam = rng.gamma(r, mu / r)
    y = jnp.asarray(rng.poisson(lam).astype(np.float64))
    params = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.2))
    return X, z, y, params


def _dense_prior(params, z, X):
    _, v, d = _fitc_prior(SeIso, params, z, X, None)
    return np.asarray(v @ v.T + jnp.diag(d))


def _loglik(f, y, r):
    return np.sum(gammaln(y + r) - gammaln(r) - gammaln(y + 1.0)
                  + r * np.log(r) + y * f
                  - (y + r) * np.logaddexp(np.log(r), f))


def _dense_mode(K, y, r, iters=300):
    n = len(y)
    kinv = np.linalg.inv(K)
    f = np.zeros(n)
    for _ in range(iters):
        p = expit(f - np.log(r))
        grad = y - (y + r) * p
        w = (y + r) * p * (1.0 - p)
        b = w * f + grad
        f_new = np.linalg.solve(kinv + np.diag(w), b)
        step = f_new - f
        t = 1.0
        while t > 1e-6:
            cand = f + t * step
            if (-0.5 * cand @ (kinv @ cand) + _loglik(cand, y, r)
                    >= -0.5 * f @ (kinv @ f) + _loglik(f, y, r)):
                break
            t *= 0.5
        f = f + t * step
    return f, kinv @ f


def test_negbin_evidence_matches_dense_oracle(rng):
    r = 2.0
    X, z, y, params = _setup(rng, r=r)
    K = _dense_prior(params, z, X)
    yn = np.asarray(y)
    f_d, a_d = _dense_mode(K, yn, r)

    f_hat, a, *_ = negbin_laplace_mode(SeIso, params, z, X, y,
                                       jnp.asarray(r), newton_iters=40)
    p = expit(np.asarray(f_hat) - np.log(r))
    resid = (yn - (yn + r) * p
             - np.linalg.inv(K) @ np.asarray(f_hat))
    assert np.linalg.norm(resid) < 1e-8

    p_d = expit(f_d - np.log(r))
    w = (yn + r) * p_d * (1.0 - p_d)
    sign, logdet = np.linalg.slogdet(np.eye(len(yn)) + K * w[None, :])
    assert sign > 0
    ev_dense = (-0.5 * float(a_d @ f_d) + _loglik(f_d, yn, r)
                - 0.5 * logdet)
    ev = float(negbin_log_evidence(SeIso, params, z, X, y, jnp.asarray(r),
                                   newton_iters=40))
    np.testing.assert_allclose(ev, ev_dense, rtol=1e-9)


def test_negbin_poisson_limit(rng):
    """r -> infinity recovers the Poisson evidence (same mode, same
    likelihood limit)."""
    X, z, y, params = _setup(rng, n=20, m=4)
    ev_p = float(poisson_log_evidence(SeIso, params, z, X, y,
                                      newton_iters=30))
    ev_nb = float(negbin_log_evidence(SeIso, params, z, X, y,
                                      jnp.asarray(1e7), newton_iters=30))
    np.testing.assert_allclose(ev_nb, ev_p, rtol=1e-5)


def test_negbin_evidence_gradients(rng):
    """FD vs AD through the unrolled Newton, including d/d log_r."""
    X, z, y, params = _setup(rng, n=16, m=4)

    def f(log_ell, log_r, z):
        p = SeIso.Params(log_ell=log_ell, log_sf2=params.log_sf2)
        return negbin_log_evidence(SeIso, p, z, X, y, jnp.exp(log_r),
                                   newton_iters=30)

    log_r0 = jnp.asarray(0.7)
    g = jax.grad(f, argnums=(0, 1, 2))(params.log_ell, log_r0, z)
    eps = 1e-5  # FD probes can cross line-search bisection branches at
    # finer eps (see tests/test_poisson.py's measured note)
    for i, val in enumerate([params.log_ell, log_r0]):
        args = [params.log_ell, log_r0, z]
        args[i] = val + eps
        up = f(*args)
        args[i] = val - eps
        dn = f(*args)
        np.testing.assert_allclose(float(g[i]), float((up - dn) / (2 * eps)),
                                   rtol=5e-5)
    dz = np.zeros(z.shape)
    dz[0, 1] = eps
    fd = float((f(params.log_ell, log_r0, z + dz)
                - f(params.log_ell, log_r0, z - dz)) / (2 * eps))
    np.testing.assert_allclose(float(g[2][0, 1]), fd, rtol=5e-5)


@pytest.mark.slow
def test_negbin_beats_poisson_on_overdispersed_counts(rng):
    """Model selection: on strongly overdispersed counts the trained NB
    evidence exceeds the Poisson evidence at the same hypers, the learned
    dispersion is finite, and predictions carry the extra variance."""
    n, r_true = 200, 1.5
    Xn = np.sort(rng.uniform(-3.0, 3.0, n))[:, None]
    f_true = 1.2 * np.sin(Xn[:, 0])
    mu = np.exp(f_true)
    y = jnp.asarray(rng.poisson(rng.gamma(r_true, mu / r_true)).astype(float))
    X = jnp.asarray(Xn)

    params = SeIso.Params(log_ell=jnp.asarray(0.5), log_sf2=jnp.asarray(0.0))
    z0 = X[:: n // 8][:8]
    pack = make_pack(SeIso, params, z0, 5.0)  # sigma2 slot = initial r
    p_f, z_f, r_f, st = fit_negbin(SeIso, X, y, pack, max_iter=40,
                                   epsabs=1e-4 / n)
    r_f = float(r_f)
    assert 0.3 < r_f < 30.0, r_f  # learned a finite dispersion

    ev_nb = float(negbin_log_evidence(SeIso, p_f, z_f, X, y,
                                      jnp.asarray(r_f)))
    ev_poisson = float(poisson_log_evidence(SeIso, p_f, z_f, X, y))
    assert ev_nb > ev_poisson + 3.0, (ev_nb, ev_poisson)

    cm, cv, mu_l, var_l = negbin_predict(SeIso, p_f, z_f, X, y,
                                         jnp.asarray(r_f), X[:5])
    assert bool(jnp.all(cv > cm))  # overdispersed: Var > mean


@pytest.mark.slow
def test_sharded_negbin_evidence_matches_single(rng):
    """NB2-Laplace over the 8-device mesh == single-device (value and
    grads, including d/dr), non-divisible n, with exposures."""
    from gpr_tpu.parallel import make_mesh, sharded_negbin_log_evidence
    from gpr_tpu.parallel.sharded import shard_batch

    X, z, y, params = _setup(rng, n=93)
    r = jnp.asarray(1.7)
    le = jnp.asarray(np.log(rng.uniform(0.5, 2.0, 93)))
    mesh = make_mesh()
    Xs, ys, mask = shard_batch(mesh, X, y)
    _, les, _ = shard_batch(mesh, X, le)

    single = negbin_log_evidence(SeIso, params, z, X, y, r,
                                 log_exposure=le, newton_iters=8)
    sharded = sharded_negbin_log_evidence(
        SeIso, mesh, params, z, Xs, ys, r, mask, log_exposure=les,
        newton_iters=8)
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-10)

    gd = jax.grad(
        lambda p, z, r: negbin_log_evidence(
            SeIso, p, z, X, y, r, log_exposure=le, newton_iters=5),
        argnums=(0, 1, 2),
    )(params, z, r)
    gs = jax.jit(jax.grad(
        lambda p, z, r: sharded_negbin_log_evidence(
            SeIso, mesh, p, z, Xs, ys, r, mask, log_exposure=les,
            newton_iters=5),
        argnums=(0, 1, 2),
    ))(params, z, r)
    # bisection-resolution-bounded parity (see test_classify_stream.py)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-12)


def test_streaming_negbin_matches_materialized(rng):
    """block_size= streams the NB2 evidence through the generic Laplace
    core: == materialized at any block partition (value and grads,
    including d/dr)."""
    X, z, y, params = _setup(rng, n=41)
    r = jnp.asarray(1.7)
    le = jnp.asarray(np.log(rng.uniform(0.5, 2.0, 41)))

    dense = negbin_log_evidence(SeIso, params, z, X, y, r,
                                log_exposure=le, newton_iters=8)
    for bs in (7, 16, 41):
        stream = negbin_log_evidence(SeIso, params, z, X, y, r,
                                     log_exposure=le, newton_iters=8,
                                     block_size=bs)
        np.testing.assert_allclose(float(stream), float(dense), rtol=1e-9)

    gd = jax.grad(
        lambda p, z, r: negbin_log_evidence(
            SeIso, p, z, X, y, r, log_exposure=le, newton_iters=5),
        argnums=(0, 1, 2),
    )(params, z, r)
    gs = jax.grad(
        lambda p, z, r: negbin_log_evidence(
            SeIso, p, z, X, y, r, log_exposure=le, newton_iters=5,
            block_size=16),
        argnums=(0, 1, 2),
    )(params, z, r)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-12)
