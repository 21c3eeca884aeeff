"""Binomial GP regression: y successes of N trials, Laplace-FITC.

Completes the likelihood matrix next to Bernoulli (models/classify.py),
softmax (classify_multi), Poisson (poisson), and negative binomial
(negbin): per-row trial counts N_i with a logit link,

  y_i ~ Binomial(N_i, sigmoid(f_i)),     f ~ GP(0, K_FITC),

whose log likelihood is strictly concave with bounded curvature

  l_i = ln C(N_i, y_i) + y_i f_i - N_i softplus(f_i),
  dl/df = y - N sigmoid(f),   W = N sigmoid(f)(1 - sigmoid(f)) <= N/4,

so the family's stabilized Newton applies unchanged (design notes in
models/classify.py).  At N_i = 1 this IS the binary classifier —
``binomial_log_evidence`` equals ``classify_log_evidence`` exactly
(tested), which doubles as a second implementation cross-check for
both.  Typical uses: conversion/claim rates with varying denominators,
spatially smoothed proportions.

Validated against a dense textbook Laplace oracle, the Bernoulli limit,
and finite differences (tests/test_binomial.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..numerics.linalg import (
    cholesky_upper,
    inv_tri_upper,
    log_det_tri,
    matmul,
    rows_sqr_norm,
    solve_tri,
    solve_tri_right,
)
from .classify import _fitc_prior


def _bin_parts(f, y, trials, mask):
    """(dl/df, W) of the binomial log likelihood, elementwise."""
    p = jax.nn.sigmoid(f)
    grad = mask * (y - trials * p)
    w = mask * trials * p * (1.0 - p)
    return grad, w


def binomial_newton_scan(
    v, d, y, trials, mask, *, newton_iters: int = 15,
    allsum=lambda x: x,
):
    """Newton mode-finding for the binomial Laplace over local rows.
    Returns (f_hat, a)."""

    def kdot(x):
        return matmul(v, allsum(matmul(v.T, x))) + d * x

    def step(carry, _):
        f, a = carry
        grad, w = _bin_parts(f, y, trials, mask)
        w = jnp.maximum(w, 1e-12) * mask
        b = w * f + grad
        kb = kdot(b)
        sw = mask * jnp.sqrt(jnp.where(w > 0.0, w, 1.0))
        c = sw * kb
        e = 1.0 / (1.0 + w * d)
        vw = v * (sw * jnp.sqrt(e))[:, None]
        mm = jnp.eye(v.shape[1], dtype=v.dtype) + allsum(matmul(vw.T, vw))
        rm = cholesky_upper(mm, jitter=0.0)

        def binv(x):
            t = solve_tri(rm, allsum(matmul(vw.T, jnp.sqrt(e) * x)),
                          trans=True)
            return e * x - jnp.sqrt(e) * matmul(vw, solve_tri(rm, t))

        atil = binv(c)
        a_n = b - sw * atil
        f_n = kdot(a_n)
        atil = atil + binv(sw * f_n - atil)  # one refinement (free residual)
        a_n = b - sw * atil
        f_n = kdot(a_n)

        aff = allsum(jnp.sum(a * f))
        afn = allsum(jnp.sum(a * f_n))
        ann = allsum(jnp.sum(a_n * f_n))
        df = f_n - f

        def dpsi(s):
            g_s, _ = _bin_parts(f + s * df, y, trials, mask)
            quad_p = (-2.0 * (1.0 - s) * aff + (2.0 - 4.0 * s) * afn
                      + 2.0 * s * ann)
            return -0.5 * quad_p + allsum(jnp.sum(g_s * df))

        def bis(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            pos = dpsi(mid) > 0
            return jnp.where(pos, mid, lo), jnp.where(pos, hi, mid)

        one = jnp.ones((), f.dtype)
        lo, _ = jax.lax.fori_loop(0, 25, bis,
                                  (jnp.zeros((), f.dtype), one))
        s = jnp.where(dpsi(one) >= 0, one, lo)
        a = (1.0 - s) * a + s * a_n
        f = (1.0 - s) * f + s * f_n
        return (f, a), None

    f0 = jnp.zeros_like(y)
    (f_hat, a), _ = jax.lax.scan(
        jax.checkpoint(step), (f0, jnp.zeros_like(y)), None,
        length=newton_iters,
    )
    return f_hat, a


def _bin_loglik(f, y, trials):
    return (
        jax.scipy.special.gammaln(trials + 1.0)
        - jax.scipy.special.gammaln(y + 1.0)
        - jax.scipy.special.gammaln(trials - y + 1.0)
        + y * f
        - trials * jnp.logaddexp(0.0, f)
    )


def binomial_laplace_mode(
    family, params, z, X, y, trials, *, newton_iters: int = 15,
    jitter: float | None = None,
):
    """Returns (f_hat, a, inducing, v, d); ``y`` successes of ``trials``
    (both (n,) floats, 0 <= y <= trials)."""
    inducing, v, d = _fitc_prior(family, params, z, X, jitter)
    f_hat, a = binomial_newton_scan(
        v, d, y, trials, jnp.ones_like(y), newton_iters=newton_iters,
    )
    return f_hat, a, inducing, v, d


def binomial_log_evidence(
    family, params, z, X, y, trials, *, newton_iters: int = 15,
    jitter: float | None = None, block_size: int | None = None,
):
    """Laplace marginal likelihood, differentiable w.r.t. (params, z)
    through the unrolled Newton mode.  At trials == 1 this equals
    classify_log_evidence(..., y in {-1,+1}) up to the (absent there)
    binomial coefficient — which is 0 for N = 1.  ``block_size`` streams
    through the generic Laplace core (unbounded n)."""
    if block_size is not None:
        from .classify_stream import stream_laplace_log_evidence

        return stream_laplace_log_evidence(
            family, params, z, X, (y, trials),
            parts=lambda f, lik, mb: _bin_parts(f, lik[0], lik[1], mb),
            loglik=lambda f, lik: _bin_loglik(f, lik[0], lik[1]),
            block_size=block_size, newton_iters=newton_iters,
            jitter=jitter,
        )
    f_hat, a, inducing, v, d = binomial_laplace_mode(
        family, params, z, X, y, trials, newton_iters=newton_iters,
        jitter=jitter,
    )
    _, w = _bin_parts(f_hat, y, trials, jnp.ones_like(y))
    w = jnp.maximum(w, 1e-12)
    e = 1.0 / (1.0 + w * d)
    vw = v * jnp.sqrt(w * e)[:, None]
    mm = jnp.eye(v.shape[1], dtype=v.dtype) + matmul(vw.T, vw)
    rm = cholesky_upper(mm, jitter=0.0)
    log_det_b = jnp.sum(jnp.log1p(w * d)) + log_det_tri(rm)
    log_lik = jnp.sum(_bin_loglik(f_hat, y, trials))
    return -0.5 * jnp.dot(a, f_hat) + log_lik - 0.5 * log_det_b


def binomial_predict(
    family, params, z, X, y, trials, Xstar, *, newton_iters: int = 15,
    jitter: float | None = None,
):
    """(prob, latent_mean, latent_var) at Xstar — success probability via
    MacKay's probit approximation on the latent moments (multiply by N*
    for expected successes)."""
    f_hat, a, inducing, v, d = binomial_laplace_mode(
        family, params, z, X, y, trials, newton_iters=newton_iters,
        jitter=jitter,
    )
    _, w = _bin_parts(f_hat, y, trials, jnp.ones_like(y))
    w = jnp.maximum(w, 1e-12)
    d2inv = w / (1.0 + w * d)
    vs = v * jnp.sqrt(d2inv)[:, None]
    rn = cholesky_upper(
        jnp.eye(v.shape[1], dtype=v.dtype) + matmul(vs.T, vs), jitter=0.0
    )
    u_inv = inv_tri_upper(inducing.chol_km)
    kstar = family.k_cross(params, Xstar, inducing.z)
    vstar = matmul(kstar, u_inv)
    mu = matmul(vstar, matmul(v.T, a))
    quad = rows_sqr_norm(vstar) - rows_sqr_norm(solve_tri_right(vstar, rn))
    var = jnp.maximum(family.k_diag(params, Xstar) - quad, 1e-10)
    prob = jax.nn.sigmoid(mu / jnp.sqrt(1.0 + jnp.pi * var / 8.0))
    return prob, mu, var


def fit_binomial(
    family, X, y, trials, pack, *, newton_iters: int = 15,
    jitter: float | None = None, normalize: bool = True,
    block_size: int | None = None, **fit_kwargs,
):
    """Hyper + inducing training on the binomial-Laplace evidence
    (optim.fit_packed_objective conventions; pack must carry
    learn_sigma2=False).  ``block_size`` streams the objective
    (unbounded n).  Returns (params, z, state)."""
    if pack.learn_sigma2:
        raise ValueError(
            "the binomial likelihood has no sigma2: build the pack with "
            "make_pack(..., learn_sigma2=False)"
        )
    from ..optim.lbfgs_device import fit_packed_objective

    scale = 1.0 / X.shape[0] if normalize else 1.0

    def fg(x, X, y, trials):
        def f(x):
            params, z, _ = pack.unpack(x)
            return -scale * binomial_log_evidence(
                family, params, z, X, y, trials,
                newton_iters=newton_iters, jitter=jitter,
                block_size=block_size,
            )

        return jax.value_and_grad(f)(x)

    st = fit_packed_objective(fg, pack, (X, y, trials), **fit_kwargs)
    params, z, _ = pack.unpack(st.x)
    return params, z, st
