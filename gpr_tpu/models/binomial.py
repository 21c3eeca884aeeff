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


def bin_parts(f, lik, mask):
    """ift.py parts convention, lik = (y, trials)."""
    y, trials = lik
    return _bin_parts(f, y, trials, mask)


def bin_loglik(f, lik):
    y, trials = lik
    return _bin_loglik(f, y, trials)


def binomial_newton_scan(
    v, d, y, trials, mask, *, newton_iters: int = 15,
    allsum=lambda x: x,
):
    """Newton mode-finding for the binomial Laplace over local rows —
    the binomial instance of ift.newton_scan_generic.  Returns
    (f_hat, a)."""
    from .ift import newton_scan_generic

    return newton_scan_generic(
        bin_parts, v, d, (y, trials), mask, newton_iters=newton_iters,
        allsum=allsum,
    )


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
    grad_impl: str = "ift",
):
    """Laplace marginal likelihood, differentiable w.r.t. (params, z) —
    implicit (IFT) gradients by default (models/ift.py).  At trials == 1
    this equals classify_log_evidence(..., y in {-1,+1}) up to the
    (absent there) binomial coefficient — which is 0 for N = 1.
    ``block_size`` streams through the generic Laplace core
    (unbounded n)."""
    if block_size is not None:
        from .classify_stream import stream_laplace_log_evidence

        return stream_laplace_log_evidence(
            family, params, z, X, (y, trials),
            parts=bin_parts, loglik=bin_loglik,
            block_size=block_size, newton_iters=newton_iters,
            jitter=jitter,
        )
    from .ift import laplace_evidence_core

    _, v, d = _fitc_prior(family, params, z, X, jitter)
    return laplace_evidence_core(
        bin_parts, bin_loglik, v, d, (y, trials), jnp.ones_like(y),
        newton_iters=newton_iters, grad_impl=grad_impl,
    )


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
