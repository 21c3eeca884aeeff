"""Negative-binomial (overdispersed count) GP regression: Laplace-FITC.

Real count data is usually overdispersed (variance > mean); the Poisson
family (models/poisson.py) cannot express that.  This module fits the
NB2 model with a log link and a LEARNABLE dispersion:

  y_i ~ NegBin(mean mu_i = E_i exp(f_i), dispersion r),
  Var[y_i | f_i] = mu_i + mu_i^2 / r,      f ~ GP(0, K_FITC),

where r = exp(log_r) is optimized alongside every other hyper by
evidence ascent (r -> infinity recovers Poisson exactly — tested).  The
log likelihood in f,

  l_i = ln G(y+r) - ln G(r) - ln G(y+1) + r log r + y eta
        - (y + r) log(r + e^eta),          eta = f + log E,

is strictly concave with bounded curvature

  dl/df = y - (y + r) p,   W = -d2l/df2 = (y + r) p (1 - p) <= (y+r)/4,
  p = sigmoid(eta - log r),

so the classifier's stabilized Newton applies unchanged (m-space
Woodbury + iterative refinement + exact concave line maximum; design
notes in models/classify.py).  The bounded W actually makes this the
best-conditioned member of the Laplace family.

Hyper-vector convention: ``fit_negbin`` reuses ``optim.make_pack`` with
the pack's positive "sigma2" coordinate carrying the DISPERSION r (both
are log-parameterized positives — build the pack with the initial r in
the sigma2 slot).  Predictions combine the lognormal latent with the
NB conditional by the law of total variance:

  E[y*]  = E* m1,   Var[y*] = E* m1 + E*^2 ((1 + 1/r) m2 - m1^2),
  m1 = exp(mu + s2/2),  m2 = exp(2 mu + 2 s2).

Validated against a dense textbook Laplace oracle, finite differences
(including d/d log_r), and the Poisson limit (tests/test_negbin.py).
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

_ETA_CLAMP = 30.0


def _nb_parts(f, y, r, log_exposure, mask):
    """(dl/df, W) of the NB2 log likelihood, elementwise; masked rows 0."""
    eta = f + log_exposure
    p = jax.nn.sigmoid(eta - jnp.log(r))
    grad = mask * (y - (y + r) * p)
    w = mask * (y + r) * p * (1.0 - p)
    return grad, w


def nb_parts(f, lik, mask):
    """ift.py parts convention, lik = (y, r, log_exposure) — ``r`` is an
    inexact leaf, so the IFT backward gives the dispersion its implicit
    gradient automatically."""
    y, r, le = lik
    return _nb_parts(f, y, r, le, mask)


def nb_loglik(f, lik):
    y, r, le = lik
    return _nb_loglik(f, y, r, le)


def negbin_newton_scan(
    v, d, y, r, log_exposure, mask, *, newton_iters: int = 20,
    allsum=lambda x: x,
):
    """Newton mode-finding for the NB2-Laplace over local rows — the NB2
    instance of ift.newton_scan_generic.  Returns (f_hat, a)."""
    from .ift import newton_scan_generic

    return newton_scan_generic(
        nb_parts, v, d, (y, r, log_exposure), mask,
        newton_iters=newton_iters, allsum=allsum,
    )


def _nb_loglik(f, y, r, log_exposure):
    eta = f + log_exposure
    return (
        jax.scipy.special.gammaln(y + r)
        - jax.scipy.special.gammaln(r)
        - jax.scipy.special.gammaln(y + 1.0)
        + r * jnp.log(r)
        + y * eta
        - (y + r) * jnp.logaddexp(jnp.log(r), jnp.clip(eta, -_ETA_CLAMP,
                                                       _ETA_CLAMP))
    )


def negbin_laplace_mode(
    family, params, z, X, y, r, *, log_exposure=None,
    newton_iters: int = 20, jitter: float | None = None,
):
    """Returns (f_hat, a, inducing, v, d); ``r`` scalar dispersion > 0."""
    inducing, v, d = _fitc_prior(family, params, z, X, jitter)
    le = (jnp.zeros_like(y) if log_exposure is None
          else jnp.asarray(log_exposure))
    f_hat, a = negbin_newton_scan(
        v, d, y, r, le, jnp.ones_like(y), newton_iters=newton_iters,
    )
    return f_hat, a, inducing, v, d


def negbin_log_evidence(
    family, params, z, X, y, r, *, log_exposure=None,
    newton_iters: int = 20, jitter: float | None = None,
    block_size: int | None = None, grad_impl: str = "ift",
):
    """Laplace marginal likelihood, differentiable w.r.t. (params, z, r)
    — implicit (IFT) gradients by default, the dispersion included
    (models/ift.py).  ``block_size`` streams the whole computation
    through the generic Laplace core (models/classify_stream.py) — Knm
    never materializes, so n is unbounded; the traced dispersion ``r``
    rides through the parts/loglik hooks like the ordinal cutpoints do."""
    le = (jnp.zeros_like(y) if log_exposure is None
          else jnp.asarray(log_exposure))
    if block_size is not None:
        from .classify_stream import stream_laplace_log_evidence

        return stream_laplace_log_evidence(
            family, params, z, X, (y, jnp.asarray(r, y.dtype), le),
            parts=nb_parts, loglik=nb_loglik,
            lik_is_row=(True, False, True),
            block_size=block_size, newton_iters=newton_iters,
            jitter=jitter,
        )
    from .ift import laplace_evidence_core

    _, v, d = _fitc_prior(family, params, z, X, jitter)
    r = jnp.asarray(r, v.dtype)
    return laplace_evidence_core(
        nb_parts, nb_loglik, v, d, (y, r, le), jnp.ones_like(y),
        newton_iters=newton_iters, grad_impl=grad_impl,
    )


def negbin_predict(
    family, params, z, X, y, r, Xstar, *, log_exposure=None,
    newton_iters: int = 20, jitter: float | None = None,
):
    """(count_mean, count_var, latent_mean, latent_var) at Xstar per unit
    exposure (scale count_mean by E*, count_var by the docstring's law of
    total variance with E*)."""
    le = (jnp.zeros_like(y) if log_exposure is None
          else jnp.asarray(log_exposure))
    f_hat, a, inducing, v, d = negbin_laplace_mode(
        family, params, z, X, y, r, log_exposure=le,
        newton_iters=newton_iters, jitter=jitter,
    )
    _, w = _nb_parts(f_hat, y, r, le, jnp.ones_like(y))
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
    m1 = jnp.exp(mu + 0.5 * var)
    m2 = jnp.exp(2.0 * mu + 2.0 * var)
    count_var = m1 + (1.0 + 1.0 / r) * m2 - m1 * m1
    return m1, count_var, mu, var


def fit_negbin(
    family, X, y, pack, *, log_exposure=None, newton_iters: int = 20,
    jitter: float | None = None, normalize: bool = True,
    block_size: int | None = None, **fit_kwargs,
):
    """Hyper + inducing + DISPERSION training on the NB2-Laplace evidence.

    Build ``pack`` with ``make_pack(family, p0, z0, r0)`` — the pack's
    positive sigma2 coordinate carries the dispersion r here (same
    log-parameterization).  ``block_size`` streams the objective
    (unbounded n).  Returns (params, z, r, state)."""
    if not pack.learn_sigma2:
        raise ValueError(
            "fit_negbin learns the dispersion through the pack's sigma2 "
            "slot: build the pack with make_pack(family, p0, z0, r0) "
            "(learn_sigma2 left True)"
        )
    from ..optim.lbfgs_device import fit_packed_objective

    scale = 1.0 / X.shape[0] if normalize else 1.0

    def fg(x, X, y):
        def f(x):
            params, z, r = pack.unpack(x)
            return -scale * negbin_log_evidence(
                family, params, z, X, y, r, log_exposure=log_exposure,
                newton_iters=newton_iters, jitter=jitter,
                block_size=block_size,
            )

        return jax.value_and_grad(f)(x)

    st = fit_packed_objective(fg, pack, (X, y), **fit_kwargs)
    params, z, r = pack.unpack(st.x)
    return params, z, r, st
