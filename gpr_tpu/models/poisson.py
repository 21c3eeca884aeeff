"""Poisson (count) GP regression: Laplace over the FITC prior.

The reference handles Gaussian observations only (its likelihood is baked
into the evidence algebra, lib/fitc_gp.ml:151-229); count data is one of
the most common non-Gaussian GP uses (log-Gaussian Cox processes, rate
smoothing).  This module fits

  y_i ~ Poisson(E_i exp(f_i)),   f ~ GP(0, K_FITC)

by the Laplace approximation, structurally the same stabilized Newton as
the binary classifier (models/classify.py — shared design notes there):
the Poisson log likelihood is strictly concave in f, W = diag(E e^f) is
the (positive) Hessian, and every n x n object collapses through
K = V V' + diag(d) into one m x m Cholesky per step plus (n, m) GEMMs.
``log_exposure`` carries the standard offset term (log E_i — counting
windows / areas); the latent f is the log rate per unit exposure.

Differences from the classifier worth knowing:

* W is UNBOUNDED above (e^f grows with the data's counts), so the
  iteration clamps the latent at |f| <= 30 inside exp() only — enough
  for rates spanning 1e-13..1e13 while keeping f32 finite.
* Predictions have closed forms under the log link: with latent
  moments (mu*, s2*), the rate is lognormal —
  E[rate] = exp(mu* + s2*/2), Var[rate] = (e^{s2*} - 1) e^{2 mu* + s2*};
  predictive count mean adds nothing (E[y*] = E * E[rate]) and
  Var[y*] = E E[rate] + E^2 Var[rate].

Validated against a dense textbook Laplace oracle and finite differences
(tests/test_poisson.py).
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

_F_CLAMP = 30.0


def _rate_w(f, log_exposure, mask):
    """W = E exp(f), clamped in the exponent; masked rows contribute 0."""
    return mask * jnp.exp(
        jnp.clip(f + log_exposure, -_F_CLAMP, _F_CLAMP)
    )


def pois_parts(f, lik, mask):
    """(dl/df, W) of the Poisson log likelihood — the ift.py parts
    convention, lik = (y, log_exposure)."""
    y, le = lik
    rate = _rate_w(f, le, mask)
    return mask * (y - rate), rate


def pois_loglik(f, lik):
    y, le = lik
    return _pois_loglik(f, y, le)


def poisson_newton_scan(
    v, d, y, log_exposure, mask, *, newton_iters: int = 20,
    allsum=lambda x: x,
):
    """Newton mode-finding for the Poisson-Laplace over local rows — the
    Poisson instance of ift.newton_scan_generic (shared stabilized
    scaffold).  Returns (f_hat, a)."""
    from .ift import newton_scan_generic

    return newton_scan_generic(
        pois_parts, v, d, (y, log_exposure), mask,
        newton_iters=newton_iters, allsum=allsum,
    )


def poisson_laplace_mode(
    family, params, z, X, y, *, log_exposure=None, newton_iters: int = 20,
    jitter: float | None = None,
):
    """Returns (f_hat, a, inducing, v, d) with f_hat = K a the latent
    log-rate mode.  ``y``: nonnegative counts (float)."""
    inducing, v, d = _fitc_prior(family, params, z, X, jitter)
    le = (jnp.zeros_like(y) if log_exposure is None
          else jnp.asarray(log_exposure))
    f_hat, a = poisson_newton_scan(
        v, d, y, le, jnp.ones_like(y), newton_iters=newton_iters,
    )
    return f_hat, a, inducing, v, d


def _pois_loglik(f, y, le):
    eta = f + le
    return (y * eta - jnp.exp(jnp.clip(eta, -_F_CLAMP, _F_CLAMP))
            - jax.scipy.special.gammaln(y + 1.0))


def poisson_log_evidence(
    family, params, z, X, y, *, log_exposure=None, newton_iters: int = 20,
    jitter: float | None = None, block_size: int | None = None,
    grad_impl: str = "ift",
):
    """Laplace marginal likelihood (GPML eq. 3.32 with the Poisson
    likelihood), differentiable w.r.t. (params, z) — implicit (IFT)
    gradients by default (models/ift.py).  Includes the -log y! constant
    so values are comparable across models.  ``block_size`` streams the
    whole computation through the generic Laplace core
    (models/classify_stream.py) — Knm never materializes, so n is
    unbounded."""
    le = (jnp.zeros_like(y) if log_exposure is None
          else jnp.asarray(log_exposure))
    if block_size is not None:
        from .classify_stream import stream_laplace_log_evidence

        return stream_laplace_log_evidence(
            family, params, z, X, (y, le), parts=pois_parts,
            loglik=pois_loglik,
            block_size=block_size, newton_iters=newton_iters,
            jitter=jitter,
        )
    from .ift import laplace_evidence_core

    _, v, d = _fitc_prior(family, params, z, X, jitter)
    return laplace_evidence_core(
        pois_parts, pois_loglik, v, d, (y, le), jnp.ones_like(y),
        newton_iters=newton_iters, grad_impl=grad_impl,
    )


def poisson_predict(
    family, params, z, X, y, Xstar, *, log_exposure=None,
    newton_iters: int = 20, jitter: float | None = None,
):
    """(rate_mean, rate_var, latent_mean, latent_var) at Xstar.

    Latent posterior exactly as the classifier's (mu* = V*(V'a),
    var* = k** - rowsq(V*) + rowsq(V* Rn^-1)); the log link gives the
    rate moments in closed form (lognormal).  Returned rates are per
    unit exposure; scale by E* for counts.
    """
    le = (jnp.zeros_like(y) if log_exposure is None
          else jnp.asarray(log_exposure))
    f_hat, a, inducing, v, d = poisson_laplace_mode(
        family, params, z, X, y, log_exposure=le,
        newton_iters=newton_iters, jitter=jitter,
    )
    w = jnp.maximum(_rate_w(f_hat, le, jnp.ones_like(y)), 1e-12)
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
    rate_mean = jnp.exp(mu + 0.5 * var)
    rate_var = (jnp.exp(var) - 1.0) * jnp.exp(2.0 * mu + var)
    return rate_mean, rate_var, mu, var


def fit_poisson(
    family, X, y, pack, *, log_exposure=None, newton_iters: int = 20,
    jitter: float | None = None, normalize: bool = True,
    block_size: int | None = None, **fit_kwargs,
):
    """Hyper + inducing training on the Poisson-Laplace evidence with the
    device L-BFGS (optim.fit_packed_objective conventions; pack must
    carry learn_sigma2=False — there is no Gaussian noise hyper).
    ``block_size`` streams the objective (unbounded n).
    Returns (params, z, state)."""
    if pack.learn_sigma2:
        raise ValueError(
            "the Poisson likelihood has no sigma2: build the pack with "
            "make_pack(..., learn_sigma2=False)"
        )
    from ..optim.lbfgs_device import fit_packed_objective

    scale = 1.0 / X.shape[0] if normalize else 1.0

    def fg(x, X, y):
        def f(x):
            params, z, _ = pack.unpack(x)
            return -scale * poisson_log_evidence(
                family, params, z, X, y, log_exposure=log_exposure,
                newton_iters=newton_iters, jitter=jitter,
                block_size=block_size,
            )

        return jax.value_and_grad(f)(x)

    st = fit_packed_objective(fg, pack, (X, y), **fit_kwargs)
    params, z, _ = pack.unpack(st.x)
    return params, z, st
