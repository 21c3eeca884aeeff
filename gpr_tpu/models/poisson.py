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
    log_det_tri,
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


def poisson_newton_scan(
    v, d, y, log_exposure, mask, *, newton_iters: int = 20,
    allsum=lambda x: x,
):
    """Newton mode-finding for the Poisson-Laplace over local rows.

    Same skeleton as classify.newton_scan: the m-space Woodbury solve
    with one round of iterative refinement, then the exact maximizer of
    the concave objective along the Newton segment (25 GEMM-free
    bisections).  ``allsum`` is the cross-row reduction hook.
    Returns (f_hat, a).
    """

    def kdot(x):
        return matmul(v, allsum(matmul(v.T, x))) + d * x

    def step(carry, _):
        f, a = carry
        w = jnp.maximum(_rate_w(f, log_exposure, mask), 1e-12) * mask
        grad = mask * (y - _rate_w(f, log_exposure, mask))
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
        # one round of iterative refinement (free residual; see
        # classify.py's measured rationale at n ~ 1e6 f32)
        atil = atil + binv(sw * f_n - atil)
        a_n = b - sw * atil
        f_n = kdot(a_n)

        # exact concave line maximum along a_s = (1-s) a + s a_n
        aff = allsum(jnp.sum(a * f))
        afn = allsum(jnp.sum(a * f_n))
        ann = allsum(jnp.sum(a_n * f_n))
        df = f_n - f

        def dpsi(s):
            rate = _rate_w(f + s * df, log_exposure, mask)
            quad_p = (-2.0 * (1.0 - s) * aff + (2.0 - 4.0 * s) * afn
                      + 2.0 * s * ann)
            return -0.5 * quad_p + allsum(
                jnp.sum(mask * (y - rate) * df)
            )

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
):
    """Laplace marginal likelihood (GPML eq. 3.32 with the Poisson
    likelihood), differentiable w.r.t. (params, z) through the unrolled
    Newton mode.  Includes the -log y! constant so values are comparable
    across models.  ``block_size`` streams the whole computation through
    the generic Laplace core (models/classify_stream.py) — Knm never
    materializes, so n is unbounded."""
    le = (jnp.zeros_like(y) if log_exposure is None
          else jnp.asarray(log_exposure))
    if block_size is not None:
        from .classify_stream import stream_laplace_log_evidence

        def parts(f, lik, maskb):
            yb, leb = lik
            w = _rate_w(f, leb, maskb)
            return maskb * (yb - w), w

        return stream_laplace_log_evidence(
            family, params, z, X, (y, le), parts=parts,
            loglik=lambda f, lik: _pois_loglik(f, lik[0], lik[1]),
            block_size=block_size, newton_iters=newton_iters,
            jitter=jitter,
        )
    f_hat, a, inducing, v, d = poisson_laplace_mode(
        family, params, z, X, y, log_exposure=le,
        newton_iters=newton_iters, jitter=jitter,
    )
    w = jnp.maximum(_rate_w(f_hat, le, jnp.ones_like(y)), 1e-12)
    e = 1.0 / (1.0 + w * d)
    vw = v * jnp.sqrt(w * e)[:, None]
    mm = jnp.eye(v.shape[1], dtype=v.dtype) + matmul(vw.T, vw)
    rm = cholesky_upper(mm, jitter=0.0)
    log_det_b = jnp.sum(jnp.log1p(w * d)) + log_det_tri(rm)
    log_lik = jnp.sum(_pois_loglik(f_hat, y, le))
    return -0.5 * jnp.dot(a, f_hat) + log_lik - 0.5 * log_det_b


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
