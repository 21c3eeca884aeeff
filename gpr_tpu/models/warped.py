"""Warped sparse GPs: learn a monotone observation warp jointly.

The reference lists warped GPs as future work and never ships them
(doc/manual/gpr_manual.tex:532-559; Snelson, Ghahramani & Rasmussen 2004).
The model: a latent sparse GP over t = g(y) with a monotone parametric
warp, so the marginal likelihood picks up the Jacobian of the warp,

  log p(y) = log N(g(y); 0, cov) + sum_i log g'(y_i),

with the tanh-sum warp of the original paper:

  g(y) = y + sum_k a_k tanh(b_k (y + c_k)),   a_k, b_k >= 0
  g'(y) = 1 + sum_k a_k b_k sech^2(b_k (y + c_k))  >= 1.

Because the warp only transforms the target vector and adds a separable
term, it composes with EVERY engine path unchanged — dense, streaming,
sharded, PITC — and with every optimizer: warped_log_evidence is just
streaming_log_evidence on g(y) plus the Jacobian sum, differentiable in
the warp parameters alongside kernel hypers, inducing points, and noise.

Prediction: the latent posterior at x* is Gaussian (mu, s2) in t-space;
y* = g^-1(t*) is non-Gaussian.  ``warp_inv`` inverts the warp (bisection
bracket + Newton polish — g' >= 1 makes both unconditionally safe, and
the fixed iteration counts are jit/vmap-friendly), giving the median and
any quantile exactly; ``warped_predict_mean`` integrates g^-1 against the
latent Gaussian with Gauss-Hermite quadrature.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass
from .streaming import streaming_log_evidence


@pytree_dataclass
class WarpParams:
    """tanh-sum warp hypers; positivity via exp (log_a, log_b)."""

    log_a: jnp.ndarray  # (k,)
    log_b: jnp.ndarray  # (k,)
    c: jnp.ndarray  # (k,)


def default_warp_params(n_terms: int = 3, dtype=jnp.float64) -> WarpParams:
    """Near-identity initialization: tiny amplitudes, unit slopes, centers
    spread around 0 (targets are centered/standardized upstream)."""
    return WarpParams(
        log_a=jnp.full((n_terms,), -3.0, dtype),
        log_b=jnp.zeros((n_terms,), dtype),
        c=jnp.asarray(np.linspace(-1.0, 1.0, n_terms), dtype),
    )


def warp(wp: WarpParams, y):
    a = jnp.exp(wp.log_a)
    b = jnp.exp(wp.log_b)
    return y + jnp.sum(
        a * jnp.tanh(b * (y[..., None] + wp.c)), axis=-1
    )


def warp_deriv(wp: WarpParams, y):
    a = jnp.exp(wp.log_a)
    b = jnp.exp(wp.log_b)
    sech2 = 1.0 / jnp.cosh(b * (y[..., None] + wp.c)) ** 2
    return 1.0 + jnp.sum(a * b * sech2, axis=-1)


def warp_inv(wp: WarpParams, t, *, bisect_iters: int = 60,
             newton_iters: int = 3):
    """y with g(y) = t, elementwise.

    tanh is bounded, so y is bracketed by [t - sum a, t + sum a]; g' >= 1
    makes bisection monotone-safe and Newton locally quadratic.  Fixed
    iteration counts keep the routine jit-compatible; 60 halvings of a
    2*sum(a)-wide bracket + 3 Newton steps is f64-exact for any sane warp.
    """
    amp = jnp.sum(jnp.exp(wp.log_a))
    lo = t - amp
    hi = t + amp

    def bis(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        too_low = warp(wp, mid) < t
        return jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid)

    lo, hi = jax.lax.fori_loop(0, bisect_iters, bis, (lo, hi))
    y = 0.5 * (lo + hi)

    def newton(_, y):
        return y - (warp(wp, y) - t) / warp_deriv(wp, y)

    return jax.lax.fori_loop(0, newton_iters, newton, y)


def warped_log_evidence(
    family, params, wp: WarpParams, z, sigma2, X, y, *,
    variational: bool = False, block_size: int = 8192,
    jitter: float | None = None, **stream_kwargs,
):
    """Sparse-GP evidence of the warped targets + the warp Jacobian.
    Differentiable w.r.t. (params, wp, z, sigma2) — train all of it
    jointly with any optimizer in gpr_tpu.optim."""
    t = warp(wp, y)
    l = streaming_log_evidence(
        family, params, z, sigma2, X, t, variational=variational,
        block_size=block_size, jitter=jitter, **stream_kwargs,
    )
    return l + jnp.sum(jnp.log(warp_deriv(wp, y)))


def warped_predict_median(wp: WarpParams, latent_means):
    """The predictive median in observation space: g^-1 of the latent
    mean (the monotone warp maps quantiles to quantiles)."""
    return warp_inv(wp, latent_means)


def warped_predict_quantile(wp: WarpParams, latent_means, latent_variances,
                            q: float):
    """Predictive q-quantile: g^-1(mu + Phi^-1(q) s)."""
    from scipy.stats import norm  # host-side scalar; traced args stay jax

    zq = float(norm.ppf(q))
    return warp_inv(
        wp, latent_means + zq * jnp.sqrt(latent_variances)
    )


def warped_predict_mean(wp: WarpParams, latent_means, latent_variances,
                        *, n_nodes: int = 20):
    """E[y*] = int g^-1(t) N(t; mu, s2) dt by Gauss-Hermite quadrature
    (n_nodes fixed at trace time)."""
    xs, ws = np.polynomial.hermite.hermgauss(n_nodes)
    xs = jnp.asarray(xs, latent_means.dtype)
    ws = jnp.asarray(ws / np.sqrt(np.pi), latent_means.dtype)
    s = jnp.sqrt(latent_variances)
    nodes = latent_means[..., None] + jnp.sqrt(2.0) * s[..., None] * xs
    inv = warp_inv(wp, nodes)
    return jnp.sum(ws * inv, axis=-1)


def warped_predict_moments(wp: WarpParams, latent_means, latent_variances,
                           *, n_nodes: int = 20):
    """(E[y*], Var[y*]) in observation space by Gauss-Hermite quadrature:
    the first two moments of g^-1(t) with t ~ N(mu, s2).  Pass the
    PREDICTIVE t-space variance (latent + sigma2) for observation moments,
    the latent variance for function moments."""
    xs, ws = np.polynomial.hermite.hermgauss(n_nodes)
    xs = jnp.asarray(xs, latent_means.dtype)
    ws = jnp.asarray(ws / np.sqrt(np.pi), latent_means.dtype)
    s = jnp.sqrt(latent_variances)
    nodes = latent_means[..., None] + jnp.sqrt(2.0) * s[..., None] * xs
    inv = warp_inv(wp, nodes)
    m1 = jnp.sum(ws * inv, axis=-1)
    m2 = jnp.sum(ws * inv * inv, axis=-1)
    return m1, jnp.maximum(m2 - m1 * m1, 0.0)


def make_warped_pack(pack, wp0: WarpParams):
    """Extend an ``optim.make_pack`` HyperPack with warp parameters.

    Returns ``(pack_w, unpack_w)``: ``pack_w.x0`` is
    ``[base hypers | warp params]`` and drives any packed-objective
    trainer unchanged; ``unpack_w(x) -> (params, z, sigma2, wp)``.
    """
    import dataclasses

    from jax.flatten_util import ravel_pytree

    wflat, unravel = ravel_pytree(wp0)
    k = pack.x0.shape[0]
    wflat = wflat.astype(pack.x0.dtype)
    pack_w = dataclasses.replace(
        pack, x0=jnp.concatenate([pack.x0, wflat]),
        n_hypers=k + wflat.shape[0],
    )

    def unpack_w(x):
        params, z, sigma2 = pack.unpack(x[:k])
        return params, z, sigma2, unravel(x[k:])

    return pack_w, unpack_w


def fit_warped(
    family, X, y, pack, wp0: WarpParams, *,
    variational: bool = False, block_size: int = 8192,
    jitter: float | None = None, normalize: bool = True,
    **fit_kwargs,
):
    """Joint (kernel hypers, inducing, sigma2, warp) training with the
    device L-BFGS (optim.fit_packed_objective conventions: data threads
    through as jit arguments; ``normalize=True`` optimizes the mean NLL
    for large-n f32 line-search resolution).

    Returns ``(params, z, sigma2, wp, state)``.
    """
    from ..optim.lbfgs_device import fit_packed_objective

    pack_w, unpack_w = make_warped_pack(pack, wp0)
    scale = 1.0 / X.shape[0] if normalize else 1.0

    def fg(x, X, y):
        def f(x):
            params, z, sigma2, wp = unpack_w(x)
            return -scale * warped_log_evidence(
                family, params, wp, z, sigma2, X, y,
                variational=variational, block_size=block_size,
                jitter=jitter,
            )

        return jax.value_and_grad(f)(x)

    st = fit_packed_objective(fg, pack_w, (X, y), **fit_kwargs)
    params, z, sigma2, wp = unpack_w(st.x)
    return params, z, sigma2, wp, st
