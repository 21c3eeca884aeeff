"""Rational-quadratic covariance family (isotropic).

No reference counterpart (mmottl/gpr ships five families, none
heavy-tailed); the RQ kernel is the standard scale-mixture of squared
exponentials — equivalent to integrating the SE lengthscale over a gamma
distribution — so one kernel covers data whose correlations decay across
several lengthscales at once (alpha -> infinity recovers se_iso):

  k(d2) = sf2 (1 + d2 / (2 alpha ell^2))^(-alpha)

Hyperparameters: log_ell, log_sf2, log_alpha.  Plugs into every engine
path (dense, streaming incl. the hand-fused VJP, sharded, online,
multitask) via the KernelFamily protocol; distances come from the same
one-GEMM ``sqdist`` as the SE kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..tree import pytree_dataclass
from .base import sqdist


@pytree_dataclass
class Params:
    log_ell: jnp.ndarray  # scalar
    log_sf2: jnp.ndarray  # scalar
    log_alpha: jnp.ndarray  # scalar


class RatQuad:
    name = "rq"
    Params = Params
    learn_inducing_default = True

    @classmethod
    def default_params(cls, X, n_inducing, key=None) -> Params:
        dt = X.dtype
        return Params(log_ell=jnp.zeros((), dt), log_sf2=jnp.zeros((), dt),
                      log_alpha=jnp.zeros((), dt))

    @staticmethod
    def inducing_from_inputs(params, X):
        return X

    @staticmethod
    def _k_of_d2(params, d2):
        alpha = jnp.exp(params.log_alpha)
        q = d2 * jnp.exp(-2.0 * params.log_ell) / (2.0 * alpha)
        return jnp.exp(params.log_sf2) * (1.0 + q) ** (-alpha)

    @classmethod
    def k_upper(cls, params, Z):
        k = cls._k_of_d2(params, sqdist(Z, Z))
        sf2 = jnp.exp(params.log_sf2)
        m = Z.shape[0]
        return jnp.where(jnp.eye(m, dtype=bool), sf2, k)

    @classmethod
    def k_diag(cls, params, X):
        return jnp.full((X.shape[0],), jnp.exp(params.log_sf2), dtype=X.dtype)

    @classmethod
    def k_cross(cls, params, X, Z):
        return cls._k_of_d2(params, sqdist(X, Z))

    @classmethod
    def k_cross_vjp(cls, params, X, Z, knm, knm_bar, kd_bar):
        """Hand-fused pullback of (k_cross, k_diag) -> (params_bar, z_bar).

        With u = d2 / ell^2 and q = u / (2 alpha):

          dk/dd2        = -(sf2 / (2 ell^2)) (1 + q)^(-alpha - 1)
                        = -(k / (2 ell^2)) / (1 + q)
          dk/dlog_ell   = -2 d2 dk/dd2            (ell enters as d2/ell^2)
          dk/dlog_alpha = alpha k (q/(1+q) - log1p(q))
          dk/dlog_sf2   = k;  k_diag is proportional to sf2.

        log_ell and z_bar ride base.sqdist_cotangent_reduce's single
        augmented GEMM on c2 = knm_bar dk/dd2; log_alpha needs one extra
        elementwise reduction in the same pass.
        """
        from .base import sqdist_cotangent_reduce

        alpha = jnp.exp(params.log_alpha)
        sf2 = jnp.exp(params.log_sf2)
        inv_ell2 = jnp.exp(-2.0 * params.log_ell)
        d2 = sqdist(X, Z)
        q = d2 * inv_ell2 / (2.0 * alpha)
        c2 = knm_bar * (-0.5 * inv_ell2) * knm / (1.0 + q)
        z_bar, c_dot_d2, _ = sqdist_cotangent_reduce(c2, X, Z)
        alpha_term = jnp.sum(
            knm_bar * knm * (q / (1.0 + q) - jnp.log1p(q))
        )
        p_bar = Params(
            log_ell=-2.0 * c_dot_d2,
            log_sf2=jnp.sum(knm_bar * knm) + sf2 * jnp.sum(kd_bar),
            log_alpha=alpha * alpha_term,
        )
        return p_bar, z_bar

    @classmethod
    def k_upper_inputs(cls, params, X):
        return cls.k_upper(params, X)

    @classmethod
    def k_one(cls, params, x):
        return jnp.exp(params.log_sf2)
