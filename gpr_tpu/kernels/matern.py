"""Matérn covariance families (5/2 and 3/2, isotropic).

No reference counterpart (mmottl/gpr ships five families, all smooth or
linear); Matérn kernels are the most-requested extension for physical data
whose sample paths are rougher than the squared exponential allows.  Both
families plug into every engine path unchanged (dense, streaming, sharded,
online, multitask) because the engine only consumes the KernelFamily
protocol.

  Matérn-5/2: k(r) = sf2 (1 + a r + a^2 r^2 / 3) exp(-a r),  a = sqrt(5)/ell
  Matérn-3/2: k(r) = sf2 (1 + a r) exp(-a r),                a = sqrt(3)/ell

Distances come from the same one-GEMM ``sqdist`` the SE kernels use; the
sqrt is guarded for AD (d/dr sqrt at 0 is inf — on-diagonal zeros are
gated with the double-where pattern so inducing-point gradients stay
finite at coincident points).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..tree import pytree_dataclass
from .base import sqdist


@pytree_dataclass
class Params:
    log_ell: jnp.ndarray  # scalar
    log_sf2: jnp.ndarray  # scalar


def _safe_r(d2):
    """sqrt with an AD-safe zero: where d2 == 0 the kernel's r-derivative is
    analytically 0 for both Matérn orders, so gating the sqrt input keeps
    reverse mode finite without changing values."""
    pos = d2 > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)


def _matern(nu_a: float, poly, params, d2):
    a = nu_a * jnp.exp(-params.log_ell)
    ar = a * _safe_r(d2)
    return jnp.exp(params.log_sf2) * poly(ar) * jnp.exp(-ar)


class _MaternBase:
    Params = Params
    learn_inducing_default = True

    @classmethod
    def default_params(cls, X, n_inducing, key=None) -> Params:
        dt = X.dtype
        return Params(log_ell=jnp.zeros((), dt), log_sf2=jnp.zeros((), dt))

    @staticmethod
    def inducing_from_inputs(params, X):
        return X

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

        dk/d d2 is analytic and finite at coincident points (the 1/r of the
        sqrt chain cancels against the kernel's r factor):

          M32: dk/dd2 = -sf2 a^2 e^{-ar} / 2
          M52: dk/dd2 = -sf2 a^2 (1 + ar) e^{-ar} / 6

        and dk/dlog_ell = -2 d2 dk/dd2, so both hyper gradients and z_bar
        reduce through base.sqdist_cotangent_reduce's single augmented GEMM
        on c2 = knm_bar * dk/dd2.  log_sf2: k and k_diag are proportional
        to sf2.
        """
        from .base import sqdist_cotangent_reduce

        a = cls._NU_A * jnp.exp(-params.log_ell)
        sf2 = jnp.exp(params.log_sf2)
        d2 = sqdist(X, Z)
        ar = a * _safe_r(d2)
        e = jnp.exp(-ar)
        c2 = knm_bar * cls._dk_dd2(sf2, a, ar, e)
        z_bar, c_dot_d2, _ = sqdist_cotangent_reduce(c2, X, Z)
        p_bar = Params(
            log_ell=-2.0 * c_dot_d2,
            log_sf2=jnp.sum(knm_bar * knm) + sf2 * jnp.sum(kd_bar),
        )
        return p_bar, z_bar

    @classmethod
    def k_upper_inputs(cls, params, X):
        return cls.k_upper(params, X)

    @classmethod
    def k_one(cls, params, x):
        return jnp.exp(params.log_sf2)


class Matern52(_MaternBase):
    name = "matern52"
    _NU_A = math.sqrt(5.0)

    @staticmethod
    def _k_of_d2(params, d2):
        return _matern(
            math.sqrt(5.0), lambda ar: 1.0 + ar + ar * ar / 3.0, params, d2
        )

    @staticmethod
    def _dk_dd2(sf2, a, ar, e):
        return (-sf2 / 6.0) * a * a * (1.0 + ar) * e


class Matern32(_MaternBase):
    name = "matern32"
    _NU_A = math.sqrt(3.0)

    @staticmethod
    def _k_of_d2(params, d2):
        return _matern(math.sqrt(3.0), lambda ar: 1.0 + ar, params, d2)

    @staticmethod
    def _dk_dd2(sf2, a, ar, e):
        return (-0.5 * sf2) * a * a * e
