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
    def k_upper_inputs(cls, params, X):
        return cls.k_upper(params, X)

    @classmethod
    def k_one(cls, params, x):
        return jnp.exp(params.log_sf2)


class Matern52(_MaternBase):
    name = "matern52"

    @staticmethod
    def _k_of_d2(params, d2):
        return _matern(
            math.sqrt(5.0), lambda ar: 1.0 + ar + ar * ar / 3.0, params, d2
        )


class Matern32(_MaternBase):
    name = "matern32"

    @staticmethod
    def _k_of_d2(params, d2):
        return _matern(math.sqrt(3.0), lambda ar: 1.0 + ar, params, d2)
