"""Isotropic squared-exponential kernel.

k(x, y) = sf2 * exp(-||x - y||^2 / (2 ell^2)),  sf2 = exp(log_sf2).

Reference: lib/cov_se_iso.ml (params at :24, eval at :41-160).  Hypers are
log_ell, log_sf2, and the inducing-point coordinates themselves
(`Inducing_hyper, lib/cov_se_iso.ml:183-202) — under jax.grad the latter come
for free as the gradient w.r.t. Z.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..tree import pytree_dataclass
from .base import sqdist


@pytree_dataclass
class Params:
    log_ell: jnp.ndarray  # scalar
    log_sf2: jnp.ndarray  # scalar


class SeIso:
    name = "se_iso"
    Params = Params
    learn_inducing_default = True

    @staticmethod
    def default_params(X, n_inducing, key=None) -> Params:
        # Reference defaults: log_ell = 0, log_sf2 = 0 (lib/cov_se_iso.ml:122-123).
        dt = X.dtype
        return Params(log_ell=jnp.zeros((), dt), log_sf2=jnp.zeros((), dt))

    @staticmethod
    def inducing_from_inputs(params, X):
        # Inducing points live in input space (lib/cov_se_iso.ml:120).
        return X

    @staticmethod
    def _k_of_d2(params, d2):
        inv_ell2_05 = -0.5 * jnp.exp(-2.0 * params.log_ell)
        return jnp.exp(params.log_sf2 + inv_ell2_05 * d2)

    @staticmethod
    def k_upper(params, Z):
        d2 = sqdist(Z, Z)
        k = SeIso._k_of_d2(params, d2)
        # Exact sf2 on the diagonal (lib/cov_se_iso.ml:81): the sqdist
        # expansion can leave tiny nonzeros there.
        sf2 = jnp.exp(params.log_sf2)
        m = Z.shape[0]
        return jnp.where(jnp.eye(m, dtype=bool), sf2, k)

    @staticmethod
    def k_diag(params, X):
        sf2 = jnp.exp(params.log_sf2)
        return jnp.full((X.shape[0],), sf2, dtype=X.dtype)

    @staticmethod
    def k_cross(params, X, Z):
        return SeIso._k_of_d2(params, sqdist(X, Z))

    @staticmethod
    def k_upper_inputs(params, X):
        return SeIso.k_upper(params, X)

    @staticmethod
    def k_one(params, x):
        return jnp.exp(params.log_sf2)
