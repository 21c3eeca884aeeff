"""Anisotropic (ARD) squared-exponential kernel.

k(x, y) = sf2 * exp(-1/2 sum_d (x_d - y_d)^2 / ell_d^2)

Per-dimension lengthscales — automatic relevance determination: evidence
ascent shrinks 1/ell_d for irrelevant inputs.  No direct reference
counterpart: mmottl/gpr covers anisotropy only through cov_se_fat's
learned linear projection (lib/cov_se_fat.ml:220, which subsumes ARD as
a diagonal tproj); the plain ARD form is what every GP practitioner
reaches for first, so it gets its own family here.

Evaluation scales the inputs by 1/ell per dimension and rides the same
one-GEMM ``sqdist`` as se_iso.  Inducing points stay in RAW input space
(scaled inside each call) so their gradients compose with the learned
lengthscales — unlike cov_lin_ard, which pre-scales its inducing
representation (a reference-parity choice documented there).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..tree import pytree_dataclass
from .base import sqdist


@pytree_dataclass
class Params:
    log_ells: jnp.ndarray  # (d,)
    log_sf2: jnp.ndarray  # scalar


class SeArd:
    name = "se_ard"
    Params = Params
    learn_inducing_default = True

    @staticmethod
    def default_params(X, n_inducing, key=None) -> Params:
        dt = X.dtype
        return Params(
            log_ells=jnp.zeros((X.shape[-1],), dt),
            log_sf2=jnp.zeros((), dt),
        )

    @staticmethod
    def inducing_from_inputs(params, X):
        return X

    @staticmethod
    def _scaled(params, X):
        return X * jnp.exp(-params.log_ells)

    @staticmethod
    def k_upper(params, Z):
        zs = SeArd._scaled(params, Z)
        k = jnp.exp(params.log_sf2 - 0.5 * sqdist(zs, zs))
        sf2 = jnp.exp(params.log_sf2)
        m = Z.shape[0]
        return jnp.where(jnp.eye(m, dtype=bool), sf2, k)

    @staticmethod
    def k_diag(params, X):
        sf2 = jnp.exp(params.log_sf2)
        return jnp.full((X.shape[0],), sf2, dtype=X.dtype)

    @staticmethod
    def k_cross(params, X, Z):
        xs = SeArd._scaled(params, X)
        zs = SeArd._scaled(params, Z)
        return jnp.exp(params.log_sf2 - 0.5 * sqdist(xs, zs))

    @staticmethod
    def k_upper_inputs(params, X):
        return SeArd.k_upper(params, X)

    @staticmethod
    def k_one(params, x):
        return jnp.exp(params.log_sf2)
