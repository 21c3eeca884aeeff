"""Linear kernel with a bias: k(x, y) = (x . y + 1) / theta^2.

Reference: lib/cov_lin_one.ml (const = exp(-2 log_theta) at :31; calc_upper =
syrk + const at :40-43; eval_one at :54).  Inducing points live in input space.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..numerics.linalg import matmul
from ..tree import pytree_dataclass


@pytree_dataclass
class Params:
    log_theta: jnp.ndarray  # scalar


class LinOne:
    name = "lin_one"
    Params = Params
    learn_inducing_default = False

    @staticmethod
    def default_params(X, n_inducing, key=None) -> Params:
        # Reference default: log_theta = 0 (lib/cov_lin_one.ml:66-67).
        return Params(log_theta=jnp.zeros((), X.dtype))

    @staticmethod
    def _alpha(params):
        return jnp.exp(-2.0 * params.log_theta)

    @staticmethod
    def inducing_from_inputs(params, X):
        return X

    @staticmethod
    def k_upper(params, Z):
        a = LinOne._alpha(params)
        return a * (matmul(Z, Z.T) + 1.0)

    @staticmethod
    def k_diag(params, X):
        a = LinOne._alpha(params)
        return a * (jnp.sum(jnp.square(X), axis=-1) + 1.0)

    @staticmethod
    def k_cross(params, X, Z):
        a = LinOne._alpha(params)
        return a * (matmul(X, Z.T) + 1.0)

    @staticmethod
    def k_upper_inputs(params, X):
        return LinOne.k_upper(params, X)

    @staticmethod
    def k_one(params, x):
        a = LinOne._alpha(params)
        return a * (jnp.sum(jnp.square(x)) + 1.0)
