"""Constant-function covariance: k(x, y) = exp(-2 log_theta) = 1/theta^2.

Reference: lib/cov_const.ml (kernel const at :31, eval at :36-68).  The
reference's inducing representation is just a point count; here the engine is
array-based, so Z is an (m, 0) placeholder array — zero feature columns, m
rows.  All covariances are the constant.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..tree import pytree_dataclass


@pytree_dataclass
class Params:
    log_theta: jnp.ndarray  # scalar


class Const:
    name = "const"
    Params = Params
    learn_inducing_default = False

    @staticmethod
    def default_params(X, n_inducing, key=None) -> Params:
        # Reference default: log_theta = 0 (lib/cov_const.ml:57-58).
        return Params(log_theta=jnp.zeros((), X.dtype))

    @staticmethod
    def _const(params):
        return jnp.exp(-2.0 * params.log_theta)

    @staticmethod
    def inducing_from_inputs(params, X):
        return X[:, :0]  # (m, 0): carries only the point count

    @staticmethod
    def k_upper(params, Z):
        m = Z.shape[0]
        return jnp.full((m, m), Const._const(params), dtype=Z.dtype)

    @staticmethod
    def k_diag(params, X):
        return jnp.full((X.shape[0],), Const._const(params), dtype=X.dtype)

    @staticmethod
    def k_cross(params, X, Z):
        return jnp.full((X.shape[0], Z.shape[0]), Const._const(params), dtype=X.dtype)

    @staticmethod
    def k_upper_inputs(params, X):
        n = X.shape[0]
        return jnp.full((n, n), Const._const(params), dtype=X.dtype)

    @staticmethod
    def k_one(params, x):
        return Const._const(params)
