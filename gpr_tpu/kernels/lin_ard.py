"""Linear ARD kernel: k(x, y) = x^T P^-1 y with P = diag(ell_1^2 .. ell_d^2).

Reference: lib/cov_lin_ard.ml.  The kernel stores consts = exp(-log_ells)
(:31-38) and — crucially — its inducing representation is the *pre-scaled*
input (``create_inducing = calc_ard_inputs``, :71), so ``k_upper`` is a plain
Gram of Z without rescaling (:47-48) and ``k_cross`` scales only the inputs
side (:75-77).  We reproduce that representation choice exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..numerics.linalg import matmul
from ..tree import pytree_dataclass


@pytree_dataclass
class Params:
    log_ells: jnp.ndarray  # (d,)


class LinArd:
    name = "lin_ard"
    Params = Params
    learn_inducing_default = False

    @staticmethod
    def default_params(X, n_inducing, key=None) -> Params:
        # Reference default: log_ells = 0 vector (lib/cov_lin_ard.ml:73-74).
        return Params(log_ells=jnp.zeros((X.shape[-1],), X.dtype))

    @staticmethod
    def _scale(params, X):
        return X * jnp.exp(-params.log_ells)[None, :]

    @staticmethod
    def inducing_from_inputs(params, X):
        return LinArd._scale(params, X)

    @staticmethod
    def k_upper(params, Z):
        return matmul(Z, Z.T)

    @staticmethod
    def k_diag(params, X):
        return jnp.sum(jnp.square(LinArd._scale(params, X)), axis=-1)

    @staticmethod
    def k_cross(params, X, Z):
        return matmul(LinArd._scale(params, X), Z.T)

    @staticmethod
    def k_upper_inputs(params, X):
        xs = LinArd._scale(params, X)
        return matmul(xs, xs.T)

    @staticmethod
    def k_one(params, x):
        return jnp.sum(jnp.square(x * jnp.exp(-params.log_ells)))
