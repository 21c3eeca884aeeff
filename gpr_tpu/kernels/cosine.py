"""Cosine covariance family — the oscillation factor of spectral-mixture
kernels.

k(x, y) = cos(2 pi mu . (x - y))

with a learnable frequency VECTOR mu (d,).  PSD because it is a linear
kernel on the two features [cos(2 pi mu.x), sin(2 pi mu.x)] (the
angle-difference identity) — which is also exactly how it is evaluated:
one (n, 2) x (2, m) GEMM, no (n, m, d) tensor, rides every engine path.

Alone it models pure oscillation along direction mu.  Its real purpose
is composition (kernels/combinators.py): a spectral-mixture component
(Wilson & Adams, ICML 2013, vector-mean form) is

    prod(se_ard, cosine)      # Gaussian spectral peak at +-mu

and a Q-component SM kernel is the sum of Q such products —
``kernels.sm_family(Q)`` builds it.  The SE factor's per-dim
lengthscales are the (inverse) peak widths, its sf2 the component
weight, and mu the peak location; evidence ascent learns the spectrum.
No reference counterpart (mmottl/gpr has no stationary-spectrum
machinery at all).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..tree import pytree_dataclass

_TWO_PI = 6.283185307179586


@pytree_dataclass
class Params:
    mu: jnp.ndarray  # (d,) frequency vector, unconstrained


class Cosine:
    name = "cosine"
    Params = Params
    learn_inducing_default = True

    @staticmethod
    def default_params(X, n_inducing, key=None) -> Params:
        import jax

        dt = X.dtype
        d = X.shape[-1]
        if key is not None:
            # positive random frequencies: mu = 0 is a stationary point
            # of the evidence (k == 1 regardless of perturbation sign)
            mu = jnp.abs(0.3 * jax.random.normal(key, (d,), dt)) + 0.05
        else:
            mu = jnp.full((d,), 0.25, dt)
        return Params(mu=mu)

    @staticmethod
    def inducing_from_inputs(params, X):
        return X

    @staticmethod
    def _features(params, X):
        t = _TWO_PI * (X @ params.mu)  # (n,)
        return jnp.stack([jnp.cos(t), jnp.sin(t)], axis=-1)  # (n, 2)

    @staticmethod
    def k_cross(params, X, Z):
        from ..numerics.linalg import matmul

        return matmul(
            Cosine._features(params, X), Cosine._features(params, Z).T
        )

    @staticmethod
    def k_upper(params, Z):
        return Cosine.k_cross(params, Z, Z)

    @staticmethod
    def k_diag(params, X):
        return jnp.ones((X.shape[0],), dtype=X.dtype)

    @staticmethod
    def k_upper_inputs(params, X):
        return Cosine.k_cross(params, X, X)

    @staticmethod
    def k_one(params, x):
        return jnp.ones((), dtype=x.dtype)
