"""Posterior sampling.

Rebuild of fitc_gp.ml:628-695.  The reference draws through GSL's ziggurat
from a global mutable RNG (lib/utils.ml:41); here sampling is a pure function
of a jax.random key — the deterministic-seeding story that replaces
``default_rng``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import config
from ..numerics.linalg import cholesky_upper, matmul
from ..tree import pytree_dataclass


@pytree_dataclass
class Sampler:
    """Single-point marginal sampler (fitc_gp.ml:628-648)."""

    mean: jnp.ndarray
    stddev: jnp.ndarray


@pytree_dataclass
class CovSampler:
    """Correlated posterior sampler (fitc_gp.ml:652-671)."""

    means: jnp.ndarray  # (t,)
    cov_chol: jnp.ndarray  # upper U with Sigma (+ jitter) = U'U


def sampler(mean, variance, sigma2, *, predictive=True) -> Sampler:
    used = variance + sigma2 if predictive else variance
    return Sampler(mean=jnp.asarray(mean), stddev=jnp.sqrt(used))


def sample(key, s: Sampler, n: int | None = None) -> jnp.ndarray:
    shape = () if n is None else (n,)
    return s.mean + s.stddev * jax.random.normal(key, shape, jnp.asarray(s.mean).dtype)


def cov_sampler(means, covariances, sigma2=None, *, predictive=True,
                jitter: float | None = None) -> CovSampler:
    """Jittered Cholesky of the posterior covariance (fitc_gp.ml:661-671).

    ``predictive=True`` adds sigma2 to the diagonal first.
    """
    cov = covariances
    t = cov.shape[0]
    if predictive:
        if sigma2 is None:
            raise ValueError("predictive sampling requires sigma2")
        cov = cov + sigma2 * jnp.eye(t, dtype=cov.dtype)
    if jitter is None:
        jitter = config.cholesky_jitter
    u = cholesky_upper(cov, jitter)
    return CovSampler(means=means, cov_chol=u)


def cov_sample(key, cs: CovSampler, n: int | None = None) -> jnp.ndarray:
    """Draw ``n`` joint samples: means + U' z with z ~ N(0, I)
    (fitc_gp.ml:673-694).  Returns (t,) if n is None else (t, n)."""
    t = cs.means.shape[0]
    shape = (t,) if n is None else (t, n)
    z = jax.random.normal(key, shape, cs.cov_chol.dtype)
    correlated = matmul(cs.cov_chol.T, z)
    return correlated + (cs.means if n is None else cs.means[:, None])
