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


def sample_fic_blocked(
    key,
    family,
    params,
    cvp,
    X,
    sigma2,
    n_samples: int,
    *,
    predictive: bool = True,
    block_size: int = 8192,
):
    """Exact joint FIC posterior samples at unbounded scale: O(t m) per draw.

    The FIC posterior covariance is low-rank-plus-diagonal,
    Sigma = W W' + diag(r_t) with W = Ktm R^-1 and
    r_t = kt_diag - rowsq(Ktm U^-1) (+ sigma2 if predictive), so

        sample = mean + W eps_m + sqrt(r_t) * eps_t,   eps ~ N(0, I)

    is exact without materializing the t x t covariance the reference must
    Cholesky (fitc_gp.ml:661-671) — sampling a million test points jointly
    becomes a streamed matmul.  Returns (t, n_samples); means are NOT added
    (compose with predict_means/predict_means_blocked).
    """
    from ..numerics.linalg import inv_tri_upper, rows_sqr_norm

    t = X.shape[0]
    m = cvp.z.shape[0]
    k_eps_m, k_eps_t = jax.random.split(key)
    eps_m = jax.random.normal(k_eps_m, (m, n_samples), X.dtype)
    u_inv = inv_tri_upper(cvp.chol_km)
    r_inv = inv_tri_upper(cvp.r_mat)

    nb = -(-t // block_size)
    pad = nb * block_size - t
    Xp = (
        jnp.concatenate([X, jnp.zeros((pad, X.shape[1]), X.dtype)])
        if pad else X
    )
    xb = Xp.reshape(nb, block_size, X.shape[1])
    keys = jax.random.split(k_eps_t, nb)

    def blk(args):
        x_b, k_b = args
        ktm = family.k_cross(params, x_b, cvp.z)
        kt_diag = family.k_diag(params, x_b)
        r_t = kt_diag - rows_sqr_norm(matmul(ktm, u_inv))
        if predictive:
            r_t = r_t + sigma2
        r_t = jnp.maximum(r_t, 0.0)
        w = matmul(ktm, r_inv)  # (b, m)
        eps_t = jax.random.normal(k_b, (x_b.shape[0], eps_m.shape[1]),
                                  X.dtype)
        return matmul(w, eps_m) + jnp.sqrt(r_t)[:, None] * eps_t

    out = jax.lax.map(blk, (xb, keys))
    return out.reshape(-1, n_samples)[:t]
