"""Regression-quality statistics.

Rebuild of the Stats module (fitc_gp.ml:305-375; spec lib/interfaces.ml:
546-619): the nine metrics the reference reports during training.  Note the
reference's conventions, reproduced exactly:

  * target_variance is the *uncentered* second moment |y|^2 / n (:319) —
    the CLI centers targets first, so this is the variance there;
  * msll = prior_l - l / n with prior_l = -1/2 log(2 pi tv) - 1/2 (:329-334),
    i.e. the mean standardized log loss against the trivial Gaussian fit.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..tree import pytree_dataclass
from .fitc import TrainedState, calc_means


@pytree_dataclass
class Stats:
    n_samples: int
    target_variance: jnp.ndarray
    sse: jnp.ndarray
    mse: jnp.ndarray
    rmse: jnp.ndarray
    smse: jnp.ndarray
    msll: jnp.ndarray
    mad: jnp.ndarray
    maxad: jnp.ndarray


def calc_n_samples(trained: TrainedState) -> int:
    """fitc_gp.ml:318."""
    return trained.y.shape[0]


def calc_target_variance(trained: TrainedState) -> jnp.ndarray:
    """Uncentered second moment |y|^2/n (fitc_gp.ml:319)."""
    y = trained.y
    return jnp.dot(y, y) / y.shape[0]


def calc_sse(trained: TrainedState) -> jnp.ndarray:
    """fitc_gp.ml:321-323."""
    resid = trained.y - calc_means(trained)
    return jnp.dot(resid, resid)


def calc_mse(trained: TrainedState) -> jnp.ndarray:
    return calc_sse(trained) / calc_n_samples(trained)


def calc_rmse(trained: TrainedState) -> jnp.ndarray:
    return jnp.sqrt(calc_mse(trained))


def calc_smse(trained: TrainedState) -> jnp.ndarray:
    """fitc_gp.ml:327."""
    return calc_mse(trained) / calc_target_variance(trained)


def calc_msll(trained: TrainedState) -> jnp.ndarray:
    """Mean standardized log loss vs the trivial Gaussian (fitc_gp.ml:329-334)."""
    tv = calc_target_variance(trained)
    prior_l = -0.5 * jnp.log(2.0 * math.pi * tv) - 0.5
    return prior_l - trained.l / calc_n_samples(trained)


def calc_mad(trained: TrainedState) -> jnp.ndarray:
    """fitc_gp.ml:336-344."""
    return jnp.mean(jnp.abs(trained.y - calc_means(trained)))


def calc_maxad(trained: TrainedState) -> jnp.ndarray:
    """fitc_gp.ml:346-352."""
    return jnp.max(jnp.abs(trained.y - calc_means(trained)))


def calc_stats(trained: TrainedState) -> Stats:
    y = trained.y
    n = y.shape[0]
    means = calc_means(trained)
    resid = y - means
    target_variance = jnp.dot(y, y) / n
    sse = jnp.dot(resid, resid)
    mse = sse / n
    rmse = jnp.sqrt(mse)
    smse = mse / target_variance
    prior_l = -0.5 * jnp.log(2.0 * math.pi * target_variance) - 0.5
    msll = prior_l - trained.l / n
    ad = jnp.abs(resid)
    return Stats(
        n_samples=n,
        target_variance=target_variance,
        sse=sse,
        mse=mse,
        rmse=rmse,
        smse=smse,
        msll=msll,
        mad=jnp.mean(ad),
        maxad=jnp.max(ad),
    )
