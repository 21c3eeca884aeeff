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


@pytree_dataclass
class ClassifyStats:
    """Classification-quality statistics — the classification analogue of
    ``Stats`` (the reference is regression-only, so the metric set is
    ours; conventions mirror the regression ones where they transfer:
    ``msll`` is the mean log loss relative to the trivial base-rate
    predictor, negative = model beats it, like the regression MSLL vs
    the trivial Gaussian)."""

    n_samples: int
    base_rate: jnp.ndarray  # fraction of positive labels
    error_rate: jnp.ndarray  # misclassification at threshold 1/2
    log_loss: jnp.ndarray  # mean negative log likelihood, nats
    msll: jnp.ndarray  # log_loss - base-rate log loss (negative = better)
    brier: jnp.ndarray  # mean squared probability error
    auc: jnp.ndarray  # rank AUC (ties broken by sort order)


def calc_classify_stats(y, prob) -> ClassifyStats:
    """``y`` in {-1, +1} (or {0, 1}), ``prob`` = P(y = +1) per point."""
    y01 = jnp.where(y > 0, 1.0, 0.0)
    n = y01.shape[0]
    p = jnp.clip(prob, 1e-12, 1.0 - 1e-12)
    base = jnp.mean(y01)
    base_c = jnp.clip(base, 1e-12, 1.0 - 1e-12)
    log_loss = -jnp.mean(y01 * jnp.log(p) + (1.0 - y01) * jnp.log1p(-p))
    prior_ll = -(base_c * jnp.log(base_c)
                 + (1.0 - base_c) * jnp.log1p(-base_c))
    # rank AUC: P(score_pos > score_neg) via the rank-sum identity
    order = jnp.argsort(prob)
    ranks = jnp.zeros(n).at[order].set(jnp.arange(1, n + 1, dtype=p.dtype))
    n_pos = jnp.sum(y01)
    n_neg = n - n_pos
    auc = (jnp.sum(ranks * y01) - n_pos * (n_pos + 1.0) / 2.0) / jnp.maximum(
        n_pos * n_neg, 1.0
    )
    return ClassifyStats(
        n_samples=n,
        base_rate=base,
        error_rate=jnp.mean(jnp.where((prob > 0.5) != (y01 > 0.5), 1.0, 0.0)),
        log_loss=log_loss,
        msll=log_loss - prior_ll,
        brier=jnp.mean((p - y01) ** 2),
        auc=auc,
    )


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
