"""Closed-form leave-one-out cross-validation for the sparse FITC model.

The FITC marginal for the targets is the dense Gaussian

    y ~ N(0, A),   A = Qnn + diag(r) + sigma2 I,   Qnn = Knm Km^-1 Kmn

so the exact-GP LOO identities (models/exact.py; Sundararajan & Keerthi
2001) apply verbatim with A in this low-rank-plus-diagonal form — and both
ingredients come out in O(n m) from quantities the engine has ALREADY
computed (ModelState/TrainedState, models/fitc.py):

    alpha  = A^-1 y        = is * (y - mean_train)        [Woodbury + the
                             engine's t/coeffs identities: Knm B^-1 Knm'
                             (is y) = Knm coeffs = mean_train]
    c      = diag(A^-1)    = is - is^2 * rowsq(Knm R^-1)  [R'R = B]

    LOO:   mu_i  = y_i - alpha_i / c_i       (model trained without row i,
           var_i = 1 / c_i                    evaluated at x_i, PREDICTIVE —
                                              includes r_i + sigma2)
    log p_LOO = sum_i log N(y_i | mu_i, var_i)

Every fold of "train the FITC model on n-1 points with these hypers and
this Z, predict the held-out point" — from ONE factorization, no refits.
The tests pin this against the brute-force definition (a from-scratch
numpy Gaussian conditional of the FITC joint) and against the dense-exact
LOO at Z = X.

Differentiable end to end: ``loo_objective`` is an alternative training
objective to the evidence (GPML sec. 5.4.2 — asymptotically consistent
under model misspecification where the evidence is not), usable wherever
``log_evidence`` is (optim.fit_packed_objective, HMC, ...).  Note the LOO
is a property of the (hypers, Z) FITC model — the variational flag does
not enter (it modifies the evidence bound l1, not the joint).

No reference counterpart: mmottl/gpr trains on the evidence only.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..numerics.linalg import rows_sqr_norm, solve_tri_right
from .fitc import TrainedState, calc_means, calc_model, calc_trained

LOG_2PI = math.log(2.0 * math.pi)


def loo_posterior(trained: TrainedState):
    """Per-point LOO predictive (mu_i, var_i) of the FITC model, O(n m).

    Requires a materialized trained state (model.knm present — the
    streaming states do not carry Knm; materialize or subsample for LOO
    at streaming scale).
    """
    model = trained.model
    w = solve_tri_right(model.knm, model.r_mat)  # Knm R^-1   (n, m)
    c = model.is_ - model.is_**2 * rows_sqr_norm(w)
    alpha = model.is_ * (trained.y - calc_means(trained))
    var = 1.0 / c
    mu = trained.y - alpha * var
    return mu, var


def loo_log_likelihood(trained: TrainedState) -> jnp.ndarray:
    """Sum_i log N(y_i | mu_-i, var_-i) — the LOO pseudo-likelihood."""
    mu, var = loo_posterior(trained)
    resid = trained.y - mu
    return -0.5 * jnp.sum(jnp.log(var) + resid * resid / var + LOG_2PI)


def loo_objective(
    family, params, z, sigma2, X, y, *,
    factorization: str | None = None, jitter: float | None = None,
) -> jnp.ndarray:
    """Differentiable LOO pseudo-likelihood of the sparse model — same
    signature as models.log_evidence, maximize it the same way."""
    model = calc_model(
        family, params, X, z, sigma2,
        factorization=factorization, jitter=jitter,
    )
    return loo_log_likelihood(calc_trained(model, y))
