"""Exact (dense) GP regression — the gold-standard anchor.

The reference is sparse-only (FITC/FIC/variational, lib/fitc_gp.ml); this
module is an extension that closes the loop below the sparse engine: for n
small enough that chol(K + sigma2 I) fits, it gives the EXACT marginal
likelihood, posterior, and leave-one-out (LOO) cross-validation quantities.
Two roles:

1. A user-facing small-n model (no inducing points to pick or learn); as
   m -> n the variational FITC evidence converges to this value from below
   (Titsias 2009), which the tests pin.
2. An in-repo convergence/validation anchor for every sparse path.

Math (GPML ch. 2 and 5; same conventions as models/fitc.py — upper Cholesky
factors, R'R = A):

    A      = K(X, X) + sigma2 I          (n, n)
    R      = chol_upper(A)               R'R = A
    alpha  = A^-1 y                      (two triangular solves)
    log Z  = -1/2 (y' alpha + log|A| + n log 2pi)

    predict at X*:  k* = K(X*, X)        mean = k* alpha
        Vs = R^-T k*'                    var  = k_diag(X*) - colsq(Vs)

    LOO (Sundararajan & Keerthi 2001; GPML eqs. 5.10-5.12), all n folds
    from ONE factorization:
        c_i      = diag(A^-1)_i = rowsq(R^-1)_i
        mu_i     = y_i - alpha_i / c_i         (posterior mean without fold i)
        var_i    = 1 / c_i
        log p_LOO = sum_i log N(y_i | mu_i, var_i)

Everything is jit-compatible and differentiable; hyperparameter training
reuses optim.pack.make_pack with ``learn_inducing=False`` (exact GPs have no
inducing coordinates) — see ``fit_exact``.

The dense chol is O(n^3) and K is O(n^2) HBM: n ~ 20k f32 is the practical
single-chip ceiling (a 20k x 20k f32 K is 1.6 GB).  Past that, use the
sparse/streaming engine — that is the whole point of the rest of the repo.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..numerics.linalg import (
    cholesky_upper,
    inv_tri_upper,
    log_det_tri,
    matmul,
    rows_sqr_norm,
    solve_tri,
)
from ..tree import pytree_dataclass

LOG_2PI = math.log(2.0 * math.pi)


@pytree_dataclass
class ExactModel:
    """Dense prior conditioned quantities (analogue of fitc.ModelState)."""

    z: jnp.ndarray  # (n, dz) training inputs in inducing representation
    sigma2: jnp.ndarray
    chol_a: jnp.ndarray  # upper R with R'R = K + sigma2 I (+ jitter)


@pytree_dataclass
class ExactTrained:
    """Dense posterior (analogue of fitc.TrainedState)."""

    model: ExactModel
    y: jnp.ndarray  # (n,)
    alpha: jnp.ndarray  # (n,) A^-1 y — the exact-GP 'coeffs'
    l: jnp.ndarray  # scalar log evidence


def calc_exact(
    family, params, X, sigma2, *, jitter: float | None = 0.0
) -> ExactModel:
    """chol(K(X,X) + sigma2 I).  ``jitter`` defaults to 0 because sigma2
    already regularizes the diagonal; pass None for the config policy when
    running near sigma2 = 0 (interpolation).

    The prior gram is the DATA-side kernel ``k_upper_inputs`` (what the
    sparse model approximates), not ``k_upper`` of the inducing
    representation — they differ for se_fat, whose multiscales/hetero are
    inducing-point properties the input gram deliberately ignores
    (lib/cov_se_fat.ml:221; same distinction models/pitc.py draws for its
    within-block covariances)."""
    z = family.inducing_from_inputs(params, X)
    k = family.k_upper_inputs(params, X)
    n = k.shape[0]
    a = k + sigma2 * jnp.eye(n, dtype=k.dtype)
    return ExactModel(
        z=z,
        sigma2=jnp.asarray(sigma2, dtype=k.dtype),
        chol_a=cholesky_upper(a, jitter),
    )


def exact_trained(model: ExactModel, y) -> ExactTrained:
    alpha = solve_tri(
        model.chol_a, solve_tri(model.chol_a, y, trans=True)
    )
    n = y.shape[0]
    l = -0.5 * (
        jnp.dot(y, alpha) + log_det_tri(model.chol_a) + n * LOG_2PI
    )
    return ExactTrained(model=model, y=y, alpha=alpha, l=l)


def log_evidence_exact(
    family, params, X, y, sigma2, *, jitter: float | None = 0.0
) -> jnp.ndarray:
    """Differentiable scalar for jax.value_and_grad over (params, sigma2)."""
    return exact_trained(calc_exact(family, params, X, sigma2, jitter=jitter), y).l


# ---------------------------------------------------------------------------
# Prediction
# ---------------------------------------------------------------------------


def predict_means_exact(family, params, trained: ExactTrained, Xs) -> jnp.ndarray:
    ks = family.k_cross(params, Xs, trained.model.z)
    return matmul(ks, trained.alpha)


def predict_variances_exact(
    family, params, trained: ExactTrained, Xs, *, predictive: bool = True
) -> jnp.ndarray:
    """Pointwise posterior variance; ``predictive`` adds sigma2 (same flag
    semantics as models/predict.py)."""
    ks = family.k_cross(params, Xs, trained.model.z)
    vs = solve_tri(trained.model.chol_a, ks.T, trans=True)  # (n, n*)
    var = family.k_diag(params, Xs) - rows_sqr_norm(vs.T)
    if predictive:
        var = var + trained.model.sigma2
    return var


def covariances_exact(
    family, params, trained: ExactTrained, Xs, *, predictive: bool = False
) -> jnp.ndarray:
    """Full posterior covariance at Xs (dense, (n*, n*))."""
    zs = family.inducing_from_inputs(params, Xs)
    kss = family.k_upper(params, zs)  # full symmetric (upper-storage name)
    ks = family.k_cross(params, Xs, trained.model.z)
    vs = solve_tri(trained.model.chol_a, ks.T, trans=True)
    cov = kss - matmul(vs.T, vs)
    if predictive:
        cov = cov + trained.model.sigma2 * jnp.eye(
            cov.shape[0], dtype=cov.dtype
        )
    return cov


# ---------------------------------------------------------------------------
# Leave-one-out cross-validation (capability the reference lacks)
# ---------------------------------------------------------------------------


def loo_posterior(trained: ExactTrained):
    """Per-point LOO predictive (mu_i, var_i) from one factorization.

    mu_i / var_i are exactly the posterior at x_i of the GP trained on the
    other n-1 points (Sundararajan & Keerthi 2001) — verified against the
    brute-force n-fold refit in tests/test_exact.py.
    """
    r_inv = inv_tri_upper(trained.model.chol_a)
    c = rows_sqr_norm(r_inv)  # diag(A^-1) = rowsq(R^-1) for upper R
    var = 1.0 / c
    mu = trained.y - trained.alpha * var
    return mu, var


def loo_log_likelihood(trained: ExactTrained) -> jnp.ndarray:
    """Log pseudo-likelihood sum_i log N(y_i | mu_-i, var_-i) — GPML eq.
    5.11; an alternative, overfit-resistant objective to the evidence."""
    mu, var = loo_posterior(trained)
    resid = trained.y - mu
    return -0.5 * jnp.sum(jnp.log(var) + resid * resid / var + LOG_2PI)


def loo_objective_exact(
    family, params, X, y, sigma2, *, jitter: float | None = 0.0
) -> jnp.ndarray:
    """Differentiable LOO pseudo-likelihood for hyperparameter training
    (maximize like the evidence; GPML sec. 5.4.2 argues it is more robust
    to model misspecification)."""
    return loo_log_likelihood(
        exact_trained(calc_exact(family, params, X, sigma2, jitter=jitter), y)
    )


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def fit_exact(
    family,
    params0,
    X,
    y,
    sigma2_0,
    *,
    objective: str = "evidence",  # or "loo"
    jitter: float | None = 0.0,
    learn_sigma2: bool = True,
    max_iter: int = 100,
    step: float = 0.1,
    tol: float = 0.1,
    epsabs: float = 0.1,
):
    """Hyperparameter training over the exact objective.

    Reuses the packed device L-BFGS (optim.lbfgs_device.fit_packed_objective)
    with ``learn_inducing=False`` — an exact GP has no inducing coordinates.
    Returns (trained: ExactTrained, params, sigma2).
    """
    from ..optim.lbfgs_device import fit_packed_objective
    from ..optim.pack import make_pack

    obj = {"evidence": log_evidence_exact, "loo": loo_objective_exact}[objective]
    pack = make_pack(
        family, params0, X[:1], sigma2_0,
        learn_sigma2=learn_sigma2, learn_inducing=False,
    )
    n = X.shape[0]

    def fg(x, X, y):
        def neg(x):
            params, _, sigma2 = pack.unpack(x)
            return -obj(family, params, X, y, sigma2, jitter=jitter) / n

        return jax.value_and_grad(neg)(x)

    st = fit_packed_objective(
        fg, pack, (X, y), step=step, tol=tol, epsabs=epsabs,
        max_iter=max_iter,
    )
    params, _, sigma2 = pack.unpack(st.x)
    trained = exact_trained(
        calc_exact(family, params, X, sigma2, jitter=jitter), y
    )
    return trained, params, sigma2
