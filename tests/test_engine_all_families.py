"""Engine evidence vs a kernel-agnostic scipy oracle, for all five families.

tests/oracle.py validates the se_iso end-to-end pipeline; here the oracle
takes arbitrary kernel matrices (computed by our kernel functions, which
tests/test_kernels.py independently validates against scalar-loop
transliterations), so the engine's linear algebra is checked for every
family including the options-heavy se_fat.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import cholesky, solve_triangular

from gpr_tpu.config import config
from gpr_tpu.kernels import Const, LinArd, LinOne, SeFat, SeIso
from gpr_tpu.models import calc_model, calc_trained

LOG_2PI = np.log(2 * np.pi)


def fitc_oracle_from_mats(Km, Knm, kn_diag, y, sigma2, jitter=1e-6,
                          variational=False):
    """oct.m:86-124 algebra on given matrices, f64 scipy."""
    n, m = Knm.shape
    U = cholesky(Km + jitter * np.eye(m), lower=False)
    V = solve_triangular(U, Knm.T, trans="T", lower=False).T
    r = kn_diag - np.sum(V * V, 1)
    s = r + sigma2
    is_ = 1.0 / s
    A1 = np.sqrt(is_)[:, None] * Knm
    B = Km + jitter * np.eye(m) + A1.T @ A1
    R = cholesky(B, lower=False)
    l1 = -0.5 * (
        2 * np.sum(np.log(np.diag(R)))
        - 2 * np.sum(np.log(np.diag(U)))
        + np.sum(np.log(s))
        + n * LOG_2PI
    )
    if variational:
        l1 -= 0.5 * float(is_ @ r)
    u = Knm.T @ (is_ * y)
    t = solve_triangular(R, u, trans="T", lower=False)
    l2 = -0.5 * (float((np.sqrt(is_) * y) @ (np.sqrt(is_) * y)) - float(t @ t))
    coeffs = solve_triangular(R, t, lower=False)
    return l1, l2, coeffs


def make_family_setup(family, rng, n=35, m=6):
    if family is SeFat:
        D = 5
        X = jnp.asarray(rng.standard_normal((n, D)))
        params = SeFat.Params(
            d=3,
            log_sf2=jnp.asarray(0.2),
            tproj=jnp.asarray(rng.standard_normal((D, 3))),
            log_hetero_skedasticity=jnp.asarray(rng.standard_normal(m) - 2),
            log_multiscales_m05=jnp.asarray(0.2 * rng.standard_normal((m, 3))),
        )
    else:
        X = jnp.asarray(rng.standard_normal((n, 3)))
        params = family.default_params(X, m, key=jax.random.PRNGKey(0))
    Z = family.inducing_from_inputs(params, X[:m])
    y = jnp.asarray(rng.standard_normal(n))
    return params, X, Z, y


@pytest.mark.parametrize("family", [Const, LinOne, LinArd, SeIso, SeFat],
                         ids=lambda f: f.name)
@pytest.mark.parametrize("variational", [False, True])
@pytest.mark.parametrize("factorization", ["qr", "chol"])
def test_engine_matches_scipy_oracle(rng, family, variational, factorization):
    params, X, Z, y = make_family_setup(family, rng)
    sigma2 = 0.7

    Km = np.asarray(family.k_upper(params, Z))
    Knm = np.asarray(family.k_cross(params, X, Z))
    kn_diag = np.asarray(family.k_diag(params, X))
    l1_ref, l2_ref, coeffs_ref = fitc_oracle_from_mats(
        Km, Knm, kn_diag, np.asarray(y), sigma2,
        jitter=config.cholesky_jitter, variational=variational,
    )

    model = calc_model(family, params, X, Z, sigma2, variational=variational,
                       factorization=factorization)
    trained = calc_trained(model, y)
    np.testing.assert_allclose(float(model.l1), l1_ref, rtol=1e-9)
    np.testing.assert_allclose(float(trained.l2), l2_ref, rtol=1e-9)
    # const/lin_ard make Km rank-deficient (rank 1 / rank d < m): the jitter
    # regularizes, but coefficient differences between BLAS implementations
    # amplify by the condition number — hence the looser bound
    np.testing.assert_allclose(np.asarray(trained.coeffs), coeffs_ref,
                               rtol=1e-5, atol=1e-9)
