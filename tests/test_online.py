"""Online posterior updates (models/online.py) == batch results.

The reference's Online module is commented out (fitc_gp.ml:2022-2053); here
it works: incremental == batch on concatenated data, to roundoff.
"""

import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import SeFat, SeIso
from gpr_tpu.models import calc_model, calc_trained, log_evidence
from gpr_tpu.models.online import (
    online_downdate,
    online_init,
    online_log_evidence,
    online_predictors,
    online_update,
)
from gpr_tpu.models.predict import predict_means, predict_variances

SIGMA2 = 0.3


def _data(rng, n=400, d=3, m=9):
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    return X, y, Z, p


def test_online_updates_match_batch(rng):
    X, y, Z, p = _data(rng)
    st = online_init(SeIso, p, Z, SIGMA2)
    # three unequal batches, one via the streaming path
    st = online_update(SeIso, p, st, X[:100], y[:100])
    st = online_update(SeIso, p, st, X[100:130], y[100:130])
    st = online_update(SeIso, p, st, X[130:], y[130:], block_size=64)

    for variational in (False, True):
        batch = log_evidence(SeIso, p, Z, SIGMA2, X, y,
                             variational=variational, factorization="chol")
        online = online_log_evidence(st, variational=variational)
        np.testing.assert_allclose(float(online), float(batch), rtol=1e-11)

    mp, cvp = online_predictors(st)
    model = calc_model(SeIso, p, X, Z, SIGMA2, factorization="chol")
    trained = calc_trained(model, y)
    Xs = jnp.asarray(np.random.default_rng(7).standard_normal((50, 3)))
    mu_o = predict_means(SeIso, p, mp, Xs)
    var_o = predict_variances(SeIso, p, cvp, Xs, SIGMA2)
    from gpr_tpu.models import co_variance_predictor, mean_predictor

    mu_b = predict_means(SeIso, p, mean_predictor(trained), Xs)
    var_b = predict_variances(SeIso, p, co_variance_predictor(model), Xs,
                              SIGMA2)
    np.testing.assert_allclose(np.asarray(mu_o), np.asarray(mu_b), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(var_o), np.asarray(var_b),
                               rtol=1e-9, atol=1e-12)


def test_online_downdate_removes_batch(rng):
    X, y, Z, p = _data(rng, n=300)
    st = online_init(SeIso, p, Z, SIGMA2)
    st = online_update(SeIso, p, st, X[:200], y[:200])
    st = online_update(SeIso, p, st, X[200:], y[200:])
    st = online_downdate(SeIso, p, st, X[200:], y[200:])
    ref = log_evidence(SeIso, p, Z, SIGMA2, X[:200], y[:200],
                       factorization="chol")
    np.testing.assert_allclose(float(online_log_evidence(st)), float(ref),
                               rtol=1e-10)
    assert int(st.stats.n) == 200


def test_online_empty_state_is_prior(rng):
    """Zero observations: coeffs are 0, variances equal the prior diag."""
    X, y, Z, p = _data(rng)
    st = online_init(SeIso, p, Z, SIGMA2)
    mp, cvp = online_predictors(st)
    Xs = X[:20]
    mu = predict_means(SeIso, p, mp, Xs)
    np.testing.assert_allclose(np.asarray(mu), 0.0, atol=1e-12)
    var = predict_variances(SeIso, p, cvp, Xs, SIGMA2, predictive=False)
    # FITC marginal prior variance at new points equals k_diag exactly
    np.testing.assert_allclose(np.asarray(var),
                               np.asarray(SeIso.k_diag(p, Xs)), rtol=1e-9)


def test_online_se_fat(rng):
    n, m = 150, 7
    X = jnp.asarray(rng.standard_normal((n, 4)))
    y = jnp.asarray(rng.standard_normal(n))
    import jax

    p = SeFat.default_params(X, m, key=jax.random.PRNGKey(2))
    Z = SeFat.inducing_from_inputs(p, X[:m])
    st = online_init(SeFat, p, Z, 0.5)
    st = online_update(SeFat, p, st, X[:80], y[:80])
    st = online_update(SeFat, p, st, X[80:], y[80:])
    batch = log_evidence(SeFat, p, Z, 0.5, X, y, variational=True,
                         factorization="chol")
    np.testing.assert_allclose(
        float(online_log_evidence(st, variational=True)), float(batch),
        rtol=1e-11,
    )
