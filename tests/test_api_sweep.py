"""Seeded randomized API sweep: end-to-end workflows over random
(family, options, shapes, trainer) combinations.

The round-1 fuzz harness lived outside the repo; this is its CI-resident,
bounded descendant — every configuration must train, predict, persist, and
reload without error, and the reloaded model must reproduce predictions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.io import load_model, save_model
from gpr_tpu.io.checkpoint import artifact_from_trained
from gpr_tpu.kernels import (Const, LinArd, LinOne, Matern32,
                             Matern52, SeFat, SeIso)
from gpr_tpu.models import (
    co_variance_predictor,
    calc_stats,
    mean_predictor,
    predict_means,
    predict_variances,
)
from gpr_tpu.models.predict import CoVariancePredictor, MeanPredictor
from gpr_tpu.optim.train import train

FAMILIES = [SeIso, SeFat, LinOne, LinArd, Const, Matern32, Matern52]


def _family_params(rng, family, X, m):
    if family is SeFat:
        d = X.shape[1]
        opts = rng.integers(0, 2, 3)
        return SeFat.Params(
            d=d,
            log_sf2=jnp.asarray(0.1),
            tproj=jnp.asarray(rng.standard_normal((d, d)) / d)
            if opts[0] else None,
            log_hetero_skedasticity=jnp.full((m,), -4.0) if opts[1] else None,
            log_multiscales_m05=jnp.zeros((m, d)) if opts[2] else None,
        )
    return family.default_params(X, m)


@pytest.mark.parametrize("seed", range(10))
def test_random_workflow(seed):
    rng = np.random.default_rng(1000 + seed)
    family = FAMILIES[int(rng.integers(len(FAMILIES)))]
    n = int(rng.integers(40, 200))
    d = int(rng.integers(1, 5))
    m = int(rng.integers(2, min(12, n // 3)))
    variational = bool(rng.integers(2))
    block_size = int(rng.choice([0, 16, 64]))  # 0 = dense objective

    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.2 * rng.standard_normal(n))
    params = _family_params(rng, family, X, m)

    result = train(
        family, X, y,
        kernel_params=params,
        n_rand_inducing=m,
        variational=variational,
        block_size=block_size or None,
        max_iter=int(rng.integers(2, 6)),
        key=jax.random.PRNGKey(seed),
    )
    assert np.isfinite(float(result.l))
    st = calc_stats(result.trained)
    assert np.isfinite(float(st.smse))

    # predict at fresh points
    Xs = jnp.asarray(rng.standard_normal((17, d)))
    p = result.kernel_params
    mp = MeanPredictor(z=result.model.inducing.z, coeffs=result.coeffs)
    cvp = CoVariancePredictor(
        z=result.model.inducing.z,
        chol_km=result.model.inducing.chol_km,
        r_mat=result.model.r_mat,
    )
    mu = predict_means(family, p, mp, Xs)
    var = predict_variances(family, p, cvp, Xs, result.sigma2)
    assert bool(jnp.all(jnp.isfinite(mu))) and bool(jnp.all(var > 0))

    # persistence round trip (works for streaming and dense trained states)
    art = artifact_from_trained(family, result.trained, kernel_params=p)
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.npz")
        save_model(path, art)
        art2, _ = load_model(path)
    mp2 = MeanPredictor(z=jnp.asarray(art2.inducing),
                        coeffs=jnp.asarray(art2.coeffs))
    mu2 = predict_means(family, art2.kernel_params, mp2, Xs)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu), rtol=1e-10,
                               atol=1e-12)
