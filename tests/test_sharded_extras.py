"""TSQR distributed evidence and sharded prediction vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.models import (
    calc_model,
    calc_trained,
    co_variance_predictor,
    log_evidence,
    mean_predictor,
    predict_means,
    predict_variances,
)
from gpr_tpu.parallel import (
    make_mesh,
    shard_batch,
    sharded_log_evidence_tsqr,
    sharded_predict_means,
    sharded_predict_variances,
)

SIGMA2 = 0.3


def data(rng, n=400, m=11, d=3):
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    return X, Z, y, p


@pytest.mark.parametrize("variational", [False, True])
@pytest.mark.parametrize("n", [400, 401])
def test_tsqr_sharded_matches_qr_dense(rng, variational, n):
    X, Z, y, p = data(rng, n=n)
    mesh = make_mesh(8)
    Xs, ys, mask = shard_batch(mesh, X, y)
    sharded = sharded_log_evidence_tsqr(
        SeIso, mesh, p, Z, SIGMA2, Xs, ys, mask, variational=variational
    )
    dense = log_evidence(SeIso, p, Z, SIGMA2, X, y, variational=variational,
                         factorization="qr")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-12)


def test_tsqr_sharded_gradients(rng):
    X, Z, y, p = data(rng, n=240, m=6)
    mesh = make_mesh(8)
    Xs, ys, mask = shard_batch(mesh, X, y)

    def f_sh(p_, z, s2):
        return sharded_log_evidence_tsqr(SeIso, mesh, p_, z, s2, Xs, ys, mask)

    def f_ref(p_, z, s2):
        return log_evidence(SeIso, p_, z, s2, X, y, factorization="qr")

    gs = jax.jit(jax.grad(f_sh, argnums=(0, 1, 2)))(p, Z, SIGMA2)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(p, Z, SIGMA2)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8,
                                   atol=1e-10)


def test_sharded_prediction(rng):
    X, Z, y, p = data(rng)
    mesh = make_mesh(8)
    model = calc_model(SeIso, p, X, Z, SIGMA2, factorization="chol")
    trained = calc_trained(model, y)
    mp, cvp = mean_predictor(trained), co_variance_predictor(model)

    Xt = jnp.asarray(np.random.default_rng(5).standard_normal((101, 3)))
    mu_ref = predict_means(SeIso, p, mp, Xt)
    mu_sh = sharded_predict_means(SeIso, mesh, p, Z, trained.coeffs, Xt)
    np.testing.assert_allclose(np.asarray(mu_sh), np.asarray(mu_ref),
                               rtol=1e-10, atol=1e-13)

    var_ref = predict_variances(SeIso, p, cvp, Xt, SIGMA2)
    var_sh = sharded_predict_variances(
        SeIso, mesh, p, Z, cvp.chol_km, cvp.r_mat, Xt, SIGMA2
    )
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(var_ref),
                               rtol=1e-9, atol=1e-12)
