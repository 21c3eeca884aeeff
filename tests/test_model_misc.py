"""update_sigma2, inducing selection, weighted_eval helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import SeIso
from gpr_tpu.kernels.base import choose_subset, weighted_eval, weighted_eval_one
from gpr_tpu.models import (
    calc_model,
    calc_trained,
    choose_n_first_inputs,
    choose_n_random_inputs,
    co_variance_coeffs,
    update_sigma2,
)


def setup(rng):
    X = jnp.asarray(rng.standard_normal((30, 2)))
    Z = jnp.asarray(rng.standard_normal((5, 2)))
    y = jnp.asarray(rng.standard_normal(30))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    return p, X, Z, y


def test_update_sigma2_matches_fresh_model(rng):
    """fitc_gp.ml:234-236: recompute s/R/l1 for new noise, reusing Knm/V."""
    p, X, Z, y = setup(rng)
    m1 = calc_model(SeIso, p, X, Z, 0.5)
    m2 = update_sigma2(m1, 0.9)
    fresh = calc_model(SeIso, p, X, Z, 0.9)
    np.testing.assert_allclose(float(m2.l1), float(fresh.l1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(m2.r_mat), np.asarray(fresh.r_mat),
                               rtol=1e-10)
    t2 = calc_trained(m2, y)
    tf = calc_trained(fresh, y)
    np.testing.assert_allclose(float(t2.l), float(tf.l), rtol=1e-12)


def test_update_sigma2_variational(rng):
    p, X, Z, y = setup(rng)
    m1 = calc_model(SeIso, p, X, Z, 0.5, variational=True)
    m2 = update_sigma2(m1, 0.9, variational=True)
    fresh = calc_model(SeIso, p, X, Z, 0.9, variational=True)
    np.testing.assert_allclose(float(m2.l1), float(fresh.l1), rtol=1e-12)


def test_choose_n_first_inputs(rng):
    p, X, Z, y = setup(rng)
    z = choose_n_first_inputs(SeIso, p, X, 7)
    np.testing.assert_allclose(np.asarray(z), np.asarray(X[:7]))


def test_choose_n_random_inputs_is_subset_without_replacement(rng):
    p, X, Z, y = setup(rng)
    z = choose_n_random_inputs(jax.random.PRNGKey(0), SeIso, p, X, 10)
    xs = {tuple(np.round(row, 10)) for row in np.asarray(X)}
    zs = [tuple(np.round(row, 10)) for row in np.asarray(z)]
    assert all(r in xs for r in zs)
    assert len(set(zs)) == 10  # without replacement


def test_weighted_eval_helpers(rng):
    p, X, Z, y = setup(rng)
    coeffs = jnp.asarray(rng.standard_normal(5))
    full = np.asarray(weighted_eval(SeIso, p, X, Z, coeffs))
    ref = np.asarray(SeIso.k_cross(p, X, Z)) @ np.asarray(coeffs)
    np.testing.assert_allclose(full, ref, rtol=1e-12)
    one = float(weighted_eval_one(SeIso, p, X[2], Z, coeffs))
    np.testing.assert_allclose(one, full[2], rtol=1e-12)
    sub = choose_subset(X, jnp.asarray([3, 1, 4]))
    np.testing.assert_allclose(np.asarray(sub), np.asarray(X)[[3, 1, 4]])


def test_co_variance_coeffs_roundtrip(rng):
    """The persisted pair (chol_km, r_mat) is exactly what predictors need
    (fitc_gp.ml:255,446-448)."""
    p, X, Z, y = setup(rng)
    model = calc_model(SeIso, p, X, Z, 0.5)
    chol_km, r_mat = co_variance_coeffs(model)
    from gpr_tpu.models.predict import CoVariancePredictor, predict_variances

    cvp = CoVariancePredictor(z=model.inducing.z, chol_km=chol_km, r_mat=r_mat)
    v = predict_variances(SeIso, p, cvp, X, 0.5)
    assert bool(jnp.all(v > 0))


def test_choose_kmeans_inputs_covers_clusters(rng):
    """k-means init puts one centroid near each well-separated cluster
    and beats a random subset on evidence for clustered data (the
    extension's justification; the reference only samples,
    fitc_gp.ml:74-89)."""
    from gpr_tpu.models import choose_kmeans_inputs, log_evidence

    centers = np.array([[-6.0, 0.0], [0.0, 6.0], [6.0, 0.0], [0.0, -6.0]])
    X = jnp.asarray(
        np.concatenate([c + 0.3 * rng.standard_normal((40, 2))
                        for c in centers])
    )
    params = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    key = jax.random.PRNGKey(0)
    Z = choose_kmeans_inputs(key, SeIso, params, X, 4, iters=25)
    assert Z.shape == (4, 2)
    # every true center has a centroid within the cluster radius
    d = np.sqrt(((np.asarray(Z)[:, None, :] - centers[None]) ** 2).sum(-1))
    assert d.min(axis=0).max() < 1.0, d.min(axis=0)

    # evidence with m=4 kmeans centroids beats m=4 random rows on
    # clustered data (random often doubles up a cluster)
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)))
    from gpr_tpu.models import choose_n_random_inputs

    ev_km = float(log_evidence(SeIso, params, Z, 0.05, X, y))
    evs_rand = [
        float(log_evidence(
            SeIso, params,
            choose_n_random_inputs(jax.random.PRNGKey(s), SeIso, params, X, 4),
            0.05, X, y,
        ))
        for s in range(5)
    ]
    assert ev_km >= max(evs_rand) - 1e-6, (ev_km, evs_rand)

    # subsample path: statically bounded and still in-bounds
    Z2 = choose_kmeans_inputs(key, SeIso, params, X, 4, subsample=64)
    assert Z2.shape == (4, 2) and bool(jnp.all(jnp.isfinite(Z2)))
