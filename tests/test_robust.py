"""Student-t robust regression (models/robust.py): heteroskedastic-evidence
correctness vs a dense oracle, ELBO monotonicity across E-steps, outlier
identification, and the headline robustness comparison where the Gaussian
fit measurably breaks."""

import numpy as np
from scipy.stats import multivariate_normal

import jax
import jax.numpy as jnp
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify import _fitc_prior
from gpr_tpu.models.fitc import log_evidence
from gpr_tpu.models.robust import (
    fit_t,
    t_elbo,
    t_em_sweeps,
    t_lambda_update,
    t_posterior_moments,
    t_predict,
)
from gpr_tpu.optim import make_pack

PARAMS = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.3))


def _setup(rng, n=24, m=6):
    X = jnp.asarray(rng.standard_normal((n, 2)))
    z = jnp.asarray(rng.standard_normal((m, 2)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(axis=1))
                    + 0.1 * rng.standard_normal(n))
    return X, z, y


def test_hetero_posterior_matches_dense(rng):
    X, z, y = _setup(rng)
    lam = jnp.asarray(rng.uniform(0.2, 2.0, len(y)))
    sigma2 = 0.3
    mu, var, _tr = t_posterior_moments(SeIso, PARAMS, z, sigma2, X, y, lam)

    _, v, d = _fitc_prior(SeIso, PARAMS, z, X, None)
    K = np.asarray(v @ v.T) + np.diag(np.asarray(d))
    S = K + np.diag(np.asarray(sigma2 / lam))
    mu_d = K @ np.linalg.solve(S, np.asarray(y))
    var_d = np.diag(K - K @ np.linalg.solve(S, K))
    np.testing.assert_allclose(np.asarray(mu), mu_d, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), var_d, atol=1e-9)


def test_elbo_increases_across_e_steps(rng):
    X, z, y = _setup(rng)
    nu, sigma2 = 4.0, 0.2
    vals = []
    for sweeps in (1, 2, 4, 8):
        lam, pair = t_em_sweeps(
            SeIso, PARAMS, z, sigma2, X, y, nu=nu, sweeps=sweeps
        )
        vals.append(float(t_elbo(SeIso, PARAMS, z, sigma2, X, y, pair)(nu)))
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:])), vals
    # and the ELBO lower-bounds the true t log likelihood's Gaussian
    # counterpart sanity: finite
    assert np.isfinite(vals[-1])


def test_lambda_flags_outliers(rng):
    X, z, y = _setup(rng, n=30)
    yn = np.asarray(y).copy()
    bad = [3, 17, 25]
    yn[bad] += np.array([6.0, -7.0, 9.0])
    y2 = jnp.asarray(yn)
    lam, _ = t_em_sweeps(SeIso, PARAMS, z, 0.05, X, y2, nu=4.0, sweeps=12)
    lam = np.asarray(lam)
    good = np.setdiff1d(np.arange(30), bad)
    assert lam[bad].max() < 0.05, lam[bad]
    assert np.median(lam[good]) > 0.5, np.median(lam[good])


@pytest.mark.slow
def test_robust_fit_beats_gaussian_on_corrupted_data(rng):
    n = 120
    X = jnp.asarray(np.sort(rng.uniform(-3, 3, n))[:, None])
    f_true = np.sin(2.0 * np.asarray(X[:, 0]))
    yn = f_true + 0.1 * rng.standard_normal(n)
    bad = rng.choice(n, 8, replace=False)
    yn[bad] += rng.choice([-1, 1], 8) * rng.uniform(4, 8, 8)
    y = jnp.asarray(yn)

    params = SeIso.default_params(X, 10)
    z0 = X[:: n // 10][:10]

    # robust fit
    pack = make_pack(SeIso, params, z0, 0.5)
    p_t, z_t, s2_t, lam, st_t = fit_t(
        SeIso, X, y, pack, nu=4.0, n_em=5, m_step_iters=25
    )
    mu_t, _, _ = t_predict(SeIso, p_t, z_t, s2_t, X, y, lam, X, nu=4.0)

    # gaussian fit (same budget)
    from gpr_tpu.optim.lbfgs_device import fit_packed_objective

    pack_g = make_pack(SeIso, params, z0, 0.5)

    def fg(x, X, y):
        def f(x):
            p, zz, s2 = pack_g.unpack(x)
            return -log_evidence(SeIso, p, zz, s2, X, y) / X.shape[0]

        return jax.value_and_grad(f)(x)

    st_g = fit_packed_objective(fg, pack_g, (X, y), max_iter=125)
    p_g, z_g, s2_g = pack_g.unpack(st_g.x)
    from gpr_tpu.models.fitc import calc_model, calc_trained, calc_means

    tr_g = calc_trained(calc_model(SeIso, p_g, X, z_g, s2_g), y)
    mu_g = calc_means(tr_g)

    rmse_t = float(np.sqrt(np.mean((np.asarray(mu_t) - f_true) ** 2)))
    rmse_g = float(np.sqrt(np.mean((np.asarray(mu_g) - f_true) ** 2)))
    assert rmse_t < 0.2, rmse_t
    assert rmse_t < 0.5 * rmse_g, (rmse_t, rmse_g)
    # the corrupted rows are identified
    assert np.asarray(lam)[bad].max() < 0.2


def test_t_em_is_jittable(rng):
    X, z, y = _setup(rng)

    @jax.jit
    def run(y):
        lam, pair = t_em_sweeps(SeIso, PARAMS, z, 0.2, X, y, nu=3.0, sweeps=5)
        return lam

    lam = run(y)
    assert np.isfinite(np.asarray(lam)).all()
    assert (np.asarray(lam) > 0).all()


def test_nu_selection_direction(rng):
    """The ELBO score must point the right way: heavy-tailed (t(2.5))
    noise prefers a small nu, clean Gaussian noise a large one.  n must
    be large enough for tail events to actually occur (at n ~ 80 a tame
    t draw legitimately scores like a Gaussian — measured)."""
    from gpr_tpu.models.robust import t_select_nu

    n = 300
    X = jnp.asarray(np.sort(rng.uniform(-3, 3, n))[:, None])
    f = np.sin(2.0 * np.asarray(X[:, 0]))
    sigma2 = 0.04
    grid = (2.5, 4.0, 10.0, 50.0)

    y_t = jnp.asarray(f + np.sqrt(sigma2) * rng.standard_t(2.5, n))
    y_g = jnp.asarray(f + np.sqrt(sigma2) * rng.standard_normal(n))
    params = SeIso.Params(log_ell=jnp.asarray(-0.3), log_sf2=jnp.asarray(0.0))
    z = X[:: n // 10][:10]

    nu_t, sc_t = t_select_nu(SeIso, params, z, sigma2, X, y_t, nu_grid=grid)
    nu_g, sc_g = t_select_nu(SeIso, params, z, sigma2, X, y_g, nu_grid=grid)
    assert nu_t <= 4.0, (nu_t, sc_t)
    assert nu_g >= 10.0, (nu_g, sc_g)


def test_streaming_hetero_evidence_matches_dense(rng):
    """Per-row noise is a first-class streaming input: value AND grads
    (incl. the noise-vector cotangent) match the materialized evidence at
    an arbitrary block partition."""
    from gpr_tpu.models.streaming import streaming_log_evidence

    X, z, y = _setup(rng, n=37)
    noise = jnp.asarray(rng.uniform(0.1, 1.0, 37))

    def f_d(p, nz):
        return log_evidence(SeIso, p, z, nz, X, y)

    def f_s(p, nz):
        return streaming_log_evidence(SeIso, p, z, nz, X, y, block_size=8)

    ld, gd = jax.value_and_grad(f_d, argnums=(0, 1))(PARAMS, noise)
    ls, gs = jax.value_and_grad(f_s, argnums=(0, 1))(PARAMS, noise)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-11)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-12)


def test_blocked_t_moments_match_materialized(rng):
    X, z, y = _setup(rng, n=41)
    lam = jnp.asarray(rng.uniform(0.2, 2.0, 41))
    mu_d, var_d, _ = t_posterior_moments(SeIso, PARAMS, z, 0.3, X, y, lam)
    mu_b, var_b, _ = t_posterior_moments(
        SeIso, PARAMS, z, 0.3, X, y, lam, block_size=7
    )
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_d),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_d),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_fit_t_streaming_matches_materialized(rng):
    X, z0, y = _setup(rng, n=60)
    yn = np.asarray(y).copy()
    yn[[5, 40]] += [6.0, -5.0]
    y = jnp.asarray(yn)
    pack = make_pack(SeIso, PARAMS, z0, 0.4)
    p_m, z_m, s2_m, lam_m, st_m = fit_t(
        SeIso, X, y, pack, nu=4.0, n_em=3, m_step_iters=10
    )
    p_s, z_s, s2_s, lam_s, st_s = fit_t(
        SeIso, X, y, pack, nu=4.0, n_em=3, m_step_iters=10, block_size=16
    )
    np.testing.assert_allclose(np.asarray(st_s.x), np.asarray(st_m.x),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lam_s), np.asarray(lam_m),
                               rtol=1e-6, atol=1e-8)
