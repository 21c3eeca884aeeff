"""Kernel combinators (sum / product): composition correctness, gradients
through every term, persistence, streaming parity, and the explicit-basis
equivalence (const + linear + SE == GP with an integrated-out linear mean,
GPML section 2.7) that motivates them.  The reference has no composition
mechanism; these are validated against per-term manual composition and the
same FD harness every base family passes (tests/test_derivatives.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import (
    Const,
    LinArd,
    LinOne,
    Periodic,
    SeIso,
    product_family,
    resolve_family,
    sum_family,
)
from gpr_tpu.kernels.base import k_upper_cols
from gpr_tpu.models.fitc import calc_model, calc_trained, log_evidence
from gpr_tpu.models.predict import MeanPredictor, predict_means
from gpr_tpu.testing import check_deriv_hyper, self_test

SUM3 = sum_family(SeIso, LinArd, Const)
PROD2 = product_family(Periodic, SeIso)
NESTED = sum_family(PROD2, LinOne)


def _data(rng, family, n=12, d=3, m=5):
    X = jnp.asarray(rng.standard_normal((n, d)))
    params = family.default_params(X, m, key=jax.random.PRNGKey(3))
    Z = family.inducing_from_inputs(params, X[:m])
    y = jnp.asarray(rng.standard_normal(n))
    return params, Z, X, y


def test_sum_matches_manual_composition(rng):
    params, Z, X, _ = _data(rng, SUM3)
    terms = (SeIso, LinArd, Const)
    expect_cross = sum(
        t.k_cross(tp, X, t.inducing_from_inputs(tp, Z))
        for t, tp in zip(terms, params.terms)
    )
    expect_diag = sum(t.k_diag(tp, X) for t, tp in zip(terms, params.terms))
    np.testing.assert_allclose(SUM3.k_cross(params, X, Z), expect_cross, rtol=1e-12)
    np.testing.assert_allclose(SUM3.k_diag(params, X), expect_diag, rtol=1e-12)
    expect_upper = sum(
        t.k_upper(tp, t.inducing_from_inputs(tp, Z))
        for t, tp in zip(terms, params.terms)
    )
    np.testing.assert_allclose(SUM3.k_upper(params, Z), expect_upper, rtol=1e-12)


def test_product_matches_manual_and_is_psd(rng):
    params, Z, X, _ = _data(rng, PROD2)
    a, b = params.terms
    expect = Periodic.k_cross(a, X, Periodic.inducing_from_inputs(a, Z)) * (
        SeIso.k_cross(b, X, Z)
    )
    np.testing.assert_allclose(PROD2.k_cross(params, X, Z), expect, rtol=1e-12)
    gram = np.asarray(PROD2.k_upper_inputs(params, X))
    w = np.linalg.eigvalsh(gram)
    assert w.min() > -1e-10  # Schur product theorem


@pytest.mark.parametrize("family", [SUM3, PROD2, NESTED], ids=lambda f: f.name)
def test_combinator_deriv_harness(rng, family):
    """The same FD gates every base family passes: kernel-matrix jvps and
    the full evidence gradient through every term's hypers and the shared
    raw-space inducing coordinates."""
    params, Z, X, y = _data(rng, family)
    assert check_deriv_hyper(family, params, Z, X) >= 3
    n = self_test(family, params, Z, X, y, 1.2, variational=True)
    assert n >= 2 + Z.size  # sigma2 + hypers + shared inducing coords


def test_name_parse_round_trip():
    assert resolve_family(SUM3.name) is SUM3
    assert resolve_family(NESTED.name) is NESTED
    assert NESTED.name == "sum(prod(periodic,se_iso),lin_one)"
    with pytest.raises(KeyError, match="unknown kernel family"):
        resolve_family("sum(se_iso,bogus)")


def test_checkpoint_round_trip(rng, tmp_path):
    from gpr_tpu.io.checkpoint import ModelArtifact, load_model, save_model

    params, Z, X, y = _data(rng, NESTED)
    model = calc_model(NESTED, params, X, Z, 0.3)
    trained = calc_trained(model, y)
    art = ModelArtifact(
        family_name=NESTED.name,
        kernel_params=params,
        inducing=np.asarray(Z),
        coeffs=np.asarray(trained.coeffs),
        chol_km=np.asarray(model.inducing.chol_km),
        r_mat=np.asarray(model.r_mat),
        sigma2=0.3,
        target_mean=0.0,
        input_means=np.zeros(X.shape[1]),
        input_stddevs=np.ones(X.shape[1]),
    )
    path = str(tmp_path / "comb.npz")
    save_model(path, art)
    art2, _ = load_model(path)
    assert art2.family is NESTED
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(art2.kernel_params),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-12)
    # served predictions identical through the reloaded artifact
    mu = predict_means(NESTED, params, MeanPredictor(z=Z, coeffs=trained.coeffs), X)
    mu2 = predict_means(
        art2.family,
        art2.kernel_params,
        MeanPredictor(
            z=jnp.asarray(art2.inducing), coeffs=jnp.asarray(art2.coeffs)
        ),
        X,
    )
    np.testing.assert_allclose(mu, mu2, rtol=1e-12)


def test_k_upper_cols_composes(rng):
    params, Z, X, _ = _data(rng, SUM3, m=6)
    full = SUM3.k_upper(params, Z)
    cols = SUM3.k_upper_cols(params, Z, 2, 3)
    np.testing.assert_allclose(cols, full[:, 2:5], rtol=1e-12, atol=1e-12)
    # and through the generic dispatcher
    cols2 = k_upper_cols(SUM3, params, Z, 2, 3)
    np.testing.assert_allclose(cols2, cols, rtol=1e-12)


def test_streaming_parity(rng):
    from gpr_tpu.models.streaming import streaming_log_evidence

    params, Z, X, y = _data(rng, SUM3, n=37)
    dense = log_evidence(SUM3, params, Z, 0.4, X, y, variational=True)
    stream = streaming_log_evidence(
        SUM3, params, Z, 0.4, X, y, variational=True, block_size=8
    )
    np.testing.assert_allclose(stream, dense, rtol=1e-9)
    # gradients too (the AD fallback pullback: no k_cross_vjp on combinators)
    g_d = jax.grad(
        lambda p: log_evidence(SUM3, p, Z, 0.4, X, y, variational=True)
    )(params)
    g_s = jax.grad(
        lambda p: streaming_log_evidence(
            SUM3, p, Z, 0.4, X, y, variational=True, block_size=8
        )
    )(params)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-10)


@pytest.mark.slow
def test_sum_kernel_is_integrated_linear_mean(rng):
    """const + lin_one + se_iso extrapolates a linear trend that a plain
    se_iso reverts to zero on — the working 'mean function' story
    (PARITY_NOTES: the reference centers targets and has no mean
    functions; composition subsumes them)."""
    import dataclasses as dc

    n = 80
    X = jnp.linspace(-3.0, 3.0, n)[:, None]
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (n,))
    # short-ell wiggle forces the SE term small; the trend must load on
    # the linear term, whose Nystrom is exact (rank d+1 <= m)
    y = 1.5 * X[:, 0] + 0.7 + 0.5 * jnp.sin(6.0 * X[:, 0]) + noise
    Xs = jnp.asarray([[5.0], [6.0]])  # well outside the data
    truth = 1.5 * Xs[:, 0] + 0.7

    def fit_predict(family):
        from gpr_tpu.optim.lbfgs_device import fit_packed_objective
        from gpr_tpu.optim.pack import make_pack

        params = family.default_params(X, 12, key=jax.random.PRNGKey(0))
        se_init = dc.replace(
            params.terms[0] if hasattr(params, "terms") else params,
            log_ell=jnp.asarray(-1.0),
        )
        params = (
            dc.replace(params, terms=(se_init,) + params.terms[1:])
            if hasattr(params, "terms")
            else se_init
        )
        Z = family.inducing_from_inputs(params, X[::6][:12])
        pack = make_pack(family, params, Z, 0.05)

        def fg(x, X, y):
            def f(x):
                p, z, s2 = pack.unpack(x)
                return -log_evidence(family, p, z, s2, X, y) / X.shape[0]

            return jax.value_and_grad(f)(x)

        st = fit_packed_objective(fg, pack, (X, y), max_iter=300, epsabs=1e-4)
        p, z, s2 = pack.unpack(st.x)
        model = calc_model(family, p, X, z, s2)
        trained = calc_trained(model, y)
        return predict_means(
            family, p, MeanPredictor(z=z, coeffs=trained.coeffs), Xs
        )

    mu_sum = fit_predict(sum_family(SeIso, LinOne))
    mu_se = fit_predict(SeIso)
    err_sum = float(jnp.max(jnp.abs(mu_sum - truth)))
    err_se = float(jnp.max(jnp.abs(mu_se - truth)))
    assert err_sum < 0.5, err_sum
    assert err_sum < 0.1 * err_se, (err_sum, err_se)
