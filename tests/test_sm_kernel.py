"""SE-ARD, cosine, and spectral-mixture kernels.

se_ard is validated against explicit numpy and against se_iso in the
isotropic limit; cosine against the cos(2 pi mu.(x-y)) definition and
its PSD feature form; the SM composition (sum of prod(se_ard, cosine),
Wilson & Adams 2013) by FD gradients, frequency recovery of a pure
tone, and the headline capability — extrapolating oscillatory structure
where a plain SE reverts to the mean.  No reference counterpart
(mmottl/gpr has no ARD-SE or spectral machinery).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import Cosine, SeArd, SeIso, resolve_family, sm_family
from gpr_tpu.kernels.base import k_upper_cols
from gpr_tpu.models.fitc import calc_model, calc_trained, log_evidence
from gpr_tpu.models.predict import mean_predictor, predict_means
from gpr_tpu.optim import make_pack
from gpr_tpu.testing import check_deriv_hyper


def test_se_ard_matches_explicit_and_iso_limit(rng):
    n, m, d = 20, 6, 3
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    ells = np.array([0.5, 1.0, 2.3])
    p = SeArd.Params(log_ells=jnp.asarray(np.log(ells)),
                     log_sf2=jnp.asarray(0.3))
    K = np.asarray(SeArd.k_cross(p, X, Z))
    d2 = (((np.asarray(X)[:, None] - np.asarray(Z)[None]) / ells) ** 2).sum(-1)
    np.testing.assert_allclose(K, np.exp(0.3) * np.exp(-0.5 * d2), rtol=1e-10)

    # isotropic limit == se_iso
    p_iso = SeArd.Params(log_ells=jnp.full((d,), 0.7), log_sf2=jnp.asarray(0.3))
    p_se = SeIso.Params(log_ell=jnp.asarray(0.7), log_sf2=jnp.asarray(0.3))
    np.testing.assert_allclose(
        SeArd.k_cross(p_iso, X, Z), SeIso.k_cross(p_se, X, Z), rtol=1e-12
    )
    np.testing.assert_allclose(
        SeArd.k_upper(p_iso, Z), SeIso.k_upper(p_se, Z), rtol=1e-12
    )
    # distributed column block
    np.testing.assert_allclose(
        k_upper_cols(SeArd, p_iso, Z, 2, 3),
        np.asarray(SeArd.k_upper(p_iso, Z))[:, 2:5],
        rtol=1e-12,
    )


def test_cosine_matches_definition_and_is_psd(rng):
    n, m, d = 18, 5, 2
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    mu = np.array([0.4, -0.15])
    p = Cosine.Params(mu=jnp.asarray(mu))
    K = np.asarray(Cosine.k_cross(p, X, Z))
    expect = np.cos(
        2 * np.pi * (np.asarray(X).dot(mu)[:, None]
                     - np.asarray(Z).dot(mu)[None, :])
    )
    np.testing.assert_allclose(K, expect, atol=1e-10)
    w = np.linalg.eigvalsh(np.asarray(Cosine.k_upper_inputs(p, X)))
    assert w.min() > -1e-9
    np.testing.assert_allclose(np.asarray(Cosine.k_diag(p, X)), 1.0)
    np.testing.assert_allclose(
        k_upper_cols(Cosine, p, Z, 1, 2),
        np.asarray(Cosine.k_upper(p, Z))[:, 1:3],
        rtol=1e-10, atol=1e-12,
    )


@pytest.mark.parametrize("family", [SeArd, Cosine], ids=lambda f: f.name)
def test_new_family_hyper_derivatives(rng, family):
    n, m, d = 14, 5, 2
    X = jnp.asarray(rng.standard_normal((n, d)))
    params = family.default_params(X, m, jax.random.PRNGKey(1))
    Z = X[:m] + 0.05 * jnp.asarray(rng.standard_normal((m, d)))
    check_deriv_hyper(family, params, Z, X, tol=1e-5)


def test_sm_family_roundtrip_and_gradients(rng):
    fam = sm_family(2)
    assert fam.name == "sum(prod(se_ard,cosine),prod(se_ard,cosine))"
    assert resolve_family(fam.name) is fam
    n, m, d = 30, 8, 1
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    params = fam.default_params(X, m, jax.random.PRNGKey(2))
    # the two components must start DISTINCT (per-term key split)
    mu0 = params.terms[0].terms[1].mu
    mu1 = params.terms[1].terms[1].mu
    assert float(jnp.abs(mu0 - mu1).max()) > 1e-3
    Z = X[:m]
    pack = make_pack(fam, params, Z, 0.1)

    def f(x):
        pp, zz, s2 = pack.unpack(x)
        return log_evidence(fam, pp, zz, s2, X, y)

    v, g = jax.value_and_grad(f)(pack.x0)
    assert np.isfinite(float(v)) and bool(jnp.all(jnp.isfinite(g)))
    eps = 1e-6
    for i in range(0, pack.n_hypers, 3):
        e = jnp.zeros(pack.n_hypers).at[i].set(eps)
        fd = (f(pack.x0 + e) - f(pack.x0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(fd), float(g[i]), rtol=2e-4,
                                   atol=1e-7)


@pytest.mark.slow
def test_sm_recovers_frequency_and_extrapolates(rng):
    """A pure tone at f0: SM(1) must learn |mu| ~ f0 and keep
    oscillating OUTSIDE the training window where plain se_iso has
    reverted to the mean."""
    from gpr_tpu.optim.lbfgs_device import fit

    f0 = 0.35
    x = np.sort(rng.uniform(0.0, 10.0, 220))
    y = np.cos(2 * np.pi * f0 * x) + 0.05 * rng.standard_normal(x.size)
    X, yj = jnp.asarray(x[:, None]), jnp.asarray(y)
    fam = sm_family(1)
    p0 = fam.default_params(X, 30, jax.random.PRNGKey(0))  # mu init 0.25ish
    pack = make_pack(fam, p0, X[::7][:30], 0.05)
    pp, zz, s2, st = fit(fam, X, yj, pack, max_iter=200, normalize=False)
    mu_hat = abs(float(pp.terms[1].mu[0]))
    assert abs(mu_hat - f0) < 0.03, mu_hat

    grid = np.linspace(10.5, 13.5, 40)  # extrapolation window
    truth = np.cos(2 * np.pi * f0 * grid)
    model = calc_model(fam, pp, X, zz, s2)
    mu = np.asarray(predict_means(
        fam, pp, mean_predictor(calc_trained(model, yj)),
        jnp.asarray(grid[:, None]),
    ))
    corr = np.corrcoef(mu, truth)[0, 1]
    amp = mu.std()
    assert corr > 0.9, corr
    assert amp > 0.3, amp  # se_iso would be ~0 out here

    # the se_iso baseline really does revert (sanity of the claim)
    p_se = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    pack_se = make_pack(SeIso, p_se, X[::7][:30], 0.05)
    ppse, zzse, s2se, _ = fit(SeIso, X, yj, pack_se, max_iter=200,
                              normalize=False)
    model_se = calc_model(SeIso, ppse, X, zzse, s2se)
    mu_se = np.asarray(predict_means(
        SeIso, ppse, mean_predictor(calc_trained(model_se, yj)),
        jnp.asarray(grid[:, None]),
    ))
    rmse_sm = float(np.sqrt(np.mean((mu - truth) ** 2)))
    rmse_se = float(np.sqrt(np.mean((mu_se - truth) ** 2)))
    assert rmse_sm < 0.5 * rmse_se, (rmse_sm, rmse_se)


def test_sm_init_from_data_finds_the_tones(rng):
    """The periodogram init must place components on BOTH spectral peaks
    of a two-tone signal (distinct-peak greedy picking), anchor one trend
    component at the window floor, and beat the blind default init on
    evidence at the init point."""
    from gpr_tpu.kernels import sm_init_from_data, sm_spectrum

    x = np.sort(rng.uniform(0, 20, 400))
    f1, f2 = 0.35, 1.2
    y = (np.cos(2 * np.pi * f1 * x) + 0.6 * np.cos(2 * np.pi * f2 * x)
         + 0.3 + 0.05 * rng.standard_normal(x.size))
    p = sm_init_from_data(3, x[:, None], y)
    mus = sorted(abs(float(t.terms[1].mu[0])) for t in p.terms)
    assert mus[0] == 0.0  # trend anchor
    assert abs(mus[1] - f1) < 0.05, mus
    assert abs(mus[2] - f2) < 0.1, mus

    # spectrum diagnostic exposes the same peaks
    (freqs, power), = sm_spectrum(x[:, None], y)
    assert abs(freqs[int(np.argmax(power))] - f1) < 0.05

    # weights split the variance; ells positive and finite
    for t in p.terms:
        assert np.isfinite(float(t.terms[0].log_sf2))
        assert np.all(np.isfinite(np.asarray(t.terms[0].log_ells)))

    # evidence at the data-driven init beats the blind default init
    fam = sm_family(3)
    X, Y = jnp.asarray(x[:, None]), jnp.asarray(y - y.mean())
    Z = X[::13][:30]
    ev_data = float(log_evidence(fam, p, Z, 0.05, X, Y))
    p_blind = fam.default_params(X, 30, jax.random.PRNGKey(0))
    ev_blind = float(log_evidence(fam, p_blind, Z, 0.05, X, Y))
    assert np.isfinite(ev_data) and ev_data > ev_blind, (ev_data, ev_blind)

    # randomized draws stay in the resolvable band and differ by seed
    p_a = sm_init_from_data(3, x[:, None], y, key=1)
    p_b = sm_init_from_data(3, x[:, None], y, key=2)
    mus_a = [abs(float(t.terms[1].mu[0])) for t in p_a.terms]
    mus_b = [abs(float(t.terms[1].mu[0])) for t in p_b.terms]
    assert mus_a != mus_b
    f_nyq = 1.0 / (2.0 * np.median(np.diff(np.sort(x))))
    assert max(mus_a + mus_b) <= f_nyq * 1.01

    # q=1 returns the bare product params; 2-D inputs work
    p1 = sm_init_from_data(1, x[:, None], y)
    assert abs(abs(float(p1.terms[1].mu[0])) - f1) < 0.05
    X2 = rng.standard_normal((100, 2))
    y2 = np.cos(2 * np.pi * 0.5 * X2[:, 0]) + X2[:, 1]
    p2d = sm_init_from_data(2, X2, y2)
    assert np.asarray(p2d.terms[1].terms[1].mu).shape == (2,)
