"""Ordinal (cumulative probit) Laplace vs a dense textbook oracle over the
same FITC prior, FD gradients (kernel hypers, inducing coordinates, AND
cutpoints), exact-integral class probabilities vs Monte Carlo, and an
ordered-structure recovery fit."""

import numpy as np
import pytest
from scipy.stats import norm

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify import _fitc_prior
from gpr_tpu.models.ordinal import (
    cutpoints_from_raw,
    default_cutpoint_raw,
    fit_ordinal,
    ordinal_laplace_mode,
    ordinal_log_evidence,
    ordinal_predict,
)
from gpr_tpu.optim import make_pack

K = 4


def _setup(rng, n=30, m=6, d_in=2):
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    z = jnp.asarray(rng.standard_normal((m, d_in)))
    f_true = np.sin(np.asarray(X).sum(axis=1)) * 2.0
    cuts_true = np.array([-1.0, 0.0, 1.2])
    y = np.digitize(f_true + 0.3 * rng.standard_normal(n), cuts_true)
    params = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.4))
    cut_raw = jnp.asarray([-1.0, 0.0, 0.2])
    return X, z, jnp.asarray(y.astype(np.int32)), params, cut_raw


def _dense_prior(params, z, X):
    _, v, d = _fitc_prior(SeIso, params, z, X, None)
    return np.asarray(v @ v.T + jnp.diag(d))


def _cell_logp(f, y, cuts):
    """Straightforward f64 oracle for log p(y|f), cell by cell."""
    lo = np.concatenate([[-np.inf], cuts])[y]
    hi = np.concatenate([cuts, [np.inf]])[y]
    return np.log(norm.cdf(hi - f) - norm.cdf(lo - f))


def _cell_parts(f, y, cuts):
    lo = np.concatenate([[-np.inf], cuts])[y]
    hi = np.concatenate([cuts, [np.inf]])[y]
    p = norm.cdf(hi - f) - norm.cdf(lo - f)
    phi_lo = np.where(np.isfinite(lo), norm.pdf(lo - f), 0.0)
    phi_hi = np.where(np.isfinite(hi), norm.pdf(hi - f), 0.0)
    grad = (phi_lo - phi_hi) / p
    z0 = np.where(np.isfinite(lo), lo - f, 0.0)
    z1 = np.where(np.isfinite(hi), hi - f, 0.0)
    r0, r1 = phi_lo / p, phi_hi / p
    w = (r0 - r1) ** 2 + z1 * r1 - z0 * r0
    return grad, np.maximum(w, 1e-12)


def _dense_mode(Kmat, y, cuts, iters=200):
    n = len(y)
    kinv = np.linalg.inv(Kmat)
    f = np.zeros(n)
    for _ in range(iters):
        grad, w = _cell_parts(f, y, cuts)
        b = w * f + grad
        f_new = np.linalg.solve(kinv + np.diag(w), b)
        step = f_new - f
        t = 1.0

        def psi(g):
            return -0.5 * g @ (kinv @ g) + np.sum(_cell_logp(g, y, cuts))

        while t > 1e-8:
            if psi(f + t * step) >= psi(f):
                break
            t *= 0.5
        f = f + t * step
    return f, kinv @ f


def test_ordinal_evidence_matches_dense_oracle(rng):
    X, z, y, params, cut_raw = _setup(rng)
    cuts = np.asarray(cutpoints_from_raw(cut_raw))
    Kmat = _dense_prior(params, z, X)
    yn = np.asarray(y)
    f_d, a_d = _dense_mode(Kmat, yn, cuts)

    f_hat, a, *_ = ordinal_laplace_mode(
        SeIso, params, z, X, y, cut_raw, newton_iters=40
    )
    np.testing.assert_allclose(np.asarray(f_hat), f_d, atol=1e-7)

    _, w = _cell_parts(f_d, yn, cuts)
    sign, logdet = np.linalg.slogdet(np.eye(len(yn)) + Kmat * w[None, :])
    assert sign > 0
    ev_dense = (
        -0.5 * float(a_d @ f_d)
        + float(np.sum(_cell_logp(f_d, yn, cuts)))
        - 0.5 * logdet
    )
    ev = float(
        ordinal_log_evidence(SeIso, params, z, X, y, cut_raw, newton_iters=40)
    )
    np.testing.assert_allclose(ev, ev_dense, rtol=1e-8)


def test_ordinal_fd_gradients(rng):
    X, z, y, params, cut_raw = _setup(rng, n=22, m=5)
    pack = make_pack(SeIso, params, z, 1.0, learn_sigma2=False)
    from gpr_tpu.optim.pack import extend_pack

    ext = extend_pack(pack, cut_raw)

    def f(x):
        p, zz, _ = ext.unpack(x)
        return ordinal_log_evidence(
            SeIso, p, zz, X, y, ext.unpack_extra(x), newton_iters=30
        )

    fj = jax.jit(f)
    g = jax.jit(jax.grad(f))(ext.x0)
    x0 = np.asarray(ext.x0)
    # 1e-4 relative: FD through the quantized bisection line search carries
    # branch noise (see tests/test_poisson.py's bisection-branch FD note)
    for i in range(len(x0)):
        e = np.zeros_like(x0)
        e[i] = 1e-5
        fd = (float(fj(jnp.asarray(x0 + e))) - float(fj(jnp.asarray(x0 - e)))) / 2e-5
        assert abs(fd - float(g[i])) < 1e-4 * max(1.0, abs(fd)), (
            i, fd, float(g[i]),
        )


def test_ordinal_predict_probs(rng):
    X, z, y, params, cut_raw = _setup(rng)
    Xs = jnp.asarray(rng.standard_normal((7, 2)))
    probs, mu, var = ordinal_predict(
        SeIso, params, z, X, y, cut_raw, Xs, newton_iters=30
    )
    probs = np.asarray(probs)
    assert probs.shape == (7, K)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-10)
    assert (probs >= 0).all()
    # exactness: the probit cell integral over the latent Gaussian == MC
    cuts = np.asarray(cutpoints_from_raw(cut_raw))
    rs = np.random.default_rng(0)
    fs = np.asarray(mu)[:, None] + np.sqrt(np.asarray(var))[:, None] * (
        rs.standard_normal((7, 200_000))
    )
    lo = np.concatenate([[-np.inf], cuts])
    hi = np.concatenate([cuts, [np.inf]])
    for k in range(K):
        mc = norm.cdf(hi[k] - fs).mean(axis=1) - norm.cdf(lo[k] - fs).mean(
            axis=1
        )
        np.testing.assert_allclose(probs[:, k], mc, atol=5e-3)


@pytest.mark.slow
def test_ordinal_boundary_hardening(rng):
    """Rows far past either cutpoint (|f| >> b) must keep finite evidence
    and gradients — the log-space cell mass is the point."""
    X = jnp.asarray(np.linspace(-1, 1, 12)[:, None])
    z = X[::3]
    params = SeIso.Params(
        log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(5.0)  # huge amplitude
    )
    y = jnp.asarray((np.arange(12) % K).astype(np.int32))
    cut_raw = jnp.asarray([-8.0, 2.0, 2.0])  # wide, off-center cells

    def f(cr):
        return ordinal_log_evidence(SeIso, params, z, X, y, cr,
                                    newton_iters=25)

    val, g = jax.value_and_grad(f)(cut_raw)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_ordinal_fit_recovers_structure(rng):
    n = 200
    X = jnp.asarray(np.sort(rng.uniform(-3, 3, n))[:, None])
    f_true = np.asarray(2.0 * np.sin(1.3 * np.asarray(X[:, 0])))
    cuts_true = np.array([-1.5, 0.0, 1.5])
    y = np.digitize(f_true + 0.2 * rng.standard_normal(n), cuts_true)
    y = jnp.asarray(y.astype(np.int32))

    params = SeIso.default_params(X, 10)
    z = X[:: n // 10][:10]
    pack = make_pack(SeIso, params, z, 1.0, learn_sigma2=False)
    cut0 = default_cutpoint_raw(K)
    p_f, z_f, cut_f, st = fit_ordinal(
        SeIso, X, y, pack, cut0, newton_iters=20, max_iter=60
    )
    assert bool(np.isfinite(float(st.f)))

    probs, mu, var = ordinal_predict(
        SeIso, p_f, z_f, X, y, cut_f, X, newton_iters=20
    )
    acc = float((jnp.argmax(probs, axis=1) == y).mean())
    base = max(np.bincount(np.asarray(y)) / n)
    assert acc > base + 0.2, (acc, base)
    # cutpoints stay ordered; the latent is identified only up to the
    # near-free joint shift/scale with the cutpoints (near-separable data
    # inflates the amplitude), so the structural check is correlation of
    # the predicted latent with the truth
    cuts = np.asarray(cutpoints_from_raw(cut_f))
    assert (np.diff(cuts) > 0).all()
    mu_n = np.asarray(mu)
    corr = np.corrcoef(mu_n, f_true)[0, 1]
    assert corr > 0.95, corr
