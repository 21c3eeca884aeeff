"""Warped sparse GP: identity limit, inverse roundtrip, FD gradients,
quadrature sanity, and a skewed-data fit where the warp earns its keep."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.streaming import streaming_log_evidence
from gpr_tpu.models.warped import (
    WarpParams,
    default_warp_params,
    warp,
    warp_deriv,
    warp_inv,
    warped_log_evidence,
    warped_predict_mean,
    warped_predict_median,
    warped_predict_quantile,
)

SIGMA2 = 0.3


def data(rng, n=160, m=8, d=2):
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    return X, Z, y, p


def big_warp():
    return WarpParams(
        log_a=jnp.asarray([0.0, -0.5]),
        log_b=jnp.asarray([0.3, -0.2]),
        c=jnp.asarray([0.4, -0.7]),
    )


def test_identity_limit(rng):
    X, Z, y, p = data(rng)
    wp = WarpParams(log_a=jnp.full((3,), -20.0), log_b=jnp.zeros((3,)),
                    c=jnp.linspace(-1, 1, 3))
    lw = warped_log_evidence(SeIso, p, wp, Z, SIGMA2, X, y, block_size=64)
    l0 = streaming_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=64)
    np.testing.assert_allclose(float(lw), float(l0), rtol=1e-7)


def test_warp_monotone_and_inverse(rng):
    wp = big_warp()
    y = jnp.asarray(np.sort(rng.standard_normal(50) * 3))
    t = warp(wp, y)
    assert bool(jnp.all(jnp.diff(t) > 0))
    assert bool(jnp.all(warp_deriv(wp, y) >= 1.0))
    back = warp_inv(wp, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(y), atol=1e-10)


def test_gradients_finite_difference(rng):
    X, Z, y, p = data(rng, n=90, m=5)
    wp = big_warp()

    def f(wp):
        return warped_log_evidence(SeIso, p, wp, Z, SIGMA2, X, y,
                                   block_size=32)

    g = jax.grad(f)(wp)
    eps = 1e-6
    for field in ("log_a", "log_b", "c"):
        for i in range(2):
            wp_p = dataclasses.replace(
                wp, **{field: getattr(wp, field).at[i].add(eps)})
            wp_m = dataclasses.replace(
                wp, **{field: getattr(wp, field).at[i].add(-eps)})
            fd = (float(f(wp_p)) - float(f(wp_m))) / (2 * eps)
            np.testing.assert_allclose(
                float(getattr(g, field)[i]), fd, rtol=1e-5, atol=1e-8,
            )


def test_predictive_quantities(rng):
    wp = big_warp()
    mu = jnp.asarray(rng.standard_normal(12))
    var = jnp.asarray(0.1 + rng.random(12))
    med = warped_predict_median(wp, mu)
    np.testing.assert_allclose(np.asarray(warp(wp, med)), np.asarray(mu),
                               atol=1e-10)
    lo = warped_predict_quantile(wp, mu, var, 0.025)
    hi = warped_predict_quantile(wp, mu, var, 0.975)
    assert bool(jnp.all(lo < med)) and bool(jnp.all(med < hi))
    mean = warped_predict_mean(wp, mu, var)
    assert mean.shape == mu.shape
    # identity warp: GH mean must equal the latent mean
    wid = WarpParams(log_a=jnp.full((2,), -20.0), log_b=jnp.zeros((2,)),
                     c=jnp.zeros((2,)))
    np.testing.assert_allclose(
        np.asarray(warped_predict_mean(wid, mu, var)), np.asarray(mu),
        atol=1e-7,
    )


def test_warp_earns_evidence_on_skewed_targets(rng):
    """Targets pushed through a cubic-ish monotone squash: training the
    warp jointly must beat the unwarped model's best evidence."""
    from gpr_tpu.optim import make_pack
    from gpr_tpu.optim.lbfgs_device import fit_packed_objective

    n, d, m = 200, 1, 8
    X = jnp.asarray(np.sort(rng.standard_normal(n))[:, None] * 2)
    f_lat = np.sin(1.5 * np.asarray(X[:, 0]))
    t = f_lat + 0.15 * rng.standard_normal(n)
    y = jnp.asarray(np.sign(t) * np.abs(t) ** (1.0 / 3.0))  # skewing inverse
    y = (y - y.mean()) / y.std()
    Z = X[:: n // m][:m]
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))

    pack = make_pack(SeIso, p0, Z, 0.3)
    wp0 = default_warp_params(2)
    wflat, unravel = ravel_pytree(wp0)
    k = pack.x0.shape[0]

    def fg_warped(x, X, y):
        def f(x):
            params, z, s2 = pack.unpack(x[:k])
            wp = unravel(x[k:])
            return -warped_log_evidence(SeIso, params, wp, z, s2, X, y,
                                        block_size=64) / X.shape[0]
        return jax.value_and_grad(f)(x)

    def fg_plain(x, X, y):
        def f(x):
            params, z, s2 = pack.unpack(x)
            return -streaming_log_evidence(SeIso, params, z, s2, X, y,
                                           block_size=64) / X.shape[0]
        return jax.value_and_grad(f)(x)

    pack_w = dataclasses.replace(pack, x0=jnp.concatenate([pack.x0, wflat]))
    st_w = fit_packed_objective(fg_warped, pack_w, (X, y), max_iter=80,
                                epsabs=1e-5)
    st_p = fit_packed_objective(fg_plain, pack, (X, y), max_iter=80,
                                epsabs=1e-5)
    assert not bool(st_w.failed)
    # mean log evidence: warped must win by a clear margin on skewed data
    assert float(st_w.f) < float(st_p.f) - 0.02, (
        float(st_w.f), float(st_p.f),
    )


def test_fit_warped_convenience(rng):
    """fit_warped (the packaged joint trainer) improves the warped
    evidence and round-trips through make_warped_pack."""
    from gpr_tpu.models.warped import fit_warped, make_warped_pack
    from gpr_tpu.optim import make_pack

    X, Z, y, p0 = data(rng, n=120, m=6)
    y = jnp.sign(y) * jnp.abs(y) ** (1.0 / 3.0)
    wp0 = default_warp_params(2)
    pack = make_pack(SeIso, p0, Z, SIGMA2)

    pack_w, unpack_w = make_warped_pack(pack, wp0)
    pr, zr, s2r, wpr = unpack_w(pack_w.x0)
    np.testing.assert_allclose(np.asarray(wpr.c), np.asarray(wp0.c))
    np.testing.assert_allclose(np.asarray(zr), np.asarray(Z))

    ev0 = warped_log_evidence(SeIso, p0, wp0, Z, SIGMA2, X, y,
                              block_size=64)
    params, z, s2, wp, st = fit_warped(
        SeIso, X, y, pack, wp0, block_size=64, max_iter=40, epsabs=1e-5,
    )
    assert not bool(st.failed)
    ev1 = warped_log_evidence(SeIso, params, wp, z, s2, X, y,
                              block_size=64)
    assert float(ev1) > float(ev0) + 1.0, (float(ev0), float(ev1))
