"""Periodic family (extension beyond the reference's five kernels) —
value spot checks vs the naive per-dim formula, exact periodicity, FD
derivatives, engine + streaming integration on a genuinely periodic
signal."""

import jax
import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import Periodic
from gpr_tpu.kernels.base import k_upper_cols
from gpr_tpu.models import log_evidence
from gpr_tpu.models.streaming import streaming_log_evidence
from gpr_tpu.optim.train import train
from gpr_tpu.testing import check_deriv_hyper


def _naive_k(p, X, Z):
    """The textbook exp-sine-squared, per-dim differences."""
    ell2 = np.exp(2.0 * float(p.log_ell))
    sf2 = np.exp(float(p.log_sf2))
    period = np.exp(float(p.log_period))
    diff = np.asarray(X)[:, None, :] - np.asarray(Z)[None, :, :]
    s = np.sum(np.sin(np.pi * diff / period) ** 2, axis=-1)
    return sf2 * np.exp(-2.0 * s / ell2)


def test_periodic_matches_naive_formula(rng):
    X = jnp.asarray(rng.standard_normal((14, 3)))
    Z = jnp.asarray(rng.standard_normal((6, 3)))
    p = Periodic.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.2),
                        log_period=jnp.asarray(-0.4))
    np.testing.assert_allclose(
        np.asarray(Periodic.k_cross(p, X, Z)), _naive_k(p, X, Z), rtol=1e-9
    )
    k = np.asarray(Periodic.k_upper(p, Z))
    np.testing.assert_allclose(np.diag(k), np.exp(0.2), rtol=1e-12)


def test_periodic_is_periodic(rng):
    """k(x, z + period * integers) == k(x, z) exactly (up to trig
    rounding) — the property no other shipped family has."""
    X = jnp.asarray(rng.standard_normal((8, 2)))
    Z = jnp.asarray(rng.standard_normal((5, 2)))
    p = Periodic.Params(log_ell=jnp.asarray(0.1), log_sf2=jnp.asarray(0.0),
                        log_period=jnp.asarray(0.5))
    period = float(jnp.exp(p.log_period))
    shift = period * jnp.asarray(rng.integers(-3, 4, Z.shape))
    np.testing.assert_allclose(
        np.asarray(Periodic.k_cross(p, X, Z + shift)),
        np.asarray(Periodic.k_cross(p, X, Z)), rtol=1e-7, atol=1e-10,
    )


def test_periodic_fd_derivatives(rng):
    X = jnp.asarray(rng.standard_normal((60, 2)))
    Z = jnp.asarray(rng.standard_normal((6, 2)))
    p = Periodic.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1),
                        log_period=jnp.asarray(0.3))
    assert check_deriv_hyper(Periodic, p, Z, X) > 0


def test_periodic_k_upper_cols(rng):
    X = jnp.asarray(rng.standard_normal((30, 3)))
    p = Periodic.default_params(X, 9)
    Z = Periodic.inducing_from_inputs(p, X[:9])
    full = Periodic.k_upper(p, Z)
    blk = k_upper_cols(Periodic, p, Z, 3, 3)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(full[:, 3:6]),
                               rtol=1e-12)


def test_periodic_end_to_end(rng):
    """Periodic signal: the periodic kernel fits what it is for, and the
    streaming evidence agrees with the dense one."""
    from gpr_tpu.models import calc_stats

    n = 300
    Xn = rng.uniform(-3.0, 3.0, (n, 1))
    yn = np.sin(2.0 * np.pi * Xn[:, 0]) + 0.1 * rng.standard_normal(n)
    X, y = jnp.asarray(Xn), jnp.asarray(yn)
    result = train(Periodic, X, y, n_rand_inducing=10, variational=True,
                   max_iter=40, key=jax.random.PRNGKey(0))
    assert float(calc_stats(result.trained).smse) < 0.2
    s = streaming_log_evidence(Periodic, result.kernel_params,
                               result.inducing, result.sigma2, X, y,
                               block_size=64)
    d = log_evidence(Periodic, result.kernel_params, result.inducing,
                     result.sigma2, X, y, factorization="chol")
    np.testing.assert_allclose(float(s), float(d), rtol=1e-10)
