"""Matérn families (extension beyond the reference's five kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import Matern32, Matern52
from gpr_tpu.kernels.base import k_upper_cols
from gpr_tpu.models import log_evidence
from gpr_tpu.models.streaming import streaming_log_evidence
from gpr_tpu.optim.train import train
from gpr_tpu.testing import check_deriv_hyper


@pytest.mark.parametrize("family", [Matern32, Matern52])
def test_matern_kernel_values(rng, family):
    """Closed-form spot checks of the Matérn formulas."""
    p = family.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.2))
    ell, sf2 = np.exp(0.3), np.exp(0.2)
    x = jnp.asarray([[0.0], [1.3]])
    k = np.asarray(family.k_upper(p, x))
    r = 1.3
    a = (np.sqrt(5) if family is Matern52 else np.sqrt(3)) / ell
    poly = (1 + a * r + (a * r) ** 2 / 3) if family is Matern52 else (1 + a * r)
    np.testing.assert_allclose(k[0, 1], sf2 * poly * np.exp(-a * r),
                               rtol=1e-12)
    np.testing.assert_allclose(k[0, 0], sf2, rtol=1e-12)


@pytest.mark.parametrize("family", [Matern32, Matern52])
def test_matern_grads_finite_at_coincident_points(rng, family):
    """Inducing gradients stay finite when Z contains duplicated points
    (the sqrt-at-zero AD guard)."""
    X = jnp.asarray(rng.standard_normal((40, 2)))
    y = jnp.asarray(rng.standard_normal(40))
    Z = jnp.concatenate([X[:3], X[:1]])  # duplicate row
    p = family.default_params(X, 4)

    def f(p, Z, s2):
        return log_evidence(family, p, Z, s2, X, y, factorization="chol")

    v, g = jax.value_and_grad(f, argnums=(0, 1, 2))(p, Z, jnp.asarray(0.5))
    assert np.isfinite(float(v))
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize("family", [Matern32, Matern52])
def test_matern_fd_derivatives(rng, family):
    X = jnp.asarray(rng.standard_normal((60, 2)))
    Z = jnp.asarray(rng.standard_normal((6, 2)))
    p = family.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    assert check_deriv_hyper(family, p, Z, X) > 0


def test_matern_end_to_end_and_streaming(rng):
    from gpr_tpu.datasets import gen_data

    Xn, yn, f = gen_data(4, n=300)
    X, y = jnp.asarray(Xn), jnp.asarray(yn)
    result = train(Matern52, X, y, n_rand_inducing=8, variational=True,
                   max_iter=40, key=jax.random.PRNGKey(0))
    from gpr_tpu.models import calc_stats

    assert float(calc_stats(result.trained).smse) < 0.5
    # streaming == dense
    s = streaming_log_evidence(Matern52, result.kernel_params,
                               result.inducing, result.sigma2, X, y,
                               block_size=64)
    d = log_evidence(Matern52, result.kernel_params, result.inducing,
                     result.sigma2, X, y, factorization="chol")
    np.testing.assert_allclose(float(s), float(d), rtol=1e-11)


def test_matern_k_upper_cols(rng):
    X = jnp.asarray(rng.standard_normal((30, 3)))
    for family in (Matern32, Matern52):
        p = family.default_params(X, 9)
        Z = family.inducing_from_inputs(p, X[:9])
        full = family.k_upper(p, Z)
        blk = k_upper_cols(family, p, Z, 3, 3)
        np.testing.assert_allclose(np.asarray(blk),
                                   np.asarray(full[:, 3:6]), rtol=1e-12)


@pytest.mark.parametrize("family", [Matern32, Matern52])
def test_matern_streaming_custom_vjp_grads(rng, family):
    """The default hand-fused VJP == dense AD for Matérn, including a
    duplicated inducing point (the _safe_r double-where under the generic
    per-tile pullback)."""
    X = jnp.asarray(rng.standard_normal((80, 2)))
    y = jnp.asarray(rng.standard_normal(80))
    Z = jnp.concatenate([X[:5], X[:1]])  # duplicate
    p = family.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))

    def f_stream(p, Z, s2):
        return streaming_log_evidence(family, p, Z, s2, X, y, block_size=16)

    def f_dense(p, Z, s2):
        return log_evidence(family, p, Z, s2, X, y, factorization="chol")

    v_s, g_s = jax.value_and_grad(f_stream, argnums=(0, 1, 2))(
        p, Z, jnp.asarray(0.5))
    v_d, g_d = jax.value_and_grad(f_dense, argnums=(0, 1, 2))(
        p, Z, jnp.asarray(0.5))
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-11)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_s)):
        assert np.all(np.isfinite(np.asarray(b)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8,
                                   atol=1e-10)
