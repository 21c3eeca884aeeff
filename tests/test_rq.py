"""Rational-quadratic family (extension beyond the reference's five
kernels) — value spot checks, FD derivatives, hand-VJP vs AD, SE limit,
engine integration."""

import jax
import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import RatQuad, SeIso
from gpr_tpu.kernels.base import k_upper_cols
from gpr_tpu.models import log_evidence
from gpr_tpu.models.streaming import streaming_log_evidence
from gpr_tpu.optim.train import train
from gpr_tpu.testing import check_deriv_hyper


def test_rq_kernel_values(rng):
    p = RatQuad.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.2),
                       log_alpha=jnp.asarray(0.4))
    ell2, sf2, alpha = np.exp(0.6), np.exp(0.2), np.exp(0.4)
    x = jnp.asarray([[0.0], [1.3]])
    k = np.asarray(RatQuad.k_upper(p, x))
    d2 = 1.3 ** 2
    np.testing.assert_allclose(
        k[0, 1], sf2 * (1 + d2 / (2 * alpha * ell2)) ** (-alpha), rtol=1e-12
    )
    np.testing.assert_allclose(k[0, 0], sf2, rtol=1e-12)


def test_rq_se_limit(rng):
    """alpha -> infinity recovers the squared exponential."""
    X = jnp.asarray(rng.standard_normal((12, 2)))
    Z = jnp.asarray(rng.standard_normal((5, 2)))
    p_rq = RatQuad.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1),
                          log_alpha=jnp.asarray(20.0))  # alpha ~ 5e8
    p_se = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    np.testing.assert_allclose(
        np.asarray(RatQuad.k_cross(p_rq, X, Z)),
        np.asarray(SeIso.k_cross(p_se, X, Z)), rtol=1e-6,
    )


def test_rq_fd_derivatives(rng):
    X = jnp.asarray(rng.standard_normal((60, 2)))
    Z = jnp.asarray(rng.standard_normal((6, 2)))
    p = RatQuad.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1),
                       log_alpha=jnp.asarray(-0.3))
    assert check_deriv_hyper(RatQuad, p, Z, X) > 0


def test_rq_streaming_custom_vjp_grads(rng):
    """Hand-fused VJP (incl. the log_alpha elementwise reduce) == dense AD."""
    X = jnp.asarray(rng.standard_normal((80, 2)))
    y = jnp.asarray(rng.standard_normal(80))
    Z = jnp.concatenate([X[:5], X[:1]])  # duplicate inducing point
    p = RatQuad.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1),
                       log_alpha=jnp.asarray(0.5))

    def f_stream(p, Z, s2):
        return streaming_log_evidence(RatQuad, p, Z, s2, X, y, block_size=16)

    def f_dense(p, Z, s2):
        return log_evidence(RatQuad, p, Z, s2, X, y, factorization="chol")

    v_s, g_s = jax.value_and_grad(f_stream, argnums=(0, 1, 2))(
        p, Z, jnp.asarray(0.5))
    v_d, g_d = jax.value_and_grad(f_dense, argnums=(0, 1, 2))(
        p, Z, jnp.asarray(0.5))
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-11)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_s)):
        assert np.all(np.isfinite(np.asarray(b)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8,
                                   atol=1e-10)


def test_rq_k_upper_cols(rng):
    X = jnp.asarray(rng.standard_normal((30, 3)))
    p = RatQuad.default_params(X, 9)
    Z = RatQuad.inducing_from_inputs(p, X[:9])
    full = RatQuad.k_upper(p, Z)
    blk = k_upper_cols(RatQuad, p, Z, 3, 3)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(full[:, 3:6]),
                               rtol=1e-12)


def test_rq_end_to_end(rng):
    from gpr_tpu.datasets import gen_data
    from gpr_tpu.models import calc_stats

    Xn, yn, _ = gen_data(5, n=300)
    X, y = jnp.asarray(Xn), jnp.asarray(yn)
    result = train(RatQuad, X, y, n_rand_inducing=8, variational=True,
                   max_iter=40, key=jax.random.PRNGKey(0))
    assert float(calc_stats(result.trained).smse) < 0.5
    s = streaming_log_evidence(RatQuad, result.kernel_params,
                               result.inducing, result.sigma2, X, y,
                               block_size=64)
    d = log_evidence(RatQuad, result.kernel_params, result.inducing,
                     result.sigma2, X, y, factorization="chol")
    np.testing.assert_allclose(float(s), float(d), rtol=1e-11)