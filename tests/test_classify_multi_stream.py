"""Streaming softmax-Laplace multi-class vs the materialized path.

The materialized classifier (models/classify_multi.py) is dense-oracle
tested in test_classify_multi.py; here the streaming rebuild
(models/classify_multi_stream.py) must reproduce it to roundoff at any
block partition — evidence, hyper/inducing gradients, and the persistable
posterior state (which streams through the F_c = diag(q_c) V M_c identity
the materialized path does not use, so state agreement is a real check of
that algebra, not a shared code path).

Reference contrast: the reference is regression-only
(doc/manual/gpr_manual.tex:82); multi-class and its streaming are
extensions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify_multi import (
    multiclass_log_evidence,
    multiclass_posterior_state,
)
from gpr_tpu.models.classify_multi_stream import (
    stream_multiclass_log_evidence,
    stream_multiclass_predict,
    stream_multiclass_state,
)

C = 3


def _setup(rng, n=97, m=7, d_in=2):
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    z = jnp.asarray(rng.standard_normal((m, d_in)))
    labels = jnp.asarray(rng.integers(0, C, n))
    params = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.4))
    return X, z, labels, params


@pytest.mark.parametrize("block_size", [13, 97])
def test_stream_evidence_matches_materialized(rng, block_size):
    """Evidence parity at a ragged block partition (13 does not divide 97,
    exercising the padded rows through every sweep) and at one full block
    (the no-padding degenerate case)."""
    X, z, labels, params = _setup(rng)
    ev = multiclass_log_evidence(SeIso, params, z, X, labels, C,
                                 newton_iters=8)
    ev_s = stream_multiclass_log_evidence(
        SeIso, params, z, X, labels, C, block_size=block_size,
        newton_iters=8,
    )
    np.testing.assert_allclose(float(ev_s), float(ev), rtol=1e-10)


@pytest.mark.slow
def test_stream_gradients_match_materialized(rng):
    """Hyper AND inducing-coordinate gradients through the streaming
    Newton scan == the materialized path.  rtol 1e-7: the reverse pass
    through 5 Newton steps reassociates every block sum, and the
    log_sf2 cotangent lands ~2e-8 relative off in f64 — roundoff, not
    algebra (evidence and posterior state match at 1e-8/1e-10)."""
    X, z, labels, params = _setup(rng, n=61, m=5)
    gd = jax.grad(
        lambda p, z: multiclass_log_evidence(
            SeIso, p, z, X, labels, C, newton_iters=5),
        argnums=(0, 1),
    )(params, z)
    gs = jax.grad(
        lambda p, z: stream_multiclass_log_evidence(
            SeIso, p, z, X, labels, C, block_size=16, newton_iters=5),
        argnums=(0, 1),
    )(params, z)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-10)


def test_stream_posterior_state_matches_materialized(rng):
    """coeffs/a_tilde/b_tilde from the Grams-only streaming construction
    == multiclass_posterior_state (which materializes C (n, m) F_c
    matrices) — validates the B_cc' = M_c' W_cc' M_c' + g_c' H^-1 g_c'
    identity end to end."""
    X, z, labels, params = _setup(rng, n=61, m=5)
    _, c1, a1, b1 = multiclass_posterior_state(
        SeIso, params, z, X, labels, C, newton_iters=8)
    _, c2, a2, b2 = stream_multiclass_state(
        SeIso, params, z, X, labels, C, block_size=16, newton_iters=8)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1),
                               rtol=1e-8, atol=1e-10)


def test_stream_predict_probabilities(rng):
    """Streaming-served class probabilities are a proper distribution and
    match the materialized predictor on the same MC key."""
    from gpr_tpu.models.classify_multi import multiclass_predict

    X, z, labels, params = _setup(rng, n=61, m=5)
    Xstar = jnp.asarray(rng.standard_normal((9, 2)))
    key = jax.random.PRNGKey(3)
    probs_m, mu_m, _ = multiclass_predict(
        SeIso, params, z, X, labels, C, Xstar, newton_iters=8,
        n_samples=256, key=key)
    probs_s, mu_s, _ = stream_multiclass_predict(
        SeIso, params, z, X, labels, C, Xstar, block_size=16,
        newton_iters=8, n_samples=256, key=key)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_m),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(probs_s), np.asarray(probs_m),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(probs_s).sum(axis=1), 1.0,
                               rtol=1e-6)


@pytest.mark.slow
def test_sharded_stream_multiclass_matches_single(rng):
    """block_size through the mesh wrapper: streaming Newton on row shards
    (psum as the reduction hook) == the single-device materialized
    evidence, value and grads."""
    from gpr_tpu.parallel import (
        make_mesh,
        shard_batch,
        sharded_multiclass_log_evidence,
    )

    X, z, labels, params = _setup(rng, n=133, m=5, d_in=3)
    mesh = make_mesh()
    Xs, ls, mask = shard_batch(mesh, X, labels)

    single = multiclass_log_evidence(SeIso, params, z, X, labels, C,
                                     newton_iters=6)
    sharded = sharded_multiclass_log_evidence(
        SeIso, mesh, params, z, Xs, ls, C, mask, newton_iters=6,
        block_size=8,
    )
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-10)

    gd = jax.grad(
        lambda p, z: multiclass_log_evidence(
            SeIso, p, z, X, labels, C, newton_iters=4),
        argnums=(0, 1),
    )(params, z)
    gs = jax.jit(jax.grad(
        lambda p, z: sharded_multiclass_log_evidence(
            SeIso, mesh, p, z, Xs, ls, C, mask, newton_iters=4,
            block_size=8),
        argnums=(0, 1),
    ))(params, z)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)
