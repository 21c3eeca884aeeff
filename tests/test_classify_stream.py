"""Streaming classification == materialized classification.

The streaming Newton (models/classify_stream.py) reorganizes the exact
same iteration into block sweeps, so evidence, gradients, and predictions
must agree with models/classify.py to roundoff at ANY block partition —
including blocks that don't divide n (padded tail rows must contribute
exactly nothing).  Sharded + streaming composes: per-shard blocks with
psum reductions must still match the single-device materialized value.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify import classify_log_evidence, classify_predict
from gpr_tpu.parallel import make_mesh
from gpr_tpu.parallel.sharded import shard_batch


def _setup(rng, n=53, m=5, d_in=2):
    X = jnp.asarray(rng.standard_normal((n, d_in)))
    z = jnp.asarray(rng.standard_normal((m, d_in)))
    y = jnp.asarray(np.sign(rng.standard_normal(n)))
    params = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.4))
    return X, z, y, params


@pytest.mark.slow
def test_stream_evidence_and_grads_match_materialized(rng):
    X, z, y, params = _setup(rng)

    def ev(p, z, block_size):
        return classify_log_evidence(
            SeIso, p, z, X, y, newton_iters=6, block_size=block_size
        )

    base = float(ev(params, z, None))
    for bs in (16, 7, 64):  # padded tail, tiny blocks, one block
        np.testing.assert_allclose(float(ev(params, z, bs)), base,
                                   rtol=1e-10, err_msg=f"block={bs}")

    gd = jax.grad(lambda p, z: ev(p, z, None), argnums=(0, 1))(params, z)
    gs = jax.grad(lambda p, z: ev(p, z, 16), argnums=(0, 1))(params, z)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-12)


def test_stream_predict_matches_materialized(rng):
    X, z, y, params = _setup(rng, n=40)
    Xstar = jnp.asarray(rng.standard_normal((6, 2)))

    pm, mm_, vm = classify_predict(SeIso, params, z, X, y, Xstar,
                                   newton_iters=8)
    ps, ms, vs = classify_predict(SeIso, params, z, X, y, Xstar,
                                  newton_iters=8, block_size=16)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pm), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(mm_), rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vm), rtol=1e-8)


@pytest.mark.slow
def test_sharded_stream_evidence_matches_single(rng):
    """mesh + per-shard streaming (blocks that do not divide the shard)
    == single-device materialized, value and grads."""
    from gpr_tpu.parallel import sharded_classify_log_evidence

    X, z, y, params = _setup(rng, n=117)
    mesh = make_mesh()
    Xs, ys, mask = shard_batch(mesh, X, y)

    single = classify_log_evidence(SeIso, params, z, X, y, newton_iters=5)
    sharded = sharded_classify_log_evidence(
        SeIso, mesh, params, z, Xs, ys, mask, newton_iters=5, block_size=8
    )
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-10)

    gd = jax.grad(
        lambda p, z: classify_log_evidence(
            SeIso, p, z, X, y, newton_iters=4),
        argnums=(0, 1),
    )(params, z)
    gs = jax.jit(jax.grad(
        lambda p, z: sharded_classify_log_evidence(
            SeIso, mesh, p, z, Xs, ys, mask, newton_iters=4, block_size=8),
        argnums=(0, 1),
    ))(params, z)
    # the line search bisects s to ~3e-8 resolution, and psum/block
    # reassociation can flip a bisection branch — grads track the chosen
    # s, so parity here is bounded by that resolution, not f64 roundoff
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-12)


@pytest.mark.slow
def test_generic_stream_matches_materialized_all_families(rng):
    """The generic streaming Laplace core (stream_laplace_*) reproduces
    every materialized family evidence — value AND grads — at an
    arbitrary block partition: poisson (with exposures), binomial,
    ordinal (cutpoint grads included)."""
    from gpr_tpu.models.binomial import binomial_log_evidence
    from gpr_tpu.models.ordinal import ordinal_log_evidence
    from gpr_tpu.models.poisson import poisson_log_evidence

    n = 41
    X = jnp.asarray(rng.standard_normal((n, 2)))
    z = jnp.asarray(rng.standard_normal((6, 2)))
    params = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.3))
    f_lat = np.sin(np.asarray(X).sum(1))

    # poisson with exposures
    counts = jnp.asarray(rng.poisson(np.exp(f_lat)).astype(np.float64))
    le = jnp.asarray(np.log(rng.uniform(0.5, 2.0, n)))

    def fp(p, zz, which):
        return poisson_log_evidence(
            SeIso, p, zz, X, counts, log_exposure=le, newton_iters=12,
            block_size=7 if which else None,
        )

    ld, gd = jax.value_and_grad(lambda p, zz: fp(p, zz, False),
                                argnums=(0, 1))(params, z)
    ls, gs = jax.value_and_grad(lambda p, zz: fp(p, zz, True),
                                argnums=(0, 1))(params, z)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-11)

    # binomial
    trials = jnp.asarray(rng.integers(1, 20, n).astype(np.float64))
    yb = jnp.asarray(rng.binomial(
        np.asarray(trials).astype(int), 1.0 / (1.0 + np.exp(-f_lat))
    ).astype(np.float64))
    ld = binomial_log_evidence(SeIso, params, z, X, yb, trials,
                               newton_iters=12)
    ls = binomial_log_evidence(SeIso, params, z, X, yb, trials,
                               newton_iters=12, block_size=13)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-10)

    # ordinal (cutpoint grads through the streamed hooks)
    yo = jnp.asarray(np.digitize(f_lat, [-0.5, 0.5]).astype(np.int32))
    cr = jnp.asarray([-0.4, 0.1])

    def fo(p, cr, bs):
        return ordinal_log_evidence(SeIso, p, z, X, yo, cr,
                                    newton_iters=12, block_size=bs)

    ld, gd = jax.value_and_grad(lambda p, c: fo(p, c, None),
                                argnums=(0, 1))(params, cr)
    ls, gs = jax.value_and_grad(lambda p, c: fo(p, c, 7),
                                argnums=(0, 1))(params, cr)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-11)
