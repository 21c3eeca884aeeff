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
