"""Sharded warped / PITC evidence == single-device, on the 8-device CPU
mesh.  Warped shards at any n (the Jacobian is a masked row sum); PITC
shard-block alignment: per-shard rows a multiple of block_size gives the
identical partition, any other n is a different-but-valid partition
(asserted finite, not equal)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.pitc import pitc_log_evidence
from gpr_tpu.models.warped import default_warp_params, warped_log_evidence
from gpr_tpu.parallel import (
    make_mesh,
    shard_batch,
    sharded_pitc_log_evidence,
    sharded_warped_log_evidence,
)

SIGMA2 = 0.3


def data(rng, n, m=9, d=3):
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1))
                    + 0.2 * rng.standard_normal(n)) ** 3
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    return X, Z, y, p


def test_sharded_warped_matches_single(rng):
    X, Z, y, p = data(rng, n=203)  # non-divisible by 8: mask path
    wp = default_warp_params(2)
    mesh = make_mesh()
    single = warped_log_evidence(SeIso, p, wp, Z, SIGMA2, X, y,
                                 variational=True, block_size=64)
    Xs, ys, mask = shard_batch(mesh, X, y)
    sharded = sharded_warped_log_evidence(
        SeIso, mesh, p, wp, Z, SIGMA2, Xs, ys, mask,
        variational=True, block_size=64,
    )
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-11)


def test_sharded_warped_gradients_match_single(rng):
    X, Z, y, p = data(rng, n=117, m=6)
    wp = default_warp_params(2)
    mesh = make_mesh()
    Xs, ys, mask = shard_batch(mesh, X, y)

    gd = jax.grad(
        lambda p, wp, z: warped_log_evidence(
            SeIso, p, wp, z, SIGMA2, X, y, block_size=64),
        argnums=(0, 1, 2),
    )(p, wp, Z)
    gs = jax.jit(jax.grad(
        lambda p, wp, z: sharded_warped_log_evidence(
            SeIso, mesh, p, wp, z, SIGMA2, Xs, ys, mask, block_size=64),
        argnums=(0, 1, 2),
    ))(p, wp, Z)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11)


def test_sharded_pitc_matches_single_aligned(rng):
    # 8 devices x 40 rows each, block 20: identical partition
    X, Z, y, p = data(rng, n=320)
    mesh = make_mesh()
    single = pitc_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=20)
    Xs, ys, mask = shard_batch(mesh, X, y)
    sharded = sharded_pitc_log_evidence(
        SeIso, mesh, p, Z, SIGMA2, Xs, ys, mask, block_size=20
    )
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-11)


def test_sharded_pitc_gradients_match_single_aligned(rng):
    X, Z, y, p = data(rng, n=160, m=6)
    mesh = make_mesh()
    Xs, ys, mask = shard_batch(mesh, X, y)

    gd = jax.grad(
        lambda p, z, s2: pitc_log_evidence(
            SeIso, p, z, s2, X, y, block_size=10),
        argnums=(0, 1, 2),
    )(p, Z, jnp.asarray(SIGMA2))
    gs = jax.jit(jax.grad(
        lambda p, z, s2: sharded_pitc_log_evidence(
            SeIso, mesh, p, z, s2, Xs, ys, mask, block_size=10),
        argnums=(0, 1, 2),
    ))(p, Z, jnp.asarray(SIGMA2))
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11)


def test_sharded_pitc_unaligned_is_valid_partition(rng):
    # n = 203 on 8 devices with block 20: a DIFFERENT partition — finite,
    # between the FITC evidence and the exact-GP evidence like any PITC
    X, Z, y, p = data(rng, n=203)
    mesh = make_mesh()
    Xs, ys, mask = shard_batch(mesh, X, y)
    sharded = sharded_pitc_log_evidence(
        SeIso, mesh, p, Z, SIGMA2, Xs, ys, mask, block_size=20
    )
    fitc = pitc_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=1)
    exact = pitc_log_evidence(SeIso, p, Z, SIGMA2, X, y, block_size=203)
    assert np.isfinite(float(sharded))
    lo, hi = sorted([float(fitc), float(exact)])
    assert lo - 1e-6 <= float(sharded) <= hi + 1e-6
