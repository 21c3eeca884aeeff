"""Sharded warped / PITC evidence == single-device, on the 8-device CPU
mesh.  Warped shards at any n (the Jacobian is a masked row sum); PITC
shard-block alignment: per-shard rows a multiple of block_size gives the
identical partition, any other n is a different-but-valid partition
(asserted finite, not equal)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_sharded_ordinal_matches_single(rng):
    from gpr_tpu.models.ordinal import ordinal_log_evidence
    from gpr_tpu.parallel.classify_sharded import (
        sharded_ordinal_log_evidence,
    )

    X, Z, _, p = data(rng, n=117, m=6)
    f = np.sin(np.asarray(X).sum(1)) * 2.0
    y = jnp.asarray(np.digitize(f, [-0.8, 0.8]).astype(np.int32))
    cut_raw = jnp.asarray([-0.7, 0.1])
    mesh = make_mesh()
    single = ordinal_log_evidence(SeIso, p, Z, X, y, cut_raw,
                                  newton_iters=15)
    Xs, ys, mask = shard_batch(mesh, X, y)

    @jax.jit
    def val_and_grads(p, z, cr):
        return jax.value_and_grad(
            lambda p, z, cr: sharded_ordinal_log_evidence(
                SeIso, mesh, p, z, Xs, ys, cr, mask, newton_iters=15),
            argnums=(0, 1, 2),
        )(p, z, cr)

    sharded, gs = val_and_grads(p, Z, cut_raw)
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-10)
    gd = jax.grad(
        lambda p, z, cr: ordinal_log_evidence(
            SeIso, p, z, X, y, cr, newton_iters=15),
        argnums=(0, 1, 2),
    )(p, Z, cut_raw)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-10)


@pytest.mark.slow
def test_sharded_hetero_and_t_moments_match_single(rng):
    from gpr_tpu.models.fitc import log_evidence
    from gpr_tpu.models.robust import t_posterior_moments
    from gpr_tpu.parallel.classify_sharded import (
        sharded_hetero_log_evidence,
        sharded_t_moments,
    )

    X, Z, y, p = data(rng, n=117, m=6)
    lam = jnp.asarray(rng.uniform(0.2, 2.0, 117))
    sigma2 = 0.4
    mesh = make_mesh()
    single = log_evidence(SeIso, p, Z, sigma2 / lam, X, y)
    Xs, ys, mask = shard_batch(mesh, X, y)
    lam_p = jnp.concatenate(
        [lam, jnp.ones(Xs.shape[0] - 117, lam.dtype)]
    )

    @jax.jit
    def ev(p, z):
        return sharded_hetero_log_evidence(
            SeIso, mesh, p, z, sigma2 / lam_p, Xs, ys, mask)

    np.testing.assert_allclose(float(ev(p, Z)), float(single), rtol=1e-10)

    gd = jax.grad(
        lambda p, z: log_evidence(SeIso, p, z, sigma2 / lam, X, y),
        argnums=(0, 1),
    )(p, Z)
    gs = jax.jit(jax.grad(ev, argnums=(0, 1)))(p, Z)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-10)

    mu_d, var_d, _ = t_posterior_moments(SeIso, p, Z, sigma2, X, y, lam)
    mu_s, var_s = jax.jit(
        lambda: sharded_t_moments(
            SeIso, mesh, p, Z, sigma2, Xs, ys, lam_p, mask)
    )()
    np.testing.assert_allclose(np.asarray(mu_s)[:117], np.asarray(mu_d),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(var_s)[:117], np.asarray(var_d),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_fit_ordinal_and_fit_t_on_mesh(rng):
    """Trainer smoke: the mesh= path of fit_ordinal / fit_t runs and
    returns finite, correctly shaped results."""
    from gpr_tpu.models.ordinal import fit_ordinal
    from gpr_tpu.models.robust import fit_t
    from gpr_tpu.optim import make_pack

    mesh = make_mesh()
    n = 90
    X = jnp.asarray(np.sort(rng.uniform(-3, 3, n))[:, None])
    f = 1.5 * np.sin(1.5 * np.asarray(X[:, 0]))
    yo = jnp.asarray(np.digitize(f, [-0.6, 0.6]).astype(np.int32))
    p0 = SeIso.default_params(X, 6)
    z0 = X[:: n // 6][:6]

    pack = make_pack(SeIso, p0, z0, 1.0, learn_sigma2=False)
    p_f, z_f, cut_f, st = fit_ordinal(
        SeIso, X, yo, pack, jnp.asarray([-0.5, 0.1]), newton_iters=10,
        mesh=mesh, max_iter=8,
    )
    assert np.isfinite(float(st.f))
    assert np.diff(np.asarray(
        __import__("gpr_tpu.models.ordinal", fromlist=["cutpoints_from_raw"])
        .cutpoints_from_raw(cut_f))).min() > 0

    yr = jnp.asarray(f + 0.1 * rng.standard_normal(n))
    pack2 = make_pack(SeIso, p0, z0, 0.3)
    p_t, z_t, s2_t, lam, st_t = fit_t(
        SeIso, X, yr, pack2, nu=4.0, n_em=2, m_step_iters=6, mesh=mesh,
    )
    lam = np.asarray(lam)
    assert lam.shape == (n,)
    assert np.isfinite(lam).all() and (lam > 0).all()
    assert np.isfinite(float(s2_t))
