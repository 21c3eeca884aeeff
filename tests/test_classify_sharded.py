"""Sharded Laplace classification == single-device, on the 8-device CPU
mesh (SURVEY.md section 4 multi-chip test strategy applied to the
classification extension).  n is chosen non-divisible by 8 so the padded
mask path is always exercised."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.classify import (
    classify_log_evidence,
    classify_predict,
)
from gpr_tpu.parallel import (
    make_mesh,
    shard_batch,
    sharded_classify_log_evidence,
    sharded_classify_predict,
)


def data(rng, n=203, m=9, d=3):
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    y = jnp.sign(jnp.asarray(np.sin(np.asarray(X).sum(1))
                             + 0.3 * rng.standard_normal(n)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.4))
    return X, Z, y, p


def test_sharded_classify_evidence_matches_single(rng):
    X, Z, y, p = data(rng)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    single = classify_log_evidence(SeIso, p, Z, X, y)
    Xs, ys, mask = shard_batch(mesh, X, y)
    sharded = sharded_classify_log_evidence(SeIso, mesh, p, Z, Xs, ys, mask)
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-10)


def test_sharded_classify_gradients_match_single(rng):
    X, Z, y, p = data(rng, n=117, m=6)
    mesh = make_mesh()
    Xs, ys, mask = shard_batch(mesh, X, y)

    gd = jax.grad(
        lambda p, z: classify_log_evidence(SeIso, p, z, X, y, newton_iters=8),
        argnums=(0, 1),
    )(p, Z)
    # grad of a shard_map-calling function must run inside jit
    gs = jax.jit(jax.grad(
        lambda p, z: sharded_classify_log_evidence(
            SeIso, mesh, p, z, Xs, ys, mask, newton_iters=8),
        argnums=(0, 1),
    ))(p, Z)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_sharded_classify_predict_matches_single(rng):
    X, Z, y, p = data(rng, n=90, m=7)
    Xt = jnp.asarray(rng.standard_normal((13, X.shape[1])))
    mesh = make_mesh()
    Xs, ys, mask = shard_batch(mesh, X, y)

    prob1, mu1, var1 = classify_predict(SeIso, p, Z, X, y, Xt)
    prob2, mu2, var2 = sharded_classify_predict(
        SeIso, mesh, p, Z, Xs, ys, Xt, mask
    )
    assert prob2.shape == prob1.shape
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var2), np.asarray(var1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(prob2), np.asarray(prob1),
                               rtol=1e-10)


def test_fit_classify_mesh_matches_plain(rng):
    """The packaged classifier trainer: single-device and mesh objectives
    give the same optimization result; sigma2-carrying packs rejected."""
    import pytest

    from gpr_tpu.models.classify import fit_classify
    from gpr_tpu.optim import make_pack

    X, Z, y, p = data(rng, n=107, m=5)
    pack = make_pack(SeIso, p, Z, 1.0, learn_sigma2=False)

    with pytest.raises(ValueError, match="learn_sigma2"):
        fit_classify(SeIso, X, y, make_pack(SeIso, p, Z, 1.0))

    p1, z1, st1 = fit_classify(SeIso, X, y, pack, newton_iters=6,
                               max_iter=6, epsabs=1e-9)
    mesh = make_mesh()
    p2, z2, st2 = fit_classify(SeIso, X, y, pack, newton_iters=6,
                               max_iter=6, epsabs=1e-9, mesh=mesh)
    assert not bool(st1.failed) and not bool(st2.failed)
    assert float(st1.f) < float(
        -classify_log_evidence(SeIso, p, Z, X, y, newton_iters=6)
        / X.shape[0])
    np.testing.assert_allclose(float(st2.f), float(st1.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_sharded_multiclass_evidence_and_grads_match_single(rng):
    """Softmax Laplace over the mesh == single-device (value and grads);
    n non-divisible by 8 exercises the padded-row path through the
    per-class factors, the coupling Cholesky, and the evidence epilogue."""
    from gpr_tpu.models.classify_multi import multiclass_log_evidence
    from gpr_tpu.parallel import sharded_multiclass_log_evidence

    n, n_classes = 133, 3
    X = jnp.asarray(rng.standard_normal((n, 3)))
    Z = jnp.asarray(rng.standard_normal((7, 3)))
    labels = jnp.asarray(rng.integers(0, n_classes, n))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.4))
    mesh = make_mesh()

    single = multiclass_log_evidence(SeIso, p, Z, X, labels, n_classes,
                                     newton_iters=8)
    Xs, ls, mask = shard_batch(mesh, X, labels)
    sharded = sharded_multiclass_log_evidence(
        SeIso, mesh, p, Z, Xs, ls, n_classes, mask, newton_iters=8
    )
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-10)

    gd = jax.grad(
        lambda p, z: multiclass_log_evidence(
            SeIso, p, z, X, labels, n_classes, newton_iters=5),
        argnums=(0, 1),
    )(p, Z)
    gs = jax.jit(jax.grad(
        lambda p, z: sharded_multiclass_log_evidence(
            SeIso, mesh, p, z, Xs, ls, n_classes, mask, newton_iters=5),
        argnums=(0, 1),
    ))(p, Z)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)
