"""Distributed block Cholesky / solve (parallel/dist_chol.py) == replicated
LAPACK-path results, and the mesh2d distributed epilogue == dense evidence.
Runs on the 8-virtual-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P

from gpr_tpu.kernels import SeFat, SeIso
from gpr_tpu.models import log_evidence
from gpr_tpu.numerics.linalg import cholesky_upper, log_det_tri, solve_tri
from gpr_tpu.parallel.dist_chol import (
    dist_cholesky_upper,
    dist_log_det_tri,
    dist_solve_lower_t,
)
from gpr_tpu.parallel.mesh2d import (
    MODEL_AXIS,
    make_mesh_2d,
    sharded_log_evidence_2d,
)

# whole-module slow mark: shard_map compiles on 1 CPU dominate — keep for
# CI/full runs, skip in the quick inner loop
# (python -m pytest tests/ -m 'not slow')
pytestmark = pytest.mark.slow

SIGMA2 = 0.3


def _spd(rng, m):
    w = rng.standard_normal((m, m))
    return jnp.asarray(np.eye(m) + w @ w.T / m)


@pytest.mark.parametrize("p", [2, 4, 8])
def test_dist_cholesky_matches_replicated(rng, p):
    m = 24
    a = _spd(rng, m)
    u = jnp.asarray(rng.standard_normal(m))
    mesh = jax.make_mesh((p,), (MODEL_AXIS,), devices=jax.devices()[:p])

    def shard_fn(a_j, u):
        r_j = dist_cholesky_upper(a_j, MODEL_AXIS, p)
        ld = dist_log_det_tri(r_j, MODEL_AXIS)
        t = dist_solve_lower_t(r_j, u, MODEL_AXIS, p)
        return r_j, ld, t

    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(None, MODEL_AXIS), P()),
        out_specs=(P(None, MODEL_AXIS), P(), P()), check_vma=False,
    )
    r, ld, t = fn(a, u)

    r_ref = cholesky_upper(a, jitter=0.0)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(float(ld), float(log_det_tri(r_ref)),
                               rtol=1e-12)
    t_ref = solve_tri(r_ref, u, trans=True)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-10,
                               atol=1e-12)


# shapes x flags pruned to two combos covering both axes (suite wall-clock:
# each combo pays a full shard_map compile; the cross terms add none)
@pytest.mark.parametrize("shape,variational", [((2, 4), False),
                                               ((4, 2), True)])
def test_mesh2d_distributed_epilogue_matches_dense(rng, shape, variational):
    n, m, d = 360, 24, 3  # m non-trivially blocked over the model axis
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    mesh = make_mesh_2d(*shape)
    sharded = sharded_log_evidence_2d(
        SeIso, mesh, p, Z, SIGMA2, X, y, variational=variational,
        block_size=64, epilogue="distributed",
    )
    dense = log_evidence(SeIso, p, Z, SIGMA2, X, y, variational=variational,
                         factorization="chol")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-11)


def test_mesh2d_distributed_epilogue_gradients(rng):
    n, m, d = 240, 16, 3
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    mesh = make_mesh_2d(2, 4)

    @jax.jit
    def g_dist(p, Z, s2):
        def f(p, Z, s2):
            return sharded_log_evidence_2d(
                SeIso, mesh, p, Z, s2, X, y, block_size=64,
                epilogue="distributed",
            )
        return jax.value_and_grad(f, argnums=(0, 1, 2))(p, Z, s2)

    def f_ref(p, Z, s2):
        return log_evidence(SeIso, p, Z, s2, X, y, factorization="chol")

    v_d, grads_d = g_dist(p, Z, jnp.asarray(SIGMA2))
    v_r, grads_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(
        p, Z, jnp.asarray(SIGMA2)
    )
    np.testing.assert_allclose(float(v_d), float(v_r), rtol=1e-11)
    for a, b in zip(jax.tree.leaves(grads_d), jax.tree.leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7,
                                   atol=1e-10)


def test_mesh2d_distributed_se_fat(rng):
    """Flagship kernel through the fully distributed epilogue."""
    n, m = 200, 12
    X = jnp.asarray(rng.standard_normal((n, 5)))
    y = jnp.asarray(rng.standard_normal(n))
    p = SeFat.default_params(X, m, key=jax.random.PRNGKey(3))
    Z = SeFat.inducing_from_inputs(p, X[:m])
    mesh = make_mesh_2d(2, 4)
    sharded = sharded_log_evidence_2d(
        SeFat, mesh, p, Z, 0.5, X, y, variational=True, block_size=32,
        epilogue="distributed",
    )
    dense = log_evidence(SeFat, p, Z, 0.5, X, y, variational=True,
                         factorization="chol")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-11)


@pytest.mark.parametrize("p", [4])
def test_dist_matrix_solves_and_inverse(rng, p):
    m = 16
    a = _spd(rng, m)
    mesh = jax.make_mesh((p,), (MODEL_AXIS,), devices=jax.devices()[:p])
    from gpr_tpu.parallel.dist_chol import (
        dist_solve_lower_cols,
        dist_solve_upper_cols,
        dist_spd_inverse_cols,
    )

    b = jnp.asarray(rng.standard_normal((m, m)))  # column-shard as RHS

    def shard_fn(a_j, b_j):
        r_j = dist_cholesky_upper(a_j, MODEL_AXIS, p)
        y_j = dist_solve_lower_cols(r_j, b_j, MODEL_AXIS, p)
        x_j = dist_solve_upper_cols(r_j, y_j, MODEL_AXIS, p)
        inv_j = dist_spd_inverse_cols(r_j, MODEL_AXIS, p)
        return y_j, x_j, inv_j

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(None, MODEL_AXIS)),
        out_specs=(P(None, MODEL_AXIS),) * 3, check_vma=False,
    )
    y, x, inv = fn(a, b)
    r_ref = cholesky_upper(a, jitter=0.0)
    y_ref = solve_tri(r_ref, b, trans=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-10,
                               atol=1e-12)
    x_ref = solve_tri(r_ref, y_ref)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-9,
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(inv), np.asarray(jnp.linalg.inv(a)),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("shape,variational", [((2, 4), False),
                                               ((4, 2), True)])
def test_fully_distributed_inducing_matches_dense(rng, shape, variational):
    """inducing='distributed': NO member holds any m x m matrix, yet the
    evidence equals the dense engine's."""
    n, m, d = 320, 24, 3
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    mesh = make_mesh_2d(*shape)
    sharded = sharded_log_evidence_2d(
        SeIso, mesh, p, Z, SIGMA2, X, y, variational=variational,
        block_size=64, inducing="distributed",
    )
    dense = log_evidence(SeIso, p, Z, SIGMA2, X, y, variational=variational,
                         factorization="chol")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-10)


def test_fully_distributed_inducing_gradients_and_se_fat(rng):
    n, m = 200, 16
    X = jnp.asarray(rng.standard_normal((n, 4)))
    y = jnp.asarray(rng.standard_normal(n))
    p = SeFat.default_params(X, m, key=jax.random.PRNGKey(3))
    Z = SeFat.inducing_from_inputs(p, X[:m])
    mesh = make_mesh_2d(2, 4)

    @jax.jit
    def g_dist(p_, Z, s2):
        def f(p_, Z, s2):
            return sharded_log_evidence_2d(
                SeFat, mesh, p_, Z, s2, X, y, variational=True,
                block_size=64, inducing="distributed",
            )
        return jax.value_and_grad(f, argnums=(0, 1, 2))(p_, Z, s2)

    def f_ref(p_, Z, s2):
        return log_evidence(SeFat, p_, Z, s2, X, y, variational=True,
                            factorization="chol")

    v_d, grads_d = g_dist(p, Z, jnp.asarray(0.5))
    v_r, grads_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(
        p, Z, jnp.asarray(0.5)
    )
    np.testing.assert_allclose(float(v_d), float(v_r), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(grads_d), jax.tree.leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-9)


def test_fully_distributed_predict_matches_dense(rng):
    from gpr_tpu.models import (
        calc_model,
        calc_trained,
        co_variance_predictor,
        mean_predictor,
        predict_means,
        predict_variances,
    )
    from gpr_tpu.parallel.mesh2d import fully_distributed_predict

    n, m, d = 320, 16, 3
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    Xs = jnp.asarray(rng.standard_normal((53, d)))  # non-divisible count
    mesh = make_mesh_2d(2, 4)

    mu, var = fully_distributed_predict(
        SeIso, mesh, p, Z, SIGMA2, X, y, Xs, block_size=64, predictive=True
    )

    model = calc_model(SeIso, p, X, Z, SIGMA2, factorization="chol")
    trained = calc_trained(model, y)
    mu_ref = predict_means(SeIso, p, mean_predictor(trained), Xs)
    var_ref = predict_variances(SeIso, p, co_variance_predictor(model), Xs,
                                SIGMA2, predictive=True)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), rtol=1e-9,
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-8, atol=1e-11)


def test_fully_distributed_larger_m(rng):
    """Block-index stress at a larger m (8 blocks of 8 over the full mesh)."""
    n, m, d = 256, 64, 2
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.4), log_sf2=jnp.asarray(0.0))
    mesh = make_mesh_2d(1, 8)
    sharded = sharded_log_evidence_2d(
        SeIso, mesh, p, Z, SIGMA2, X, y, block_size=64,
        inducing="distributed",
    )
    dense = log_evidence(SeIso, p, Z, SIGMA2, X, y, factorization="chol")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-9)


@pytest.mark.parametrize("m", [13])
def test_fully_distributed_non_divisible_m(rng, m):
    """m not divisible by the model axis: the linear algebra is identity-
    padded, exactly — evidence, gradients, and predictions unchanged."""
    from gpr_tpu.parallel.mesh2d import fully_distributed_predict

    n, d = 240, 3
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    mesh = make_mesh_2d(2, 4)

    @jax.jit
    def g_dist(p_, Z, s2):
        def f(p_, Z, s2):
            return sharded_log_evidence_2d(
                SeIso, mesh, p_, Z, s2, X, y, block_size=64,
                inducing="distributed",
            )
        return jax.value_and_grad(f, argnums=(0, 1, 2))(p_, Z, s2)

    v_d, grads_d = g_dist(p, Z, jnp.asarray(SIGMA2))
    def f_ref(p_, Z, s2):
        return log_evidence(SeIso, p_, Z, s2, X, y, factorization="chol")
    v_r, grads_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(
        p, Z, jnp.asarray(SIGMA2))
    np.testing.assert_allclose(float(v_d), float(v_r), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(grads_d), jax.tree.leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-9)

    Xs = jnp.asarray(rng.standard_normal((40, d)))
    mu, var = fully_distributed_predict(
        SeIso, mesh, p, Z, SIGMA2, X, y, Xs, block_size=64)
    from gpr_tpu.models import (calc_model, calc_trained,
                                co_variance_predictor, mean_predictor,
                                predict_means, predict_variances)
    model = calc_model(SeIso, p, X, Z, SIGMA2, factorization="chol")
    trained = calc_trained(model, y)
    np.testing.assert_allclose(
        np.asarray(mu),
        np.asarray(predict_means(SeIso, p, mean_predictor(trained), Xs)),
        rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(var),
        np.asarray(predict_variances(SeIso, p, co_variance_predictor(model),
                                     Xs, SIGMA2)),
        rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("p", [2, 4, 8])
def test_dist_transpose_cols(rng, p):
    from gpr_tpu.parallel.dist_chol import dist_transpose_cols

    m = 8 * p
    w = jnp.asarray(rng.standard_normal((m, m)))
    mesh = jax.make_mesh((p,), (MODEL_AXIS,), devices=jax.devices()[:p])
    fn = jax.shard_map(
        lambda w_j: dist_transpose_cols(w_j, MODEL_AXIS, p), mesh=mesh,
        in_specs=P(None, MODEL_AXIS), out_specs=P(None, MODEL_AXIS),
        check_vma=False,
    )
    np.testing.assert_array_equal(np.asarray(fn(w)), np.asarray(w).T)


@pytest.mark.parametrize("p", [4])
def test_dist_whiten_cols(rng, p):
    """Two-sided whitening U^-T G U^-1 from column blocks, both with a
    column-sharded U (dist_whiten_cols) and a replicated one
    (whiten_cols_replicated)."""
    from gpr_tpu.parallel.dist_chol import (
        dist_whiten_cols,
        whiten_cols_replicated,
    )

    m = 16
    g = _spd(rng, m)
    km = _spd(rng, m) + jnp.eye(m) * m
    u = cholesky_upper(km, jitter=0.0)
    ref = solve_tri(u, solve_tri(u, g, trans=True).T, trans=True)
    mesh = jax.make_mesh((p,), (MODEL_AXIS,), devices=jax.devices()[:p])

    def shard_fn(g_j, u_j, u_rep):
        return (
            dist_whiten_cols(u_j, g_j, MODEL_AXIS, p),
            whiten_cols_replicated(u_rep, g_j, MODEL_AXIS, p),
        )

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(None, MODEL_AXIS), P()),
        out_specs=(P(None, MODEL_AXIS),) * 2, check_vma=False,
    )
    out_dist, out_rep = fn(g, u, u)
    np.testing.assert_allclose(np.asarray(out_dist), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out_rep), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("variational", [True])
def test_fully_distributed_whitened_factorization(rng, variational):
    """factorization='whitened' (the f32-stable route: compensated raw-Gram
    accumulation + distributed two-sided whitening) == dense, in f64 exactly."""
    n, m, d = 320, 24, 3
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    mesh = make_mesh_2d(2, 4)
    sharded = sharded_log_evidence_2d(
        SeIso, mesh, p, Z, SIGMA2, X, y, variational=variational,
        block_size=64, inducing="distributed", factorization="whitened",
    )
    dense = log_evidence(SeIso, p, Z, SIGMA2, X, y, variational=variational,
                         factorization="chol")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-10)


def test_fully_distributed_whitened_gradients(rng):
    """Gradients flow exactly through the ppermute-ring transpose and the
    whitened distributed factorization (non-divisible m: identity padding)."""
    n, m, d = 240, 13, 3
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    mesh = make_mesh_2d(2, 4)

    @jax.jit
    def g_dist(p_, Z, s2):
        def f(p_, Z, s2):
            return sharded_log_evidence_2d(
                SeIso, mesh, p_, Z, s2, X, y, variational=True,
                block_size=64, inducing="distributed",
                factorization="whitened",
            )
        return jax.value_and_grad(f, argnums=(0, 1, 2))(p_, Z, s2)

    def f_ref(p_, Z, s2):
        return log_evidence(SeIso, p_, Z, s2, X, y, variational=True,
                            factorization="chol")

    v_d, grads_d = g_dist(p, Z, jnp.asarray(SIGMA2))
    v_r, grads_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(
        p, Z, jnp.asarray(SIGMA2))
    np.testing.assert_allclose(float(v_d), float(v_r), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(grads_d), jax.tree.leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-9)
