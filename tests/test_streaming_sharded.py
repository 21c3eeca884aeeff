"""Streaming evidence == dense evidence; sharded == single-device
(SURVEY.md section 4: multi-chip tests on the virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeFat, SeIso
from gpr_tpu.models import calc_model, calc_trained, log_evidence
from gpr_tpu.models.streaming import (
    predict_means_blocked,
    predict_variances_blocked,
    streaming_coeffs,
    streaming_log_evidence,
)
from gpr_tpu.optim import make_pack
from gpr_tpu.parallel import (
    make_mesh,
    make_sharded_objective,
    sharded_log_evidence,
    shard_batch,
)

SIGMA2 = 0.3


def data(rng, n=500, m=13, d=3):
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    return X, Z, y, p


@pytest.mark.parametrize("variational", [False, True])
@pytest.mark.parametrize("block_size", [64, 100, 500, 512])
def test_streaming_matches_dense(rng, variational, block_size):
    X, Z, y, p = data(rng)
    dense = log_evidence(SeIso, p, Z, SIGMA2, X, y, variational=variational,
                         factorization="chol")
    stream = streaming_log_evidence(
        SeIso, p, Z, SIGMA2, X, y, variational=variational,
        block_size=block_size,
    )
    np.testing.assert_allclose(float(stream), float(dense), rtol=1e-11)


def test_streaming_gradients_match_dense(rng):
    X, Z, y, p = data(rng, n=300, m=7)

    def f_dense(p, z, s2):
        return log_evidence(SeIso, p, z, s2, X, y, factorization="chol")

    def f_stream(p, z, s2):
        return streaming_log_evidence(SeIso, p, z, s2, X, y, block_size=64)

    gd = jax.grad(f_dense, argnums=(0, 1, 2))(p, Z, SIGMA2)
    gs = jax.grad(f_stream, argnums=(0, 1, 2))(p, Z, SIGMA2)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8,
                                   atol=1e-10)


def test_streaming_coeffs_and_prediction(rng):
    X, Z, y, p = data(rng, n=400)
    model = calc_model(SeIso, p, X, Z, SIGMA2, factorization="chol")
    trained = calc_trained(model, y)
    inducing, r_mat, coeffs = streaming_coeffs(SeIso, p, Z, SIGMA2, X, y,
                                               block_size=128)
    np.testing.assert_allclose(np.asarray(coeffs), np.asarray(trained.coeffs),
                               rtol=1e-9, atol=1e-12)

    Xs = jnp.asarray(np.random.default_rng(7).standard_normal((77, 3)))
    from gpr_tpu.models import (co_variance_predictor, mean_predictor,
                                predict_means, predict_variances)
    mu_ref = predict_means(SeIso, p, mean_predictor(trained), Xs)
    mu_blk = predict_means_blocked(SeIso, p, Z, coeffs, Xs, block_size=32)
    np.testing.assert_allclose(np.asarray(mu_blk), np.asarray(mu_ref),
                               rtol=1e-10, atol=1e-13)

    var_ref = predict_variances(SeIso, p, co_variance_predictor(model), Xs,
                                SIGMA2)
    var_blk = predict_variances_blocked(
        SeIso, p, Z, inducing.chol_km, r_mat, Xs, SIGMA2, block_size=32
    )
    np.testing.assert_allclose(np.asarray(var_blk), np.asarray(var_ref),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("variational", [False, True])
@pytest.mark.parametrize("n", [496, 500])  # divisible and padded cases
def test_sharded_matches_single_device(rng, variational, n):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    X, Z, y, p = data(rng, n=n)
    mesh = make_mesh(8)
    Xs, ys, mask = shard_batch(mesh, X, y)
    sharded = sharded_log_evidence(
        SeIso, mesh, p, Z, SIGMA2, Xs, ys, mask,
        variational=variational, block_size=32,
    )
    dense = log_evidence(SeIso, p, Z, SIGMA2, X, y, variational=variational,
                         factorization="chol")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-11)


def test_sharded_objective_gradients(rng):
    X, Z, y, p = data(rng, n=300, m=7)
    mesh = make_mesh(8)
    pack = make_pack(SeIso, p, Z, SIGMA2)
    neg_lg = make_sharded_objective(SeIso, mesh, X, y, pack, block_size=64)
    f_sh, g_sh = neg_lg(pack.x0)

    def f_ref(x):
        params, z, s2 = pack.unpack(x)
        return -log_evidence(SeIso, params, z, s2, X, y, factorization="chol")

    f_d, g_d = jax.value_and_grad(f_ref)(pack.x0)
    np.testing.assert_allclose(float(f_sh), float(f_d), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_d), rtol=1e-7,
                               atol=1e-10)


def test_sharded_se_fat(rng):
    """The flagship CLI kernel through the sharded path."""
    n, m = 200, 6
    X = jnp.asarray(rng.standard_normal((n, 5)))
    y = jnp.asarray(rng.standard_normal(n))
    p = SeFat.default_params(X, m, key=jax.random.PRNGKey(3))
    Z = SeFat.inducing_from_inputs(p, X[:m])
    mesh = make_mesh(8)
    Xs, ys, mask = shard_batch(mesh, X, y)
    sharded = sharded_log_evidence(SeFat, mesh, p, Z, 0.5, Xs, ys, mask,
                                   variational=True, block_size=32)
    dense = log_evidence(SeFat, p, Z, 0.5, X, y, variational=True,
                         factorization="chol")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-11)


def test_remat_policy_save_kernel_matches(rng):
    """The save-kernel checkpoint policy must not change values/gradients."""
    X, Z, y, p = data(rng, n=300, m=7)

    def f(policy):
        return jax.grad(
            lambda p_: streaming_log_evidence(
                SeIso, p_, Z, SIGMA2, X, y, block_size=64,
                remat_policy=policy, grad_impl="ad",
            )
        )(p)

    g1, g2 = f("recompute_all"), f("save_kernel")
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_streaming_trained_matches_dense(rng):
    """streaming_trained == calc_model+calc_trained on every reported field."""
    from gpr_tpu.models import calc_stats
    from gpr_tpu.models.streaming import streaming_trained

    X, Z, y, p = data(rng, n=300, m=7)
    model = calc_model(SeIso, p, X, Z, SIGMA2, variational=True,
                       factorization="chol")
    dense = calc_trained(model, y)
    st = streaming_trained(SeIso, p, Z, SIGMA2, X, y, variational=True,
                           block_size=64)
    np.testing.assert_allclose(float(st.l), float(dense.l), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(st.coeffs), np.asarray(dense.coeffs),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.model.r_mat),
                               np.asarray(model.r_mat), rtol=1e-9, atol=1e-12)
    s_stream, s_dense = calc_stats(st), calc_stats(dense)
    np.testing.assert_allclose(float(s_stream.smse), float(s_dense.smse),
                               rtol=1e-9)
    np.testing.assert_allclose(float(s_stream.msll), float(s_dense.msll),
                               rtol=1e-9)


def test_train_with_streaming_objective(rng):
    """train(block_size=...) reaches the same model as the dense objective."""
    from gpr_tpu.optim.train import train

    X, Z, y, p = data(rng, n=240, m=6)
    kw = dict(kernel_params=p, inducing=Z, sigma2=0.5, variational=True,
              max_iter=8, key=jax.random.PRNGKey(1))
    dense = train(SeIso, X, y, **kw)
    stream = train(SeIso, X, y, block_size=64, **kw)
    np.testing.assert_allclose(float(stream.l), float(dense.l), rtol=1e-8)
    for a, b in zip(jax.tree.leaves(stream.kernel_params),
                    jax.tree.leaves(dense.kernel_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-9)


def test_fit_sharded_matches_single_device(rng):
    """The chunked device L-BFGS over the 8-device sharded objective lands
    where the single-device fit lands (sharded evidence is exact, so the
    trajectories agree to accumulated roundoff)."""
    import jax.numpy as jnp
    import numpy as np

    from gpr_tpu.kernels import SeIso
    from gpr_tpu.optim import make_pack
    from gpr_tpu.optim.lbfgs_device import fit
    from gpr_tpu.parallel import fit_sharded

    n, m = 333, 7  # deliberately not a multiple of 8 (padding path)
    X = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1))
                    + 0.1 * rng.standard_normal(n))
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    pack = make_pack(SeIso, p0, X[:m], 1.0)
    kw = dict(epsabs=1e-3, max_iter=30, dispatch_iters=8)

    mesh = make_mesh(8)
    p_sh, z_sh, s2_sh, st_sh = fit_sharded(
        SeIso, mesh, X, y, pack, block_size=64, **kw
    )
    _, _, _, st_one = fit(
        SeIso, X, y, pack, streaming_block_size=64, **kw
    )

    assert not bool(st_sh.failed)
    np.testing.assert_allclose(float(st_sh.f), float(st_one.f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st_sh.x), np.asarray(st_one.x),
                               rtol=1e-4, atol=1e-6)
