"""2-D (data x model) mesh evidence == single-device, values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeFat, SeIso
from gpr_tpu.models import log_evidence
from gpr_tpu.parallel.mesh2d import make_mesh_2d, sharded_log_evidence_2d

SIGMA2 = 0.3


def data(rng, n=400, m=16, d=3):
    X = jnp.asarray(rng.standard_normal((n, d)))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    return X, Z, y, p


# inner loop keeps one mesh shape; the degenerate/transposed shapes are
# slow-tier (each costs a fresh ~15 s shard_map compile on the 1-CPU box)
@pytest.mark.parametrize("shape", [
    (2, 4),
    pytest.param((4, 2), marks=pytest.mark.slow),
    pytest.param((8, 1), marks=pytest.mark.slow),
    pytest.param((1, 8), marks=pytest.mark.slow),
])
@pytest.mark.parametrize("variational", [False, True])
def test_2d_matches_single_device(rng, shape, variational):
    X, Z, y, p = data(rng)
    mesh = make_mesh_2d(*shape)
    sharded = sharded_log_evidence_2d(
        SeIso, mesh, p, Z, SIGMA2, X, y, variational=variational,
        block_size=64,
    )
    dense = log_evidence(SeIso, p, Z, SIGMA2, X, y, variational=variational,
                         factorization="chol")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-10)


def test_2d_gradients(rng):
    X, Z, y, p = data(rng, n=240, m=8)
    mesh = make_mesh_2d(2, 4)

    def f_sh(p_, z, s2):
        return sharded_log_evidence_2d(SeIso, mesh, p_, z, s2, X, y,
                                       block_size=64)

    def f_ref(p_, z, s2):
        return log_evidence(SeIso, p_, z, s2, X, y, factorization="chol")

    gs = jax.jit(jax.grad(f_sh, argnums=(0, 1, 2)))(p, Z, SIGMA2)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(p, Z, SIGMA2)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7,
                                   atol=1e-10)


@pytest.mark.slow
def test_2d_se_fat_padded_n(rng):
    n, m = 201, 8  # n not divisible by data axis
    X = jnp.asarray(rng.standard_normal((n, 5)))
    y = jnp.asarray(rng.standard_normal(n))
    p = SeFat.default_params(X, m, key=jax.random.PRNGKey(3))
    Z = SeFat.inducing_from_inputs(p, X[:m])
    mesh = make_mesh_2d(4, 2)
    from gpr_tpu.parallel import pad_to_shards

    # pad to the data-axis multiple; mask marks real rows
    Xp, yp, mask = pad_to_shards_2d(mesh, X, y)
    sharded = sharded_log_evidence_2d(SeFat, mesh, p, Z, 0.5, Xp, yp, mask,
                                      variational=True, block_size=32)
    dense = log_evidence(SeFat, p, Z, 0.5, X, y, variational=True,
                         factorization="chol")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-10)


def pad_to_shards_2d(mesh, X, y):
    n_dp = mesh.shape["data"]
    n = X.shape[0]
    pad = (-n) % n_dp
    mask = jnp.ones((n,), X.dtype)
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, X.shape[1]), X.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
    return X, y, mask


def test_2d_rejects_indivisible_m(rng):
    X, Z, y, p = data(rng, m=10)
    mesh = make_mesh_2d(2, 4)
    with pytest.raises(ValueError, match="divisible"):
        sharded_log_evidence_2d(SeIso, mesh, p, Z, SIGMA2, X, y)


def test_fit_sharded_2d_matches_single_device(rng):
    """Device-resident TP training == single-device fit: same short
    trajectory (the 2-D evidence is exact, so the optimizer walks the same
    path up to f64 roundoff)."""
    from gpr_tpu.optim import make_pack
    from gpr_tpu.optim.lbfgs_device import fit
    from gpr_tpu.parallel import fit_sharded_2d

    X, Z, y, p = data(rng, n=203, m=8)  # n exercises row padding
    pack = make_pack(SeIso, p, Z, 0.5)
    mesh = make_mesh_2d(2, 4)

    p2, z2, s22, st2 = fit_sharded_2d(
        SeIso, mesh, X, y, pack, max_iter=8, block_size=64, epsabs=1e-10,
    )
    p1, z1, s21, st1 = fit(
        SeIso, X, y, pack, max_iter=8, streaming_block_size=64,
        epsabs=1e-10,
    )
    assert int(st2.n_iter) == int(st1.n_iter)
    np.testing.assert_allclose(float(st2.f), float(st1.f), rtol=1e-8)
    np.testing.assert_allclose(float(s22), float(s21), rtol=1e-5)
    assert not bool(st2.failed)


def test_fit_sharded_2d_distributed_epilogue(rng):
    """The distributed-epilogue objective trains too (value/grads through
    the distributed block Cholesky are exercised under the optimizer)."""
    from gpr_tpu.optim import make_pack
    from gpr_tpu.parallel import fit_sharded_2d

    X, Z, y, p = data(rng, n=160, m=8)
    pack = make_pack(SeIso, p, Z, 0.5)
    mesh = make_mesh_2d(2, 4)
    p2, z2, s22, st = fit_sharded_2d(
        SeIso, mesh, X, y, pack, max_iter=4, block_size=64,
        epilogue="distributed",
    )
    assert np.isfinite(float(st.f)) and not bool(st.failed)
    assert float(s22) > 0
