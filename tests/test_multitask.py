"""Batched multi-task GPs (models/multitask.py): vmapped == per-task loops."""

import jax
import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import SeIso
from gpr_tpu.models import log_evidence
from gpr_tpu.models.multitask import (
    batched_log_evidence,
    batched_value_and_grad,
    multi_start,
)
from gpr_tpu.optim import make_pack


def _stacked(rng, B=4, n=120, d=3, m=6):
    X = jnp.asarray(rng.standard_normal((B, n, d)))
    y = jnp.asarray(rng.standard_normal((B, n)))
    Z = jnp.asarray(rng.standard_normal((B, m, d)))
    params = SeIso.Params(
        log_ell=jnp.asarray(rng.standard_normal(B) * 0.2),
        log_sf2=jnp.asarray(rng.standard_normal(B) * 0.2),
    )
    sigma2 = jnp.asarray(0.2 + rng.uniform(size=B))
    return params, Z, sigma2, X, y


def test_batched_evidence_matches_loop(rng):
    params, Z, sigma2, X, y = _stacked(rng)
    batched = batched_log_evidence(SeIso, params, Z, sigma2, X, y)
    for b in range(X.shape[0]):
        p_b = SeIso.Params(log_ell=params.log_ell[b],
                           log_sf2=params.log_sf2[b])
        one = log_evidence(SeIso, p_b, Z[b], sigma2[b], X[b], y[b],
                           factorization="chol")
        np.testing.assert_allclose(float(batched[b]), float(one), rtol=1e-12)


def test_batched_shared_inputs_and_streaming(rng):
    params, Z, sigma2, X, y = _stacked(rng)
    Xs = X[0]
    shared = batched_log_evidence(SeIso, params, Z, sigma2, None, y,
                                  shared_inputs=Xs)
    stream = batched_log_evidence(
        SeIso, params, Z, sigma2,
        jnp.broadcast_to(Xs, X.shape), y, block_size=32,
    )
    np.testing.assert_allclose(np.asarray(shared), np.asarray(stream),
                               rtol=1e-10)


def test_batched_value_and_grad(rng):
    params, Z, sigma2, X, y = _stacked(rng, B=3)
    vg = batched_value_and_grad(SeIso)
    vals, (gp, gz, gs) = vg(params, Z, sigma2, X, y)
    assert vals.shape == (3,)
    assert gz.shape == Z.shape
    for b in range(3):
        p_b = SeIso.Params(log_ell=params.log_ell[b],
                           log_sf2=params.log_sf2[b])

        def f(p, zz, s2):
            return -log_evidence(SeIso, p, zz, s2, X[b], y[b],
                                 factorization="chol")

        v1, g1 = jax.value_and_grad(f, argnums=(0, 1, 2))(
            p_b, Z[b], sigma2[b]
        )
        np.testing.assert_allclose(float(vals[b]), float(v1), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(gz[b]), np.asarray(g1[1]),
                                   rtol=1e-9, atol=1e-12)


def test_multi_start_picks_best(rng):
    from gpr_tpu.datasets import gen_data

    Xn, yn, _ = gen_data(2, n=200)
    X, y = jnp.asarray(Xn), jnp.asarray(yn)
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    Z0 = X[:: 200 // 6][:6]
    pack = make_pack(SeIso, p0, Z0, 1.0)
    # stacked starts: the packed vector perturbed
    starts = jnp.stack([
        pack.x0,
        pack.x0 + 0.5,
        pack.x0 - 0.5,
    ])
    best_x, ls = multi_start(SeIso, X, y, starts, pack.unpack, steps=50)
    assert ls.shape == (3,)
    # the selected start attains the max final evidence
    def neg(x):
        p, z, s2 = pack.unpack(x)
        return float(log_evidence(SeIso, p, z, s2, X, y,
                                  factorization="chol"))
    assert abs(neg(best_x) - float(jnp.max(ls))) < 1e-6
