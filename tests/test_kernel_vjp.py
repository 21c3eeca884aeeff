"""Hand-fused k_cross_vjp == jax.vjp of (k_cross, k_diag), per family.

The streaming custom VJP uses the family's hand pullback when present
(models/stream_grad.py); these tests pin the pullback itself, at the kernel
level, against AD for random cotangents — including coincident points
(r = 0) and every se_fat option combination.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import Matern32, Matern52, SeFat, SeIso


def _check(family, params, X, Z, rng, rtol=1e-9, atol=1e-12):
    knm_bar = jnp.asarray(rng.standard_normal((X.shape[0], Z.shape[0])))
    kd_bar = jnp.asarray(rng.standard_normal(X.shape[0]))

    def kfun(p, zz):
        return family.k_cross(p, X, zz), family.k_diag(p, X)

    (knm, _), pull = jax.vjp(kfun, params, Z)
    p_ref, z_ref = pull((knm_bar, kd_bar))
    p_hand, z_hand = family.k_cross_vjp(params, X, Z, knm, knm_bar, kd_bar)

    ref_leaves = jax.tree.leaves(p_ref) + [z_ref]
    hand_leaves = jax.tree.leaves(p_hand) + [z_hand]
    assert len(ref_leaves) == len(hand_leaves)
    for a, b in zip(hand_leaves, ref_leaves):
        assert bool(jnp.all(jnp.isfinite(a)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
        )


@pytest.mark.parametrize("family", [SeIso, Matern32, Matern52])
def test_iso_families_hand_vjp(rng, family):
    n, d, m = 64, 3, 7
    X = jnp.asarray(rng.standard_normal((n, d)))
    # Z[0] coincides with X[0]: the r=0 / d2=0 corner must stay finite
    Z = jnp.concatenate([X[:1], jnp.asarray(rng.standard_normal((m - 1, d)))])
    p = family.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.1))
    _check(family, p, X, Z, rng)


@pytest.mark.parametrize("tproj", [True, False])
@pytest.mark.parametrize("multiscale", [True, False])
@pytest.mark.parametrize("hetero", [True, False])
def test_se_fat_hand_vjp(rng, tproj, multiscale, hetero):
    n, big_d, m = 48, 5, 6
    X = jnp.asarray(rng.standard_normal((n, big_d)))
    full = SeFat.default_params(X, m, key=jax.random.PRNGKey(7))
    d = big_d if not tproj else full.d
    p = SeFat.Params(
        d=d,
        log_sf2=full.log_sf2,
        tproj=full.tproj if tproj else None,
        log_hetero_skedasticity=(
            full.log_hetero_skedasticity if hetero else None
        ),
        log_multiscales_m05=(
            jnp.asarray(rng.standard_normal((m, d)) * 0.3)
            if multiscale else None
        ),
    )
    Z = SeFat.inducing_from_inputs(p, X[:m])
    _check(SeFat, p, X, Z, rng)
