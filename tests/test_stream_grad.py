"""Hand-fused streaming VJP (models/stream_grad.py) == checkpointed AD.

The custom backward re-derives the cotangent chain by hand; these tests pin
it against jax AD through the same scan body, in f64, for every kernel
family, with non-divisible n (padding/mask gating live in the backward too)
and both evidence variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import Const, LinArd, LinOne, SeFat, SeIso
from gpr_tpu.models.streaming import streaming_log_evidence


def _setup(rng, family, n=71, d=3, m=9):
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    if family is SeFat:
        params = SeFat.Params(
            d=d,
            log_sf2=jnp.asarray(0.2),
            tproj=jnp.asarray(rng.standard_normal((d, d)) / d),
            log_hetero_skedasticity=jnp.asarray(
                rng.standard_normal(m) * 0.1 - 3.0
            ),
            log_multiscales_m05=jnp.asarray(rng.standard_normal((m, d)) * 0.1),
        )
    else:
        params = family.default_params(X, m)
    # Perturb the inducing representation off the data rows: at an exact
    # interpolation point (Z == scaled X rows) the true gradient is a tiny
    # residue of O(1) cancelling per-tile terms, and "AD == custom to
    # roundoff" becomes relative to the cancellation scale, not the result.
    Z = family.inducing_from_inputs(params, X[:m])
    Z = Z + 0.05 * jnp.asarray(rng.standard_normal(Z.shape))
    return params, Z, X, y


@pytest.mark.parametrize("family", [SeIso, SeFat, LinOne, LinArd, Const])
@pytest.mark.parametrize("variational", [False, True])
def test_custom_vjp_matches_ad(rng, family, variational):
    params, Z, X, y = _setup(rng, family)
    sigma2 = jnp.asarray(0.3)

    def make_obj(grad_impl):
        def obj(params, Z, sigma2):
            return streaming_log_evidence(
                family, params, Z, sigma2, X, y,
                variational=variational, block_size=16, grad_impl=grad_impl,
            )
        return obj

    v_ad, g_ad = jax.value_and_grad(make_obj("ad"), argnums=(0, 1, 2))(
        params, Z, sigma2
    )
    v_cv, g_cv = jax.value_and_grad(make_obj("custom"), argnums=(0, 1, 2))(
        params, Z, sigma2
    )
    assert np.isclose(float(v_ad), float(v_cv), rtol=1e-12, atol=1e-12)
    flat_ad = jax.tree.leaves(g_ad)
    flat_cv = jax.tree.leaves(g_cv)
    assert len(flat_ad) == len(flat_cv)
    for a, c in zip(flat_ad, flat_cv):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=1e-9, atol=1e-9
        )


def test_custom_vjp_under_jit_and_mask(rng):
    """jit + explicit mask path (sharded callers pass masks)."""
    from gpr_tpu.models.fitc import calc_inducing
    from gpr_tpu.models.streaming import evidence_from_stats, stream_stats

    params, Z, X, y = _setup(rng, SeIso, n=50)
    mask = jnp.asarray((rng.uniform(size=50) > 0.2).astype(np.float64))
    sigma2 = jnp.asarray(0.5)

    def make_obj(grad_impl):
        @jax.jit
        def obj(params, Z, sigma2, X, y, mask):
            inducing = calc_inducing(SeIso, params, Z)
            stats = stream_stats(
                SeIso, params, inducing, sigma2, X, y, block_size=16,
                mask=mask, grad_impl=grad_impl,
            )
            return evidence_from_stats(inducing, stats, variational=True)
        return obj

    args = (params, Z, sigma2, X, y, mask)
    v_ad, g_ad = jax.value_and_grad(make_obj("ad"), argnums=(0, 1, 2))(*args)
    v_cv, g_cv = jax.value_and_grad(make_obj("custom"), argnums=(0, 1, 2))(
        *args
    )
    assert np.isclose(float(v_ad), float(v_cv), rtol=1e-12)
    for a, c in zip(jax.tree.leaves(g_ad), jax.tree.leaves(g_cv)):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=1e-9, atol=1e-9
        )


def test_custom_vjp_sharded(rng):
    """Default grad path inside shard_map == single-device AD gradients."""
    from gpr_tpu.parallel import make_mesh, shard_batch
    from gpr_tpu.parallel.sharded import sharded_log_evidence

    params, Z, X, y = _setup(rng, SeIso, n=64)
    sigma2 = jnp.asarray(0.4)
    mesh = make_mesh(8)
    Xs, ys, mask = shard_batch(mesh, X, y)

    def obj_sharded(params, Z, sigma2):
        return sharded_log_evidence(
            SeIso, mesh, params, Z, sigma2, Xs, ys, mask, block_size=8
        )

    def obj_local(params, Z, sigma2):
        return streaming_log_evidence(
            SeIso, params, Z, sigma2, X, y, block_size=8, grad_impl="ad"
        )

    v_s, g_s = jax.jit(jax.value_and_grad(obj_sharded, argnums=(0, 1, 2)))(
        params, Z, sigma2
    )
    v_l, g_l = jax.value_and_grad(obj_local, argnums=(0, 1, 2))(
        params, Z, sigma2
    )
    assert np.isclose(float(v_s), float(v_l), rtol=1e-11)
    for a, c in zip(jax.tree.leaves(g_l), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=1e-8, atol=1e-10
        )


def test_custom_vjp_y_cotangent_matches_ad(rng):
    """d/dy of the streaming evidence: custom VJP == checkpointed AD (the
    warped-GP training path differentiates w.r.t. the targets)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gpr_tpu.kernels import SeIso
    from gpr_tpu.models.streaming import streaming_log_evidence

    X = jnp.asarray(rng.standard_normal((150, 3)))
    y = jnp.asarray(rng.standard_normal(150))
    Z = jnp.asarray(rng.standard_normal((7, 3)))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))

    def f(y, impl):
        return streaming_log_evidence(SeIso, p, Z, 0.3, X, y, block_size=64,
                                      grad_impl=impl, variational=True)

    g_custom = jax.grad(lambda y: f(y, "custom"))(y)
    g_ad = jax.grad(lambda y: f(y, "ad"))(y)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ad),
                               rtol=1e-10, atol=1e-12)


def test_bwd_demote_sites_wiring(rng):
    """config.bwd_demote_sites moves exactly the named backward GEMMs to
    DEFAULT precision (checked in the lowered HLO; numerically a no-op on
    CPU), and never touches the forward or the un-named sites."""
    from gpr_tpu.config import config

    X = jnp.asarray(rng.standard_normal((128, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(128), jnp.float32)
    Z = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
    p = SeIso.Params(log_ell=jnp.asarray(0.2, jnp.float32),
                     log_sf2=jnp.asarray(0.1, jnp.float32))

    def lowered_default_dots(sites):
        old = config.bwd_demote_sites
        config.bwd_demote_sites = sites
        try:
            def f(p_, z, s2):
                return streaming_log_evidence(
                    SeIso, p_, z, s2, X, y, block_size=64,
                    grad_variant="ug")
            txt = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2))).lower(
                p, Z, jnp.float32(0.3)).as_text()
            return txt.count("precision = [DEFAULT, DEFAULT]")
        finally:
            config.bwd_demote_sites = old

    base = lowered_default_dots(())
    assert lowered_default_dots(("ui_bar",)) == base + 1
    assert lowered_default_dots(("ui_bar", "vg", "knm_bar")) == base + 3


def test_custom_vjp_two_term_structures(rng):
    """Regression: params PyTrees containing a 2-TUPLE of dataclasses
    (2-term combinators, the ICM multi-output composition) broke the
    old structural is_leaf pair-matching in the accumulator — the
    (hi, lo) pairs are positional now.  Custom VJP must equal AD for
    both structures."""
    from gpr_tpu.kernels import icm_family, product_family

    n, d, m = 57, 2, 7
    for fam, aug in [
        (product_family(SeIso, LinOne), False),
        (icm_family(SeIso, d, 3, 2), True),
    ]:
        Xf = rng.standard_normal((n, d))
        X = jnp.asarray(
            np.c_[Xf, rng.integers(0, 3, n).astype(float)] if aug else Xf
        )
        y = jnp.asarray(rng.standard_normal(n))
        params = fam.default_params(X, m, jax.random.PRNGKey(0))
        Z = X[:m] + 0.05 * jnp.asarray(rng.standard_normal((m, X.shape[1])))
        if aug:
            Z = Z.at[:, d].set(X[:m, d])  # keep task ids integral

        def obj(grad_impl, params, Z, s2):
            return streaming_log_evidence(
                fam, params, Z, s2, X, y, block_size=16,
                grad_impl=grad_impl,
            )

        s2 = jnp.asarray(0.3)
        v_ad, g_ad = jax.value_and_grad(
            lambda p, z, s: obj("ad", p, z, s), argnums=(0, 1, 2)
        )(params, Z, s2)
        v_cv, g_cv = jax.value_and_grad(
            lambda p, z, s: obj("custom", p, z, s), argnums=(0, 1, 2)
        )(params, Z, s2)
        assert np.isclose(float(v_ad), float(v_cv), rtol=1e-12), fam.name
        for a, c in zip(jax.tree.leaves(g_ad), jax.tree.leaves(g_cv)):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(a), rtol=1e-9, atol=1e-9,
                err_msg=fam.name,
            )
