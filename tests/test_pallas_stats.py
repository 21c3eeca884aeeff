"""Fused Pallas statistics kernels == the scan path (interpreter mode).

CPU CI runs the kernels through the Pallas interpreter so the kernel math —
tiling, masking, in-VMEM accumulation, dot_general contractions — is covered
without TPU hardware.  Tolerances are f32-class: the kernels compute in f32
by design (the scan reference here runs in f64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.fitc import calc_inducing
from gpr_tpu.models.streaming import stream_stats, streaming_log_evidence
from gpr_tpu.numerics.linalg import inv_tri_upper
from gpr_tpu.ops.fused_stats import (
    se_iso_stream_stats_fused,
    se_iso_stream_stats_fused_acc,
)


def _setup(rng, n=300, d=3, m=8):
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    p = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.1))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    sigma2 = jnp.asarray(0.4)
    return p, Z, X, y, sigma2


@pytest.mark.parametrize("fused", [se_iso_stream_stats_fused,
                                   se_iso_stream_stats_fused_acc])
@pytest.mark.parametrize("n", [256, 300])  # divisible and padded
def test_fused_kernels_match_scan(rng, fused, n):
    p, Z, X, y, sigma2 = _setup(rng, n=n)
    inducing = calc_inducing(SeIso, p, Z)
    ref = stream_stats(SeIso, p, inducing, sigma2, X, y, block_size=64,
                       grad_impl="ad")
    u_inv = inv_tri_upper(inducing.chol_km)
    gram, u_vec, lds, yiy, isr, cnt = fused(
        p.log_ell, p.log_sf2, Z, u_inv, sigma2, X, y,
        block_size=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(gram), np.asarray(ref.gram),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u_vec), np.asarray(ref.u_vec),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(lds), float(ref.log_det_s), rtol=1e-5)
    np.testing.assert_allclose(float(yiy), float(ref.y_is_y), rtol=1e-4)
    np.testing.assert_allclose(float(isr), float(ref.is_r_sum), rtol=1e-4)
    assert int(cnt) == n


def test_fused_kernel_mask(rng):
    """Explicit mask (sharded-caller protocol) gates padded rows exactly."""
    p, Z, X, y, sigma2 = _setup(rng, n=200)
    mask = jnp.asarray((np.arange(200) < 170).astype(np.float64))
    inducing = calc_inducing(SeIso, p, Z)
    ref = stream_stats(SeIso, p, inducing, sigma2, X, y, block_size=64,
                       mask=mask, grad_impl="ad")
    u_inv = inv_tri_upper(inducing.chol_km)
    gram, u_vec, lds, yiy, isr, cnt = se_iso_stream_stats_fused_acc(
        p.log_ell, p.log_sf2, Z, u_inv, sigma2, X, y, mask,
        block_size=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(gram), np.asarray(ref.gram),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(lds), float(ref.log_det_s), rtol=1e-5)
    assert int(cnt) == 170


@pytest.mark.parametrize("variational", [False, True])
def test_impl_pallas_evidence_and_grads(rng, variational):
    """streaming_log_evidence(impl='pallas') is differentiable: Pallas
    forward (interpreted on CPU) + the hand-fused VJP backward."""
    p, Z, X, y, sigma2 = _setup(rng, n=300)

    def make_obj(impl):
        def obj(p, Z, sigma2):
            return streaming_log_evidence(
                SeIso, p, Z, sigma2, X, y, variational=variational,
                block_size=64, impl=impl,
            )
        return obj

    v_ref, g_ref = jax.value_and_grad(make_obj("scan"), argnums=(0, 1, 2))(
        p, Z, sigma2
    )
    v_pl, g_pl = jax.value_and_grad(make_obj("pallas"), argnums=(0, 1, 2))(
        p, Z, sigma2
    )
    # forward runs in f32 inside the kernel: f32-class agreement
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-6)
    # backward is the same hand-VJP scan, but its cotangents derive from
    # the f32 forward statistics: f32-class agreement
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-5)


def test_impl_pallas_rejects_other_families(rng):
    from gpr_tpu.kernels import LinOne

    X = jnp.asarray(rng.standard_normal((40, 2)))
    y = jnp.asarray(rng.standard_normal(40))
    p = LinOne.default_params(X, 4)
    Z = LinOne.inducing_from_inputs(p, X[:4])
    with pytest.raises(ValueError, match="se_iso"):
        streaming_log_evidence(LinOne, p, Z, 0.5, X, y, impl="pallas",
                               block_size=16)


@pytest.mark.parametrize("variational", [False, True])
def test_bwd_pallas_matches_scan(rng, variational):
    """grad_variant='pallas' (fused backward tile) == the scan backward.

    f32-class tolerances: the kernel computes in f32 by design while the
    scan reference here runs the suite's f64.
    """
    p, Z, X, y, sigma2 = _setup(rng, n=300, d=3, m=9)
    p = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), p)
    Z, X = Z.astype(jnp.float32), X.astype(jnp.float32)
    y, sigma2 = y.astype(jnp.float32), sigma2.astype(jnp.float32)

    def make(variant):
        def obj(p, z, s2):
            return streaming_log_evidence(
                SeIso, p, z, s2, X, y, variational=variational,
                block_size=64, grad_variant=variant,
            )
        return jax.jit(jax.value_and_grad(obj, argnums=(0, 1, 2)))

    v_ref, g_ref = make("base")(p, Z, sigma2)
    v_pl, g_pl = make("pallas")(p, Z, sigma2)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=1e-4)


def test_bwd_pallas_rejects_other_families(rng):
    from gpr_tpu.kernels import SeFat

    X = jnp.asarray(rng.standard_normal((40, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(40), jnp.float32)
    p = SeFat.default_params(X, 4)
    Z = SeFat.inducing_from_inputs(p, X[:4])
    with pytest.raises(ValueError, match="se_iso"):
        jax.grad(
            lambda pp: streaming_log_evidence(
                SeFat, pp, Z, 0.5, X, y, block_size=16,
                grad_variant="pallas",
            )
        )(p)
