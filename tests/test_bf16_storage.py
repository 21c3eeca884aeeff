"""bf16 storage mode: X/y stored at half width, upcast per tile on chip."""

import jax
import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import SeIso
from gpr_tpu.models.streaming import streaming_log_evidence
from gpr_tpu.utils import to_bf16_stochastic


def test_bf16_storage_evidence_and_grads(rng):
    n, d, m = 300, 3, 8
    Xf = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    yf = jnp.asarray(rng.standard_normal(n), jnp.float32)
    Z = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    p = SeIso.Params(log_ell=jnp.asarray(0.3, jnp.float32),
                     log_sf2=jnp.asarray(0.1, jnp.float32))
    s2 = jnp.asarray(0.4, jnp.float32)

    def obj(X, y):
        def f(p, Z, s2):
            return streaming_log_evidence(SeIso, p, Z, s2, X, y,
                                          block_size=64)
        return jax.value_and_grad(f, argnums=(0, 1, 2))(p, Z, s2)

    v32, g32 = obj(Xf, yf)
    Xb = Xf.astype(jnp.bfloat16)
    yb = yf.astype(jnp.bfloat16)
    vb, gb = obj(Xb, yb)
    # outputs stay in the compute dtype and are close at bf16-input accuracy
    assert vb.dtype == jnp.float32 if not jax.config.jax_enable_x64 else True
    assert np.isfinite(float(vb))
    np.testing.assert_allclose(float(vb), float(v32), rtol=2e-2)
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(gb)):
        assert np.all(np.isfinite(np.asarray(b)))


def test_stochastic_rounding_unbiased(rng):
    x = jnp.full((20000,), 1.0 + 2.0 ** -9)  # exactly between bf16 steps
    q = to_bf16_stochastic(jax.random.PRNGKey(0), x)
    qm = float(jnp.mean(q.astype(jnp.float32)))
    # round-to-nearest would give 1.0 or 1.0078125 for ALL entries; the
    # stochastic mean recovers the true value within sampling noise
    assert abs(qm - float(x[0])) < 2e-4
    vals = np.unique(np.asarray(q.astype(jnp.float32)))
    assert len(vals) == 2


def test_bf16_storage_custom_vjp_matches_ad(rng):
    """Regression: cotangents must stay in the COMPUTE dtype — casting them
    to the bf16 STORAGE dtype silently truncated every hyper gradient
    (caught in round-2 self-review)."""
    n, d, m = 200, 3, 7
    Xf = jnp.asarray(rng.standard_normal((n, d)))
    yf = jnp.asarray(rng.standard_normal(n))
    Z = jnp.asarray(rng.standard_normal((m, d)))
    p = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(0.1))
    s2 = jnp.asarray(0.4)
    Xb, yb = Xf.astype(jnp.bfloat16), yf.astype(jnp.bfloat16)

    def obj(impl):
        def f(p, Z, s2):
            return streaming_log_evidence(SeIso, p, Z, s2, Xb, yb,
                                          block_size=32, grad_impl=impl)
        return f

    v_cv, g_cv = jax.value_and_grad(obj("custom"), argnums=(0, 1, 2))(
        p, Z, s2
    )
    v_ad, g_ad = jax.value_and_grad(obj("ad"), argnums=(0, 1, 2))(p, Z, s2)
    np.testing.assert_allclose(float(v_cv), float(v_ad), rtol=1e-12)
    for a, c in zip(jax.tree.leaves(g_ad), jax.tree.leaves(g_cv)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-9,
                                   atol=1e-9)
