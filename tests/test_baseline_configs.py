"""End-to-end checks mirroring BASELINE.json's benchmark configs (scaled to
CI size; the full-size numbers run in bench.py on hardware):

1. dense full-GP regression (m = n) on the gen_data synthetic
2. FITC se_iso with learned inducing inputs on a synthetic nonlinear fit
3. variational/FIC evidence bound + derivative self-test
4. se_fat with supervised dimensionality reduction on high-dim data
5. sharded evidence+gradient == single device (in test_streaming_sharded)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.datasets import gen_data
from gpr_tpu.kernels import SeFat, SeIso
from gpr_tpu.models import calc_stats, log_evidence
from gpr_tpu.optim import train
from gpr_tpu.testing import self_test
from oracle import dense_gp_posterior


@pytest.mark.slow
def test_config1_dense_full_gp_on_gen_data(rng):
    """m = n FITC == exact dense GP on the reference synthetic."""
    X_np, y_np, _ = gen_data(seed=3, n=150)
    X, y = jnp.asarray(X_np), jnp.asarray(y_np)
    p = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    l_fitc = float(log_evidence(SeIso, p, X, 0.49, X, y))
    _, _, lml = dense_gp_posterior(X_np, X_np[:1], y_np, 0.49, 0.0, 0.0)
    np.testing.assert_allclose(l_fitc, lml, rtol=1e-5)


@pytest.mark.slow
def test_config2_fitc_learned_inducing(rng):
    """FITC with m = 50 learned inducing inputs: inducing points must move
    from their random init and the fit must beat the trivial predictor."""
    X_np, y_np, _ = gen_data(seed=5, n=800)
    X, y = jnp.asarray(X_np), jnp.asarray(y_np)
    key = jax.random.PRNGKey(11)
    res = train(SeIso, X, y, n_rand_inducing=50, epsabs=2.0, max_iter=40,
                key=key)
    st = calc_stats(res.trained)
    assert float(st.smse) < 0.45
    # inducing locations were optimized (SPGP): they moved
    from gpr_tpu.models import choose_n_random_inputs
    z0 = choose_n_random_inputs(key, SeIso, res.kernel_params, X, 50)
    moved = float(jnp.max(jnp.abs(res.inducing - z0)))
    assert moved > 1e-3


@pytest.mark.slow
def test_config3_variational_bound_and_derivatives(rng):
    """The variational evidence lower-bounds the standard FITC evidence at
    the same hypers, and its full gradient passes the FD self-test."""
    X = jnp.asarray(rng.standard_normal((60, 2)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)))
    p = SeIso.Params(log_ell=jnp.asarray(0.1), log_sf2=jnp.asarray(0.0))
    Z = X[:8]
    lv = float(log_evidence(SeIso, p, Z, 0.3, X, y, variational=True))
    ls = float(log_evidence(SeIso, p, Z, 0.3, X, y, variational=False))
    assert lv <= ls  # the Titsias correction is -1/2 sum(is r) <= 0
    self_test(SeIso, p, Z, X, y, 0.3, variational=True)


@pytest.mark.slow
def test_config4_se_fat_dim_reduction(rng):
    """High-dim regression where the signal lives in a low-dim projection;
    se_fat with tproj must find a decisively-better-than-trivial fit."""
    n, big_d = 400, 12
    X_np = rng.standard_normal((n, big_d))
    w = np.zeros((big_d, 2))
    w[:3, 0] = [1.0, -1.0, 0.5]
    w[3:6, 1] = [0.7, 0.7, -0.4]
    proj = X_np @ w
    y_np = np.sin(proj[:, 0]) * np.cos(proj[:, 1]) + 0.05 * rng.standard_normal(n)
    X, y = jnp.asarray(X_np), jnp.asarray(y_np)
    params = SeFat.Params(
        d=4,
        log_sf2=jnp.asarray(0.0),
        tproj=jnp.asarray(rng.standard_normal((big_d, 4)) / big_d),
        log_hetero_skedasticity=None,
        log_multiscales_m05=None,
    )
    res = train(SeFat, X, y, kernel_params=params, n_rand_inducing=30,
                variational=True, epsabs=1.0, max_iter=60)
    st = calc_stats(res.trained)
    assert float(st.smse) < 0.5
    # the projection was learned (moved from init)
    assert float(jnp.max(jnp.abs(res.kernel_params.tproj - params.tproj))) > 1e-3
