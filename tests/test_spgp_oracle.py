"""Cross-author oracle: gpr_tpu evidence/gradients vs Snelson's spgp_lik.

Mirrors the reference's own cross-check (/root/reference/test/oct.m:183-192):
the FITC (non-variational) log evidence and ALL its gradients must reproduce
Ed Snelson's independent SPGP implementation (tests/oracle_spgp.py, a numpy
transliteration of /root/reference/test/spgp_lik.m).

Parameter mapping (oct.m:185-192): spgp packs w = [vec(xb); log b; log c;
log sig] with b = inverse squared lengthscales, c = sf2, sig = sigma2, and
returns the NEGATIVE log likelihood fw, so l = -fw and signs flip; log-space
chain rules convert dfw to our parametrizations.  Both sides add the same
absolute jitter (1e-6) to the inducing gram.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import SeFat, SeIso
from gpr_tpu.models.fitc import log_evidence

from oracle_spgp import spgp_lik

JITTER = 1e-6


def _data(rng, n=60, d=3, m=8):
    X = rng.standard_normal((n, d))
    y = np.sin(X.sum(1)) + 0.1 * rng.standard_normal(n)
    xb = rng.standard_normal((m, d))
    return X, y, xb


def test_se_iso_evidence_and_grads_match_spgp(rng):
    n, d, m = 60, 3, 8
    X, y, xb = _data(rng, n, d, m)
    log_ell, log_sf2, sigma2 = 0.3, 0.2, 0.25

    # spgp side: b_d = exp(-2 log_ell) for all d
    w = np.concatenate([
        xb.reshape(m * d, order="F"),
        np.full(d, -2.0 * log_ell),
        [log_sf2],
        [np.log(sigma2)],
    ])
    fw, dfw = spgp_lik(w, y, X, m, JITTER)

    # gpr_tpu side (non-variational FITC, same jitter)
    params = SeIso.Params(log_ell=jnp.asarray(log_ell),
                          log_sf2=jnp.asarray(log_sf2))

    def obj(params, z, sigma2):
        return log_evidence(SeIso, params, z, sigma2, jnp.asarray(X),
                            jnp.asarray(y), jitter=JITTER,
                            factorization="chol")

    l, (gp, gz, gs2) = jax.value_and_grad(obj, argnums=(0, 1, 2))(
        params, jnp.asarray(xb), jnp.asarray(sigma2)
    )

    np.testing.assert_allclose(float(l), -fw, rtol=1e-10)

    dfxb = dfw[: m * d].reshape(m, d, order="F")
    dfb = dfw[m * d : m * d + d]
    dfc, dfsig = dfw[-2], dfw[-1]

    # l = -fw; log b = -2 log_ell => dl/dlog_ell = 2 sum_d dfb
    np.testing.assert_allclose(float(gp.log_ell), 2.0 * dfb.sum(), rtol=1e-8)
    np.testing.assert_allclose(float(gp.log_sf2), -dfc, rtol=1e-8)
    # dfsig is w.r.t. log sig: dl/dsigma2 = -dfsig / sigma2
    np.testing.assert_allclose(float(gs2), -dfsig / sigma2, rtol=1e-8)
    # inducing coordinates are raw inputs for se_iso
    np.testing.assert_allclose(np.asarray(gz), -dfxb, rtol=1e-7, atol=1e-10)


def test_se_fat_ard_matches_spgp(rng):
    """se_fat with a diagonal tproj == Snelson's ARD SE (per-dim b)."""
    n, d, m = 50, 3, 7
    X, y, xb = _data(rng, n, d, m)
    b = np.exp(rng.standard_normal(d) * 0.5)  # distinct inverse sq. scales
    log_sf2, sigma2 = 0.1, 0.3

    w = np.concatenate([
        xb.reshape(m * d, order="F"),
        np.log(b),
        [log_sf2],
        [np.log(sigma2)],
    ])
    fw, dfw = spgp_lik(w, y, X, m, JITTER)
    dfxb = dfw[: m * d].reshape(m, d, order="F")
    dfb = dfw[m * d : m * d + d]
    dfc, dfsig = dfw[-2], dfw[-1]

    # our side: tproj = diag(sqrt(b)) projects inputs to Snelson's scaled
    # space; the inducing representation IS the scaled pseudo-inputs
    sqrt_b = np.sqrt(b)
    params = SeFat.Params(
        d=d,
        log_sf2=jnp.asarray(log_sf2),
        tproj=jnp.asarray(np.diag(sqrt_b)),
        log_hetero_skedasticity=None,
        log_multiscales_m05=None,
    )
    z = jnp.asarray(xb * sqrt_b[None, :])

    def obj(params, z, sigma2):
        return log_evidence(SeFat, params, z, sigma2, jnp.asarray(X),
                            jnp.asarray(y), jitter=JITTER,
                            factorization="chol")

    l, (gp, gz, gs2) = jax.value_and_grad(obj, argnums=(0, 1, 2))(
        params, z, jnp.asarray(sigma2)
    )

    np.testing.assert_allclose(float(l), -fw, rtol=1e-10)
    np.testing.assert_allclose(float(gp.log_sf2), -dfc, rtol=1e-8)
    np.testing.assert_allclose(float(gs2), -dfsig / sigma2, rtol=1e-8)

    # dfxb is w.r.t. RAW xb; our z is the scaled xb: dl/dz = -dfxb / sqrt(b)
    np.testing.assert_allclose(
        np.asarray(gz), -dfxb / sqrt_b[None, :], rtol=1e-7, atol=1e-10
    )

    # diagonal tproj entries: spgp's dfb holds RAW xb fixed, ours holds z
    # (scaled) fixed.  Removing the xb-scaling share of dfb leaves the
    # X-side contribution q_i = dfb_i - sum_r dfxb[r,i] z[r,i] / (2 sqrt(b_i));
    # then dl/dtproj_ii = -2 q_i / sqrt(b_i).
    q = dfb - np.sum(dfxb * np.asarray(z), axis=0) / (2.0 * sqrt_b)
    expected_diag = -2.0 * q / sqrt_b
    got_diag = np.diag(np.asarray(gp.tproj))
    np.testing.assert_allclose(got_diag, expected_diag, rtol=1e-7, atol=1e-10)
