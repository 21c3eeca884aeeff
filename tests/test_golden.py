"""Golden-value regression tests.

Freezes exact f64 evidence values for fixed seeds/configs so future
refactors that accidentally change the math (rather than just its schedule)
fail loudly.  Values were produced by this implementation after it passed
the independent oracle suite (tests/test_fitc_oracle.py) — they certify
continuity, the oracle certifies correctness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import Const, LinArd, LinOne, SeFat, SeIso
from gpr_tpu.models import log_evidence


def _data(family):
    rng = np.random.default_rng(2026)
    X = jnp.asarray(rng.standard_normal((40, 3)))
    y = jnp.asarray(rng.standard_normal(40))
    if family is SeFat:
        params = SeFat.Params(
            d=2,
            log_sf2=jnp.asarray(0.25),
            tproj=jnp.asarray(rng.standard_normal((3, 2))),
            log_hetero_skedasticity=jnp.asarray(rng.standard_normal(6) - 2.0),
            log_multiscales_m05=jnp.asarray(0.1 * rng.standard_normal((6, 2))),
        )
    else:
        params = family.default_params(X, 6, key=jax.random.PRNGKey(0))
    Z = family.inducing_from_inputs(params, X[:6])
    return params, Z, X, y


def compute(family, variational):
    params, Z, X, y = _data(family)
    return float(
        log_evidence(family, params, Z, 0.8, X, y, variational=variational,
                     factorization="qr")
    )


# Pinned values (f64, jitter 1e-6, seed 2026); regenerate deliberately with
# tests/test_golden.py::generate if the math is *intentionally* changed.
PINNED = {
    ("const", False): -68.23889513241372,
    ("const", True): -68.23889929907881,
    ("lin_one", False): -72.84231779898502,
    ("lin_one", True): -72.84238759183162,
    ("lin_ard", False): -70.90678934424167,
    ("lin_ard", True): -70.90683532854774,
    ("se_iso", False): -64.30903956829025,
    ("se_iso", True): -71.06053879063569,
    ("se_fat", False): -64.32875437177712,
    ("se_fat", True): -74.86928349722474,
}


@pytest.mark.parametrize("family", [Const, LinOne, LinArd, SeIso, SeFat],
                         ids=lambda f: f.name)
@pytest.mark.parametrize("variational", [False, True])
def test_golden_evidence(family, variational):
    got = compute(family, variational)
    key = (family.name, variational)
    np.testing.assert_allclose(got, PINNED[key], rtol=1e-12, atol=0)
