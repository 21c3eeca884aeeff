"""The rebuild of test/test_derivatives.ml: randomized FD validation of every
hyper of every kernel family through the deriv harness — se_fat with all
options on (10 random 3-D points, 5 inducing, matching the reference setup
at test/test_derivatives.ml:25-36), plus the four other families the
reference's executable doesn't cover."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import Const, LinArd, LinOne, SeFat, SeIso
from gpr_tpu.testing import check_deriv_hyper, self_test

SIGMA2 = 1.2


def _data(rng, family, n=10, d=3, m=5):
    X = jnp.asarray(rng.standard_normal((n, d)))
    if family is SeFat:
        params = SeFat.Params(
            d=2,
            log_sf2=jnp.asarray(0.3),
            tproj=jnp.asarray(rng.standard_normal((d, 2))),
            log_hetero_skedasticity=jnp.asarray(rng.standard_normal(m) - 2.0),
            log_multiscales_m05=jnp.asarray(0.3 * rng.standard_normal((m, 2))),
        )
    else:
        params = family.default_params(X, m, key=jax.random.PRNGKey(0))
    Z = family.inducing_from_inputs(params, X[:m])
    y = jnp.asarray(rng.standard_normal(n))
    return params, Z, X, y


FAMILIES = [Const, LinOne, LinArd, SeIso, SeFat]


@pytest.mark.parametrize("family", FAMILIES, ids=lambda f: f.name)
def test_check_deriv_hyper(rng, family):
    params, Z, X, _ = _data(rng, family)
    n_checked = check_deriv_hyper(family, params, Z, X)
    assert n_checked >= 1


@pytest.mark.parametrize("family", FAMILIES, ids=lambda f: f.name)
@pytest.mark.parametrize("variational", [False, True])
def test_self_test(rng, family, variational):
    params, Z, X, y = _data(rng, family)
    n_checked = self_test(
        family, params, Z, X, y, SIGMA2, variational=variational
    )
    # sigma2 is always checked; families with inducing hypers check them all
    expected_min = 2
    if family.learn_inducing_default:
        expected_min += Z.size
    assert n_checked >= expected_min


def test_self_test_catches_wrong_gradient(rng):
    """The harness must actually fail when AD and the true derivative
    disagree — the realistic custom-kernel bug is an accidental
    stop_gradient (AD sees zero, finite differences see the real slope)."""

    class Broken(SeIso):
        name = "broken"

        @staticmethod
        def k_diag(params, X):
            sf2 = jax.lax.stop_gradient(jnp.exp(params.log_sf2))
            return jnp.full((X.shape[0],), sf2, dtype=X.dtype)

    params, Z, X, y = _data(rng, SeIso)
    with pytest.raises(AssertionError):
        self_test(Broken, params, Z, X, y, SIGMA2)
