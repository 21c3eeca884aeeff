"""Aux subsystems (timing/debug/logging) and the synthetic dataset."""

import io
import json

import numpy as np
import pytest

from gpr_tpu.config import config
from gpr_tpu.datasets import gen_data, gen_data_fn
from gpr_tpu.utils import JsonlLogger, check_finite, check_symmetric, timing


def test_gen_data_matches_reference_fn():
    # spot values of sin(3x)/x + |x-3|/(x^2+1)
    x = np.array([1.0, -2.0, 3.0])
    expect = (
        np.sin(3 * x) / x + np.abs(x - 3) / (x * x + 1)
    )
    np.testing.assert_allclose(gen_data_fn(x), expect, rtol=1e-12)
    # continuity at 0: lim sin(3x)/x = 3, plus |0-3|/1 = 3
    np.testing.assert_allclose(gen_data_fn(np.array([0.0])), [6.0], rtol=1e-12)


def test_gen_data_shapes_and_noise():
    X, y, f = gen_data(seed=1, n=500)
    assert X.shape == (500, 1) and y.shape == (500,)
    resid = y - f
    assert 0.5 < resid.std() < 0.9  # sigma = 0.7
    assert np.all(np.diff(X[:, 0]) >= 0)  # sorted


def test_timing_prints():
    buf = io.StringIO()
    with timing("op", stream=buf):
        pass
    assert buf.getvalue().startswith("op: ")


def test_check_finite_gated_by_debug():
    bad = np.array([1.0, np.nan])
    check_finite("x", bad)  # debug off: no-op
    config.debug = True
    try:
        with pytest.raises(FloatingPointError, match="check_finite"):
            check_finite("x", bad)
        with pytest.raises(AssertionError, match="asymmetry"):
            check_symmetric("m", np.array([[1.0, 2.0], [0.0, 1.0]]))
        check_symmetric("ok", np.eye(3))
    finally:
        config.debug = False


def test_jsonl_logger():
    buf = io.StringIO()
    with JsonlLogger(buf) as log:
        log.write(iter=1, l=-123.5)
        log.write(iter=2, l=-100.0, note="better")
    lines = [json.loads(line) for line in buf.getvalue().splitlines()]
    assert lines[0]["iter"] == 1 and lines[0]["l"] == -123.5
    assert lines[1]["note"] == "better"
    assert "ts" in lines[0]


def test_debug_nans_context():
    import jax
    import jax.numpy as jnp

    from gpr_tpu.utils import debug_nans

    old = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
        with pytest.raises(FloatingPointError):
            # a shape no other test uses: the nan check is baked into the
            # compiled op, and a cached non-checking executable from an
            # earlier test would otherwise be reused (measured: this test
            # is order-flaky with a scalar log)
            jnp.sum(jnp.log(jnp.full((13, 11), -1.0))) + 1.0
    assert jax.config.jax_debug_nans == old
