"""Mesh-parallel multi-start training == the sequential path.

probe_starts_sharded runs one batch of starts per device (starts axis
sharded, data replicated); fit_restarts_sharded composes it with the
n-sharded continuation.  The sequential oracle is optim.fit_restarts on a
single device — probe objectives and the winning basin must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.optim import fit_restarts, make_pack
from gpr_tpu.parallel import (
    fit_restarts_sharded,
    make_mesh,
    probe_starts_sharded,
)


def _problem(rng, n=384, d=2, m=6):
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1))
                    + 0.1 * rng.standard_normal(n))
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    Z0 = X[:m]
    pack = make_pack(SeIso, p0, Z0, 0.5)
    return X, y, pack


def _ladder(pack, offsets):
    # vary the leading packed hyper (log_sigma2) — cheap distinct starts
    return [pack.x0.at[0].add(o) for o in offsets]


@pytest.mark.parametrize("n_starts", [3, 4])  # 3 exercises start padding
def test_probe_starts_match_sequential(rng, n_starts):
    X, y, pack = _problem(rng)
    mesh = make_mesh(4)
    x0s = _ladder(pack, np.linspace(-1.0, 1.0, n_starts))

    sts = probe_starts_sharded(
        SeIso, mesh, X, y, pack, x0s, probe_iters=8,
        streaming_block_size=128, epsabs=1e-10,
    )
    assert sts.x.shape[0] == n_starts

    # sequential oracle: fit_restarts with zero-length continuation is not
    # expressible, so run its probe phase by hand via the same machinery
    from gpr_tpu.optim.lbfgs_device import (
        _chunk_loop,
        _fresh_state,
        _make_fg,
        minimize_lbfgs_device,
    )

    fg = _make_fg(SeIso, pack, False, 128, 1.0 / X.shape[0], None)
    for i, x0 in enumerate(x0s):
        st = _fresh_state(x0, *fg(x0, X, y), 10)
        st = minimize_lbfgs_device(
            lambda x: fg(x, X, y), st.x, epsabs=1e-10, max_iter=8,
            history=10, init_state=st,
        )
        np.testing.assert_allclose(float(sts.f[i]), float(st.f), rtol=1e-9)
        assert int(sts.n_iter[i]) == int(st.n_iter)
        np.testing.assert_allclose(
            np.asarray(sts.x[i]), np.asarray(st.x), rtol=1e-7, atol=1e-9
        )


def test_fit_restarts_sharded_matches_sequential(rng):
    X, y, pack = _problem(rng)
    mesh = make_mesh(4)
    x0s = _ladder(pack, [-1.0, 0.0, 1.0])

    p_s, z_s, s2_s, st_s, rep_s = fit_restarts_sharded(
        SeIso, mesh, X, y, pack, x0s, probe_iters=6, max_iter=25,
        block_size=128, epsabs=1e-8,
    )
    p_q, z_q, s2_q, st_q, rep_q = fit_restarts(
        SeIso, X, y, pack, x0s, probe_iters=6, max_iter=25,
        streaming_block_size=128, epsabs=1e-8,
    )
    # same probe objectives, same winning basin
    np.testing.assert_allclose(list(rep_s), list(rep_q), rtol=1e-8)
    np.testing.assert_allclose(float(st_s.f), float(st_q.f), rtol=1e-6)
    np.testing.assert_allclose(float(s2_s), float(s2_q), rtol=1e-4)
    assert rep_s.probe_iters == rep_q.probe_iters
    assert not bool(st_s.failed)


@pytest.mark.slow
def test_fit_restarts_sharded_subsampled(rng):
    X, y, pack = _problem(rng, n=512)
    mesh = make_mesh(4)
    x0s = _ladder(pack, [-1.0, 0.0, 1.0])

    p_s, z_s, s2_s, st_s, rep_s = fit_restarts_sharded(
        SeIso, mesh, X, y, pack, x0s, probe_iters=6, max_iter=20,
        block_size=128, epsabs=1e-8, probe_subsample=128, probe_seed=7,
    )
    p_q, z_q, s2_q, st_q, rep_q = fit_restarts(
        SeIso, X, y, pack, x0s, probe_iters=6, max_iter=20,
        streaming_block_size=128, epsabs=1e-8, probe_subsample=128,
        probe_seed=7,
    )
    np.testing.assert_allclose(list(rep_s), list(rep_q), rtol=1e-8)
    np.testing.assert_allclose(float(st_s.f), float(st_q.f), rtol=1e-6)
    assert np.isfinite(float(s2_s)) and float(s2_s) > 0


@pytest.mark.slow
def test_fit_restarts_sharded_2d_mesh(rng):
    """On a 2-D (data x model) mesh the probes shard over the data axis
    and the continuation runs tensor-parallel (fit_sharded_2d) — the
    result matches the 1-D-mesh run (both are exact)."""
    from gpr_tpu.parallel import make_mesh_2d

    X, y, pack = _problem(rng, n=256, m=8)
    mesh2 = make_mesh_2d(2, 2)
    mesh1 = make_mesh(4)
    x0s = _ladder(pack, [-1.0, 0.0, 1.0])

    p2, z2, s22, st2, rep2 = fit_restarts_sharded(
        SeIso, mesh2, X, y, pack, x0s, probe_iters=5, max_iter=15,
        block_size=64, epsabs=1e-8,
    )
    p1, z1, s21, st1, rep1 = fit_restarts_sharded(
        SeIso, mesh1, X, y, pack, x0s, probe_iters=5, max_iter=15,
        block_size=64, epsabs=1e-8,
    )
    np.testing.assert_allclose(list(rep2), list(rep1), rtol=1e-8)
    np.testing.assert_allclose(float(st2.f), float(st1.f), rtol=1e-6)
    assert not bool(st2.failed)
