"""Device-resident L-BFGS: classic test functions + full GP training in one
jit, compared against the host-driven trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import SeIso
from gpr_tpu.models import calc_model, calc_trained, log_evidence
from gpr_tpu.optim import make_pack, train
from gpr_tpu.optim.lbfgs_device import minimize_lbfgs_device


def test_device_lbfgs_rosenbrock():
    def fg(x):
        f = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
        return f, jax.grad(
            lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
        )(x)

    st = minimize_lbfgs_device(
        fg, jnp.asarray([-1.2, 1.0]), epsabs=1e-7, max_iter=200,
        max_ls_evals=30,
    )
    np.testing.assert_allclose(np.asarray(st.x), [1.0, 1.0], atol=1e-5)
    assert float(jnp.linalg.norm(st.g)) < 1e-6


def test_device_lbfgs_quadratic():
    a = jnp.asarray(np.diag([1.0, 10.0, 100.0]))

    def fg(x):
        return 0.5 * x @ a @ x, a @ x

    st = minimize_lbfgs_device(fg, jnp.ones(3), epsabs=1e-9, max_iter=100)
    np.testing.assert_allclose(np.asarray(st.x), 0.0, atol=1e-8)


def test_device_lbfgs_trains_gp(rng):
    n, m, d = 300, 8, 2
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    Z0 = jnp.asarray(np.asarray(X)[:m])
    pack = make_pack(SeIso, p0, Z0, 1.0)

    def fg(x):
        def f(x):
            params, z, s2 = pack.unpack(x)
            return -log_evidence(SeIso, params, z, s2, X, y,
                                 factorization="chol")
        return jax.value_and_grad(f)(x)

    l_start = -float(fg(pack.x0)[0])
    st = minimize_lbfgs_device(fg, pack.x0, epsabs=1.0, max_iter=100,
                               step=0.1, tol=0.1)
    l_dev = -float(st.f)
    assert l_dev > l_start + 10.0

    # host trainer on the same problem reaches a comparable optimum
    res = train(SeIso, X, y, kernel_params=p0, inducing=Z0, sigma2=1.0,
                epsabs=1.0, max_iter=200)
    l_host = float(res.l)
    assert abs(l_dev - l_host) < 0.05 * abs(l_host) + 5.0


def test_dispatch_chunking_matches_single_dispatch():
    """Chunked dispatches (init_state + dispatch_iters) walk the SAME
    trajectory as one long dispatch — the curvature history carries whole."""
    a = jnp.asarray(np.diag([1.0, 4.0, 25.0, 100.0]))
    b = jnp.asarray([1.0, -2.0, 0.5, 3.0])

    def fg(x):
        return 0.5 * x @ a @ x - b @ x, a @ x - b

    x0 = jnp.asarray([2.0, -1.0, 1.5, -0.5])
    full = minimize_lbfgs_device(fg, x0, epsabs=1e-10, max_iter=40)

    st = minimize_lbfgs_device(
        fg, x0, epsabs=1e-10, max_iter=40, dispatch_iters=7
    )
    while (
        int(st.n_iter) < 40
        and not bool(st.failed)
        and float(jnp.linalg.norm(st.g)) >= 1e-10
    ):
        st = minimize_lbfgs_device(
            fg, x0, epsabs=1e-10, max_iter=40, dispatch_iters=7,
            init_state=st,
        )

    assert int(st.n_iter) == int(full.n_iter)
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(float(st.f), float(full.f), rtol=1e-12)


def test_fit_chunked_equals_unchunked(rng):
    """fit()'s automatic chunk loop lands where a single dispatch lands."""
    from gpr_tpu.optim.lbfgs_device import fit

    n, m = 200, 6
    X = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    pack = make_pack(SeIso, p0, X[:m], 1.0)

    kw = dict(epsabs=1e-3, max_iter=60, step=0.1, tol=0.1)
    _, _, _, st_one = fit(SeIso, X, y, pack, dispatch_iters=1000, **kw)
    _, _, _, st_chunk = fit(SeIso, X, y, pack, dispatch_iters=9, **kw)
    assert int(st_chunk.n_iter) == int(st_one.n_iter)
    np.testing.assert_allclose(float(st_chunk.f), float(st_one.f), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st_chunk.x), np.asarray(st_one.x),
                               rtol=1e-8, atol=1e-10)


def test_fit_restarts_picks_best_start(rng):
    """fit_restarts probes every start and continues the best: the winner
    must match (or beat) the best single-start run, and the probe
    objectives must be reported per start."""
    from gpr_tpu.optim.lbfgs_device import fit, fit_restarts

    n, m = 200, 6
    X = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sin(3.0 * np.asarray(X).sum(1))
                    + 0.1 * rng.standard_normal(n))
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    pack = make_pack(SeIso, p0, X[:m], 1.0)

    # a log-lengthscale ladder of packed starts: pack Params variants with
    # the same options so the vectors share pack's layout
    x0s = [
        make_pack(
            SeIso,
            SeIso.Params(log_ell=jnp.asarray(le), log_sf2=jnp.asarray(0.0)),
            X[:m], 1.0,
        ).x0
        for le in (-1.5, 0.0, 1.5)
    ]

    kw = dict(epsabs=1e-3, max_iter=50)
    p_r, z_r, s2_r, st_r, probe_fs = fit_restarts(
        SeIso, X, y, pack, x0s, probe_iters=10, **kw
    )
    assert len(probe_fs) == 3 and all(np.isfinite(probe_fs))

    singles = []
    import dataclasses as dc

    for x0 in x0s:
        _, _, _, st = fit(SeIso, X, y, dc.replace(pack, x0=jnp.asarray(x0)),
                          **kw)
        singles.append(float(st.f))
    assert float(st_r.f) <= min(singles) + 1e-3


@pytest.mark.slow
def test_fit_restarts_subsample_probes(rng):
    """Subsampled probes rank basins on cheap data, then the winner
    retrains on the full set — the result must be competitive with
    full-data probing on the same ladder."""
    from gpr_tpu.optim.lbfgs_device import fit_restarts

    n, m = 400, 6
    X = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sin(3.0 * np.asarray(X).sum(1))
                    + 0.1 * rng.standard_normal(n))
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    pack = make_pack(SeIso, p0, X[:m], 1.0)
    x0s = [
        make_pack(
            SeIso,
            SeIso.Params(log_ell=jnp.asarray(le), log_sf2=jnp.asarray(0.0)),
            X[:m], 1.0,
        ).x0
        for le in (-1.5, 0.0, 1.5)
    ]
    kw = dict(probe_iters=8, epsabs=1e-3, max_iter=40)
    _, _, _, st_full, _ = fit_restarts(SeIso, X, y, pack, x0s, **kw)
    _, _, _, st_sub, probe_fs = fit_restarts(
        SeIso, X, y, pack, x0s, probe_subsample=120, **kw
    )
    assert len(probe_fs) == 3 and all(np.isfinite(probe_fs))
    assert np.isfinite(float(st_sub.f))
    # same ladder, same data: the subsample-probed run must land within a
    # modest margin of the full-probed optimum (same basin or better)
    assert float(st_sub.f) <= float(st_full.f) + 0.05 * abs(float(st_full.f))


def test_fit_restarts_nan_start_never_wins(rng):
    """A diverged start (NaN objective) must lose to any finite probe —
    float comparisons against NaN are always False, so naive best-keeping
    would keep the NaN."""
    from gpr_tpu.optim.lbfgs_device import fit_restarts

    n, m = 120, 5
    X = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    pack = make_pack(SeIso, p0, X[:m], 1.0)

    bad = np.asarray(pack.x0).copy()
    bad[:] = 1e30  # overflows the kernel exponentials -> NaN objective
    _, _, _, st, probe_fs = fit_restarts(
        SeIso, X, y, pack, [bad, pack.x0], probe_iters=5, max_iter=15,
        epsabs=1e-3,
    )
    assert not np.isfinite(probe_fs[0]) or probe_fs[0] > probe_fs[1]
    assert np.isfinite(float(st.f))


def test_fit_map_prior_pulls_hyper(rng):
    """fit(log_prior=) does MAP like train(log_prior=): a steep prior on
    log_ell pulls the trained value to its mean."""
    from gpr_tpu.optim.lbfgs_device import fit
    from gpr_tpu.optim.priors import field_priors, normal

    n, m = 200, 6
    X = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.standard_normal(n))
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    pack = make_pack(SeIso, p0, X[:m], 1.0)
    kw = dict(epsabs=1e-3, max_iter=40)

    p_ml, _, _, _ = fit(SeIso, X, y, pack, **kw)
    target = float(p_ml.log_ell) + 2.0
    prior = field_priors({"log_ell": normal(target, 0.01)})
    p_map, _, _, _ = fit(SeIso, X, y, pack, log_prior=prior, **kw)
    assert abs(float(p_map.log_ell) - target) < 0.15
    assert abs(float(p_map.log_ell) - float(p_ml.log_ell)) > 1.0


def test_device_lbfgs_survives_nan_region():
    """Objective NaNs for x < 0; line search must shrink and converge to the
    minimum at x = 1 from a start that tempts overshoot."""

    def fg(x):
        f = jnp.where(x[0] <= 0, jnp.nan, (jnp.log(x[0])) ** 2)
        g = jnp.where(x[0] <= 0, jnp.nan, 2 * jnp.log(x[0]) / x[0])
        return f, g[None] if g.ndim == 0 else g

    st = minimize_lbfgs_device(fg, jnp.asarray([4.0]), epsabs=1e-6,
                               max_iter=60, max_ls_evals=25)
    np.testing.assert_allclose(np.asarray(st.x), [1.0], atol=1e-4)
