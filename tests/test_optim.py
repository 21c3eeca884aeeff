"""Optimizer layer: packing round-trips, L-BFGS on references functions,
full evidence training on the reference's synthetic benchmark
(test/gen_data.ml), SGD/SMD behavior, callbacks/interrupt semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import LinArd, SeFat, SeIso
from gpr_tpu.models import calc_stats
from gpr_tpu.optim import (
    Bailout,
    make_pack,
    minimize_lbfgs,
    run_ascent,
    sgd_create,
    sgd_step,
    smd_create,
    smd_step,
    train,
    train_sgd,
    train_smd,
)


def gen_data(rng, n=400, noise=0.7):
    """test/gen_data.ml:23-44: f(x) = sin(3x)/x + |x-3|/(x^2+1) on [-5,5]."""
    x = np.sort(rng.uniform(-5, 5, n))
    f = np.sin(3 * x) / x + np.abs(x - 3) / (x * x + 1)
    y = f + noise * rng.standard_normal(n)
    return jnp.asarray(x[:, None]), jnp.asarray(y)


# -- packing ----------------------------------------------------------------


def test_pack_roundtrip_se_iso(rng):
    X = jnp.asarray(rng.standard_normal((20, 2)))
    p = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(-0.2))
    Z = jnp.asarray(rng.standard_normal((4, 2)))
    pack = make_pack(SeIso, p, Z, 0.5)
    # layout: [log sigma2, params..., z...]
    assert pack.n_hypers == 1 + 2 + 8
    np.testing.assert_allclose(float(pack.x0[0]), np.log(0.5))
    params, z, sigma2 = pack.unpack(pack.x0)
    np.testing.assert_allclose(float(sigma2), 0.5, rtol=1e-12)
    np.testing.assert_allclose(float(params.log_ell), 0.3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(Z))


def test_pack_fixed_and_flags(rng):
    X = jnp.asarray(rng.standard_normal((20, 2)))
    p = SeIso.Params(log_ell=jnp.asarray(0.3), log_sf2=jnp.asarray(-0.2))
    Z = jnp.asarray(rng.standard_normal((4, 2)))
    pack = make_pack(
        SeIso, p, Z, 0.5, learn_sigma2=False, learn_inducing=False,
        fixed=("log_sf2",),
    )
    assert pack.n_hypers == 1  # only log_ell
    params, z, sigma2 = pack.unpack(pack.x0 + 1.0)
    np.testing.assert_allclose(float(params.log_ell), 1.3, rtol=1e-12)
    np.testing.assert_allclose(float(params.log_sf2), -0.2)
    np.testing.assert_allclose(float(sigma2), 0.5)


def test_pack_lin_ard_excludes_inducing_by_default(rng):
    X = jnp.asarray(rng.standard_normal((10, 3)))
    p = LinArd.default_params(X, 4)
    Z = LinArd.inducing_from_inputs(p, X[:4])
    pack = make_pack(LinArd, p, Z, 1.0)
    assert pack.n_hypers == 1 + 3  # sigma2 + log_ells; no inducing coords


def test_pack_se_fat_optional_fields(rng):
    X = jnp.asarray(rng.standard_normal((30, 6)))
    p = SeFat.default_params(X, 5, key=jax.random.PRNGKey(0))
    Z = SeFat.inducing_from_inputs(p, X[:5])
    pack = make_pack(SeFat, p, Z, 1.0)
    d = p.d
    expected = 1 + 1 + 6 * d + 5 + 5 * d + 5 * d  # s2, sf2, tproj, het, ms, z
    assert pack.n_hypers == expected


# -- L-BFGS core ------------------------------------------------------------


def test_lbfgs_rosenbrock():
    def fg(x):
        f = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
        g = np.array(
            [
                -400.0 * x[0] * (x[1] - x[0] ** 2) - 2 * (1 - x[0]),
                200.0 * (x[1] - x[0] ** 2),
            ]
        )
        return f, g

    res = minimize_lbfgs(fg, np.array([-1.2, 1.0]), epsabs=1e-8, max_iter=200)
    assert res.converged
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)


def test_lbfgs_quadratic_one_iteration_direction():
    a = np.diag([1.0, 10.0, 100.0])

    def fg(x):
        return 0.5 * x @ a @ x, a @ x

    res = minimize_lbfgs(fg, np.ones(3), epsabs=1e-10, max_iter=100)
    assert res.converged
    np.testing.assert_allclose(res.x, 0.0, atol=1e-8)


# -- end-to-end training ----------------------------------------------------


@pytest.mark.parametrize("variational", [False, True])
def test_train_improves_fit(rng, variational):
    X, y = gen_data(rng)
    trained = train(
        SeIso, X, y, n_rand_inducing=10, variational=variational,
        epsabs=5.0, max_iter=60,
    )
    st = calc_stats(trained)
    # the fit on this benchmark should be decisively better than the trivial
    # predictor (smse ~1) and the noise estimate near 0.49
    assert float(st.smse) < 0.5
    assert 0.2 < float(trained.model.sigma2) < 1.2


def test_train_reports_and_bailout(rng):
    X, y = gen_data(rng, n=200)
    iters = []

    def report(iter, trained):
        iters.append(iter)
        if iter >= 3:
            raise Bailout

    trained = train(
        SeIso, X, y, n_rand_inducing=8, report_trained_model=report,
        epsabs=1e-8, max_iter=500,
    )
    assert 3 <= len(iters) <= 4
    assert np.isfinite(float(trained.l))


def test_train_defaults(rng):
    X, y = gen_data(rng, n=150)
    trained = train(SeIso, X, y, max_iter=5, epsabs=5.0)
    # default n_inducing = min(n/10, 1000) = 15
    assert trained.coeffs.shape == (15,)


def test_train_se_fat_all_options(rng):
    rng2 = np.random.default_rng(7)
    X = jnp.asarray(rng2.standard_normal((120, 5)) + 3.0)
    w = rng2.standard_normal(5)
    y = jnp.asarray(np.tanh(np.asarray(X) @ w) + 0.1 * rng2.standard_normal(120))
    trained = train(
        SeFat, X, y, n_rand_inducing=8, variational=True, max_iter=25,
        epsabs=1.0,
    )
    assert np.isfinite(float(trained.l))
    assert float(calc_stats(trained).smse) < 1.0


# -- SGD / SMD --------------------------------------------------------------


def quad_grad(x):
    return -jnp.asarray([1.0, 4.0]) * x  # ascent gradient of -x'diag(.5,2)x


def quad_value(x):
    return -float(0.5 * x[0] ** 2 + 2.0 * x[1] ** 2)


def test_sgd_ascends():
    st = sgd_create(quad_grad, jnp.asarray([3.0, -2.0]), eta0=0.1)
    v0 = quad_value(st.x)
    best = run_ascent(
        lambda s: sgd_step(quad_grad, s), quad_value, st, epsabs=1e-3,
        max_iter=500,
    )
    assert quad_value(best.x) > v0
    assert np.linalg.norm(np.asarray(best.x)) < 1.0


def test_sgd_eta_decay():
    st = sgd_create(quad_grad, jnp.asarray([1.0, 1.0]), tau=10.0, eta0=0.1)
    st1 = sgd_step(quad_grad, st)
    # decay applies with step=0 first: eta1 = 10/(10+0) * 0.1 = 0.1, then
    # next uses step=1 -> x2's eta = 10/11 * 0.1
    st2 = sgd_step(quad_grad, st1)
    np.testing.assert_allclose(st2.eta, 10.0 / 11.0 * 0.1, rtol=1e-12)


def test_smd_exact_hvp_ascends():
    st = smd_create(quad_grad, jnp.asarray([3.0, -2.0]), eta0=0.05)
    for _ in range(200):
        st = smd_step(quad_grad, st)
        if st.gradient_norm < 1e-3:
            break
    assert np.linalg.norm(np.asarray(st.x)) < 0.1


def test_train_sgd_smd_on_gp(rng):
    X, y = gen_data(rng, n=150)
    t1 = train_sgd(SeIso, X, y, n_rand_inducing=6, max_iter=30, epsabs=1.0)
    t2 = train_smd(SeIso, X, y, n_rand_inducing=6, max_iter=15, epsabs=1.0)
    assert np.isfinite(float(t1.l))
    assert np.isfinite(float(t2.l))


def test_train_se_fat_fixed_subset(rng):
    """Hyper-subset selection through training: freeze tproj and the noise,
    learn only sf2/hetero/multiscales/inducing (the reference's explicit
    ``hypers`` array use case)."""
    X = jnp.asarray(rng.standard_normal((80, 4)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)))
    p0 = SeFat.default_params(X, 6, key=jax.random.PRNGKey(2))
    res = train(
        SeFat, X, y, kernel_params=p0, n_rand_inducing=6, sigma2=0.5,
        learn_sigma2=False, fixed=("tproj",), max_iter=6, epsabs=1.0,
        key=jax.random.PRNGKey(2),
    )
    np.testing.assert_allclose(np.asarray(res.kernel_params.tproj),
                               np.asarray(p0.tproj))
    np.testing.assert_allclose(float(res.sigma2), 0.5, rtol=1e-12)
    # something else did move
    assert float(jnp.abs(res.kernel_params.log_sf2 - p0.log_sf2)) > 1e-8


def test_map_prior_pulls_hypers(rng):
    """MAP with a tight prior on log_ell lands near the prior mean; MLE
    does not (optim/priors.py; log_prior= on train)."""
    import jax
    import jax.numpy as jnp

    from gpr_tpu.datasets import gen_data
    from gpr_tpu.kernels import SeIso
    from gpr_tpu.optim.priors import field_priors, normal, soft_box
    from gpr_tpu.optim.train import train

    Xn, yn, _ = gen_data(1, n=300)
    X, y = jnp.asarray(Xn), jnp.asarray(yn)
    kw = dict(n_rand_inducing=8, max_iter=25, key=jax.random.PRNGKey(5))

    mle = train(SeIso, X, y, **kw)
    target = float(mle.kernel_params.log_ell) + 2.0
    prior = field_priors({"log_ell": normal(target, 0.01)})
    m_map = train(SeIso, X, y, log_prior=prior, **kw)
    assert abs(float(m_map.kernel_params.log_ell) - target) < 0.2
    assert abs(float(mle.kernel_params.log_ell) - target) > 1.0

    # soft box acts as a bound: keep log_sf2 below -1
    bound = field_priors({"log_sf2": soft_box(-10.0, -1.0, strength=1e4)})
    m_b = train(SeIso, X, y, log_prior=bound, **kw)
    assert float(m_b.kernel_params.log_sf2) < -0.9
    assert float(mle.kernel_params.log_sf2) > -0.9  # MLE sits above it
