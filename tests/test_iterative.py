"""Iterative exact GP (models/iterative.py) — matvec/PCG/preconditioner
against the dense exact path (models/exact.py) on CPU/f64.

The dense module is the correctness oracle: the iterative operator must
reproduce calc_exact's A for every family (including se_fat, whose dense
diagonal is forced to sf2 while the cross form needn't match), and the
preconditioned solves must land on the dense alpha/means/variances to CG
tolerance.  The stochastic evidence gradients are checked against
jax.grad of the dense log evidence by probe averaging (unbiasedness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import LinOne, Matern52, SeFat, SeIso, product_family
from gpr_tpu.models import (
    calc_exact,
    evidence_grads_iter,
    exact_trained,
    fit_iter,
    iter_trained,
    kernel_matvec,
    log_evidence_exact,
    nystrom_precond,
    pcg,
    predict_means_exact,
    predict_means_iter,
    predict_variances_exact,
    predict_variances_iter,
)


def _data(rng, n=60, d=3):
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(axis=1)) +
                    0.1 * rng.standard_normal(n))
    return X, y


def _dense_a(family, params, X, sigma2):
    k = family.k_upper_inputs(params, X)
    return k + sigma2 * jnp.eye(k.shape[0], dtype=k.dtype)


def _families(rng, X):
    key = jax.random.PRNGKey(3)
    prod = product_family(SeIso, LinOne)
    # se_fat's per-inducing-point options (hetero, multiscales) are sized
    # (n,) in the dense/exact context where Z = project(X)
    sefat_params = SeFat.default_params(X, X.shape[0], key)
    return [
        (SeIso, SeIso.Params(log_ell=jnp.asarray(0.3),
                             log_sf2=jnp.asarray(0.2))),
        (Matern52, Matern52.default_params(X, 10, key)),
        (prod, prod.default_params(X, 10, key)),
        (SeFat, sefat_params),
    ]


def test_kernel_matvec_matches_dense(rng):
    X, _ = _data(rng)
    V = jnp.asarray(rng.standard_normal((X.shape[0], 3)))
    for family, params in _families(rng, X):
        a = _dense_a(family, params, X, 0.07)
        want = a @ V
        got = kernel_matvec(family, params, X, V, 0.07, block_size=16)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-9,
            err_msg=family.name,
        )
        # 1-D rhs round-trips the squeeze
        got1 = kernel_matvec(family, params, X, V[:, 0], 0.07, block_size=16)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want[:, 0]),
                                   rtol=1e-9, atol=1e-9)


def test_pcg_solves_spd_system(rng):
    n = 32
    m = rng.standard_normal((n, n))
    a = jnp.asarray(m @ m.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal((n, 4)))
    x, info = pcg(lambda v: a @ v, b, tol=1e-12, max_iter=200)
    np.testing.assert_allclose(np.asarray(a @ x), np.asarray(b), atol=1e-8)
    assert float(info["relres"].max()) < 1e-10


def test_nystrom_precond_is_woodbury_inverse(rng):
    X, _ = _data(rng, n=50)
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    pre = nystrom_precond(SeIso, p, X, 0.05, X[:12])
    p_dense = np.diag(np.asarray(pre.d)) + np.asarray(pre.v) @ np.asarray(pre.v).T
    r = rng.standard_normal((X.shape[0], 2))
    want = np.linalg.solve(p_dense, r)
    got = np.asarray(pre.apply(jnp.asarray(r)))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_preconditioning_cuts_iterations(rng):
    X, y = _data(rng, n=120)
    p = SeIso.Params(log_ell=jnp.asarray(0.5), log_sf2=jnp.asarray(0.0))
    a = _dense_a(SeIso, p, X, 1e-3)
    pre = nystrom_precond(SeIso, p, X, 1e-3, X[:40])
    _, plain = pcg(lambda v: a @ v, y, tol=1e-8, max_iter=500)
    _, cond = pcg(lambda v: a @ v, y, precond=pre, tol=1e-8, max_iter=500)
    assert int(cond["iters"]) < int(plain["iters"])
    assert float(cond["relres"].max()) < 1e-8


def test_iter_trained_matches_dense_posterior(rng):
    X, y = _data(rng, n=80)
    Xs = jnp.asarray(rng.standard_normal((25, X.shape[1])))
    for family, params in _families(rng, X):
        dense = exact_trained(calc_exact(family, params, X, 0.05), y)
        tr = iter_trained(family, params, X, y, 0.05, n_inducing=30,
                          tol=1e-10, max_iter=400, block_size=16)
        np.testing.assert_allclose(
            np.asarray(tr.alpha), np.asarray(dense.alpha),
            rtol=1e-6, atol=1e-8, err_msg=family.name,
        )
        mu = predict_means_iter(family, params, tr, Xs, block_size=8)
        mu_d = predict_means_exact(family, params, dense, Xs)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d),
                                   rtol=1e-6, atol=1e-8)
        var, _ = predict_variances_iter(
            family, params, tr, X, Xs, tol=1e-10, max_iter=400,
            block_size=16,
        )
        var_d = predict_variances_exact(family, params, dense, Xs)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_d),
                                   rtol=1e-5, atol=1e-8)


def test_evidence_grads_iter_unbiased(rng):
    X, y = _data(rng, n=40, d=2)
    p = SeIso.Params(log_ell=jnp.asarray(0.4), log_sf2=jnp.asarray(0.1))
    s2 = 0.08

    def neg_l(p, s2):
        return -log_evidence_exact(SeIso, p, X, y, s2)

    want_p, want_s2 = jax.grad(neg_l, argnums=(0, 1))(p, jnp.asarray(s2))

    gp_acc = {"log_ell": 0.0, "log_sf2": 0.0}
    gs_acc = 0.0
    n_keys = 6
    for i in range(n_keys):
        (gp, gs), info = evidence_grads_iter(
            SeIso, p, X, y, s2, jax.random.PRNGKey(100 + i),
            n_probes=8, n_inducing=20, tol=1e-10, max_iter=400,
            block_size=16,
        )
        assert float(info["relres"].max()) < 1e-9
        gp_acc["log_ell"] += float(gp.log_ell) / n_keys
        gp_acc["log_sf2"] += float(gp.log_sf2) / n_keys
        gs_acc += float(gs) / n_keys

    # The preconditioner control variate makes even single 8-probe draws
    # land within ~8% of the dense-AD truth at this shape (without it the
    # plain Hutchinson trace put the NET gradient 30-65% off — it is a
    # small difference of two ~10x larger terms); the mean of 6 draws
    # passes a 10% gate with margin.
    np.testing.assert_allclose(gp_acc["log_ell"], float(want_p.log_ell),
                               rtol=0.1)
    np.testing.assert_allclose(gp_acc["log_sf2"], float(want_p.log_sf2),
                               rtol=0.1)
    np.testing.assert_allclose(gs_acc, float(want_s2), rtol=0.1)


def test_fit_iter_improves_exact_evidence(rng):
    X, y = _data(rng, n=150, d=2)
    p0 = SeIso.Params(log_ell=jnp.asarray(1.5), log_sf2=jnp.asarray(-1.0))
    s2_0 = 0.5

    def exact_l(p, s2):
        return float(log_evidence_exact(SeIso, p, X, y, s2))

    l0 = exact_l(p0, s2_0)
    p1, s2_1 = fit_iter(
        SeIso, p0, X, y, s2_0, key=jax.random.PRNGKey(5), n_steps=60,
        eta0=0.5, n_probes=8, n_inducing=40, tol=1e-8, max_iter=300,
        block_size=32,
    )
    l1 = exact_l(p1, float(s2_1))
    # measured: -130 -> ~+92 nats in 60 steps at this shape (eta0 0.2-1.0
    # all converge; the clip keeps the log-space moves bounded)
    assert l1 > l0 + 50.0, (l0, l1)
    assert float(s2_1) > 0.0


@pytest.mark.slow
def test_sharded_iter_solve_matches_single(rng):
    """parallel/iter_sharded: the ppermute-ring matvec + psum'd PCG over
    the 8-device CPU mesh reproduces the single-device alpha exactly
    (same math; the ring only reorders the tile sums)."""
    from jax.sharding import Mesh

    from gpr_tpu.parallel.iter_sharded import sharded_iter_solve
    from gpr_tpu.parallel.sharded import shard_batch

    n, m = 301, 24
    X = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1))
                    + 0.05 * rng.standard_normal(n))
    p = SeIso.Params(log_ell=jnp.asarray(0.2), log_sf2=jnp.asarray(0.1))
    s2 = 0.05
    Xsub = X[:m]

    tr = iter_trained(SeIso, p, X, y, s2, X_sub=Xsub, tol=1e-10,
                      max_iter=400, block_size=64)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    Xs, ys, mask = shard_batch(mesh, X, y)

    @jax.jit
    def solve():
        return sharded_iter_solve(SeIso, mesh, p, Xs, ys, s2, Xsub, mask,
                                  tol=1e-10, max_iter=400, block_size=64)

    x, iters, relres = solve()
    assert float(jnp.max(relres)) < 1e-9
    np.testing.assert_allclose(np.asarray(x)[:n], np.asarray(tr.alpha),
                               rtol=0, atol=1e-8)
