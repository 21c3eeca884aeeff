"""Multi-output (ICM / coregionalization) kernel: entry-level oracle vs
explicit numpy B ⊙ K, the cols() column-restriction law, the
independent-task factorization of the FITC evidence, FD gradients over
the full hyper pack, cross-task transfer in the predictive, streaming
parity, persistence, and the distributed column-block path.

The reference has no multi-output support (one Spec per engine,
/root/reference/lib/interfaces.ml); kernels/task.py is an extension —
correctness anchors are the explicit construction B[t,t'] * k(x,x')
(Bonilla et al. 2008) and the exact block-decomposition argument for
diagonal B in ``test_independent_tasks_evidence_factorizes``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpr_tpu.kernels import (
    SeIso,
    cols_family,
    icm_family,
    resolve_family,
    task_family,
)
from gpr_tpu.kernels.base import k_upper_cols
from gpr_tpu.models import streaming_log_evidence
from gpr_tpu.models.fitc import calc_model, calc_trained, log_evidence
from gpr_tpu.models.predict import predict_means
from gpr_tpu.optim import make_pack
from gpr_tpu.testing import check_deriv_hyper

T, R, D = 3, 2, 2
ICM = icm_family(SeIso, D, T, R)


def _stacked(rng, n=40, d=D, n_tasks=T):
    """Rows [features..., task_id]."""
    X = np.c_[
        rng.standard_normal((n, d)),
        rng.integers(0, n_tasks, n).astype(float),
    ]
    return jnp.asarray(X)


def _dense_icm(params, A, B_pts):
    """Explicit numpy B[t,t'] * k_se(x,x') for the ICM params PyTree."""
    tp = params.terms[0].terms[0]
    sp = params.terms[1].terms[0]
    W = np.asarray(tp.W)
    B = W @ W.T + np.diag(np.exp(np.asarray(tp.log_kappa)))
    ell2 = np.exp(2 * float(sp.log_ell))
    sf2 = np.exp(float(sp.log_sf2))
    A, B_pts = np.asarray(A), np.asarray(B_pts)
    d2 = ((A[:, None, :D] - B_pts[None, :, :D]) ** 2).sum(-1)
    kse = sf2 * np.exp(-0.5 * d2 / ell2)
    ta = A[:, D].astype(int)
    tb = B_pts[:, D].astype(int)
    return B[np.ix_(ta, tb)] * kse


def test_icm_entries_match_explicit_construction(rng):
    X = _stacked(rng)
    Z = X[:8]
    params = ICM.default_params(X, 8, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        ICM.k_cross(params, X, Z), _dense_icm(params, X, Z), rtol=1e-12
    )
    np.testing.assert_allclose(
        ICM.k_upper(params, Z), _dense_icm(params, Z, Z), rtol=1e-12
    )
    np.testing.assert_allclose(
        ICM.k_diag(params, X),
        np.diag(_dense_icm(params, X, X)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        ICM.k_one(params, X[5]), _dense_icm(params, X[5:6], X[5:6])[0, 0],
        rtol=1e-12,
    )
    # PSD: stacked gram over repeated tasks/features
    w = np.linalg.eigvalsh(np.asarray(ICM.k_upper_inputs(params, X)))
    assert w.min() > -1e-9


def test_icm_name_roundtrip_and_interning():
    assert ICM.name == "prod(cols(task(3,2),2,3),cols(se_iso,0,2))"
    assert resolve_family(ICM.name) is ICM
    assert task_family(T, R) is task_family(T, R)
    assert cols_family(SeIso, 0, D) is cols_family(SeIso, 0, D)


def test_cols_restriction_law(rng):
    """cols(se_iso, 0, d) on augmented rows == se_iso on the plain rows."""
    X = _stacked(rng)
    Z = X[:6]
    fam = cols_family(SeIso, 0, D)
    p = fam.default_params(X, 6, jax.random.PRNGKey(0))
    sp = p.terms[0]
    np.testing.assert_allclose(
        fam.k_cross(p, X, Z),
        SeIso.k_cross(sp, X[:, :D], Z[:, :D]),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        fam.k_upper(p, Z), SeIso.k_upper(sp, Z[:, :D]), rtol=1e-12
    )
    np.testing.assert_allclose(
        fam.k_diag(p, X), SeIso.k_diag(sp, X[:, :D]), rtol=1e-12
    )


def test_independent_tasks_evidence_factorizes(rng):
    """With W = 0 (diagonal B) and per-task inducing subsets, Qnn and the
    FITC diag are block-diagonal by task, so the stacked evidence must
    equal the sum of per-task evidences computed with kappa_t-scaled
    SE kernels — an exact structural identity, not an approximation."""
    n_per, m_per = 14, 4
    sigma2 = 0.07
    Xs, Zs, ys = [], [], []
    for t in range(T):
        Xt = np.c_[
            rng.standard_normal((n_per, D)), np.full(n_per, float(t))
        ]
        Xs.append(Xt)
        Zs.append(Xt[:m_per])
        ys.append(rng.standard_normal(n_per))
    X = jnp.asarray(np.concatenate(Xs))
    Z = jnp.asarray(np.concatenate(Zs))
    y = jnp.asarray(np.concatenate(ys))

    params = ICM.default_params(X, Z.shape[0], jax.random.PRNGKey(2))
    tp = params.terms[0].terms[0]
    tp0 = type(tp)(W=jnp.zeros_like(tp.W), log_kappa=tp.log_kappa)
    params = type(params)(
        terms=(
            type(params.terms[0])(terms=(tp0,)),
            params.terms[1],
        )
    )
    stacked = float(
        log_evidence(ICM, params, Z, sigma2, X, y, jitter=1e-10)
    )

    sp = params.terms[1].terms[0]
    total = 0.0
    for t in range(T):
        # B[t,t] * k_se == SE with log_sf2 shifted by log_kappa[t]
        sp_t = type(sp)(
            log_ell=sp.log_ell,
            log_sf2=sp.log_sf2 + tp0.log_kappa[t],
        )
        total += float(
            log_evidence(
                SeIso,
                sp_t,
                jnp.asarray(Zs[t][:, :D]),
                sigma2,
                jnp.asarray(Xs[t][:, :D]),
                jnp.asarray(ys[t]),
                jitter=1e-10,
            )
        )
    np.testing.assert_allclose(stacked, total, rtol=1e-9)


def test_icm_hyper_derivatives(rng):
    X = _stacked(rng, n=14)
    Z = X[:5]
    params = ICM.default_params(X, 5, jax.random.PRNGKey(3))
    n = check_deriv_hyper(ICM, params, Z, X, tol=1e-5)
    assert n >= 5 * 3 + T * R + T + 2  # Z, W, kappa, se hypers


def test_icm_transfer_beats_independent(rng):
    """Two perfectly correlated tasks, task 1 observed only on x < 0:
    the ICM predictive for task 1 on x > 0 must borrow task 0's data and
    beat the diagonal-B (independent) model there."""
    f = lambda x: np.sin(1.5 * x)
    x0 = np.linspace(-3, 3, 60)
    x1 = np.linspace(-3, 0, 18)  # task 1: left half only
    X = np.c_[
        np.r_[x0, x1][:, None],
        np.r_[np.zeros_like(x0), np.ones_like(x1)],
    ]
    y = np.r_[f(x0), f(x1)] + 0.05 * rng.standard_normal(len(x0) + len(x1))
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    fam = icm_family(SeIso, 1, 2, 1)
    Z = Xj[::4]

    from gpr_tpu.kernels.combinators import CombParams
    from gpr_tpu.models.predict import mean_predictor

    def params_with(w, kappa):
        tk = task_family(2, 1)
        tp = tk.Params(
            W=jnp.asarray(w, Xj.dtype).reshape(2, 1),
            log_kappa=jnp.log(jnp.asarray(kappa, Xj.dtype)),
        )
        sp = SeIso.Params(
            log_ell=jnp.asarray(0.0, Xj.dtype),
            log_sf2=jnp.asarray(0.0, Xj.dtype),
        )
        return CombParams(
            terms=(CombParams(terms=(tp,)), CombParams(terms=(sp,)))
        )

    grid = np.linspace(0.5, 3, 12)
    Xstar = jnp.asarray(np.c_[grid, np.ones_like(grid)])
    truth = f(grid)

    def rmse(params):
        model = calc_model(fam, params, Xj, Z, 0.05**2, jitter=1e-10)
        trained = calc_trained(model, yj)
        mu = predict_means(fam, params, mean_predictor(trained), Xstar)
        return float(jnp.sqrt(jnp.mean((mu - truth) ** 2)))

    err_coupled = rmse(params_with([1.0, 1.0], [1e-4, 1e-4]))
    err_indep = rmse(params_with([0.0, 0.0], [1.0, 1.0]))
    assert err_coupled < 0.2, err_coupled
    assert err_coupled < 0.3 * err_indep, (err_coupled, err_indep)


def test_icm_streaming_parity(rng):
    X = _stacked(rng, n=37)
    Z = X[:7]
    y = jnp.asarray(rng.standard_normal(37))
    params = ICM.default_params(X, 7, jax.random.PRNGKey(4))
    dense = log_evidence(ICM, params, Z, 0.2, X, y)
    stream = streaming_log_evidence(
        ICM, params, Z, 0.2, X, y, block_size=8
    )
    np.testing.assert_allclose(float(stream), float(dense), rtol=1e-10)


def test_icm_checkpoint_roundtrip(tmp_path, rng):
    from gpr_tpu.io.checkpoint import ModelArtifact, load_model, save_model

    X = _stacked(rng, n=20)
    Z = X[:5]
    params = ICM.default_params(X, 5, jax.random.PRNGKey(5))
    art = ModelArtifact(
        family_name=ICM.name,
        kernel_params=params,
        inducing=np.asarray(Z),
        coeffs=np.zeros(5),
        chol_km=np.eye(5),
        r_mat=np.eye(5),
        sigma2=0.3,
        target_mean=0.0,
        input_means=np.zeros(D + 1),
        input_stddevs=np.ones(D + 1),
    )
    p = str(tmp_path / "icm.npz")
    save_model(p, art)
    back, _extra = load_model(p)
    assert back.family is ICM
    leaves0 = jax.tree.leaves(params)
    leaves1 = jax.tree.leaves(back.kernel_params)
    assert len(leaves0) == len(leaves1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(a, b)


def test_task_k_upper_cols_matches_dense(rng):
    X = _stacked(rng, n=16)
    Z = X[:9]
    params = ICM.default_params(X, 9, jax.random.PRNGKey(6))
    full = np.asarray(ICM.k_upper(params, Z))
    blk = np.asarray(k_upper_cols(ICM, params, Z, 3, 4))
    np.testing.assert_allclose(blk, full[:, 3:7], rtol=1e-12)


@pytest.mark.slow
def test_icm_sharded_parity(rng):
    """ICM evidence + gradients over the 8-device mesh == single-device
    (the family threads through the generic sharded objective; the
    task-id column rows shard like any feature)."""
    from gpr_tpu.parallel import make_mesh, shard_batch, sharded_log_evidence

    X = _stacked(rng, n=203)  # non-divisible by 8: mask path
    Z = X[:9]
    y = jnp.asarray(np.sin(np.asarray(X)[:, 0]) + 0.1 * rng.standard_normal(203))
    params = ICM.default_params(X, 9, jax.random.PRNGKey(7))
    mesh = make_mesh()

    single = log_evidence(ICM, params, Z, 0.2, X, y)
    Xs, ys, mask = shard_batch(mesh, X, y)

    @jax.jit
    def val_and_grads(params, Z, Xs, ys, mask):
        def f(params, Z):
            return sharded_log_evidence(
                ICM, mesh, params, Z, 0.2, Xs, ys, mask, block_size=32
            )
        return jax.value_and_grad(f, argnums=(0, 1))(params, Z)

    sharded, (gp, gz) = val_and_grads(params, Z, Xs, ys, mask)
    np.testing.assert_allclose(float(sharded), float(single), rtol=1e-11)

    gp1, gz1 = jax.grad(
        lambda p, z: log_evidence(ICM, p, z, 0.2, X, y), argnums=(0, 1)
    )(params, Z)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gp1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8,
                                   atol=1e-12)
    np.testing.assert_allclose(np.asarray(gz), np.asarray(gz1), rtol=1e-8,
                               atol=1e-12)
