"""API fuzz: random (family, options, shapes, trainer, predictor) workflows
end to end through the public API.  Any exception or non-finite result is a
failure.  CPU/f64; run from the repo root:  python probes/fuzz_api.py [N]
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpr_tpu.kernels import (
    Const, LinArd, LinOne, Matern32, Matern52, Periodic, RatQuad, SeFat,
    SeIso, product_family, sum_family,
)
from gpr_tpu.models import calc_model, calc_trained, calc_stats, log_evidence
from gpr_tpu.models.predict import (
    co_variance_predictor, mean_predictor, predict_means, predict_variances,
)
from gpr_tpu.models.predict import covariances_fitc
from gpr_tpu.models.sample import cov_sample, cov_sampler
from gpr_tpu.optim import make_pack, train
from gpr_tpu.optim.lbfgs_device import fit, fit_restarts

from gpr_tpu.kernels import icm_family

_ICM = icm_family(SeIso, 2, 3, 1)  # 2 features + task-id column, T=3

FAMILIES = [Const, LinOne, LinArd, SeIso, Matern32, Matern52, RatQuad,
            Periodic, SeFat,
            # combinators compose with every engine path (round-3 s5)
            sum_family(SeIso, LinArd, Const),
            product_family(Periodic, SeIso),
            # multi-output ICM (round 4): fixed layout [f0, f1, task_id]
            _ICM]

from gpr_tpu.kernels import Cosine, SeArd, sm_family  # noqa: E402

FAMILIES += [SeArd, Cosine, sm_family(2)]


def one(rng, i, fam=None, n_max=200, variant=None):
    if fam is None:
        fam = FAMILIES[rng.integers(len(FAMILIES))]
    else:
        rng.integers(len(FAMILIES))  # keep the stream aligned
    n = int(rng.integers(20, n_max))
    d = int(rng.integers(1, 5))
    if fam is _ICM:
        d = 3  # the cols() slices are baked into the family
    m = int(rng.integers(1, min(n, 12) + 1))
    variational = bool(rng.integers(2))
    factorization = ["chol", "qr"][rng.integers(2)]
    X = jnp.asarray(rng.standard_normal((n, d)))
    if fam is _ICM:
        X = X.at[:, -1].set(jnp.asarray(rng.integers(0, 3, n), X.dtype))
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.2 * rng.standard_normal(n))
    key = jax.random.PRNGKey(int(rng.integers(2**31)))

    params = fam.default_params(X, m, key)
    if fam is SeFat and rng.integers(2):
        # fat options on
        import dataclasses as dc
        params = dc.replace(
            params,
            log_hetero_skedasticity=jnp.full((m,), -3.0),
            log_multiscales_m05=jnp.zeros((m, params.d)),
        )
    Z = fam.inducing_from_inputs(params, X[:m])
    sigma2 = float(rng.uniform(0.05, 2.0))

    # evidence + grad
    def f(params, z, s2):
        return log_evidence(fam, params, z, s2, X, y,
                            variational=variational,
                            factorization=factorization)

    l, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(
        params, Z, jnp.asarray(sigma2))
    assert np.isfinite(float(l)), f"evidence not finite ({fam.name})"
    for leaf in jax.tree.leaves(grads):
        assert bool(jnp.all(jnp.isfinite(leaf))), f"grad NaN ({fam.name})"

    # model + stats + prediction + sampling
    model = calc_model(fam, params, X, Z, sigma2, variational=variational,
                       factorization=factorization)
    trained = calc_trained(model, y)
    st = calc_stats(trained)
    assert np.isfinite(float(st.msll)) and np.isfinite(float(st.smse))
    mp = mean_predictor(trained)
    cvp = co_variance_predictor(model)
    Xt = jnp.asarray(rng.standard_normal((7, d)))
    if fam is _ICM:
        Xt = Xt.at[:, -1].set(jnp.asarray(rng.integers(0, 3, 7), Xt.dtype))
    mu = predict_means(fam, params, mp, Xt)
    var = predict_variances(fam, params, cvp, Xt, model.sigma2)
    assert bool(jnp.all(jnp.isfinite(mu)))
    assert bool(jnp.all(var > -1e-9))
    cov = covariances_fitc(fam, params, cvp, Xt, model.sigma2)
    mu_t = predict_means(fam, params, mp, Xt)
    cs = cov_sampler(mu_t, cov, model.sigma2)
    s = cov_sample(key, cs, 3)
    assert bool(jnp.all(jnp.isfinite(s)))

    # a short trainer run on a random path
    mode = rng.integers(3)
    if mode == 0:
        res = train(fam, X, y, kernel_params=params, inducing=Z,
                    sigma2=sigma2, variational=variational, max_iter=4,
                    epsabs=1e-8, key=key)
        assert np.isfinite(float(res.l))
    elif mode == 1:
        pack = make_pack(fam, params, Z, sigma2)
        _, _, _, stt = fit(fam, X, y, pack, variational=variational,
                           max_iter=4, epsabs=1e-8)
        assert np.isfinite(float(stt.f))
    else:
        pack = make_pack(fam, params, Z, sigma2)
        _, _, _, stt, _ = fit_restarts(
            fam, X, y, pack, [pack.x0], probe_iters=2, max_iter=4,
            epsabs=1e-8)
        assert np.isfinite(float(stt.f))

    # model-family variants on the same draw (round-3 additions): PITC,
    # warped, Laplace classification (materialized or streaming), EP
    # classification, softmax multi-class, Poisson counts, NB counts,
    # binomial proportions — each composes with every kernel family, so
    # the fuzz exercises the cross product
    variant = int(rng.integers(11)) if variant is None else variant
    if variant == 1:
        from gpr_tpu.models.pitc import pitc_log_evidence
        bs = int(rng.integers(1, n + 1))
        lp = pitc_log_evidence(fam, params, Z, jnp.asarray(sigma2), X, y,
                               block_size=bs)
        assert np.isfinite(float(lp)), f"pitc evidence ({fam.name}, bs={bs})"
    elif variant == 2:
        from gpr_tpu.models.warped import (
            default_warp_params, warped_log_evidence,
        )
        wp = default_warp_params(int(rng.integers(1, 4)))
        lw, gw = jax.value_and_grad(
            lambda wp: warped_log_evidence(
                fam, params, wp, Z, jnp.asarray(sigma2), X, y,
                variational=variational))(wp)
        assert np.isfinite(float(lw)), f"warped evidence ({fam.name})"
        for leaf in jax.tree.leaves(gw):
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"warp grad NaN ({fam.name})"
    elif variant == 3:
        from gpr_tpu.models.classify import (
            classify_log_evidence, classify_predict,
        )
        yc = jnp.where(y > jnp.median(y), 1.0, -1.0)
        lc, gc = jax.value_and_grad(
            lambda p: classify_log_evidence(fam, p, Z, X, yc,
                                            newton_iters=8))(params)
        assert np.isfinite(float(lc)), f"classify evidence ({fam.name})"
        for leaf in jax.tree.leaves(gc):
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"classify grad NaN ({fam.name})"
        bs = int(rng.integers(4, n + 1)) if rng.integers(2) else None
        prob, _, varc = classify_predict(fam, params, Z, X, yc, Xt,
                                         newton_iters=8, block_size=bs)
        assert bool(jnp.all((prob >= 0) & (prob <= 1))
                    and jnp.all(varc > 0)), f"classify predict ({fam.name})"
    elif variant == 4:
        from gpr_tpu.models.classify_ep import ep_log_evidence, ep_predict
        yc = jnp.where(y > jnp.median(y), 1.0, -1.0)
        le, ge = jax.value_and_grad(
            lambda p: ep_log_evidence(fam, p, Z, X, yc, n_sweeps=10)
        )(params)
        assert np.isfinite(float(le)), f"ep evidence ({fam.name})"
        for leaf in jax.tree.leaves(ge):
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"ep grad NaN ({fam.name})"
        prob, _, vare = ep_predict(fam, params, Z, X, yc, Xt, n_sweeps=10)
        assert bool(jnp.all((prob >= 0) & (prob <= 1))
                    and jnp.all(vare > 0)), f"ep predict ({fam.name})"
    elif variant == 5:
        from gpr_tpu.models.classify_multi import (
            multiclass_log_evidence, multiclass_predict,
        )
        n_c = int(rng.integers(3, 5))
        labels = jnp.asarray(rng.integers(0, n_c, n))
        lm, gm = jax.value_and_grad(
            lambda p: multiclass_log_evidence(fam, p, Z, X, labels, n_c,
                                              newton_iters=6)
        )(params)
        assert np.isfinite(float(lm)), f"multiclass evidence ({fam.name})"
        for leaf in jax.tree.leaves(gm):
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"multiclass grad NaN ({fam.name})"
        probs, _, _ = multiclass_predict(fam, params, Z, X, labels, n_c,
                                         Xt, newton_iters=6, n_samples=64)
        assert bool(jnp.all(jnp.abs(jnp.sum(probs, axis=1) - 1.0) < 1e-3)), \
            f"multiclass predict ({fam.name})"
        if rng.integers(2):
            from gpr_tpu.models.classify_multi_stream import (
                stream_multiclass_log_evidence,
            )
            bs = int(rng.integers(4, n + 1))
            ls = stream_multiclass_log_evidence(
                fam, params, Z, X, labels, n_c, block_size=bs,
                newton_iters=6,
            )
            assert abs(float(ls) - float(lm)) < 1e-5 * max(
                1.0, abs(float(lm))
            ), f"multiclass stream != materialized ({fam.name}, bs={bs})"
    elif variant == 6:
        from gpr_tpu.models.poisson import (
            poisson_log_evidence, poisson_predict,
        )
        counts = jnp.asarray(
            rng.poisson(np.exp(np.clip(np.asarray(y), -3, 3))).astype(float)
        )
        le = (jnp.asarray(np.log(rng.uniform(0.5, 2.0, n)))
              if rng.integers(2) else None)
        lp, gp = jax.value_and_grad(
            lambda p: poisson_log_evidence(fam, p, Z, X, counts,
                                           log_exposure=le, newton_iters=8)
        )(params)
        assert np.isfinite(float(lp)), f"poisson evidence ({fam.name})"
        for leaf in jax.tree.leaves(gp):
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"poisson grad NaN ({fam.name})"
        rate, rvar, _, _ = poisson_predict(fam, params, Z, X, counts, Xt,
                                           log_exposure=le, newton_iters=8)
        assert bool(jnp.all(rate > 0) and jnp.all(rvar > 0)), \
            f"poisson predict ({fam.name})"
    elif variant == 7:
        from gpr_tpu.models.negbin import (
            negbin_log_evidence, negbin_predict,
        )
        counts = jnp.asarray(
            rng.poisson(np.exp(np.clip(np.asarray(y), -3, 3))).astype(float)
        )
        r0 = jnp.asarray(float(rng.uniform(0.5, 5.0)))
        ln, gn = jax.value_and_grad(
            lambda p, r: negbin_log_evidence(fam, p, Z, X, counts, r,
                                             newton_iters=8),
            argnums=(0, 1),
        )(params, r0)
        assert np.isfinite(float(ln)), f"negbin evidence ({fam.name})"
        for leaf in jax.tree.leaves(gn):
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"negbin grad NaN ({fam.name})"
        cm, cv, _, _ = negbin_predict(fam, params, Z, X, counts, r0, Xt,
                                      newton_iters=8)
        assert bool(jnp.all(cm > 0) and jnp.all(cv > cm)), \
            f"negbin predict ({fam.name})"
    elif variant == 8:
        from gpr_tpu.models.binomial import (
            binomial_log_evidence, binomial_predict,
        )
        trials = jnp.asarray(rng.integers(1, 20, n).astype(float))
        p_t = 1.0 / (1.0 + np.exp(-np.asarray(y)))
        yb = jnp.asarray(
            rng.binomial(np.asarray(trials).astype(int), p_t).astype(float)
        )
        lb, gb = jax.value_and_grad(
            lambda p: binomial_log_evidence(fam, p, Z, X, yb, trials,
                                            newton_iters=8)
        )(params)
        assert np.isfinite(float(lb)), f"binomial evidence ({fam.name})"
        for leaf in jax.tree.leaves(gb):
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"binomial grad NaN ({fam.name})"
        prob, _, varb = binomial_predict(fam, params, Z, X, yb, trials, Xt,
                                         newton_iters=8)
        assert bool(jnp.all((prob >= 0) & (prob <= 1))
                    and jnp.all(varb > 0)), f"binomial predict ({fam.name})"
    elif variant == 9:
        from gpr_tpu.models.ordinal import (
            default_cutpoint_raw, ordinal_log_evidence, ordinal_predict,
        )
        n_c = int(rng.integers(2, 6))
        qs = np.quantile(np.asarray(y), np.linspace(0, 1, n_c + 1)[1:-1])
        yo = jnp.asarray(np.digitize(np.asarray(y), qs).astype(np.int32))
        cr0 = default_cutpoint_raw(n_c, dtype=X.dtype)
        lo, go = jax.value_and_grad(
            lambda p, cr: ordinal_log_evidence(fam, p, Z, X, yo, cr,
                                               newton_iters=8),
            argnums=(0, 1),
        )(params, cr0)
        assert np.isfinite(float(lo)), f"ordinal evidence ({fam.name})"
        for leaf in jax.tree.leaves(go):
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"ordinal grad NaN ({fam.name})"
        probs, _, varo = ordinal_predict(fam, params, Z, X, yo, cr0, Xt,
                                         newton_iters=8)
        assert bool(jnp.all(jnp.abs(jnp.sum(probs, axis=1) - 1.0) < 1e-6)
                    and jnp.all(varo > 0)), f"ordinal predict ({fam.name})"
    elif variant == 10:
        from gpr_tpu.models.robust import (
            t_em_sweeps, t_posterior_moments, t_predict,
        )
        nu = float(rng.uniform(2.5, 10.0))
        lam, pair = t_em_sweeps(fam, params, Z, sigma2, X, y, nu=nu,
                                sweeps=4)
        assert bool(jnp.all(jnp.isfinite(lam)) and jnp.all(lam > 0)), \
            f"t lam ({fam.name})"
        lt, gt = jax.value_and_grad(
            lambda p: log_evidence(fam, p, Z, sigma2 / lam, X, y)
        )(params)
        assert np.isfinite(float(lt)), f"t hetero evidence ({fam.name})"
        for leaf in jax.tree.leaves(gt):
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"t grad NaN ({fam.name})"
        mu_t, var_t, nv = t_predict(fam, params, Z, sigma2, X, y, lam, Xt,
                                    nu=nu)
        assert bool(jnp.all(jnp.isfinite(mu_t)) and jnp.all(var_t > 0)), \
            f"t predict ({fam.name})"
    return fam.name, n, d, m, variational, factorization, mode, variant


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rng = np.random.default_rng(0)
    fails = 0
    for i in range(n_iters):
        try:
            desc = one(rng, i)
            print(f"ok  {i:3d}: {desc}", flush=True)
        except Exception:
            fails += 1
            print(f"FAIL {i:3d}:", flush=True)
            traceback.print_exc()
    print(f"\n{n_iters - fails}/{n_iters} passed", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
