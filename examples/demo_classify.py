"""GP classification demo: Laplace-FITC on two moons, then the EP
approximation and the softmax multi-class route on the same data.

Trains all hypers (kernel, inducing coordinates) by ascending the
Laplace marginal likelihood (models/classify.py) with the device L-BFGS
driver, then reports accuracy, calibration, and an ASCII view of the
decision field with the learned inducing points; finally compares the
EP classifier (models/classify_ep.py) and runs the 3-class softmax
Laplace (models/classify_multi.py) on a three-blob task.

Run: python examples/demo_classify.py   (CPU f64, ~a minute)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from gpr_tpu.kernels import SeIso  # noqa: E402
from gpr_tpu.models.classify import (  # noqa: E402
    classify_predict,
    fit_classify,
)
from gpr_tpu.optim import make_pack  # noqa: E402


def two_moons(rng, n, noise=0.1):
    t = rng.uniform(0.0, np.pi, n)
    lab = rng.integers(0, 2, n)
    sign = 2 * lab - 1
    X = np.stack(
        [np.cos(t) - 0.5 * sign + noise * rng.standard_normal(n),
         np.sin(t) * sign + noise * rng.standard_normal(n)], 1
    )
    return jnp.asarray(X), jnp.asarray(sign.astype(np.float64))


def main():
    rng = np.random.default_rng(0)
    X, y = two_moons(rng, 500)
    Xt, yt = two_moons(rng, 400)
    m = 20
    Z = X[rng.choice(len(y), m, replace=False)]
    p0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.5))

    # pack (kernel hypers, inducing coords); the Bernoulli likelihood has
    # no sigma2, so leave it out of the optimization vector
    pack = make_pack(SeIso, p0, Z, 1.0, learn_sigma2=False)
    params, z, st = fit_classify(SeIso, X, y, pack, max_iter=60,
                                 epsabs=1e-5, normalize=False)
    print(f"Laplace evidence: {-float(st.f):.2f} after {int(st.n_iter)} "
          f"L-BFGS iters ({int(st.n_evals)} evals), "
          f"ell={float(jnp.exp(params.log_ell)):.3f}")

    prob, mu, var = classify_predict(SeIso, params, z, X, y, Xt)
    pred = jnp.sign(prob - 0.5)
    acc = float(jnp.mean(pred == yt))
    nll = -float(jnp.mean(jnp.log(jnp.where(yt > 0, prob, 1.0 - prob))))
    print(f"held-out accuracy {acc:.3f}, mean NLL {nll:.3f} on {len(yt)} pts")

    # ASCII decision field: P(class +) on a grid, inducing points as 'o'
    gx = np.linspace(-2.0, 1.6, 64)
    gy = np.linspace(-1.6, 1.6, 24)
    GX, GY = np.meshgrid(gx, gy)
    G = jnp.asarray(np.stack([GX.ravel(), GY.ravel()], 1))
    pg, _, _ = classify_predict(SeIso, params, z, X, y, G)
    pg = np.asarray(pg).reshape(GY.shape)
    shades = " .:-=+*#%@"
    zs = np.asarray(z)
    for i in range(len(gy) - 1, -1, -1):
        row = [shades[min(int(v * (len(shades) - 1)), len(shades) - 1)]
               for v in pg[i]]
        for zx, zy in zs:
            if abs(zy - gy[i]) < (gy[1] - gy[0]) / 2:
                j = int(round((zx - gx[0]) / (gx[1] - gx[0])))
                if 0 <= j < len(row):
                    row[j] = "o"
        print("".join(row))
    print("shade = P(class +) from ' ' (0) to '@' (1); o = inducing points")

    assert acc > 0.95, f"demo regression: accuracy {acc}"

    # --- EP on the same task: the other approximation family ---
    from gpr_tpu.models import calc_classify_stats
    from gpr_tpu.models.classify_ep import ep_predict, fit_classify_ep

    pack_ep = make_pack(SeIso, p0, Z, 1.0, learn_sigma2=False)
    params_e, z_e, st_e = fit_classify_ep(SeIso, X, y, pack_ep,
                                          max_iter=40, epsabs=1e-5 / len(y))
    prob_e, _, _ = ep_predict(SeIso, params_e, z_e, X, y, Xt)
    cs_l = calc_classify_stats(yt, prob)
    cs_e = calc_classify_stats(yt, prob_e)
    print(f"\nLaplace vs EP (held out): "
          f"acc {1 - float(cs_l.error_rate):.3f} / "
          f"{1 - float(cs_e.error_rate):.3f}, "
          f"log loss {float(cs_l.log_loss):.3f} / "
          f"{float(cs_e.log_loss):.3f}, "
          f"AUC {float(cs_l.auc):.3f} / {float(cs_e.auc):.3f}")

    # --- 3-class softmax Laplace on Gaussian blobs ---
    from gpr_tpu.models.classify_multi import (
        fit_classify_multi,
        multiclass_predict,
    )

    C, n_per = 3, 60
    centers = np.array([[2.0, 0.0], [-1.0, 2.0], [-1.0, -2.0]])
    Xm = np.concatenate([
        centers[c] + 0.6 * rng.standard_normal((n_per, 2)) for c in range(C)
    ])
    lab = np.repeat(np.arange(C), n_per)
    perm = rng.permutation(len(lab))
    Xm, lab = jnp.asarray(Xm[perm]), jnp.asarray(lab[perm])
    pm0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(1.0))
    pack_m = make_pack(SeIso, pm0, Xm[:8], 1.0, learn_sigma2=False)
    params_m, z_m, st_m = fit_classify_multi(SeIso, Xm, lab, pack_m, C,
                                             max_iter=25,
                                             epsabs=1e-4 / len(lab))
    Xtm = jnp.asarray(centers + 0.2 * rng.standard_normal((C, 2)))
    probs, _, _ = multiclass_predict(SeIso, params_m, z_m, Xm, lab, C, Xtm,
                                     n_samples=512)
    print(f"3-class softmax Laplace: evidence {-float(st_m.f) * len(lab):.1f}"
          f"; class probabilities at the blob centers:")
    for c in range(C):
        row = ", ".join(f"{float(v):.3f}" for v in probs[c])
        print(f"  center {c}: [{row}]")
    assert (np.argmax(np.asarray(probs), axis=1) == np.arange(C)).all()


if __name__ == "__main__":
    main()
