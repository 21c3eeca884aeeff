"""Binary GP classification demo: Laplace-FITC on two moons.

Trains all hypers (kernel, inducing coordinates) by ascending the
Laplace marginal likelihood (models/classify.py) with the device L-BFGS
driver, then reports accuracy, calibration, and an ASCII view of the
decision field with the learned inducing points.

Run: python examples/demo_classify.py   (CPU f64, ~half a minute)
"""

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


if __name__ == "__main__":
    main()
