"""Robust regression demo: Student-t noise vs a Gaussian fit on
outlier-corrupted data, plus ordinal regression on graded labels.

Part 1 corrupts 6% of a smooth 1-D dataset with gross outliers, fits
both models with the same budget, prints an ASCII view of the two fits
(the Gaussian fit chases the outliers; the t fit ignores them), the
rows each model downweighted, and the ELBO-selected degrees of freedom.
Part 2 discretizes the same latent into 4 ordered grades and trains the
cumulative-probit model (models/ordinal.py), reporting per-grade
accuracy and the learned cutpoints.

Run: python examples/demo_robust.py   (CPU f64, ~a minute)
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
from gpr_tpu.models.fitc import (  # noqa: E402
    calc_means,
    calc_model,
    calc_trained,
    log_evidence,
)
from gpr_tpu.models.ordinal import (  # noqa: E402
    cutpoints_from_raw,
    default_cutpoint_raw,
    fit_ordinal,
    ordinal_predict,
)
from gpr_tpu.models.robust import fit_t, t_predict, t_select_nu  # noqa: E402
from gpr_tpu.optim import make_pack  # noqa: E402
from gpr_tpu.optim.lbfgs_device import fit_packed_objective  # noqa: E402


def ascii_plot(x, curves, labels, points=None, height=15):
    lo = min(float(np.min(c)) for c in curves) - 0.2
    hi = max(float(np.max(c)) for c in curves) + 0.2
    if points is not None:
        lo = min(lo, float(np.min(points[1])))
        hi = max(hi, float(np.max(points[1])))
    cols = len(x)
    grid = [[" "] * cols for _ in range(height)]

    def row(v):
        return int((hi - v) / (hi - lo) * (height - 1))

    if points is not None:
        for px, py in zip(*points):
            c = int((px - x[0]) / (x[-1] - x[0]) * (cols - 1))
            grid[row(float(py))][min(max(c, 0), cols - 1)] = "."
    for curve, ch in zip(curves, labels):
        for c, v in enumerate(curve):
            grid[row(float(v))][c] = ch
    for r in grid:
        print("".join(r))


def main():
    rng = np.random.default_rng(0)
    n = 240
    X = jnp.asarray(np.sort(rng.uniform(-3, 3, n))[:, None])
    f_true = np.sin(2.0 * np.asarray(X[:, 0]))
    yn = f_true + 0.1 * rng.standard_normal(n)
    bad = rng.choice(n, n * 6 // 100, replace=False)
    yn[bad] += rng.choice([-1, 1], len(bad)) * rng.uniform(3, 6, len(bad))
    y = jnp.asarray(yn)

    params0 = SeIso.default_params(X, 12)
    z0 = X[:: n // 12][:12]

    print(f"== Student-t robust fit ({len(bad)} of {n} rows corrupted) ==")
    pack = make_pack(SeIso, params0, z0, 0.5)
    p_t, z_t, s2_t, lam, _ = fit_t(SeIso, X, y, pack, nu=4.0, n_em=5,
                                   m_step_iters=25)
    mu_t, _, _ = t_predict(SeIso, p_t, z_t, s2_t, X, y, lam, X, nu=4.0)

    pack_g = make_pack(SeIso, params0, z0, 0.5)

    def fg(x, X, y):
        def f(x):
            p, zz, s2 = pack_g.unpack(x)
            return -log_evidence(SeIso, p, zz, s2, X, y) / X.shape[0]

        return jax.value_and_grad(f)(x)

    st_g = fit_packed_objective(fg, pack_g, (X, y), max_iter=125)
    p_g, z_g, s2_g = pack_g.unpack(st_g.x)
    mu_g = calc_means(calc_trained(calc_model(SeIso, p_g, X, z_g, s2_g), y))

    rmse_t = float(np.sqrt(np.mean((np.asarray(mu_t) - f_true) ** 2)))
    rmse_g = float(np.sqrt(np.mean((np.asarray(mu_g) - f_true) ** 2)))
    lam_np = np.asarray(lam)
    print(f"latent rmse vs truth: student-t {rmse_t:.3f}, "
          f"gaussian {rmse_g:.3f}")
    print(f"downweighted rows (lam < 0.1): {int((lam_np < 0.1).sum())} "
          f"(corrupted among them: {int((lam_np[bad] < 0.1).sum())}"
          f"/{len(bad)})")
    nu_star, scores = t_select_nu(SeIso, p_t, z_t, float(s2_t), X, y,
                                  nu_grid=(2.5, 4.0, 10.0, 50.0))
    print(f"ELBO-selected nu: {nu_star} "
          f"(scores {dict((k, round(v, 1)) for k, v in scores.items())})")
    print("t = student-t fit, g = gaussian fit, . = data (clipped)")
    xs = np.asarray(X[:, 0])[::3]
    ascii_plot(
        xs,
        [np.asarray(mu_t)[::3], np.asarray(mu_g)[::3]],
        ["t", "g"],
        points=(np.asarray(X[:, 0]), np.clip(yn, -2.5, 2.5)),
    )

    print("\n== Ordinal regression on 4 graded labels ==")
    grades = np.digitize(f_true + 0.15 * rng.standard_normal(n),
                         [-0.6, 0.0, 0.6])
    yg = jnp.asarray(grades.astype(np.int32))
    pack_o = make_pack(SeIso, params0, z0, 1.0, learn_sigma2=False)
    p_o, z_o, cut_o, _ = fit_ordinal(
        SeIso, X, yg, pack_o, default_cutpoint_raw(4), max_iter=60
    )
    probs, mu_o, _ = ordinal_predict(SeIso, p_o, z_o, X, yg, cut_o, X)
    pred = np.asarray(jnp.argmax(probs, axis=1))
    print(f"cutpoints: {np.round(np.asarray(cutpoints_from_raw(cut_o)), 2)}")
    for k in range(4):
        sel = grades == k
        acc = float((pred[sel] == k).mean())
        print(f"grade {k}: {sel.sum():3d} rows, accuracy {acc:.2f}")
    print(f"overall accuracy: {float((pred == grades).mean()):.2f} "
          f"(base rate {np.bincount(grades).max() / n:.2f})")


if __name__ == "__main__":
    main()
