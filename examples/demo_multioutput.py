"""Multi-output (ICM) demo: two correlated sensors, one barely sampled —
the joint coregionalized fit transfers what the dense sensor knows.

Sensor 0 logs the whole range; sensor 1 (a scaled, offset copy of the
same latent signal) only the left half.  Train (a) independent GPs per
sensor and (b) one ICM model on the stacked rows, same budget, then
compare predictions for sensor 1 on the UNOBSERVED right half and print
the learned task-covariance matrix B.

Run: python examples/demo_multioutput.py   (CPU f64, ~a minute)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from gpr_tpu.kernels import (  # noqa: E402
    SeIso,
    cols_family,
    icm_family,
    sum_family,
    task_family,
)
from gpr_tpu.models.fitc import calc_model, calc_trained  # noqa: E402
from gpr_tpu.models.predict import mean_predictor, predict_means  # noqa: E402
from gpr_tpu.optim import make_pack  # noqa: E402
from gpr_tpu.optim.lbfgs_device import fit  # noqa: E402


def latent(x):
    return np.sin(1.4 * x) + 0.3 * np.sin(4.1 * x)


def main():
    rng = np.random.default_rng(3)
    x0 = np.sort(rng.uniform(-3, 3, 160))
    x1 = np.sort(rng.uniform(-3, 0, 30))  # sensor 1: left half only
    y0 = latent(x0) + 0.07 * rng.standard_normal(x0.size)
    y1 = 0.7 * latent(x1) - 0.2 + 0.07 * rng.standard_normal(x1.size)
    print(f"sensor 0: {x0.size} points over [-3, 3]; "
          f"sensor 1: {x1.size} points over [-3, 0] ONLY")

    grid = np.linspace(0.2, 3.0, 12)
    truth1 = 0.7 * latent(grid) - 0.2

    # --- (a) independent GP for sensor 1 (its own data only) --------------
    X1, yj1 = jnp.asarray(x1[:, None]), jnp.asarray(y1 - y1.mean())
    p1 = SeIso.default_params(X1, 10)
    pack1 = make_pack(SeIso, p1, X1[::3][:10], 0.05)
    pp1, zz1, s21, _ = fit(SeIso, X1, yj1, pack1, max_iter=120,
                           normalize=False)
    model1 = calc_model(SeIso, pp1, X1, zz1, s21)
    mu_ind = np.asarray(
        predict_means(SeIso, pp1, mean_predictor(calc_trained(model1, yj1)),
                      jnp.asarray(grid[:, None]))
    ) + y1.mean()

    # --- (b) joint ICM on stacked [x, task_id] rows ------------------------
    # a zero-mean shared latent cannot express a between-task OFFSET
    # (only scale, through B) — so SUM a bare cols(task) term into the
    # kernel: a learned random intercept per task, correlated across
    # tasks, trained jointly with everything else (kernel composition
    # doing the mean-function job, MANUAL section 4)
    X = np.c_[np.r_[x0, x1][:, None],
              np.r_[np.zeros_like(x0), np.ones_like(x1)]]
    y = np.r_[y0, y1]
    Xj, yj = jnp.asarray(X), jnp.asarray(y - y.mean())
    fam = sum_family(
        icm_family(SeIso, 1, 2, 1),          # shared latent x B
        cols_family(task_family(2, 2), 1, 2)  # per-task intercepts
    )
    p0 = fam.default_params(Xj, 24, jax.random.PRNGKey(0))
    pack = make_pack(fam, p0, Xj[:: X.shape[0] // 24][:24], 0.05)
    pp, zz, s2, _ = fit(fam, Xj, yj, pack, max_iter=200, normalize=False)
    model = calc_model(fam, pp, Xj, zz, s2)
    Xstar = jnp.asarray(np.c_[grid, np.ones_like(grid)])
    mu_icm = np.asarray(
        predict_means(fam, pp, mean_predictor(calc_trained(model, yj)),
                      Xstar)
    ) + y.mean()

    B = np.asarray(
        task_family(2, 1).coregionalization(pp.terms[0].terms[0].terms[0])
    )
    corr = B[0, 1] / np.sqrt(B[0, 0] * B[1, 1])
    print(f"\nlearned task covariance B:\n  {B[0].round(3)}\n"
          f"  {B[1].round(3)}")
    print(f"learned inter-sensor correlation: {corr:.3f}")

    print("\nsensor-1 predictions on the UNOBSERVED right half:")
    print("   x      truth    indep     icm")
    for i in range(len(grid)):
        print(f"  {grid[i]:+.2f}   {truth1[i]:+.3f}   {mu_ind[i]:+.3f}   "
              f"{mu_icm[i]:+.3f}")
    rmse_ind = float(np.sqrt(np.mean((mu_ind - truth1) ** 2)))
    rmse_icm = float(np.sqrt(np.mean((mu_icm - truth1) ** 2)))
    print(f"\nrmse: independent {rmse_ind:.3f}  vs  ICM {rmse_icm:.3f} "
          f"({rmse_ind / max(rmse_icm, 1e-9):.1f}x better via transfer)")
    assert rmse_icm < 0.2, rmse_icm
    assert rmse_icm < 0.5 * rmse_ind, (rmse_icm, rmse_ind)
    print("\ndemo OK")


if __name__ == "__main__":
    main()
