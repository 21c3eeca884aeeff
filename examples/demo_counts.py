"""Count regression demo: Poisson vs negative-binomial on overdispersed
data — the evidence selects the right noise model and learns the
dispersion.

Draws counts from a gamma-Poisson mixture (true dispersion r = 1.5) over
a smooth 1-D log-rate, trains BOTH count models with the same budget, and
reports: the evidence comparison (NB must win on NB data), the learned
dispersion, rate-curve recovery for each, and a binomial postscript —
thinning each count into successes of N_i trials and recovering the
success curve with models/binomial.py.

Run: python examples/demo_counts.py   (CPU f64, ~a minute)
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
from gpr_tpu.models.binomial import binomial_predict, fit_binomial  # noqa: E402
from gpr_tpu.models.negbin import (  # noqa: E402
    fit_negbin,
    negbin_log_evidence,
    negbin_predict,
)
from gpr_tpu.models.poisson import (  # noqa: E402
    fit_poisson,
    poisson_log_evidence,
    poisson_predict,
)
from gpr_tpu.optim import make_pack  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n, m = 400, 12
    r_true = 1.5
    Xn = np.sort(rng.uniform(-3.0, 3.0, n))[:, None]
    log_rate = 1.3 * np.sin(Xn[:, 0]) + 0.3
    mu = np.exp(log_rate)
    # gamma-Poisson mixture = NB2 with dispersion r_true
    y = rng.poisson(rng.gamma(r_true, mu / r_true)).astype(float)
    X, yj = jnp.asarray(Xn), jnp.asarray(y)
    print(f"data: n={n}, counts mean {y.mean():.2f}, var {y.var():.2f} "
          f"(Poisson would need var == mean; true dispersion r={r_true})")

    params0 = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    z0 = X[:: n // m][:m]

    # --- Poisson fit (no overdispersion channel) --------------------------
    pack_p = make_pack(SeIso, params0, z0, 1.0, learn_sigma2=False)
    p_p, z_p, st_p = fit_poisson(SeIso, X, yj, pack_p, max_iter=40)
    ev_p = float(poisson_log_evidence(SeIso, p_p, z_p, X, yj))

    # --- NB fit (dispersion learned through the pack's positive slot) ----
    pack_nb = make_pack(SeIso, params0, z0, 8.0)  # sigma2 slot = initial r
    p_nb, z_nb, r_nb, st_nb = fit_negbin(SeIso, X, yj, pack_nb, max_iter=40)
    ev_nb = float(negbin_log_evidence(SeIso, p_nb, z_nb, X, yj, r_nb))

    print(f"\nevidence: Poisson {ev_p:.1f}  vs  NB {ev_nb:.1f} "
          f"(NB wins by {ev_nb - ev_p:.1f} nats on overdispersed data)")
    print(f"learned dispersion r = {float(r_nb):.3f} (truth {r_true})")
    assert ev_nb > ev_p, "NB evidence must beat Poisson on NB data"

    xg = jnp.linspace(-3.0, 3.0, 9)[:, None]
    rate_p, *_ = poisson_predict(SeIso, p_p, z_p, X, yj, xg)
    rate_nb, var_nb, *_ = negbin_predict(SeIso, p_nb, z_nb, X, yj, r_nb, xg)
    truth = np.exp(1.3 * np.sin(np.asarray(xg)[:, 0]) + 0.3)
    print("\n   x      truth   poisson  negbin   nb-sd")
    for i in range(len(xg)):
        print(f"  {float(xg[i, 0]):+0.2f}   {truth[i]:6.2f}  "
              f"{float(rate_p[i]):6.2f}  {float(rate_nb[i]):6.2f}  "
              f"{float(jnp.sqrt(var_nb[i])):6.2f}")
    err_p = np.mean(np.abs(np.log(np.asarray(rate_p)) - np.log(truth)))
    err_nb = np.mean(np.abs(np.log(np.asarray(rate_nb)) - np.log(truth)))
    print(f"mean |log-rate error|: poisson {err_p:.3f}, negbin {err_nb:.3f}")

    # --- binomial postscript: successes of N_i trials ---------------------
    trials = rng.integers(1, 15, n).astype(float)
    p_success = 1.0 / (1.0 + np.exp(-1.5 * np.sin(Xn[:, 0])))
    succ = rng.binomial(trials.astype(int), p_success).astype(float)
    pack_b = make_pack(SeIso, params0, z0, 1.0, learn_sigma2=False)
    p_b, z_b, st_b = fit_binomial(
        SeIso, X, jnp.asarray(succ), jnp.asarray(trials), pack_b, max_iter=40
    )
    prob, *_ = binomial_predict(SeIso, p_b, z_b, X, jnp.asarray(succ),
                                jnp.asarray(trials), xg)
    truth_p = 1.0 / (1.0 + np.exp(-1.5 * np.sin(np.asarray(xg)[:, 0])))
    err_b = np.mean(np.abs(np.asarray(prob) - truth_p))
    print(f"\nbinomial (N_i in 1..14): mean |prob error| {err_b:.3f} "
          f"over the grid")
    assert err_b < 0.1, err_b
    print("\ndemo OK")


if __name__ == "__main__":
    main()
