"""Spectral-mixture demo: learn a two-tone signal's spectrum and
extrapolate it far outside the training window.

A plain SE kernel interpolates beautifully and then reverts to the mean
one lengthscale past the data.  A spectral-mixture kernel (sm_family —
Wilson & Adams 2013, built here from prod(se_ard, cosine) combinators)
learns the signal's SPECTRUM, so its predictions keep oscillating,
phase-locked, arbitrarily far out.  The empirical-spectrum initializer
(sm_init_from_data) reads the two tones straight off the periodogram,
which is what makes the multi-modal frequency landscape trainable.

Run: python examples/demo_spectral.py   (CPU f64, ~a minute)
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
    sm_family,
    sm_init_from_data,
    sm_spectrum,
)
from gpr_tpu.models.fitc import calc_model, calc_trained  # noqa: E402
from gpr_tpu.models.predict import mean_predictor, predict_means  # noqa: E402
from gpr_tpu.optim import make_pack  # noqa: E402
from gpr_tpu.optim.lbfgs_device import fit  # noqa: E402

F1, F2 = 0.35, 1.2


def signal(x):
    return np.cos(2 * np.pi * F1 * x) + 0.6 * np.cos(2 * np.pi * F2 * x)


def ascii_spectrum(freqs, power, marks, width=70, height=10):
    """Log-power vs log-frequency, with the init's picks marked."""
    lp = np.log10(power + power.max() * 1e-9)
    lo, hi = lp.min(), lp.max()
    cols = np.linspace(0, len(freqs) - 1, width).astype(int)
    rows = []
    for h in range(height, 0, -1):
        line = []
        thresh = lo + (hi - lo) * h / height
        for c in cols:
            line.append("#" if lp[c] >= thresh else " ")
        rows.append("".join(line))
    axis = [" "] * width
    for mf in marks:
        j = int(np.argmin(np.abs(freqs[cols] - mf)))
        axis[j] = "^"
    rows.append("".join(axis))
    rows.append(f"f: {freqs[0]:.3g} .. {freqs[-1]:.3g} (geometric; "
                f"^ = init picks)")
    return "\n".join(rows)


def fit_family(fam, p0, X, y, Z, max_iter=200):
    pack = make_pack(fam, p0, Z, 0.05)
    pp, zz, s2, _ = fit(fam, X, y, pack, max_iter=max_iter, normalize=False)
    tr = calc_trained(calc_model(fam, pp, X, zz, s2), y)
    return pp, zz, s2, tr


def main():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0.0, 20.0, 400))
    y = signal(x) + 0.05 * rng.standard_normal(x.size)
    X, yj = jnp.asarray(x[:, None]), jnp.asarray(y)
    Z = X[::10][:40]

    (freqs, power), = sm_spectrum(x[:, None], y)
    q = 3
    p0 = sm_init_from_data(q, x[:, None], y)
    mus = sorted(abs(float(t.terms[1].mu[0])) for t in p0.terms)
    print(f"true tones: {F1}, {F2}")
    print(f"periodogram init picks: {[round(m, 4) for m in mus]} "
          f"(0.0 = trend anchor)\n")
    print(ascii_spectrum(freqs, power, mus[1:]))

    fam = sm_family(q)
    pp, zz, s2, tr = fit_family(fam, p0, X, yj, Z)
    p_se = SeIso.Params(log_ell=jnp.asarray(0.0), log_sf2=jnp.asarray(0.0))
    pse, zse, s2se, tr_se = fit_family(SeIso, p_se, X, yj, Z)

    grid = np.linspace(20.5, 26.0, 80)  # far outside the data
    gX = jnp.asarray(grid[:, None])
    mu_sm = np.asarray(predict_means(fam, pp, mean_predictor(tr), gX))
    mu_se = np.asarray(predict_means(SeIso, pse, mean_predictor(tr_se), gX))
    truth = signal(grid)
    rmse_sm = float(np.sqrt(np.mean((mu_sm - truth) ** 2)))
    rmse_se = float(np.sqrt(np.mean((mu_se - truth) ** 2)))
    corr = float(np.corrcoef(mu_sm, truth)[0, 1])
    print(f"\nextrapolation 0.5-6 units past the data:")
    print(f"  spectral mixture: rmse {rmse_sm:.3f}, corr {corr:.3f}, "
          f"amplitude {mu_sm.std():.2f}")
    print(f"  plain SE:         rmse {rmse_se:.3f} "
          f"(amplitude {mu_se.std():.2f} — reverted to the mean)")
    learned = sorted(abs(float(t.terms[1].mu[0])) for t in pp.terms)[1:]
    print(f"  learned frequencies: {[round(m, 4) for m in learned]}")
    assert rmse_sm < 0.3 * rmse_se


if __name__ == "__main__":
    main()
