"""Smoke test for the display.R counterpart (gpr_tpu/viz.py)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np


def test_plot_fit_renders(tmp_path, rng):
    from gpr_tpu.viz import plot_fit

    n = 120
    x = np.sort(rng.uniform(-5, 5, n))
    f = np.sin(x)
    y = f + 0.3 * rng.standard_normal(n)
    var = 0.05 + 0.01 * rng.uniform(size=n)
    ax = plot_fit(
        x, y, f, var, 0.09,
        true_fn=np.sin,
        inducing=np.linspace(-4, 4, 7),
        samples=np.stack([f + 0.1 * rng.standard_normal(n) for _ in range(3)]),
        fic_samples=np.stack([f + 0.1 * rng.standard_normal(n)]),
    )
    out = tmp_path / "fit.png"
    ax.figure.savefig(out)
    assert out.stat().st_size > 10_000
    # every named series present in the legend
    labels = {t.get_text() for t in ax.get_legend().get_texts()}
    assert {"data", "true f", "posterior mean", "inducing",
            "posterior samples", "FIC samples", "95% (latent)",
            "95% (predictive)"} <= labels


def test_plot_artifacts_renders(tmp_path, rng):
    """The artifact-directory entry point (the `R -f display.R` analogue)."""
    import os

    from gpr_tpu.viz import plot_artifacts

    n = 80
    x = np.sort(rng.uniform(-5, 5, n))
    arts = {
        "inputs": x,
        "targets": np.sin(x) + 0.2 * rng.standard_normal(n),
        "means": np.sin(x),
        "variances": 0.05 + 0.01 * rng.uniform(size=n),
        "sigma2": np.asarray(0.04),
        "inducing_points": np.linspace(-4, 4, 6),
        "fitc_samples": np.stack([np.sin(x) + 0.1 * rng.standard_normal(n)
                                  for _ in range(2)]),
        "fic_samples": np.sin(x)[None, :],
    }
    for name, arr in arts.items():
        np.savetxt(os.path.join(tmp_path, name), np.atleast_1d(arr))
    out = tmp_path / "fit.png"
    plot_artifacts(str(tmp_path), str(out))
    assert out.stat().st_size > 10_000
