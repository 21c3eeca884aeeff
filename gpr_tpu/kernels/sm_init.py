"""Data-driven initialization for spectral-mixture kernels.

SM kernels (kernels.sm_family) are notoriously init-sensitive: the evidence
in frequency space is multi-modal with period-doubling ridges, and a random
start usually finds a harmonic or nothing (Wilson & Adams 2013, sec. 5 —
their published practice initializes from the empirical spectrum).  This
module implements that practice for SCATTERED inputs, where an FFT does not
apply: a classic periodogram (Lomb-Scargle numerator) evaluated on a
per-dimension frequency grid — two GEMV-shaped projections per dimension —
then q frequency draws proportional to spectral power (Gumbel top-q, so
components land on DISTINCT peaks instead of q copies of the strongest).

Grid and scales per dimension:
  f_nyq  = 1 / (2 * median nearest-neighbor spacing)   (resolvable ceiling)
  f_min  = 1 / (2 * range)                             (window floor)
  grid   = geometric in [f_min, f_nyq], n_grid points

Component j gets:
  cosine.mu[d]      = f_jd drawn from the power-weighted grid
  se_ard.log_ells[d]: spectral peak width sigma_s = max(f_jd/4, f_min)
                      -> ell = 1/(2 pi sigma_s)  (a peak narrower than the
                      window is unresolvable; wider than f/4 stops being a
                      local peak)
  se_ard.log_sf2    = log(var(y)/q)               (equal weight split)

One component is always anchored at the window floor with an ell of the
full input range — the smooth-trend/DC component every decomposition
needs.  No reference counterpart (mmottl/gpr has no spectral machinery).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .combinators import CombParams
from .cosine import Params as CosineParams
from .se_ard import Params as SeArdParams

_TWO_PI = 2.0 * np.pi


def _dim_scales(x: np.ndarray):
    """(f_min, f_nyq) for one input dimension from its empirical spacing."""
    xs = np.sort(np.unique(x))
    rng = float(xs[-1] - xs[0]) if xs.size > 1 else 1.0
    if rng <= 0.0:
        return 1e-3, 1.0
    if xs.size > 1:
        dx = float(np.median(np.diff(xs)))
    else:
        dx = rng
    f_nyq = 1.0 / (2.0 * max(dx, 1e-12))
    f_min = 1.0 / (2.0 * rng)
    return f_min, max(f_nyq, f_min * 2.0)


def _periodogram(x: np.ndarray, y: np.ndarray, freqs: np.ndarray):
    """Classic periodogram power at ``freqs`` for scattered 1-D inputs:
    P(f) = (sum y cos(2 pi f x))^2 + (sum y sin(2 pi f x))^2."""
    ang = _TWO_PI * np.outer(freqs, x)  # (n_f, n)
    c = np.cos(ang) @ y
    s = np.sin(ang) @ y
    return c * c + s * s


def sm_spectrum(X, y, n_grid: int = 256):
    """Per-dimension (freqs, power) marginal periodograms — the quantity
    ``sm_init_from_data`` samples from, exposed for diagnostics/plots."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    y = y - y.mean()
    out = []
    for d in range(X.shape[1]):
        f_min, f_nyq = _dim_scales(X[:, d])
        freqs = np.geomspace(f_min, f_nyq, n_grid)
        out.append((freqs, _periodogram(X[:, d], y, freqs)))
    return out


def sm_init_from_data(q: int, X, y, key=None, *, n_grid: int = 256):
    """Empirical-spectrum init for ``sm_family(q)``.

    Returns a params PyTree matching ``sm_family(q).Params`` (the nested
    CombParams of q prod(se_ard, cosine) terms; q = 1 returns the single
    product's params).  ``key`` (a jax PRNGKey or int seed) randomizes the
    power-weighted draw; None takes the top-q peaks deterministically.
    """
    if q < 1:
        raise ValueError("sm_init_from_data needs q >= 1")
    X = np.asarray(X, dtype=np.float64)
    if X.ndim == 1:
        X = X[:, None]
    yc = np.asarray(y, dtype=np.float64)
    yc = yc - yc.mean()
    n, dim = X.shape
    var_y = float(yc @ yc / max(n, 1)) or 1.0

    if key is None:
        rng = None
    elif isinstance(key, (int, np.integer)):
        rng = np.random.default_rng(int(key))
    else:  # jax PRNGKey
        import jax

        rng = np.random.default_rng(
            int(jax.random.randint(key, (), 0, 2**31 - 1))
        )

    # per-dimension power-weighted frequency draws (q-1 spectral + 1 trend)
    n_spec = q - 1 if q > 1 else 1
    mus = np.zeros((q, dim))
    sig_s = np.zeros((q, dim))
    for d in range(dim):
        f_min, f_nyq = _dim_scales(X[:, d])
        freqs = np.geomspace(f_min, f_nyq, n_grid)
        power = _periodogram(X[:, d], yc, freqs)
        logp = np.log(power + 1e-12 * power.max() + 1e-300)
        if rng is not None:
            logp = logp + rng.gumbel(size=logp.shape)  # Gumbel top-q draw
        # greedy picks with an exclusion window so q components land on q
        # DISTINCT spectral peaks, not adjacent bins of the strongest one
        w = max(n_grid // 32, 2)
        avail = logp.copy()
        top = []
        for _ in range(min(n_spec, n_grid)):
            i = int(np.argmax(avail))
            top.append(i)
            avail[max(0, i - w):i + w + 1] = -np.inf
        f_sel = freqs[np.sort(np.asarray(top))]
        if f_sel.size < n_spec:  # degenerate grid
            f_sel = np.resize(f_sel, n_spec)
        row0 = 1 if q > 1 else 0
        mus[row0:, d] = f_sel[: q - row0]
        sig_s[row0:, d] = np.maximum(f_sel[: q - row0] / 4.0, f_min)
        if q > 1:
            mus[0, d] = 0.0  # trend/DC component
            sig_s[0, d] = f_min
        elif rng is None:
            # q == 1: single component on the strongest peak (already set)
            pass

    log_w = np.log(var_y / q)
    terms = []
    for j in range(q):
        ells = 1.0 / (_TWO_PI * sig_s[j])
        terms.append(CombParams(terms=(
            SeArdParams(log_ells=jnp.asarray(np.log(ells)),
                        log_sf2=jnp.asarray(log_w)),
            CosineParams(mu=jnp.asarray(mus[j])),
        )))
    if q == 1:
        return terms[0]
    return CombParams(terms=tuple(terms))
