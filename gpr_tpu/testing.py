"""Derivative self-test harness — the rebuild of ``Sigs.Deriv.Test``.

The reference ships finite-difference validators as part of the library
(``check_deriv_hyper`` and ``self_test``, lib/fitc_gp.ml:1212-1462, spec
lib/interfaces.ml:987-1026) and its derivative executable drives them over
every hyper of the fat kernel (test/test_derivatives.ml).  Here the analytic
side is jax AD instead of hand-derived sparse representations, so these
checks validate (a) each kernel family's smoothness/correctness under jvp
and (b) the full evidence gradient — including through the jittered Cholesky
and both factorizations.

Central differences with f64 give ~1e-9 accuracy; defaults are tighter than
the reference's (eps=1e-8, tol=1e-2 at fitc_gp.ml:1223,1398) accordingly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models.fitc import log_evidence
from .optim.pack import make_pack


class DerivMismatch(AssertionError):
    """Raised with the offending quantity, mirroring the reference's loud
    per-element failure reports."""


def _fd_dir(f, x, v, eps):
    plus, minus = f(x + eps * v), f(x - eps * v)
    return jax.tree.map(lambda a, b: (a - b) / (2.0 * eps), plus, minus)


def check_deriv_hyper(
    family, params, z, X, *, eps: float = 1e-6, tol: float = 1e-6
) -> int:
    """Check d(Km)/dh, d(Knm)/dh, d(kn_diag)/dh along every optimizable
    hyper direction: jax.jvp vs central finite differences.

    Returns the number of directions checked.  Raises :class:`DerivMismatch`
    naming the worst element on failure.
    """
    pack = make_pack(family, params, z, 1.0, learn_sigma2=False)
    x0 = pack.x0

    def mats(x):
        p, zz, _ = pack.unpack(x)
        return (
            family.k_upper(p, zz),
            family.k_cross(p, X, zz),
            family.k_diag(p, X),
        )

    names = ("dKm", "dKnm", "dkn_diag")
    n = int(x0.shape[0])
    for i in range(n):
        v = jnp.zeros_like(x0).at[i].set(1.0)
        analytic = jax.jvp(mats, (x0,), (v,))[1]
        fd = _fd_dir(mats, x0, v, eps)
        for name, a, f in zip(names, analytic, fd):
            a, f = np.asarray(a), np.asarray(f)
            err = np.abs(a - f)
            scale = np.maximum(1.0, np.abs(f))
            rel = err / scale
            if rel.max() > tol:
                idx = np.unravel_index(rel.argmax(), rel.shape)
                raise DerivMismatch(
                    f"{family.name}: {name} mismatch for hyper coordinate "
                    f"{i} at element {idx}: analytic {a[idx]:.10g} vs FD "
                    f"{f[idx]:.10g} (tol {tol})"
                )
    return n


def self_test(
    family,
    params,
    z,
    X,
    y,
    sigma2,
    *,
    variational: bool = False,
    factorization: str | None = None,
    eps: float = 1e-6,
    tol: float = 1e-5,
) -> int:
    """Check the full evidence gradient (log sigma2, every kernel hyper,
    every inducing coordinate) against central finite differences — the
    analogue of Test.self_test looping `Sigma2 and each `Hyper
    (fitc_gp.ml:1398-1462).  Returns the number of coordinates checked."""
    pack = make_pack(family, params, z, sigma2, learn_sigma2=True)
    x0 = pack.x0

    def f(x):
        p, zz, s2 = pack.unpack(x)
        return log_evidence(
            family, p, zz, s2, X, y,
            variational=variational, factorization=factorization,
        )

    g = np.asarray(jax.grad(f)(x0))
    n = int(x0.shape[0])
    for i in range(n):
        v = jnp.zeros_like(x0).at[i].set(1.0)
        fd = float(_fd_dir(f, x0, v, eps))
        err = abs(g[i] - fd) / max(1.0, abs(fd))
        if err > tol:
            which = "log_sigma2" if (pack.learn_sigma2 and i == 0) else f"hyper {i}"
            raise DerivMismatch(
                f"{family.name}: evidence gradient mismatch for {which}: "
                f"analytic {g[i]:.10g} vs FD {fd:.10g} (rel err {err:.2e}, "
                f"tol {tol})"
            )
    return n
