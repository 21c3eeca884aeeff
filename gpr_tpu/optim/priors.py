"""Hyper-prior building blocks for MAP estimation.

The reference has no prior/bound mechanism (pure maximum likelihood,
lib/fitc_gp.ml:1532-1671); this is an extension users of probabilistic-
programming stacks expect.  A prior here is any differentiable callable
``(params, z, sigma2) -> scalar log density`` passed as ``log_prior=`` to
:func:`gpr_tpu.optim.train` / :func:`make_objective`; these helpers build
the common cases.  A steep prior (small ``std`` / large ``strength``)
doubles as a soft box bound.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)


def normal(mean, std):
    """Gaussian log density, summed over the argument's elements."""
    mean = jnp.asarray(mean)
    std = jnp.asarray(std)

    def logp(value):
        zsc = (jnp.asarray(value) - mean) / std
        return jnp.sum(-0.5 * (zsc * zsc + LOG_2PI) - jnp.log(std))

    return logp


def soft_box(lo, hi, strength=100.0):
    """Differentiable box penalty: ~0 inside [lo, hi], quadratic outside.
    Acts as a soft bound for the unconstrained L-BFGS (GSL-style optimizers
    have no native bound support either — the reference simply had neither).
    """

    def logp(value):
        v = jnp.asarray(value)
        below = jnp.minimum(v - lo, 0.0)
        above = jnp.maximum(v - hi, 0.0)
        return -strength * jnp.sum(below * below + above * above)

    return logp


def field_priors(param_priors=None, sigma2_prior=None, z_prior=None):
    """Compose per-field priors into one ``log_prior(params, z, sigma2)``.

    ``param_priors`` maps kernel-parameter field names to log-density
    callables (e.g. ``{"log_ell": normal(0.0, 1.0)}``).
    """
    param_priors = dict(param_priors or {})

    def log_prior(params, z, sigma2):
        total = jnp.asarray(0.0)
        for name, logp in param_priors.items():
            total = total + logp(getattr(params, name))
        if sigma2_prior is not None:
            total = total + sigma2_prior(sigma2)
        if z_prior is not None:
            total = total + z_prior(z)
        return total

    return log_prior
