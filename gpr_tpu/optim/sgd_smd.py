"""Gradient-ascent optimizers: SGD with decaying rate, and SMD.

Ports of the reference's homegrown optimizers (lib/fitc_gp.ml:1724-2019).
Both *maximize* the evidence: x += eta * grad, with sigma2 carried in log
space as coordinate 0 of the packed vector (which makes the reference's
special-cased ``exp(log sigma2 + eta * g)`` update fall out automatically).

SMD (stochastic meta-descent) adapts a per-coordinate rate.  The reference
approximates the Hessian-vector product H.nu by central finite differences of
the gradient and notes it "would require algorithmic differentiation for
practical use" (fitc_gp.ml:1952-1954) — we have AD: ``jax.jvp`` of the
gradient function gives the exact H.nu in one forward-over-reverse pass.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SGDState:
    """fitc_gp.ml:1725-1735."""

    x: jnp.ndarray
    grad: jnp.ndarray
    eta: float
    tau: float
    step: int

    @property
    def gradient_norm(self) -> float:
        return float(jnp.linalg.norm(self.grad))


def sgd_create(grad_fn, x0, *, tau: float = 100.0, eta0: float = 1e-3) -> SGDState:
    """fitc_gp.ml:1737-1772 (defaults tau=100, eta0=1e-3)."""
    if tau <= 0 or eta0 <= 0:
        raise ValueError("tau and eta0 must be positive")
    return SGDState(x=x0, grad=grad_fn(x0), eta=eta0, tau=tau, step=0)


def sgd_step(grad_fn, st: SGDState) -> SGDState:
    """Ascent step + learning-rate decay eta <- tau/(tau+step) eta
    (fitc_gp.ml:1774-1826)."""
    x = st.x + st.eta * st.grad
    return SGDState(
        x=x,
        grad=grad_fn(x),
        eta=st.tau / (st.tau + st.step) * st.eta,
        tau=st.tau,
        step=st.step + 1,
    )


@dataclasses.dataclass(frozen=True)
class SMDState:
    """fitc_gp.ml:1836-1848."""

    x: jnp.ndarray
    grad: jnp.ndarray
    eta: jnp.ndarray  # per-coordinate rates
    nu: jnp.ndarray
    lambda_: float
    mu: float

    @property
    def gradient_norm(self) -> float:
        return float(jnp.linalg.norm(self.grad))


def smd_create(
    grad_fn,
    x0,
    *,
    lambda_: float = 0.1,
    mu: float = 1e-3,
    eta0: jnp.ndarray | float = 1e-3,
    nu0: jnp.ndarray | float = 1e-3,
) -> SMDState:
    """fitc_gp.ml:1850-1925 (defaults lambda=0.1, mu=1e-3, eta0=nu0=1e-3)."""
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError("lambda must be in [0, 1]")
    if mu < 0.0:
        raise ValueError("mu must be >= 0")
    n = x0.shape[0]
    eta = jnp.broadcast_to(jnp.asarray(eta0, x0.dtype), (n,))
    if jnp.any(eta <= 0):
        raise ValueError("eta0 must be positive")
    nu = jnp.broadcast_to(jnp.asarray(nu0, x0.dtype), (n,))
    return SMDState(
        x=x0, grad=grad_fn(x0), eta=eta, nu=nu, lambda_=lambda_, mu=mu
    )


def smd_step(grad_fn, st: SMDState, *, hvp_fn=None) -> SMDState:
    """One SMD update (fitc_gp.ml:1927-2012):

        eta' = eta * max(1/2, 1 + mu * g * nu)
        x'   = x + eta' * g
        nu'  = lambda nu + eta * (g + lambda H nu)

    ``hvp_fn(x, v)`` defaults to the exact jax.jvp product.
    """
    if hvp_fn is None:
        def hvp_fn(x, v):
            return jax.jvp(grad_fn, (x,), (v,))[1]

    h_nu = hvp_fn(st.x, st.nu)
    eta = st.eta * jnp.maximum(0.5, 1.0 + st.mu * st.grad * st.nu)
    x = st.x + eta * st.grad
    nu = st.lambda_ * st.nu + st.eta * (st.grad + st.lambda_ * h_nu)
    return SMDState(
        x=x, grad=grad_fn(x), eta=eta, nu=nu, lambda_=st.lambda_, mu=st.mu
    )


def run_ascent(
    step_fn: Callable,
    value_fn: Callable[[jnp.ndarray], float],
    state,
    *,
    epsabs: float = 0.1,
    max_iter: int | None = None,
    report: Callable | None = None,
):
    """Best-so-far driver shared by SGD and SMD (fitc_gp.ml:1696-1722):
    iterate until |grad| < epsabs or max_iter, returning the state whose
    evidence was highest."""
    if max_iter is not None and max_iter < 0:
        raise ValueError("max_iter < 0")
    n = max_iter if max_iter is not None else -1
    best, best_le = state, value_fn(state.x)
    t = state
    while n != 0 and t.gradient_norm >= epsabs:
        t = step_fn(t)
        le = value_fn(t.x)
        if le > best_le:
            best_le, best = le, t
            if report is not None:
                report(t)
        n -= 1
    return best
