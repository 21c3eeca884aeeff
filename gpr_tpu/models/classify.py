"""Binary GP classification: Laplace approximation over the FITC prior.

The reference is regression-only and names classification as future work
(doc/manual/gpr_manual.tex:82, 532-559).  This module delivers the
standard route (GPML ch. 3, Rasmussen & Williams): a Bernoulli-logit
likelihood over a latent sparse-GP with the FITC prior

  f ~ N(0, K),   K = V V' + D,   V = Knm U^-1,  D = diag(kd - rowsq(V)),

mode-finding by the stabilized Newton iteration of GPML Algorithm 3.1,
with every n x n object eliminated through the low-rank + diagonal
structure: B = I + W^1/2 K W^1/2 inverts via an m x m Woodbury factor, so
one Newton step is two (n, m) GEMMs + elementwise work, and the Laplace
evidence needs only diagonal sums and an m x m Cholesky:

  log|B| = sum log(1 + w_i d_i) + log|I_m + V' diag(w/(1+wd)) V|.

Hyper gradients: the mode is a fixed point, and models/ift.py supplies
the implicit-function-theorem gradient (GPML section 5.5.1) through a
custom_vjp — the reverse pass is ONE extra m-space Woodbury solve plus
one kernel VJP at the held-fixed mode instead of retraversing all
newton_iters remat'ed sweeps (grad_impl="unroll" keeps the round-1..4
unrolled route as the comparison path; both agree to the mode's
convergence tolerance, tested).  Train with optim.fit_packed_objective.

Prediction reuses the FITC predictive shape: the latent variance is
k** - rowsq(V*) + rowsq(V* R^-1) with R'R = I_m + S the posterior
m-factor, and class probabilities use the probit approximation to the
logistic integral (MacKay 1992): p = sigma(mu / sqrt(1 + pi var / 8)).

V is materialized at (n, m) — 1.2 GB f32 at the 1M x 300 bench shape,
fine for HBM; a streaming variant is a mechanical extension (every
product below is a row-block reduction) if n ever outgrows that.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..numerics.linalg import (
    cholesky_upper,
    inv_tri_upper,
    matmul,
    rows_sqr_norm,
    solve_tri,
    solve_tri_right,
)
from .fitc import calc_inducing


def _fitc_prior(family, params, z, X, jitter=None, d_floor=1e-8):
    """(V, d): the low-rank + diagonal FITC prior K = V V' + diag(d)."""
    inducing = calc_inducing(family, params, z, jitter)
    u_inv = inv_tri_upper(inducing.chol_km)
    knm = family.k_cross(params, X, inducing.z)
    v = matmul(knm, u_inv)
    d = jnp.maximum(family.k_diag(params, X) - rows_sqr_norm(v), d_floor)
    return inducing, v, d


def _log_sigmoid(t):
    return -jnp.logaddexp(0.0, -t)


def logit_parts(f, lik, mask):
    """(dl/df, W) of the Bernoulli-logit likelihood, elementwise; the
    ift.py parts convention (lik = (y,) with y in {-1,+1})."""
    (y,) = lik
    pi = jax.nn.sigmoid(f)
    w = mask * jnp.maximum(pi * (1.0 - pi), 1e-12)
    grad = mask * (0.5 * (y + 1.0) - pi)
    return grad, w


def logit_loglik(f, lik):
    (y,) = lik
    return _log_sigmoid(y * f)


def newton_scan(
    v, d, y, mask, *, newton_iters: int = 15, allsum=lambda x: x,
):
    """The Newton iteration over local rows of the FITC prior — the
    logit instance of ift.newton_scan_generic (the shared stabilized
    scaffold: m-space Woodbury solve, one round of iterative refinement,
    exact concave line maximum; measured rationale in the generic scan
    and the git history of this file).

    ``allsum`` reduces m-vectors / m x m matrices / scalars over the data
    axis: identity on one device, ``lax.psum`` under shard_map — every
    cross-row quantity in the step is such a sum, so data parallelism is
    exact.  ``mask`` zeroes padded rows (their w and likelihood gradient
    vanish, which keeps their ``a`` rows exactly zero throughout).
    Returns (f_hat, a) over the local rows.
    """
    from .ift import newton_scan_generic

    return newton_scan_generic(
        logit_parts, v, d, (y,), mask, newton_iters=newton_iters,
        allsum=allsum,
    )




def laplace_mode(
    family, params, z, X, y, *, newton_iters: int = 15,
    jitter: float | None = None,
):
    """Newton mode-finding for the Laplace approximation.

    ``y`` in {-1, +1}.  Returns (f_hat, a, inducing, v, d) with
    f_hat = K a the latent mode — the fixed iteration count keeps the loop
    jit/grad-friendly; 15 Newton steps converge this concave problem to
    f64 roundoff in practice (the evidence test asserts it).
    """
    inducing, v, d = _fitc_prior(family, params, z, X, jitter)
    f_hat, a = newton_scan(v, d, y, jnp.ones_like(y),
                           newton_iters=newton_iters)
    return f_hat, a, inducing, v, d


def classify_log_evidence(
    family, params, z, X, y, *, newton_iters: int = 15,
    jitter: float | None = None, block_size: int | None = None,
    grad_impl: str = "ift",
):
    """Laplace marginal likelihood log q(y | X, hypers) (GPML eq. 3.32).
    Differentiable w.r.t. (params, z); ``grad_impl`` picks the implicit
    (IFT, default — reverse cost ~one Newton step) or unrolled gradient
    route (models/ift.py docstring).

    ``block_size`` switches to the streaming Newton (classify_stream.py):
    V never materializes at (n, m), so n is unbounded — identical value
    and gradients at ~3x the passes."""
    if block_size is not None:
        from .classify_stream import stream_classify_log_evidence

        return stream_classify_log_evidence(
            family, params, z, X, y, block_size=block_size,
            newton_iters=newton_iters, jitter=jitter,
        )
    from .ift import laplace_evidence_core

    _, v, d = _fitc_prior(family, params, z, X, jitter)
    return laplace_evidence_core(
        logit_parts, logit_loglik, v, d, (y,), jnp.ones_like(y),
        newton_iters=newton_iters, grad_impl=grad_impl,
    )


def classify_predict(
    family, params, z, X, y, Xstar, *, newton_iters: int = 15,
    jitter: float | None = None, block_size: int | None = None,
):
    """(prob, latent_mean, latent_var) at Xstar.

    Latent posterior: mu* = V* (V' a); var* = k** - rowsq(V*)
    + rowsq(V* R^-1) with R'R = I + V' diag(1/(d + 1/w)) V — the identity
    S(I+S)^-1 = I - (I+S)^-1 collapses the Woodbury quadratic form onto
    the FITC predictive-variance shape.  Class probability via MacKay's
    probit approximation to the logistic-Gaussian integral.
    ``block_size`` streams the mode + state (classify_stream.py).
    """
    if block_size is not None:
        from .classify_stream import stream_classify_predict

        return stream_classify_predict(
            family, params, z, X, y, Xstar, block_size=block_size,
            newton_iters=newton_iters, jitter=jitter,
        )
    f_hat, a, inducing, v, d = laplace_mode(
        family, params, z, X, y, newton_iters=newton_iters, jitter=jitter
    )
    pi = jax.nn.sigmoid(f_hat)
    w = jnp.maximum(pi * (1.0 - pi), 1e-12)
    d2inv = w / (1.0 + w * d)  # = 1/(d + 1/w), division-by-w-free
    vs = v * jnp.sqrt(d2inv)[:, None]
    s_mat = matmul(vs.T, vs)
    rn = cholesky_upper(jnp.eye(v.shape[1], dtype=v.dtype) + s_mat,
                        jitter=0.0)

    u_inv = inv_tri_upper(inducing.chol_km)
    kstar = family.k_cross(params, Xstar, inducing.z)
    vstar = matmul(kstar, u_inv)
    mu = matmul(vstar, matmul(v.T, a))
    # v*' S (I+S)^-1 v* = rowsq(v*) - rowsq(v* Rn^-1)
    quad = rows_sqr_norm(vstar) - rows_sqr_norm(
        solve_tri_right(vstar, rn)
    )
    var = jnp.maximum(family.k_diag(params, Xstar) - quad, 1e-10)
    prob = jax.nn.sigmoid(mu / jnp.sqrt(1.0 + jnp.pi * var / 8.0))
    return prob, mu, var


def fit_classify(
    family, X, y, pack, *, newton_iters: int = 15,
    jitter: float | None = None, normalize: bool = True, mesh=None,
    block_size: int | None = None, **fit_kwargs,
):
    """Hyper + inducing training of the Laplace classifier with the
    device L-BFGS (optim.fit_packed_objective conventions).

    Build ``pack`` with ``learn_sigma2=False`` — the Bernoulli likelihood
    has no noise variance (a pack that still carries log sigma2 trains it
    to no effect and wastes a coordinate; this function rejects it to
    catch the mistake early).  With ``mesh``, X/y shard over the data
    axis and the objective is parallel.sharded_classify_log_evidence.
    ``block_size`` streams the Newton (memory O(n + block x m) per
    device, so n is unbounded); both options compose.

    Returns ``(params, z, state)``.
    """
    if pack.learn_sigma2:
        raise ValueError(
            "classification has no sigma2: build the pack with "
            "make_pack(..., learn_sigma2=False)"
        )
    from ..optim.lbfgs_device import fit_packed_objective

    scale = 1.0 / X.shape[0] if normalize else 1.0
    if mesh is None:
        def fg(x, X, y):
            def f(x):
                params, z, _ = pack.unpack(x)
                return -scale * classify_log_evidence(
                    family, params, z, X, y,
                    newton_iters=newton_iters, jitter=jitter,
                    block_size=block_size,
                )

            return jax.value_and_grad(f)(x)

        data = (X, y)
    else:
        from ..parallel import shard_batch
        from ..parallel.classify_sharded import (
            sharded_classify_log_evidence,
        )

        Xs, ys, mask = shard_batch(mesh, X, y)

        def fg(x, Xs, ys, mask):
            def f(x):
                params, z, _ = pack.unpack(x)
                return -scale * sharded_classify_log_evidence(
                    family, mesh, params, z, Xs, ys, mask,
                    newton_iters=newton_iters, jitter=jitter,
                    block_size=block_size,
                )

            return jax.value_and_grad(f)(x)

        data = (Xs, ys, mask)

    st = fit_packed_objective(fg, pack, data, **fit_kwargs)
    params, z, _ = pack.unpack(st.x)
    return params, z, st
