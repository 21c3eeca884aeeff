"""Second, independent oracle: Ed Snelson's ``spgp_lik.m`` in numpy f64.

The reference cross-checks its evidence/gradients against Snelson's original
SPGP implementation (/root/reference/test/oct.m:183-192 calling
/root/reference/test/spgp_lik.m) — an implementation by a *different author*
with a *different factorization* (scaled-by-ep form, lower Cholesky, explicit
hand-derived gradients).  This file transliterates spgp_lik.m:3-115 to numpy,
keeping its variable names and its exact operation order; it imports nothing
from gpr_tpu, closing the "both sides written by the same author" loophole of
tests/oracle.py.

Model (spgp_lik.m:15-22): SPGP / FITC negative log likelihood with the ARD SE
kernel  cov = c * exp(-0.5 * sum_d b_d (x_d - x'_d)^2),  noise sig, jitter
``del`` added to the inducing gram.  w packs [vec(xb); log b; log c; log sig].

Returns (fw, dfw): the NLL and its gradient w.r.t. w.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import cholesky, solve_triangular


def spgp_lik(w, y, x, n, delta=1e-6):
    """Transliteration of spgp_lik.m (Snelson 2006).  All f64.

    w: (n*dim + dim + 2,) packed [xb (n*dim, column-major per dim); log b;
       log c; log sig];  y: (N,);  x: (N, dim);  n: #pseudo-inputs.
    """
    w = np.asarray(w, float).ravel()
    y = np.asarray(y, float).reshape(-1, 1)
    x = np.asarray(x, float)
    N, dim = x.shape
    xb = w[: n * dim].reshape(n, dim, order="F")
    b = np.exp(w[n * dim : n * dim + dim])
    c = float(np.exp(w[-2]))
    sig = float(np.exp(w[-1]))

    xb = xb * np.sqrt(b)[None, :]
    x = x * np.sqrt(b)[None, :]

    Q = xb @ xb.T
    Q = np.diag(Q)[:, None] + np.diag(Q)[None, :] - 2.0 * Q
    Q = c * np.exp(-0.5 * Q) + delta * np.eye(n)

    K = -2.0 * xb @ x.T + np.sum(x * x, 1)[None, :] + np.sum(xb * xb, 1)[:, None]
    K = c * np.exp(-0.5 * K)

    L = cholesky(Q, lower=True)
    V = solve_triangular(L, K, lower=True)
    ep = (1.0 + (c - np.sum(V**2, 0)) / sig)[:, None]  # (N, 1)
    K = K / np.sqrt(ep).T
    V = V / np.sqrt(ep).T
    y = y / np.sqrt(ep)
    Lm = cholesky(sig * np.eye(n) + V @ V.T, lower=True)
    invLmV = solve_triangular(Lm, V, lower=True)
    bet = invLmV @ y  # (n, 1)

    fw = (
        np.sum(np.log(np.diag(Lm)))
        + (N - n) / 2.0 * np.log(sig)
        + float((y.T @ y - bet.T @ bet).item()) / 2.0 / sig
        + np.sum(np.log(ep)) / 2.0
        + 0.5 * N * np.log(2.0 * np.pi)
    )

    # ----- derivatives (spgp_lik.m:62-115) --------------------------------
    Lt = L @ Lm
    B1 = solve_triangular(Lt.T, invLmV, lower=False)
    b1 = solve_triangular(Lt.T, bet, lower=False)
    invLV = solve_triangular(L.T, V, lower=False)
    invL = np.linalg.inv(L)
    invQ = invL.T @ invL
    invLt = np.linalg.inv(Lt)
    invA = invLt.T @ invLt
    mu = (solve_triangular(Lm.T, bet, lower=False).T @ V).T  # (N, 1)
    sumVsq = np.sum(V**2, 0)[:, None]  # (N, 1)
    bigsum = (
        y * (bet.T @ invLmV).T / sig
        - np.sum(invLmV * invLmV, 0)[:, None] / 2.0
        - (y**2 + mu**2) / 2.0 / sig
        + 0.5
    )  # (N, 1)
    TT = invLV @ (invLV.T * bigsum)  # (n, n)

    dfxb = np.zeros((n, dim))
    dfb = np.zeros(dim)
    for i in range(dim):
        # dist(u, v) = u_k - v_l  (outer difference)
        dnnQ = (xb[:, i][:, None] - xb[:, i][None, :]) * Q
        dNnK = (x[:, i][None, :] - xb[:, i][:, None]) * K

        epdot = (-2.0 / sig) * dNnK * invLV  # (n, N)
        epPmod = -np.sum(epdot, 0)[:, None]  # (N, 1)

        dfxb[:, i] = (
            -b1[:, 0] * ((dNnK @ (y - mu))[:, 0] / sig + (dnnQ @ b1)[:, 0])
            + np.sum((invQ - invA * sig) * dnnQ, 1)
            + (epdot @ bigsum)[:, 0]
            - (2.0 / sig) * np.sum(dnnQ * TT, 1)
        )
        dfb[i] = float(
            (((y - mu)[:, 0] * (b1.T @ dNnK)[0]) / sig
             + (epPmod * bigsum)[:, 0]) @ x[:, i]
        )

        dNnK = dNnK * B1
        dfxb[:, i] = dfxb[:, i] + np.sum(dNnK, 1)
        dfb[i] = dfb[i] - np.sum(dNnK, 0) @ x[:, i]

        dfxb[:, i] = dfxb[:, i] * np.sqrt(b[i])

        dfb[i] = dfb[i] / np.sqrt(b[i])
        dfb[i] = dfb[i] + dfxb[:, i] @ xb[:, i] / b[i]
        dfb[i] = dfb[i] * np.sqrt(b[i]) / 2.0

    epc = ((c / ep[:, 0] - sumVsq[:, 0]
            - delta * np.sum(invLV**2, 0)) / sig)[:, None]

    dfc = (
        (n + delta * np.trace(invQ - sig * invA)
         - sig * np.sum(invA * Q.T)) / 2.0
        - float((mu.T @ (y - mu)).item()) / sig
        + float((b1.T @ (Q - delta * np.eye(n)) @ b1).item()) / 2.0
        + float((epc.T @ bigsum).item())
    )

    dfsig = float(np.sum(bigsum / ep))

    dfw = np.concatenate(
        [dfxb.reshape(n * dim, order="F"), dfb, [dfc], [dfsig]]
    )
    return float(fw), dfw
