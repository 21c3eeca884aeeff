"""Independent numpy/f64 oracle for the FITC evidence and gradients.

This is a transliteration of the reference's cross-language test oracle
``test/oct.m`` (which itself re-derives the math of lib/fitc_gp.ml from
scratch) into numpy, deliberately NOT using any gpr_tpu code.  It serves the
role Octave + Ed Snelson's spgp_lik.m serve for the reference (SURVEY.md
section 4): an implementation-independent ground truth.

Notes vs oct.m:
  * oct.m:168 computes ``sum(Q .* 2, 2)`` in the variational v1; the OCaml
    source (fitc_gp.ml:1092-1108) uses q_diag = rowsq(Q).  We follow the
    OCaml semantics (the oct.m line is an upstream typo).
  * kernel-matrix derivatives dKm/dKnm/dKn are finite-differenced exactly as
    oct.m:71-83 does (epsilon 1e-6), keeping this oracle formula-free w.r.t.
    kernel derivatives.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy.linalg import cho_factor, cho_solve, cholesky, solve_triangular

JITTER = 1e-6
LOG_2PI = np.log(2.0 * np.pi)


def k_se_iso(a, b, log_ell, log_sf2):
    """sf2 exp(-|a-b|^2 / (2 ell^2)); a (n,d), b (m,d)."""
    d2 = (
        np.sum(a * a, 1)[:, None]
        - 2.0 * a @ b.T
        + np.sum(b * b, 1)[None, :]
    )
    d2 = np.maximum(d2, 0.0)
    return np.exp(log_sf2 - 0.5 * np.exp(-2.0 * log_ell) * d2)


@dataclasses.dataclass
class OracleResult:
    l1: float
    l2: float
    l: float
    vl1: float
    vl: float
    dl_dlog_ell: float
    dl_dlog_sf2: float
    dl_dsigma2: float
    vdl_dlog_ell: float
    vdl_dlog_sf2: float
    vdl_dsigma2: float
    coeffs: np.ndarray
    r_vec: np.ndarray


def fitc_oracle(X, Z, y, sigma2, log_ell, log_sf2, eps=1e-6) -> OracleResult:
    """Evidence + gradients for se_iso FITC, standard and variational.

    Transliterates oct.m:71-181.  X (n,d), Z (m,d), y (n,).
    """
    n = X.shape[0]
    m = Z.shape[0]

    def mats(le, ls):
        km = k_se_iso(Z, Z, le, ls) + JITTER * np.eye(m)
        knm = k_se_iso(X, Z, le, ls)
        kn_diag = np.full(n, np.exp(ls))
        return km, knm, kn_diag

    Km, Knm, Kn_diag = mats(log_ell, log_sf2)

    # FD kernel-matrix derivatives (oct.m:71-83)
    def d_mats(le, ls):
        km_e, knm_e, kn_e = mats(le, ls)
        return (km_e - Km) / eps, (knm_e - Knm) / eps, (kn_e - Kn_diag) / eps

    dKm_ell, dKnm_ell, dKn_ell = d_mats(log_ell + eps, log_sf2)
    dKm_sf2, dKnm_sf2, dKn_sf2 = d_mats(log_ell, log_sf2 + eps)

    cholKm = cholesky(Km, lower=False)  # upper: Km = U'U
    V = solve_triangular(cholKm, Knm.T, trans="T", lower=False).T  # Knm U^-1
    r = Kn_diag - np.sum(V * V, 1)
    s = r + sigma2
    is_ = 1.0 / s
    is_2 = np.sqrt(is_)

    Knm_ = is_2[:, None] * Knm
    B = Km + Knm_.T @ Knm_
    R = cholesky(B, lower=False)  # upper: B = R'R

    log_det_B = 2.0 * np.sum(np.log(np.diag(R)))
    log_det_Km = 2.0 * np.sum(np.log(np.diag(cholKm)))
    l1 = -0.5 * (log_det_B - log_det_Km + np.sum(np.log(s)) + n * LOG_2PI)

    y_ = is_2 * y
    u_m = Knm.T @ (is_ * y)
    t = solve_triangular(R, u_m, trans="T", lower=False)  # R^-T u
    l2 = -0.5 * (y_ @ y_ - t @ t)
    l = l1 + l2
    coeffs = solve_triangular(R, t, lower=False)

    # Q1 = first n rows of the orthogonal factor = Knm_ R^-1 (oct.m:102-104)
    Q1 = solve_triangular(R, Knm_.T, trans="T", lower=False).T
    # S = diag(is) Knm B^-1 (oct.m:106)
    S = is_[:, None] * solve_triangular(
        R, solve_triangular(R, Knm.T, trans="T", lower=False), lower=False
    ).T

    iKm = cho_solve((cholKm, False), np.eye(m))
    iB = cho_solve((R, False), np.eye(m))
    T = iKm - iB
    # oct.m:131 ``U = V / cholKm'`` i.e. V @ inv(U^T) = (U^-1 V^T)^T
    U = solve_triangular(cholKm, V.T, lower=False).T

    q_diag = np.sum(Q1 * Q1, 1)
    v1 = is_ * (1.0 - q_diag)
    U1 = np.sqrt(v1)[:, None] * U
    W1 = T - U1.T @ U1
    X1 = S - v1[:, None] * U

    def dl1_of(dKn, dKm, dKnm, vv):
        return -0.5 * (vv @ dKn - np.trace(W_mat.T @ dKm)) - np.trace(
            X_mat.T @ dKnm
        )

    # standard dl1 (oct.m:138)
    W_mat, X_mat = W1, X1
    dl1_ell = dl1_of(dKn_ell, dKm_ell, dKnm_ell, v1)
    dl1_sf2 = dl1_of(dKn_sf2, dKm_sf2, dKnm_sf2, v1)

    u_vec = y_ - Q1 @ (Q1.T @ y_)
    w = is_2 * u_vec
    v2 = w * w
    t_vec = S.T @ y
    U2 = w[:, None] * U
    W2 = np.outer(t_vec, t_vec) - U2.T @ U2
    X2 = np.outer(w, t_vec) - v2[:, None] * U

    def dl2_of(dKn, dKm, dKnm):
        return 0.5 * (v2 @ dKn - np.trace(W2.T @ dKm)) + np.trace(X2.T @ dKnm)

    dl2_ell = dl2_of(dKn_ell, dKm_ell, dKnm_ell)
    dl2_sf2 = dl2_of(dKn_sf2, dKm_sf2, dKnm_sf2)

    dls1 = -0.5 * np.sum(v1)
    dls2 = 0.5 * np.sum(v2)

    # variational (oct.m:158-180, fitc_gp.ml:1092-1122)
    vl1 = l1 - 0.5 * (is_ @ r)
    vv1 = is_ * (2.0 - is_ * r - q_diag)
    vU1 = np.sqrt(vv1)[:, None] * U
    vW1 = T - vU1.T @ vU1
    vX1 = S - vv1[:, None] * U
    W_mat, X_mat = vW1, vX1
    vdl1_ell = dl1_of(dKn_ell, dKm_ell, dKnm_ell, vv1)
    vdl1_sf2 = dl1_of(dKn_sf2, dKm_sf2, dKnm_sf2, vv1)
    vdls1 = -0.5 * (np.sum(vv1) - np.sum(is_))

    return OracleResult(
        l1=l1,
        l2=l2,
        l=l,
        vl1=vl1,
        vl=vl1 + l2,
        dl_dlog_ell=dl1_ell + dl2_ell,
        dl_dlog_sf2=dl1_sf2 + dl2_sf2,
        dl_dsigma2=dls1 + dls2,
        vdl_dlog_ell=vdl1_ell + dl2_ell,
        vdl_dlog_sf2=vdl1_sf2 + dl2_sf2,
        vdl_dsigma2=vdls1 + dls2,
        coeffs=coeffs,
        r_vec=r,
    )


def dense_gp_posterior(X, Xstar, y, sigma2, log_ell, log_sf2):
    """Exact dense GP posterior (mean, cov, log evidence) — the m = n limit
    FITC must recover.  Standard textbook formulas, jitter-free."""
    n = X.shape[0]
    Knn = k_se_iso(X, X, log_ell, log_sf2)
    Ks = k_se_iso(Xstar, X, log_ell, log_sf2)
    Kss = k_se_iso(Xstar, Xstar, log_ell, log_sf2)
    A = Knn + sigma2 * np.eye(n)
    cf = cho_factor(A, lower=False)
    alpha = cho_solve(cf, y)
    mean = Ks @ alpha
    cov = Kss - Ks @ cho_solve(cf, Ks.T)
    _, logdet = np.linalg.slogdet(A)
    lml = -0.5 * (y @ alpha + logdet + n * LOG_2PI)
    return mean, cov, lml
