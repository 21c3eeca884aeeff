"""Global configuration.

Mirrors the reference's two mutable library globals ``cholesky_jitter`` and
``debug`` (``lib/utils.ml:34-35``) plus TPU-specific knobs the reference has no
analogue for (dtype policy, matmul precision).

All engine functions take explicit keyword overrides; these globals are only
defaults read at trace time.
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass
class Config:
    # Jitter added to every Cholesky factorization of Km / posterior
    # covariances (reference: lib/utils.ml:35, lib/fitc_gp.ml:55,669).
    cholesky_jitter: float = 1e-6
    # Debug-gated invariant checks (reference: lib/utils.ml:34,118-192).
    debug: bool = False
    # Matmul precision for f32 inputs on TPU.  HIGHEST = f32 accumulation via
    # multiple bf16 passes; matters for the 1e-6 parity bar at large n.
    # NOTE: read at trace time — changing it does not invalidate already-
    # compiled jit caches; set it before building jitted objectives.
    matmul_precision: str = "highest"
    # Precision for the whitened ACCUMULATION GEMMs in the streaming
    # evidence (gram += a'a, u_vec += v'(is*y)).  None (default) = follow
    # matmul_precision, so a user who asks for HIGHEST gets it everywhere.
    # Measured opt-in (probes/r4_tpu_error_split.py, 1M x 8 m=300 SeIso on
    # v5e): 'high' here under matmul_precision='highest' moves the evidence
    # by exactly 0.0 nats — the whitened products are O(1) and
    # well-conditioned at that shape — while buying back ~16% of forward
    # GEMM time; the kernel sqdist and whitening GEMMs carry ~250 of the
    # ~290-nat f32-HIGH error.  Validated at the bench shape only; a
    # low-noise problem (tiny sigma2) scales the whitened rows by 1/sqrt(s),
    # so this stays an explicit dial rather than the library default.
    acc_precision: str | None = None
    # Streaming-backward GEMM sites to demote to single-pass (DEFAULT)
    # precision, from {"ui_bar", "vg", "knm_bar"} (stream_grad.py).  Probed
    # per site by probes/r4_bwd_demote.py; default () = no demotion.  Like
    # every precision knob this is read at trace time.  Applies to the
    # streaming custom-VJP backward only (grad_impl='cv', the default path);
    # the 'vg' site exists only under grad_variant='ug' — other variants
    # fuse that GEMM, leaving the entry inert.  Unknown names raise at
    # trace time (stream_grad.site_mm).
    bwd_demote_sites: tuple = ()
    # 'gemm' | 'direct': pairwise squared-distance assembly
    # (kernels/base.py:sqdist).  'gemm' is |a|^2 - 2ab + |b|^2 on the MXU —
    # the fast path, but the f32 assembly of ~|terms|-magnitude pieces
    # leaves d2 errors of a few ulp(|a|^2+|b|^2), i.e. up to ~40 f32 ulps
    # on near-pair kernel ENTRIES; measured as the largest accurate-mode
    # evidence error term at 1M x 8 m=300 (+2.1 of the +2.9-nat sum-log-s
    # stage total, probes/r5 tile diff).  'direct' computes
    # sum_k (a_k - b_k)^2 elementwise on the VPU — no cancellation,
    # ~1-ulp entries — for the accurate/parity path.  Read at trace time.
    sqdist_impl: str = "gemm"
    # 'qr' | 'chol' | 'auto': how to factor B = Km + Knm' D^-1 Knm.
    # 'qr' reproduces the reference's Foster-2009 stacked QR
    # (lib/fitc_gp.ml:168-183); 'chol' is the cheap, shardable normal-equations
    # path.  'auto' picks QR below the size where QR cost is negligible.
    factorization: str = "auto"


config = Config()


def default_dtype():
    """Highest-precision float dtype currently enabled in JAX."""
    return jax.numpy.float64 if jax.config.jax_enable_x64 else jax.numpy.float32
