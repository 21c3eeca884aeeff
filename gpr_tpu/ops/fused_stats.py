"""Pallas TPU kernels: fused FITC evidence statistics for the SE-iso kernel.

MEASURED STATUS (round 3, v5e, 1M x 8 m=300, probes/r3_fused_timing.py):
both the fused forward and the fused backward tile are correct to f32
tolerance but SLOWER than the XLA lax.scan path (fwd 18.6 vs 13.0 ms; bwd
52.3 vs 42.2 ms same-session) — Mosaic's 3-pass bf16 f32 emulation
(_dot3) plus the tighter VMEM tiling (512-row backward tiles) loses to
XLA's native f32-HIGH GEMM handling at these shapes.  The scan is the
production path; these kernels are kept as tested reference
implementations (selectable via impl='pallas' / grad_variant='pallas')
to re-evaluate when Mosaic gains native multi-pass f32 dots.

One grid step processes one row-tile of inputs entirely in VMEM:
form the Knm tile from (X-tile, Z) on the MXU, immediately derive the FITC
diagonal (r, s, 1/s), and contract into the per-tile partials of

    G   = (V sqrt(1/s))' (V sqrt(1/s))   (m, m, whitened — see streaming.py)
    u   = V' (y / s)                     (m,)
    lds = sum log s,  yiy = y'y/s,  isr = sum r/s

— the cross-covariance never exists outside VMEM.  This is the hand-fused
version of models/streaming.py's scan body (same math, same masking), the
role the reference delegates to LAPACK syrk/gemm over a materialized matrix
(fitc_gp.ml:151-229).

Per-tile partials are written out (grid, ...) and summed outside in f64:
TPU Pallas has no f64, so accumulating across tiles *inside* the kernel
would round-robin f32 error into the Gram statistic; summing ~n/512 f32
partials in f64 outside preserves the parity budget and costs O(m^2 n/512)
HBM traffic — negligible.

V-tiles use a GEMM against U^-1 (precomputed once) rather than a per-tile
triangular solve: MXU beats trsm and the O(m^3) inversion amortizes over n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _acc():
    # f64 cross-tile sums when x64 is on; plain f32 otherwise (no worse than
    # in-kernel accumulation, and no truncation warnings on default TPU).
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32



def _split_bf16(x):
    """Split f32 into a bf16-representable head and an f32 tail."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot3(a, b, dims, precise=False):
    """3-pass bf16 emulation of an f32 contraction — Mosaic's dot lowering
    supports only DEFAULT (1 bf16 pass) and HIGHEST (6 passes); this is the
    missing HIGH (~f32 accuracy at half HIGHEST's cost), built from operands
    that are exactly bf16-representable so DEFAULT adds no input rounding.

    ``precise`` (interpreter mode) uses one exact dot instead: off-TPU the
    backend computes full f32 anyway, so tests check the kernel MATH at f32
    tolerance rather than the 3-pass emulation's error class."""

    def d(u, v):
        return jax.lax.dot_general(u, v, dims,
                                   preferred_element_type=jnp.float32)

    if precise:
        return d(a, b)
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _se_iso_stats_kernel(
    precise,  # static: exact dots (interpreter) vs 3-pass bf16 (TPU)
    x_ref,  # (B, d) row tile
    y_ref,  # (B,) targets tile       [as (B, 1)]
    mask_ref,  # (B, 1) 1.0 for live rows
    z_ref,  # (m, d) inducing (replicated per tile)
    uinv_ref,  # (m, m) U^-1
    scal_ref,  # (1, 3) [inv_ell2_05, log_sf2, sigma2] in SMEM
    gram_ref,  # out (m, m) partial
    uvec_ref,  # out (1, m) partial
    sums_ref,  # out (1, 4) partial [lds, yiy, isr, n_live]
):
    inv_ell2_05 = scal_ref[0, 0]
    log_sf2 = scal_ref[0, 1]
    sigma2 = scal_ref[0, 2]

    x = x_ref[:]  # (B, d)
    z = z_ref[:]  # (m, d)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)  # (B, 1)
    z2 = jnp.sum(z * z, axis=1).reshape(1, -1)  # (1, m)
    xz = _dot3(x, z, (((1,), (1,)), ((), ())), precise)  # MXU, d axes in place
    d2 = jnp.maximum(x2 - 2.0 * xz + z2, 0.0)
    knm = jnp.exp(log_sf2 + inv_ell2_05 * d2)  # (B, m)

    v = _dot3(knm, uinv_ref[:], (((1,), (0,)), ((), ())), precise)
    r = jnp.exp(log_sf2) - jnp.sum(v * v, axis=1, keepdims=True)  # (B, 1)
    mask = mask_ref[:]  # (B, 1)
    live = mask > 0.0
    s = jnp.where(live, r + sigma2, 1.0)
    is_ = mask / s  # (B, 1)

    y = y_ref[:]  # (B, 1)
    a = v * jnp.sqrt(is_)  # whitened rows (see models/streaming.py)
    gram_ref[0] = _dot3(a, a, (((0,), (0,)), ((), ())), precise)
    uvec_ref[0] = _dot3(is_ * y, v, (((0,), (0,)), ((), ())), precise)
    lds = jnp.sum(jnp.where(live, jnp.log(s), 0.0))
    yiy = jnp.sum(is_ * y * y)
    isr = jnp.sum(is_ * r)
    n_live = jnp.sum(mask)
    sums_ref[0, 0] = jnp.stack([lds, yiy, isr, n_live])


def _se_iso_stats_kernel_acc(
    precise, x_ref, y_ref, mask_ref, z_ref, uinv_ref, scal_ref,
    gram_ref, uvec_ref, sums_ref,
):
    """Accumulating variant: outputs use a constant index map, so the same
    VMEM blocks stay resident across the (sequential) TPU grid; step 0
    initializes, later steps add.  No per-tile HBM partials — trades the
    f64 outside-sum for in-VMEM f32 accumulation (same precision class as
    the XLA scan when x64 is off)."""
    i = pl.program_id(0)

    inv_ell2_05 = scal_ref[0, 0]
    log_sf2 = scal_ref[0, 1]
    sigma2 = scal_ref[0, 2]

    x = x_ref[:]
    z = z_ref[:]
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    z2 = jnp.sum(z * z, axis=1).reshape(1, -1)
    # contract the d axis of both operands directly: no z transpose
    xz = _dot3(x, z, (((1,), (1,)), ((), ())), precise)
    d2 = jnp.maximum(x2 - 2.0 * xz + z2, 0.0)
    knm = jnp.exp(log_sf2 + inv_ell2_05 * d2)

    v = _dot3(knm, uinv_ref[:], (((1,), (0,)), ((), ())), precise)
    r = jnp.exp(log_sf2) - jnp.sum(v * v, axis=1, keepdims=True)
    mask = mask_ref[:]
    live = mask > 0.0
    s = jnp.where(live, r + sigma2, 1.0)
    is_ = mask / s

    y = y_ref[:]
    a = v * jnp.sqrt(is_)  # whitened rows (see models/streaming.py)
    # contract the row axis of both operands: a' a without the transpose
    gram = _dot3(a, a, (((0,), (0,)), ((), ())), precise)
    uvec = _dot3(is_ * y, v, (((0,), (0,)), ((), ())), precise)
    sums = jnp.stack(
        [
            jnp.sum(jnp.where(live, jnp.log(s), 0.0)),
            jnp.sum(is_ * y * y),
            jnp.sum(is_ * r),
            jnp.sum(mask),
        ]
    )

    @pl.when(i == 0)
    def _():
        gram_ref[:] = gram
        uvec_ref[:] = uvec.reshape(uvec_ref.shape)
        sums_ref[0] = sums
        sums_ref[1] = jnp.zeros_like(sums)

    @pl.when(i > 0)
    def _():
        gram_ref[:] += gram
        uvec_ref[:] += uvec.reshape(uvec_ref.shape)
        # compensated (two-sum) scalar accumulation: the plain f32 running
        # sums drift by thousands of nats over ~500 grid steps at n = 10^6
        # (yiy ~ 1e7 has ulp ~ 1); row 0 = hi, row 1 = lo
        hi = sums_ref[0]
        t = hi + sums
        bp = t - hi
        err = (hi - (t - bp)) + (sums - bp)
        sums_ref[0] = t
        sums_ref[1] = sums_ref[1] + err


@functools.partial(
    jax.jit, static_argnames=("block_size", "interpret")
)
def se_iso_stream_stats_fused_acc(
    log_ell, log_sf2, z, u_inv, sigma2, X, y, mask=None, *, block_size=1024,
    interpret=False,
):
    """Single-pass fused statistics with in-VMEM accumulation.

    Fastest forward path on hardware; use the partial-sum variant
    (:func:`se_iso_stream_stats_fused`) when f64 cross-tile accumulation is
    required for parity work.
    """
    n, d = X.shape
    m = z.shape[0]
    nb = -(-n // block_size)
    pad = nb * block_size - n
    f32 = jnp.float32
    if mask is None:
        mask = jnp.ones((n,), f32)
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, d), X.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])

    xf = X.astype(f32)
    yf = y.astype(f32).reshape(nb * block_size, 1)
    mf = mask.astype(f32).reshape(nb * block_size, 1)
    zf = z.astype(f32)
    uf = u_inv.astype(f32)
    inv_ell2_05 = (-0.5 * jnp.exp(-2.0 * log_ell)).astype(f32)
    scal = jnp.stack(
        [inv_ell2_05, jnp.asarray(log_sf2, f32), jnp.asarray(sigma2, f32)]
    ).reshape(1, 3)

    gram, uvec, sums = pl.pallas_call(
        functools.partial(_se_iso_stats_kernel_acc, interpret),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_size, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_size, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_size, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, m), f32),
            jax.ShapeDtypeStruct((1, m), f32),
            jax.ShapeDtypeStruct((2, 4), f32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * block_size * m * (d + 2 * m),
            bytes_accessed=nb * block_size * (d + 2) * 4 + 2 * m * m * 4,
            transcendentals=nb * block_size * (m + 1),
        ),
    )(xf, yf, mf, zf, uf, scal)
    folded = sums[0].astype(_acc()) + sums[1].astype(_acc())  # hi + lo
    return (
        gram.astype(_acc()),
        uvec.reshape(m).astype(_acc()),
        folded[0],
        folded[1],
        folded[2],
        folded[3],
    )


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def se_iso_stream_stats_fused(
    log_ell, log_sf2, z, u_inv, sigma2, X, y, mask=None, *, block_size=1024,
    interpret=False,
):
    """Per-tile partial statistics via the fused kernel, summed in ACC dtype.

    Returns (gram, u_vec, lds, yiy, isr, n) matching
    models.streaming.StreamStats fields.  f32 compute; f64 cross-tile sums
    when x64 is enabled.
    """
    n, d = X.shape
    m = z.shape[0]
    nb = -(-n // block_size)
    pad = nb * block_size - n
    f32 = jnp.float32
    if mask is None:
        mask = jnp.ones((n,), f32)
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, d), X.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])

    xf = X.astype(f32)
    yf = y.astype(f32).reshape(nb * block_size, 1)
    mf = mask.astype(f32).reshape(nb * block_size, 1)
    zf = z.astype(f32)
    uf = u_inv.astype(f32)
    inv_ell2_05 = (-0.5 * jnp.exp(-2.0 * log_ell)).astype(f32)
    scal = jnp.stack(
        [inv_ell2_05, jnp.asarray(log_sf2, f32), jnp.asarray(sigma2, f32)]
    ).reshape(1, 3)

    grid = (nb,)
    out_shape = (
        jax.ShapeDtypeStruct((nb, m, m), f32),
        jax.ShapeDtypeStruct((nb, 1, m), f32),
        jax.ShapeDtypeStruct((nb, 1, 4), f32),
    )
    gram_p, uvec_p, sums_p = pl.pallas_call(
        functools.partial(_se_iso_stats_kernel, interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_size, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_size, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_size, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * block_size * m * (d + 2 * m),
            bytes_accessed=nb * (block_size * (d + 2) + 2 * m * m) * 4,
            transcendentals=nb * block_size * (m + 1),
        ),
    )(xf, yf, mf, zf, uf, scal)

    gram = jnp.sum(gram_p.astype(_acc()), axis=0)
    u_vec = jnp.sum(uvec_p.astype(_acc()), axis=0).reshape(m)
    sums = jnp.sum(sums_p.astype(_acc()), axis=0).reshape(4)
    return gram, u_vec, sums[0], sums[1], sums[2], sums[3]


def _se_iso_bwd_kernel_acc(
    precise,  # static: exact dots (interpreter) vs 3-pass bf16 (TPU)
    x_ref,  # (B, d) row tile
    y_ref,  # (B, 1)
    mask_ref,  # (B, 1)
    z_ref,  # (m, d)
    uinv_ref,  # (m, m) U^-1
    ug_ref,  # (m, m) U^-1 (G-bar + G-bar')   (precomputed once)
    ubar_ref,  # (1, m) u_vec cotangent
    scal_ref,  # (1, 7) SMEM: [inv_ell2_05, log_sf2, sigma2,
    #                          lds_bar, yiy_bar, isr_bar, inv_ell2]
    zbar_ref,  # out (m, d) accum hi
    zbarlo_ref,  # out (m, d) accum lo
    uibar_ref,  # out (m, m) accum hi
    uibarlo_ref,  # out (m, m) accum lo
    scalout_ref,  # out (2, 4) [log_ell_bar, log_sf2_bar, s2_bar, 0] hi/lo
):
    """Fused backward tile: the entire per-tile reverse pass of the
    streaming statistics (models/stream_grad.py body) in VMEM.

    Motivation (measured, probes/r3_roofline_probe.py): at m = 300 the
    unfused backward's GEMM chain is HBM-traffic-bound on v5e — every
    (B, m) intermediate (knm, v, vg, vbar, knm_bar, c) round-trips HBM
    between XLA ops, ~3x the traffic of the operands the math actually
    needs.  Here the whole chain lives in VMEM; HBM sees only the x/y tile
    in and the O(m^2) accumulators (constant index map, resident across
    the sequential grid).

    Accumulation is compensated (two-sum) for every output — the same
    cross-tile f32 drift logic as the scan path's compensated carries.
    """
    i = pl.program_id(0)

    inv_ell2_05 = scal_ref[0, 0]
    log_sf2 = scal_ref[0, 1]
    sigma2 = scal_ref[0, 2]
    lds_bar = scal_ref[0, 3]
    yiy_bar = scal_ref[0, 4]
    isr_bar = scal_ref[0, 5]
    inv_ell2 = scal_ref[0, 6]

    x = x_ref[:]  # (B, d)
    z = z_ref[:]  # (m, d)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)  # (B, 1)
    z2 = jnp.sum(z * z, axis=1).reshape(1, -1)  # (1, m)
    xz = _dot3(x, z, (((1,), (1,)), ((), ())), precise)
    d2 = jnp.maximum(x2 - 2.0 * xz + z2, 0.0)
    knm = jnp.exp(log_sf2 + inv_ell2_05 * d2)  # (B, m)

    v = _dot3(knm, uinv_ref[:], (((1,), (0,)), ((), ())), precise)
    vg = _dot3(knm, ug_ref[:], (((1,), (0,)), ((), ())), precise)

    sf2 = jnp.exp(log_sf2)
    r = sf2 - jnp.sum(v * v, axis=1, keepdims=True)  # (B, 1)
    mask = mask_ref[:]
    live = mask > 0.0
    s = jnp.where(live, r + sigma2, 1.0)
    is_ = mask / s
    y = y_ref[:]

    ubar = ubar_ref[:]  # (1, m)
    vu = jnp.sum(v * ubar, axis=1, keepdims=True)  # (B, 1)
    is_bar = (
        y * vu
        + 0.5 * jnp.sum(vg * v, axis=1, keepdims=True)
        + yiy_bar * y * y
        + isr_bar * r
    )
    s_bar = (lds_bar * mask - is_bar * is_) / s
    s_bar_live = jnp.where(live, s_bar, 0.0)
    r_bar = s_bar_live + isr_bar * is_

    vbar = is_ * vg + (is_ * y) * ubar - 2.0 * v * r_bar  # (B, m)
    # knm_bar = vbar @ U^-T: contract the m axis of U^-1's SECOND dim
    knm_bar = _dot3(vbar, uinv_ref[:], (((1,), (1,)), ((), ())), precise)
    ui_bar_t = _dot3(knm, vbar, (((0,), (0,)), ((), ())), precise)  # (m, m)
    s2_bar_t = jnp.sum(s_bar_live)

    # se_iso pullback (kernels/se_iso.py k_cross_vjp, in-VMEM):
    c = knm_bar * knm
    cs = jnp.sum(c, axis=0).reshape(-1, 1)  # (m, 1)
    cX = _dot3(c, x, (((0,), (0,)), ((), ())), precise)  # (m, d)
    zbar_t = (2.0 * inv_ell2_05) * (z * cs - cX)
    log_ell_bar_t = inv_ell2 * jnp.sum(c * d2)
    # kd = sf2 per row; kd_bar = r_bar
    log_sf2_bar_t = jnp.sum(c) + sf2 * jnp.sum(r_bar)
    scal_t = jnp.stack(
        [log_ell_bar_t, log_sf2_bar_t, s2_bar_t, jnp.zeros_like(s2_bar_t)]
    )

    @pl.when(i == 0)
    def _():
        zbar_ref[:] = zbar_t
        zbarlo_ref[:] = jnp.zeros_like(zbar_t)
        uibar_ref[:] = ui_bar_t
        uibarlo_ref[:] = jnp.zeros_like(ui_bar_t)
        scalout_ref[0] = scal_t
        scalout_ref[1] = jnp.zeros_like(scal_t)

    @pl.when(i > 0)
    def _():
        def two_sum_acc(hi_ref, lo_ref, t):
            hi = hi_ref[:]
            new = hi + t
            bp = new - hi
            err = (hi - (new - bp)) + (t - bp)
            hi_ref[:] = new
            lo_ref[:] = lo_ref[:] + err

        two_sum_acc(zbar_ref, zbarlo_ref, zbar_t)
        two_sum_acc(uibar_ref, uibarlo_ref, ui_bar_t)
        hi = scalout_ref[0]
        new = hi + scal_t
        bp = new - hi
        err = (hi - (new - bp)) + (scal_t - bp)
        scalout_ref[0] = new
        scalout_ref[1] = scalout_ref[1] + err


@functools.partial(
    jax.jit, static_argnames=("block_size", "interpret")
)
def se_iso_stream_bwd_fused(
    log_ell, log_sf2, z, u_inv, sigma2, X, y, mask,
    gbar, ubar, lds_bar, yiy_bar, isr_bar,
    *, block_size=1024, interpret=False,
):
    """Fused backward pass over pre-flattened data.

    Returns (log_ell_bar, log_sf2_bar, z_bar, ui_bar, s2_bar) in f32 —
    the cotangents of (params, z, u_inv, sigma2) given the statistic
    cotangents.  Compensated accumulation folded on exit.
    """
    n, d = X.shape
    m = z.shape[0]
    nb = -(-n // block_size)
    pad = nb * block_size - n
    f32 = jnp.float32
    if mask is None:
        mask = jnp.ones((n,), f32)
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, d), X.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])

    xf = X.astype(f32)
    yf = y.astype(f32).reshape(nb * block_size, 1)
    mf = mask.astype(f32).reshape(nb * block_size, 1)
    zf = z.astype(f32)
    uf = u_inv.astype(f32)
    gsym = (gbar + gbar.T).astype(f32)
    ug = jnp.matmul(uf, gsym, precision=jax.lax.Precision.HIGHEST)
    ubar_f = ubar.astype(f32).reshape(1, m)
    inv_ell2 = jnp.exp(-2.0 * log_ell)
    scal = jnp.stack([
        (-0.5 * inv_ell2).astype(f32), jnp.asarray(log_sf2, f32),
        jnp.asarray(sigma2, f32), jnp.asarray(lds_bar, f32),
        jnp.asarray(yiy_bar, f32), jnp.asarray(isr_bar, f32),
        inv_ell2.astype(f32),
    ]).reshape(1, 7)

    zb_hi, zb_lo, ui_hi, ui_lo, scals = pl.pallas_call(
        functools.partial(_se_iso_bwd_kernel_acc, interpret),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_size, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_size, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_size, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, d), f32),
            jax.ShapeDtypeStruct((m, d), f32),
            jax.ShapeDtypeStruct((m, m), f32),
            jax.ShapeDtypeStruct((m, m), f32),
            jax.ShapeDtypeStruct((2, 4), f32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * block_size * m * (2 * d + 4 * m),
            bytes_accessed=nb * block_size * (d + 2) * 4 + 4 * m * m * 4,
            transcendentals=nb * block_size * m,
        ),
    )(xf, yf, mf, zf, uf, ug, ubar_f, scal)

    z_bar = zb_hi + zb_lo
    ui_bar = ui_hi + ui_lo
    sc = scals[0] + scals[1]
    return sc[0], sc[1], z_bar, ui_bar, sc[2]
