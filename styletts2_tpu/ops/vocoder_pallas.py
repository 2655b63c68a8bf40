"""Pallas TPU kernel: fused AdaIN-affine + Snake + prefix-mask + dilated conv.

This is the vocoder's hot op (reference hifigan.py:26-80 runs AdaIN + Snake
before every dilated conv; ~50 such groups per synthesis call, at rates up
to 24 kHz). The XLA path (blocks.adain_res_block1_apply) materializes the
normalized/activated tensor in HBM and lowers the small-channel conv poorly
(~2.5% MFU measured on v5e). Here the whole group is one kernel:

    z   = snake(x * scale + shift, alpha)        # affine collapses AdaIN
    z   = where(pos < n_valid, z, 0)             # prefix mask (bucket pad)
    out = conv1d_same(z, w, dilation) + bias     # k per-tap MXU dots

The instance-norm statistics stay outside (they are global-T reductions);
the caller folds (mean, var, gamma, beta) into per-(batch, channel)
scale/shift. The conv is computed as k shifted (T_tile, C) @ (C, C) dots
accumulating in f32 — MXU-shaped for C >= 128 and still several times
faster than the XLA conv lowering for the C=32/64 tail stages.

DEFAULT on TPU (blocks.adain_res_block1_apply routes here whenever the
inference prefix-mask contract holds). Decision bench, v5e, B=1, bf16, one
k=7 3-dilation AdainResBlock1 per hifigan stage of a 600-frame bucket,
dispatch amortized over a 20-iteration on-device loop (single dispatched
calls are dominated by the ~28 ms tunnel floor and measure nothing):

    stage shape          XLA shipping path   this kernel   speedup
    C=256 T= 12000             4.74 ms          2.47 ms     1.92x
    C=128 T= 60000             6.81 ms          3.66 ms     1.86x
    C= 64 T=180000            16.67 ms          7.72 ms     2.16x
    C= 32 T=360000            25.47 ms (folded) 14.48 ms    1.76x

(Round-4 re-measurement at the hot B=8 150000x128 serving shape, same
on-device-loop method: XLA 11.9 ms/call vs this kernel 6.1 ms before /
4.8-6.2 ms after the halo-block + sin^2-polynomial fixes; with the
residual/stats epilogue fusion the full phase-2 graph went 346 -> 264 ms
at b=8 fb=1000.)

Set STYLETTS2_TPU_NO_VOCODER_PALLAS=1 to force the XLA path (escape hatch
for Pallas-toolchain regressions; also what the decision bench compares
against).

Numerics of the decision (measured on v5e): in f32 the kernel is exact vs
the XLA path (rel 1e-5 through the full generator; maxabs 1e-6 per block
at every engine shape). In bf16 the kernel is *closer* to f32 than the
XLA-bf16 path per block (rel 0.0061 vs 0.0092; both paths quantize the
activation and the weights to bf16 at the same points — conv1d_apply
casts w to x.dtype). End-to-end on RANDOM (untrained) weights any
true-bf16 path shows a large rel-l2 vs f32 (0.25-0.27 for this kernel
AND for the XLA path with bf16-cast params): the untrained network's
output is a quasi-periodic oscillation whose phase drifts ~1 sample per
0.5 s under bf16 rounding (local cross-correlation at the drifted lag
stays 0.998 — same audio, shifted). This is a property of bf16 on an
untrained net, not of the kernel; with trained weights the output is
phase-locked to the f32 NSF harmonic source.

Halo handling: the input is read through three views — the current tile
plus one small (multiple-of-8-row) halo block from each neighbor, clamped
at the edges (_pick_halo_block; fetching full neighbor TILES instead
tripled the read traffic and ~2x'd wall-clock on the hot 150000x128
serving stages). Out-of-range rows are killed by the same position mask
that implements the bucket prefix, so edge tiles need no special casing
(positions < 0 or >= n_valid zero out).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# every candidate is a multiple of 8: Mosaic requires the sublane block
# dim be divisible by 8 (or equal to the full array dim — the tile == t
# case below)
_TILE_CANDIDATES = (2048, 2000, 1600, 1280, 1200, 1024, 1000, 800, 640,
                    512, 400, 256, 200, 128)

# scoped VMEM is 16 MB; the kernel's working set per (tile, C_lanes)
# element is ~4*itemsize (cur + out blocks, double-buffered; the halo
# blocks are <= 48 rows, negligible) + ~40 B of f32 temps (z concat, zf,
# valid mask, acc, dot staging). C is padded to the 128-lane register
# width, so small-C stages pay the full 128 lanes. Cap the tile to stay
# under ~13 MB with the conservative 4*itemsize + 40 model.
_VMEM_BUDGET = 13e6


def _pick_tile(t: int, c: int = 0, itemsize: int = 2,
               io_blocks: int = 4) -> int:
    """io_blocks: double-buffered (tile, C) I/O blocks in flight — 4 for
    the base kernel (cur in + out), 6 with a fused residual input."""
    cap = (_VMEM_BUDGET / (max(c, 128)
                           * (40 + io_blocks * itemsize))) if c else t
    if t <= cap:
        return t  # single tile == full array dim (no sublane constraint)
    for cand in _TILE_CANDIDATES:
        if cand <= cap and t % cand == 0:
            return cand
    return 0  # no even tiling -> caller falls back to the XLA path


def _pad_to_tileable(t: int, c: int = 0, itemsize: int = 2,
                     halo: int = 0) -> int:
    """Smallest t' >= t that _pick_tile can tile with a tile > halo, or 0.

    Callers zero-pad the time axis to t' and slice the result back: the
    kernel's n_valid position mask zeroes every conv input beyond the
    valid prefix, so the extra rows never influence rows < t. This is what
    lets istftnet's reflection-padded last stage (T = 60*F + 1, odd — no
    even tiling exists) run the fused kernel instead of falling back to
    XLA. Conservative io_blocks=6 cap so the padded length stays tileable
    for the residual-fused variant too."""
    cap = (_VMEM_BUDGET / (max(c, 128) * (40 + 6 * itemsize))) if c else t
    if t <= cap:
        return t
    for cand in _TILE_CANDIDATES:
        if cand <= cap and cand > halo:
            return ((t + cand - 1) // cand) * cand
    return 0


def _pick_halo_block(tile: int, halo: int) -> int:
    """Smallest multiple-of-8 row count >= halo that evenly tiles `tile`:
    the prev/next inputs are fetched as one such block instead of a full
    neighbor tile (the original triple-full-tile scheme tripled the
    kernel's HBM read traffic — measured 2x wall-clock on the hot
    150000x128 serving stages). 0 -> no valid halo block (caller falls
    back to full-tile neighbor fetches via halo_block=tile)."""
    for cand in (8, 16, 24, 32, 40, 48):
        if cand >= halo and tile % cand == 0:
            return cand
    return 0


# minimax fit of sin^2(r)/r^2 over r in [0, pi/2] (degree 4 in u = r^2;
# Remez-weighted lstsq): max |poly - sin^2| = 4.4e-7 on the interval,
# 3.1e-6 end-to-end in f32 including the mod-pi range reduction — three
# orders of magnitude below bf16's own quantization step on O(1)
# activations. sin^2 is even and pi-periodic, so the reduction is a
# single round() — ~10 VPU ops total vs Mosaic's full-precision sin
# (measured 2.5 ms/call cheaper on the hot 150000x128 serving stage).
_SIN2_COEFFS = (0.9999919530071253, -0.3332866101072116,
                0.04435612637758055, -0.003101284637731907,
                0.00011299663600091553)


def _sin2_poly(y):
    """sin(y)^2 via mod-pi range reduction + even minimax polynomial."""
    r = y - np.float32(np.pi) * jnp.round(y * np.float32(1.0 / np.pi))
    u = r * r
    p = jnp.float32(_SIN2_COEFFS[-1])
    for c in _SIN2_COEFFS[-2::-1]:
        p = p * u + np.float32(c)
    return u * p


def _kernel(nv_ref, prev_ref, cur_ref, next_ref, scale_ref, shift_ref,
            alpha_ref, w_ref, bias_ref, *refs, tile: int, halo: int,
            h_blk: int, k: int, dilation: int, use_snake: bool,
            fast_snake: bool, with_res: bool, with_stats: bool):
    refs = list(refs)
    res_ref = refs.pop(0) if with_res else None
    out_ref = refs.pop(0)
    st_ref = refs.pop(0) if with_stats else None
    b = pl.program_id(0)
    t = pl.program_id(1)

    # rows [t*tile - halo, (t+1)*tile + halo) of the time axis; the
    # neighbor halos arrive as h_blk-row blocks (edge programs fetch a
    # clamped block whose rows land outside [0, n_valid) and are zeroed
    # by the position mask below)
    z = jnp.concatenate(
        [prev_ref[0, h_blk - halo:, :], cur_ref[0],
         next_ref[0, :halo, :]], axis=0)  # (tile + 2*halo, C)

    pos = (t * tile - halo
           + jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * halo, 1), 0))
    valid = (pos >= 0) & (pos < nv_ref[b])

    # affine + snake in f32: Mosaic cannot legalize math.sin on bf16
    # vectors (v5e), and f32 transcendentals are in-register anyway
    zf = z.astype(jnp.float32) * scale_ref[0, 0] + shift_ref[0, 0]
    if use_snake:
        a = alpha_ref[0, 0].astype(jnp.float32)
        if fast_snake:
            zf = zf + (1.0 / a) * _sin2_poly(a * zf)
        else:
            sn = jnp.sin(a * zf)
            zf = zf + (1.0 / a) * (sn * sn)
    zf = jnp.where(valid, zf, 0.0).astype(z.dtype)

    # f32 inputs must multiply at HIGHEST (3-pass bf16) precision to match
    # the XLA path's convs — the MXU's default single-pass rounds f32
    # operands to bf16 (measured 0.016 maxabs per call, compounding to
    # audible e2e divergence). bf16 inputs are exact in one pass.
    prec = (jax.lax.Precision.HIGHEST if z.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc = jnp.zeros((tile, z.shape[1]), jnp.float32)
    for i in range(k):
        acc = acc + jnp.dot(zf[i * dilation: i * dilation + tile, :],
                            w_ref[i], precision=prec,
                            preferred_element_type=jnp.float32)
    acc = acc + bias_ref[0, 0].astype(jnp.float32)
    if with_res:
        # fused residual epilogue (reference hifigan.py:66-79's `x = xt+x`)
        acc = acc + res_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)
    if with_stats:
        # masked per-tile partial sums of the OUTPUT (for the next AdaIN's
        # instance-norm stats — saves that pass re-reading the tensor from
        # HBM). The conv leaks nonzero values into invalid rows near the
        # boundary (and bias/residual fill the rest), so mask to the valid
        # core explicitly. Quantize to out dtype first so the stats match
        # what the consumer actually reads.
        core_pos = (t * tile
                    + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0))
        om = jnp.where(core_pos < nv_ref[b],
                       out_ref[0].astype(jnp.float32), 0.0)
        st_ref[0, 0, 0, :] = om.sum(axis=0)
        st_ref[0, 0, 1, :] = (om * om).sum(axis=0)


def fused_ada_snake_conv(x: jnp.ndarray, scale: jnp.ndarray,
                         shift: jnp.ndarray, alpha, w: jnp.ndarray,
                         bias: jnp.ndarray, dilation: int,
                         n_valid: jnp.ndarray, *,
                         use_snake: bool = True,
                         w_is_hio: bool = False,
                         interpret: bool = False,
                         residual: jnp.ndarray = None,
                         out_stats: bool = False):
    """x: (B, T, C); scale/shift: (B, C) f32; alpha: (C,) or None;
    w: torch-layout (C_out, C_in, k) with C_out == C_in — or, with
    w_is_hio=True, an already-(k, C_in, C_out) weight (the time-folded
    layers.fold_conv1d_weight layout; the caller then passes the FOLDED
    x/scale/shift/alpha/n_valid and dilation=1); bias: (C,);
    n_valid: (B,) int32 valid prefix length. Returns (B, T, C) in x.dtype.

    residual: optional (B, T, C) added in the epilogue (the resblock's
    `x = xt + x` — saves a separate HBM read/modify/write pass).
    out_stats: additionally return (B, n_t, 2, C) f32 per-tile partial
    [sum, sumsq] of the masked output — the next AdaIN's instance-norm
    stats without re-reading the tensor (consumer: blocks._affine_from
    _stats; one-pass variance, so the bf16 path only).

    Falls back to returning None if T has no even tile (caller uses XLA).
    """
    b_sz, t_sz, c = x.shape
    k = w.shape[0] if w_is_hio else w.shape[2]
    halo = dilation * (k - 1) // 2
    tile = _pick_tile(t_sz, c, jnp.dtype(x.dtype).itemsize,
                      io_blocks=6 if residual is not None else 4)
    if tile == 0 or tile <= halo:
        return (None, None) if out_stats else None

    n_t = t_sz // tile
    h_blk = _pick_halo_block(tile, halo) or tile
    r = tile // h_blk           # halo blocks per tile
    n_hb = t_sz // h_blk        # halo-block count along T
    w_kio = (w.astype(x.dtype) if w_is_hio
             else jnp.transpose(w, (2, 1, 0)).astype(x.dtype))
    if alpha is None:
        alpha2 = jnp.ones((1, 1, c), jnp.float32)
    else:
        alpha2 = alpha.reshape(1, 1, c).astype(jnp.float32)

    # per-(batch, channel) vectors ride as (B, 1, C) blocks: Mosaic requires
    # the last two block dims be (multiple of 8, multiple of 128) OR equal
    # to the array dims — (1, C) blocks over a (B, C) array violate that
    # whenever B > 1
    in_specs = [
        pl.BlockSpec((1, h_blk, c),
                     lambda b, t, nv: (b, jnp.maximum(t * r - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, c), lambda b, t, nv: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_blk, c),
                     lambda b, t, nv: (b, jnp.minimum((t + 1) * r,
                                                      n_hb - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda b, t, nv: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda b, t, nv: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda b, t, nv: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, c, c), lambda b, t, nv: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda b, t, nv: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, x, x,
                scale.reshape(b_sz, 1, c).astype(jnp.float32),
                shift.reshape(b_sz, 1, c).astype(jnp.float32), alpha2,
                w_kio, bias.reshape(1, 1, c)]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, tile, c),
                                     lambda b, t, nv: (b, t, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(residual)
    out_shape = jax.ShapeDtypeStruct((b_sz, t_sz, c), x.dtype)
    out_specs = pl.BlockSpec((1, tile, c), lambda b, t, nv: (b, t, 0),
                             memory_space=pltpu.VMEM)
    if out_stats:
        # (1, 1, 2, c) blocks equal the array's last two dims, satisfying
        # Mosaic's block-shape rule without 8-row padding
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b_sz, n_t, 2, c), jnp.float32)]
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1, 2, c), lambda b, t, nv: (b, t, 0, 0),
                                  memory_space=pltpu.VMEM)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b_sz, n_t),
        in_specs=in_specs, out_specs=out_specs)
    # bf16 path: the minimax sin^2 polynomial (error 3e-6 — far below the
    # bf16 quantization the output is about to undergo). f32 path keeps
    # jnp.sin: the kernel's documented exactness vs the XLA reference path
    # is measured in f32. STYLETTS2_TPU_EXACT_SNAKE=1 forces exact sin.
    fast_snake = (jnp.dtype(x.dtype) == jnp.bfloat16
                  and os.environ.get("STYLETTS2_TPU_EXACT_SNAKE") != "1")
    kern = functools.partial(_kernel, tile=tile, halo=halo, h_blk=h_blk,
                             k=k, dilation=dilation, use_snake=use_snake,
                             fast_snake=fast_snake,
                             with_res=residual is not None,
                             with_stats=out_stats)
    flops = 2 * b_sz * t_sz * c * c * k
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * b_sz * t_sz * c * x.dtype.itemsize,
            transcendentals=b_sz * t_sz * c if use_snake else 0),
        interpret=interpret,
    )(n_valid.astype(jnp.int32), *operands)
