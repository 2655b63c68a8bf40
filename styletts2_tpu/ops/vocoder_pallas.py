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

Halo handling: the input is read through three views (prev/cur/next tile,
clamped at the edges); out-of-range rows are killed by the same position
mask that implements the bucket prefix, so edge tiles need no special
casing (positions < 0 or >= n_valid zero out).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_CANDIDATES = (2048, 2000, 1600, 1280, 1200, 1024, 1000, 800, 640,
                    512, 500, 400, 256, 250, 200, 128, 100)


def _pick_tile(t: int) -> int:
    for cand in _TILE_CANDIDATES:
        if t % cand == 0:
            return cand
    return 0  # no even tiling -> caller falls back to the XLA path


def _kernel(nv_ref, prev_ref, cur_ref, next_ref, scale_ref, shift_ref,
            alpha_ref, w_ref, bias_ref, out_ref, *, tile: int, halo: int,
            k: int, dilation: int, use_snake: bool):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # rows [t*tile - halo, (t+1)*tile + halo) of the time axis
    z = jnp.concatenate(
        [prev_ref[0, tile - halo:, :], cur_ref[0],
         next_ref[0, :halo, :]], axis=0)  # (tile + 2*halo, C)

    pos = (t * tile - halo
           + jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * halo, 1), 0))
    valid = (pos >= 0) & (pos < nv_ref[b])

    # affine + snake in f32: Mosaic cannot legalize math.sin on bf16
    # vectors (v5e), and f32 transcendentals are in-register anyway
    zf = z.astype(jnp.float32) * scale_ref[0] + shift_ref[0]
    if use_snake:
        a = alpha_ref[0].astype(jnp.float32)
        sn = jnp.sin(a * zf)
        zf = zf + (1.0 / a) * (sn * sn)
    zf = jnp.where(valid, zf, 0.0).astype(z.dtype)

    acc = jnp.zeros((tile, z.shape[1]), jnp.float32)
    for i in range(k):
        acc = acc + jnp.dot(zf[i * dilation: i * dilation + tile, :],
                            w_ref[i], preferred_element_type=jnp.float32)
    out_ref[0] = (acc + bias_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def fused_ada_snake_conv(x: jnp.ndarray, scale: jnp.ndarray,
                         shift: jnp.ndarray, alpha, w: jnp.ndarray,
                         bias: jnp.ndarray, dilation: int,
                         n_valid: jnp.ndarray, *,
                         use_snake: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """x: (B, T, C); scale/shift: (B, C) f32; alpha: (C,) or None;
    w: torch-layout (C_out, C_in, k) with C_out == C_in; bias: (C,);
    n_valid: (B,) int32 valid prefix length. Returns (B, T, C) in x.dtype.

    Falls back to returning None if T has no even tile (caller uses XLA).
    """
    b_sz, t_sz, c = x.shape
    k = w.shape[2]
    halo = dilation * (k - 1) // 2
    tile = _pick_tile(t_sz)
    if tile == 0 or tile <= halo:
        return None

    n_t = t_sz // tile
    w_kio = jnp.transpose(w, (2, 1, 0)).astype(x.dtype)  # (k, C_in, C_out)
    if alpha is None:
        alpha2 = jnp.ones((1, c), jnp.float32)
    else:
        alpha2 = alpha.reshape(1, c).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_sz, n_t),
        in_specs=[
            pl.BlockSpec((1, tile, c),
                         lambda b, t, nv: (b, jnp.maximum(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda b, t, nv: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c),
                         lambda b, t, nv: (b, jnp.minimum(t + 1, n_t - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, t, nv: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, t, nv: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, t, nv: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, c), lambda b, t, nv: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, t, nv: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda b, t, nv: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_kernel, tile=tile, halo=halo, k=k,
                             dilation=dilation, use_snake=use_snake)
    flops = 2 * b_sz * t_sz * c * c * k
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_sz, t_sz, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * b_sz * t_sz * c * x.dtype.itemsize,
            transcendentals=b_sz * t_sz * c if use_snake else 0),
        interpret=interpret,
    )(n_valid.astype(jnp.int32), x, x, x,
      scale.astype(jnp.float32), shift.astype(jnp.float32), alpha2,
      w_kio, bias.reshape(1, c))
