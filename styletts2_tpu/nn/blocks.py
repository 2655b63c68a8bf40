"""Shared residual blocks.

One copy of the blocks the reference duplicates per decoder file
(AdaIN1d/AdainResBlk1d/UpSample1d appear in models.py:303-370,
hifigan.py:359-414, istftnet.py:603-658 and vocos.py:307-362 — identical).

Channels-last activations; params mirror torch state_dict names.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu.nn import layers as L

SQRT2 = math.sqrt(2.0)


# ---------------------------------------------------------------------------
# 2-D ResBlk (StyleEncoder; reference models.py:82-123)
# ---------------------------------------------------------------------------


def res_blk2d_init(key, dim_in: int, dim_out: int, downsample: str = "half"):
    keys = jax.random.split(key, 4)
    p = {
        "conv1": L.conv2d_init(keys[0], dim_in, dim_in, (3, 3)),
        "conv2": L.conv2d_init(keys[1], dim_in, dim_out, (3, 3)),
    }
    if downsample == "half":
        # LearnedDownSample 'half': depthwise 3x3 stride-2 (models.py:23)
        p["downsample_res"] = {"conv": L.conv2d_init(keys[2], dim_in, dim_in,
                                                     (3, 3), groups=dim_in)}
    if dim_in != dim_out:
        p["conv1x1"] = L.conv2d_init(keys[3], dim_in, dim_out, (1, 1), bias=False)
    return p


def res_blk2d_apply(p, x: jnp.ndarray, downsample: str = "half",
                    slope: float = 0.2) -> jnp.ndarray:
    """x: (B, H, W, C). 'half' downsampling halves H and W.

    Shortcut: 1x1 conv + avg-pool (odd-W edge-duplicated, odd-H floor —
    models.py:53-63); residual: lrelu/conv3x3/learned-downsample/lrelu/conv3x3.
    """
    def duplicate_last_col(v):
        if v.shape[2] % 2 != 0:
            return jnp.concatenate([v, v[:, :, -1:, :]], axis=2)
        return v

    # shortcut
    sc = x
    if "conv1x1" in p:
        sc = L.conv2d_apply(p["conv1x1"], sc)
    if downsample == "half":
        sc = L.avg_pool2d_floor(duplicate_last_col(sc), 2)

    # residual
    h = L.leaky_relu(x, slope)
    h = L.conv2d_apply(p["conv1"], h, padding=(1, 1))
    if downsample == "half":
        h = L.conv2d_apply(p["downsample_res"]["conv"], h, stride=(2, 2),
                           padding=(1, 1), groups=h.shape[-1])
    h = L.leaky_relu(h, slope)
    h = L.conv2d_apply(p["conv2"], h, padding=(1, 1))
    return (sc + h) / SQRT2


# ---------------------------------------------------------------------------
# AdainResBlk1d (reference models.py:326-370)
# ---------------------------------------------------------------------------


def adain_res_blk1d_init(key, dim_in: int, dim_out: int, style_dim: int = 64,
                         upsample: bool = False):
    keys = jax.random.split(key, 6)
    p = {
        "conv1": L.conv1d_init(keys[0], dim_in, dim_out, 3, weight_norm=True),
        "conv2": L.conv1d_init(keys[1], dim_out, dim_out, 3, weight_norm=True),
        "norm1": L.adain_1d_init(keys[2], style_dim, dim_in),
        "norm2": L.adain_1d_init(keys[3], style_dim, dim_out),
    }
    if dim_in != dim_out:
        p["conv1x1"] = L.conv1d_init(keys[4], dim_in, dim_out, 1, bias=False,
                                     weight_norm=True)
    if upsample:
        # depthwise ConvTranspose1d k3 s2 pad1 outpad1 (models.py:340)
        p["pool"] = L.conv_transpose1d_init(keys[5], dim_in, dim_in, 3,
                                            groups=dim_in, weight_norm=True)
    return p


def adain_res_blk1d_apply(p, x: jnp.ndarray, s: jnp.ndarray,
                          upsample: bool = False,
                          mask: Optional[jnp.ndarray] = None,
                          out_mask: Optional[jnp.ndarray] = None,
                          dropout_p: float = 0.0, train: bool = False,
                          rng=None) -> jnp.ndarray:
    """x: (B, T, C). With upsample=True output T doubles.

    mask (B, T): valid mask at the input rate (AdaIN stats + re-zeroing);
    out_mask (B, 2T): valid mask at the output rate when upsampling.
    """
    slope = 0.2
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)

    # shortcut
    sc = x
    if upsample:
        sc = L.upsample_nearest_1d(sc, 2)
    if "conv1x1" in p:
        if out_mask is not None and upsample:
            sc = jnp.where(out_mask[..., None], sc, 0.0)
        sc = L.conv1d_apply(p["conv1x1"], sc)

    # residual
    h = L.adain_1d_act_apply(p["norm1"], x, s, mask, act="lrelu", slope=slope)
    if upsample:
        h = L.conv_transpose1d_apply(p["pool"], h, stride=2, padding=1,
                                     output_padding=1, groups=h.shape[-1])
        cur_mask = out_mask
    else:
        cur_mask = mask
    h = L.dropout(h, dropout_p, train, r1)
    if cur_mask is not None and upsample:
        # the pool conv's bias re-populates padded positions; dropout
        # preserves zeros, so this is the only re-zeroing needed
        h = jnp.where(cur_mask[..., None], h, 0.0)
    h = L.conv1d_apply(p["conv1"], h, padding=1)
    h = L.adain_1d_act_apply(p["norm2"], h, s, cur_mask, act="lrelu",
                             slope=slope)
    h = L.dropout(h, dropout_p, train, r2)
    h = L.conv1d_apply(p["conv2"], h, padding=1)

    return (h + sc) / SQRT2


# ---------------------------------------------------------------------------
# AdaINResBlock1 — the snake/AdaIN dilated stack inside the vocoder
# (reference hifigan.py:26-80 / istftnet.py:27-81)
# ---------------------------------------------------------------------------


def adain_res_block1_init(key, channels: int, kernel_size: int = 3,
                          dilation=(1, 3, 5), style_dim: int = 64):
    """Param tree mirrors the torch module paths exactly: convs1.{i}.*,
    adain1.{i}.fc.*, alpha1.{i} (torch shape (1, C, 1))."""
    n = len(dilation)
    keys = jax.random.split(key, 4 * n)
    p = {
        "convs1": {str(i): L.conv1d_init(keys[i], channels, channels,
                                         kernel_size, weight_norm=True)
                   for i in range(n)},
        "convs2": {str(i): L.conv1d_init(keys[n + i], channels, channels,
                                         kernel_size, weight_norm=True)
                   for i in range(n)},
        "adain1": {str(i): L.adain_1d_init(keys[2 * n + i], style_dim, channels)
                   for i in range(n)},
        "adain2": {str(i): L.adain_1d_init(keys[3 * n + i], style_dim, channels)
                   for i in range(n)},
        "alpha1": {str(i): np.ones((1, channels, 1), np.float32)
                   for i in range(n)},
        "alpha2": {str(i): np.ones((1, channels, 1), np.float32)
                   for i in range(n)},
    }
    return p


def _alpha_cl(a: jnp.ndarray, dtype) -> jnp.ndarray:
    """torch alpha (1, C, 1) -> channels-last (1, 1, C)."""
    return jnp.swapaxes(a, 1, 2).astype(dtype)


def _adain_affine(p_adain, x: jnp.ndarray, s: jnp.ndarray,
                  mask: Optional[jnp.ndarray]):
    """Collapse AdaIN into per-(batch, channel) scale/shift:
    (1+gamma)*IN(x)+beta == x*scale + shift with scale=(1+gamma)*rsqrt(var),
    shift=beta-mean*scale. Stats over the masked region (two-pass)."""
    h = L.linear_apply(p_adain["fc"], s.astype(jnp.float32))
    gamma, beta = jnp.split(h, 2, axis=-1)
    xf = x.astype(jnp.float32)
    m = None if mask is None else mask.astype(jnp.float32)[..., None]
    mean, var = L._masked_stats(xf, m)  # (B, 1, C); seq-par aware
    mean, var = mean[:, 0], var[:, 0]
    scale = (1.0 + gamma) * jax.lax.rsqrt(var + 1e-5)
    return scale, beta - mean * scale


def _adain_affine_folded(p_adain, x_f: jnp.ndarray, s: jnp.ndarray,
                         nv_f: jnp.ndarray, f: int):
    """_adain_affine on a time-folded (B, T/f, f*C) tensor: stats are per
    ORIGINAL channel (phase-merged) but every pass over the big tensor
    stays in the folded 128-lane layout. Returns (B, f*C) scale/shift
    (tiled per phase). Exact when every valid prefix divides f."""
    b, tp, fc = x_f.shape
    c = fc // f
    h = L.linear_apply(p_adain["fc"], s.astype(jnp.float32))
    gamma, beta = jnp.split(h, 2, axis=-1)
    xf = x_f.astype(jnp.float32)
    m = (jnp.arange(tp)[None, :] < nv_f[:, None]).astype(
        jnp.float32)[..., None]
    n = jnp.maximum(nv_f.astype(jnp.float32) * f, 1.0)[:, None]
    mean = (xf * m).sum(axis=1).reshape(b, f, c).sum(axis=1) / n
    mean_t = jnp.tile(mean, (1, f))[:, None, :]
    var = (jnp.square(xf - mean_t) * m).sum(axis=1).reshape(
        b, f, c).sum(axis=1) / n
    scale = (1.0 + gamma) * jax.lax.rsqrt(var + 1e-5)
    shift = beta - mean * scale
    return jnp.tile(scale, (1, f)), jnp.tile(shift, (1, f))


def _affine_from_stats(p_adain, stats, s, nv_f, f: int):
    """AdaIN affine (scale, shift) from the Pallas kernel's per-tile
    partial [sum, sumsq] output (vocoder_pallas out_stats) — the
    instance-norm stats WITHOUT a separate full pass over the tensor.
    One-pass variance (E[x^2] - mean^2), so the bf16 hot path only; the
    f32 path keeps the two-pass _adain_affine/_adain_affine_folded that
    the kernel's documented XLA exactness is measured against.
    stats: (B, n_tiles, 2, f*C); f: phase fold (1 = unfolded)."""
    b, _, _, fc = stats.shape
    c = fc // f
    h = L.linear_apply(p_adain["fc"], s.astype(jnp.float32))
    gamma, beta = jnp.split(h, 2, axis=-1)
    tot = stats.sum(axis=1)  # (B, 2, f*C)
    n = jnp.maximum(nv_f.astype(jnp.float32) * f, 1.0)[:, None]
    sm = tot[:, 0].reshape(b, f, c).sum(axis=1)
    sq = tot[:, 1].reshape(b, f, c).sum(axis=1)
    mean = sm / n
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    scale = (1.0 + gamma) * jax.lax.rsqrt(var + 1e-5)
    shift = beta - mean * scale
    if f > 1:
        scale = jnp.tile(scale, (1, f))
        shift = jnp.tile(shift, (1, f))
    return scale, shift


def _res_block_folded_pallas(p, x_f, s, dilation, nv_f, f: int,
                             itemsize: int, kp_max: int):
    """The fused-Pallas dilation loop on an ALREADY-FOLDED (B, T/f, f*C)
    tensor (prefolded 'wfold' weights); returns the folded result."""
    from styletts2_tpu.ops import vocoder_pallas as VP

    t_f = x_f.shape[1]
    # bf16: fuse the residual add into conv2's epilogue and take the next
    # AdaIN's stats from the kernel's partial sums (saves one full
    # read-modify-write + one stats pass per conv pair; see
    # _affine_from_stats for the f32 gate)
    fuse_x = (jnp.dtype(x_f.dtype) == jnp.bfloat16
              and os.environ.get("STYLETTS2_TPU_NO_FUSE_STATS") != "1"
              and VP._pick_tile(t_f, 128, itemsize, io_blocks=6)
              > (kp_max - 1) // 2)
    st = None
    for i, _d in enumerate(dilation):
        si = str(i)
        last = i == len(dilation) - 1
        if st is None:
            sc1, sh1 = _adain_affine_folded(p["adain1"][si], x_f, s, nv_f, f)
        else:
            sc1, sh1 = _affine_from_stats(p["adain1"][si], st, s, nv_f, f)
        a1 = jnp.tile(jnp.asarray(p["alpha1"][si]).ravel(), f)
        a2 = jnp.tile(jnp.asarray(p["alpha2"][si]).ravel(), f)
        if fuse_x:
            zt, st_z = VP.fused_ada_snake_conv(
                x_f, sc1, sh1, a1, p["convs1"][si]["wfold"],
                p["convs1"][si]["bfold"], 1, nv_f,
                w_is_hio=True, out_stats=True)
            sc2, sh2 = _affine_from_stats(p["adain2"][si], st_z, s, nv_f, f)
            out = VP.fused_ada_snake_conv(
                zt, sc2, sh2, a2, p["convs2"][si]["wfold"],
                p["convs2"][si]["bfold"], 1, nv_f,
                w_is_hio=True, residual=x_f, out_stats=not last)
            if last:
                x_f, st = out, None
            else:
                x_f, st = out
        else:
            zt = VP.fused_ada_snake_conv(
                x_f, sc1, sh1, a1, p["convs1"][si]["wfold"],
                p["convs1"][si]["bfold"], 1, nv_f, w_is_hio=True)
            sc2, sh2 = _adain_affine_folded(p["adain2"][si], zt, s, nv_f, f)
            zt = VP.fused_ada_snake_conv(
                zt, sc2, sh2, a2, p["convs2"][si]["wfold"],
                p["convs2"][si]["bfold"], 1, nv_f, w_is_hio=True)
            x_f = zt + x_f
    return x_f


def _res_block_folded_xla(p, x_f, s, dilation, nv_f, fold: int):
    """The XLA folded dilation loop on an ALREADY-FOLDED tensor; returns
    the folded result. nv_f None = unmasked stats (matches mask=None)."""
    for i, d in enumerate(dilation):
        si = str(i)
        z = L.adain_1d_act_folded_apply(
            p["adain1"][si], x_f, s, fold, nv_f, act="snake",
            alpha=jnp.asarray(p["alpha1"][si]).ravel())
        z = L.conv1d_folded_apply(p["convs1"][si], z, fold, d)
        z = L.adain_1d_act_folded_apply(
            p["adain2"][si], z, s, fold, nv_f, act="snake",
            alpha=jnp.asarray(p["alpha2"][si]).ravel())
        z = L.conv1d_folded_apply(p["convs2"][si], z, fold, 1)
        x_f = z + x_f
    return x_f


def adain_res_block1_apply(p, x: jnp.ndarray, s: jnp.ndarray,
                           kernel_size: int, dilation=(1, 3, 5),
                           mask: Optional[jnp.ndarray] = None,
                           n_valid: Optional[jnp.ndarray] = None,
                           fold: Optional[int] = None,
                           rate_prod: Optional[int] = None,
                           x_folded: Optional[int] = None) -> jnp.ndarray:
    """x: (B, T, C); the weight-norm convs keep T (SAME padding).

    When `n_valid` is given (prefix-mask lengths — inference), the
    low-channel stages run TIME-FOLDED: (B, T, C) -> (B, T/f, f*C) with
    f = 128//C (a free reshape in channels-last layout) so every conv is
    MXU-shaped (layers.fold_conv1d_weight) — measured ~1% MFU unfolded vs
    ~47% folded for C=32 on v5e. `fold` overrides the auto gate (tests);
    the result is numerically the same conv (same taps, same zero pads).

    On TPU with prefix-masked inference inputs (mask + n_valid given) each
    AdaIN+Snake+conv group runs as one fused Pallas kernel
    (ops/vocoder_pallas.py) — the DEFAULT hot path, 1.8-2.2x the XLA
    path at every stage (see the kernel header for the measured table).

    x_folded: the caller passes x ALREADY time-folded by this factor
    (B, T/f, f*C) and takes the folded result back — the decoder's
    stage-folded fast path (hifigan_generator_apply keeps whole low-C
    stages folded so the per-block fold/unfold boundary copies vanish).
    n_valid stays at the ORIGINAL stage rate."""
    if x_folded is not None:
        f = x_folded
        nv_f = None if n_valid is None else n_valid // f
        if (jax.default_backend() == "tpu"
                and "wfold" in p["convs1"]["0"]
                and os.environ.get("STYLETTS2_TPU_NO_VOCODER_PALLAS") != "1"):
            from styletts2_tpu.ops import vocoder_pallas as VP

            itemsize = jnp.dtype(x.dtype).itemsize
            kp_max = max(p[cs][str(i)]["wfold"].shape[0]
                         for cs in ("convs1", "convs2")
                         for i in range(len(dilation)))
            if VP._pick_tile(x.shape[1], 128, itemsize) > (kp_max - 1) // 2:
                return _res_block_folded_pallas(p, x, s, dilation, nv_f, f,
                                                itemsize, kp_max)
        return _res_block_folded_xla(p, x, s, dilation, nv_f, f)

    c = x.shape[-1]
    # Pallas default gate: inference prefix-mask contract (mask carries the
    # stats semantics, n_valid the kernel's zero boundary), fused weight
    # norm, and an even time tiling for every dilation's halo
    if (fold is None and mask is not None and n_valid is not None
            and L.seqpar_ctx() is None  # seq-par windows aren't prefix-masked
            and jax.default_backend() == "tpu"
            and "weight" in p["convs1"]["0"]
            and os.environ.get("STYLETTS2_TPU_NO_VOCODER_PALLAS") != "1"
            # debug bisection knob: kernel only for C >= MINC
            and c >= int(os.environ.get(
                "STYLETTS2_TPU_VOCODER_PALLAS_MINC", "0"))):
        from styletts2_tpu.ops import vocoder_pallas as VP

        itemsize = jnp.dtype(x.dtype).itemsize
        # under-128-lane stages run the kernel TIME-FOLDED on (T/f, 128)
        # tensors (prefolded weights from decoder.prefold_generator_params):
        # full MXU lanes, and — critically — no 128-lane HBM padding on the
        # inter-kernel buffers (unfolded (T, 32) bf16 operands pad 4x in
        # HBM; at batch 8 x 2400-frame buckets that alone OOMs the chip)
        f = 128 // c if (c < 128 and 128 % c == 0) else 1
        if (f > 1 and rate_prod is not None and rate_prod % f == 0
                and x.shape[1] % f == 0 and "wfold" in p["convs1"]["0"]):
            kp_max = max(p[cs][str(i)]["wfold"].shape[0]
                         for cs in ("convs1", "convs2")
                         for i in range(len(dilation)))
            tile_f = VP._pick_tile(x.shape[1] // f, 128, itemsize)
            if tile_f > (kp_max - 1) // 2:
                b_sz, t_sz = x.shape[0], x.shape[1]
                x_f = x.reshape(b_sz, t_sz // f, f * c)
                x_f = _res_block_folded_pallas(p, x_f, s, dilation,
                                               n_valid // f, f, itemsize,
                                               kp_max)
                return x_f.reshape(b_sz, t_sz, c)

        tile = VP._pick_tile(x.shape[1], c, itemsize)
        max_halo = max(dilation) * (kernel_size - 1) // 2
        t_orig = x.shape[1]
        pad_t = 0
        if tile <= max_halo:
            # no even tiling at this length (e.g. istftnet's
            # reflection-padded odd last stage) — zero-pad the time axis to
            # a tileable length and slice back after; the kernel's n_valid
            # mask zeroes every conv input beyond the valid prefix, so the
            # extra rows never feed back into real rows
            t_new = VP._pad_to_tileable(t_orig, c, itemsize, max_halo)
            if t_new > t_orig:
                pad_t = t_new - t_orig
                x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
                mask = jnp.pad(mask, ((0, 0), (0, pad_t)))
                tile = VP._pick_tile(t_new, c, itemsize)
        if tile > max_halo:
            fuse_x = (jnp.dtype(x.dtype) == jnp.bfloat16
                      and os.environ.get(
                          "STYLETTS2_TPU_NO_FUSE_STATS") != "1"
                      and VP._pick_tile(x.shape[1], c, itemsize,
                                        io_blocks=6) > max_halo)
            st = None
            for i, d in enumerate(dilation):
                si = str(i)
                last = i == len(dilation) - 1
                if st is None:
                    sc1, sh1 = _adain_affine(p["adain1"][si], x, s, mask)
                else:
                    sc1, sh1 = _affine_from_stats(p["adain1"][si], st, s,
                                                  n_valid, 1)
                if fuse_x:
                    xt, st_x = VP.fused_ada_snake_conv(
                        x, sc1, sh1, jnp.asarray(p["alpha1"][si]).ravel(),
                        p["convs1"][si]["weight"], p["convs1"][si]["bias"],
                        d, n_valid, out_stats=True)
                    sc2, sh2 = _affine_from_stats(p["adain2"][si], st_x, s,
                                                  n_valid, 1)
                    out = VP.fused_ada_snake_conv(
                        xt, sc2, sh2, jnp.asarray(p["alpha2"][si]).ravel(),
                        p["convs2"][si]["weight"], p["convs2"][si]["bias"],
                        1, n_valid, residual=x, out_stats=not last)
                    if last:
                        x, st = out, None
                    else:
                        x, st = out
                else:
                    xt = VP.fused_ada_snake_conv(
                        x, sc1, sh1, jnp.asarray(p["alpha1"][si]).ravel(),
                        p["convs1"][si]["weight"], p["convs1"][si]["bias"],
                        d, n_valid)
                    sc2, sh2 = _adain_affine(p["adain2"][si], xt, s, mask)
                    xt = VP.fused_ada_snake_conv(
                        xt, sc2, sh2, jnp.asarray(p["alpha2"][si]).ravel(),
                        p["convs2"][si]["weight"], p["convs2"][si]["bias"],
                        1, n_valid)
                    x = xt + x
            return x[:, :t_orig] if pad_t else x
    if fold is None:
        fold = 1
        # C=64 measures neutral (9.3 vs 10.0 ms/block on v5e) — fold only
        # where the lanes are 4x underfilled
        if (n_valid is not None and jax.default_backend() == "tpu"
                and L.seqpar_ctx() is None
                and c <= 32 and 128 % c == 0
                and "weight" in p["convs1"]["0"]):
            f = 128 // c
            # with a mask, the masked stats use n_valid // f groups: exact
            # only when every valid prefix length divides f. n_valid is
            # n_val * rate_prod (the decoder stage contract), so gate
            # statically on the stage's cumulative upsample product —
            # custom upsample_rates whose product isn't a multiple of f
            # take the unfolded path instead of zeroing valid tail samples
            if x.shape[1] % f == 0 and (
                    mask is None
                    or (rate_prod is not None and rate_prod % f == 0)):
                fold = f
    if fold > 1:
        b_sz, t_sz = x.shape[0], x.shape[1]
        # stats follow `mask` exactly like the unfolded path: mask=None
        # means unmasked stats and no re-zeroing (n_valid alone only gates
        # the fold and feeds the optional Pallas kernel)
        nv_f = None if mask is None else n_valid // fold
        x_f = _res_block_folded_xla(p, x.reshape(b_sz, t_sz // fold,
                                                 fold * c),
                                    s, dilation, nv_f, fold)
        return x_f.reshape(b_sz, t_sz, c)
    for i, d in enumerate(dilation):
        si = str(i)
        pad1 = (kernel_size * d - d) // 2
        pad2 = (kernel_size - 1) // 2
        xt = L.adain_1d_act_apply(p["adain1"][si], x, s, mask, act="snake",
                                  alpha=_alpha_cl(p["alpha1"][si], x.dtype))
        xt = L.conv1d_apply(p["convs1"][si], xt, padding=pad1, dilation=d)
        xt = L.adain_1d_act_apply(p["adain2"][si], xt, s, mask, act="snake",
                                  alpha=_alpha_cl(p["alpha2"][si], x.dtype))
        xt = L.conv1d_apply(p["convs2"][si], xt, padding=pad2, dilation=1)
        x = xt + x
    return x
