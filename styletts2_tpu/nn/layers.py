"""NN primitives: convs, weight norm, LSTMs, norms — functional JAX.

Conventions (chosen so the torch checkpoint converter is a tree copy):
* params are nested dicts whose leaf names mirror torch state_dicts
  (`weight`, `bias`, `weight_g`/`weight_v`, `weight_ih_l0`, ...), stored in
  torch layouts ((out,in,k) convs, (out,in) linears, (4H,In) LSTMs);
* activations are channels-last: (B, T, C) for 1-D, (B, H, W, C) for 2-D —
  the TPU-friendly layout; the transposes into XLA's ('NHC','HIO','NHC')
  conv forms happen at apply time and fuse into the convs;
* masks are "valid" masks (1 = real data), the complement of the reference's
  pad masks (utils.length_to_mask, reference utils.py:42-45);
* dropout / PRNG is explicit: apply fns take `train` and an optional `rng`.

Parity targets are cited per function.
"""

from __future__ import annotations

import math
import os
import threading
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jax.lax.Precision.HIGHEST

# lax.scan unroll factor for the LSTM scans (the longest sequential chains
# in the synthesis path — loop overhead per step is pure latency).
# Numerically equivalent at any value (fusion changes reduction order by
# ulps); tune with STYLETTS2_TPU_SCAN_UNROLL on real hardware before
# changing the default.
try:
    SCAN_UNROLL = max(1, int(os.environ.get("STYLETTS2_TPU_SCAN_UNROLL",
                                            "1")))
except ValueError:  # malformed env var: fall back, never break import
    SCAN_UNROLL = 1


def _np_rng(key) -> np.random.Generator:
    """jax PRNG key -> deterministic numpy Generator.

    Init-time sampling uses numpy: each eager jax.random op with a distinct
    shape compiles its own executable (build_model took ~2 minutes in jax,
    <1 s in numpy). Param trees therefore hold numpy leaves until the first
    jitted use (or an explicit device_put) — a single bulk transfer."""
    data = np.asarray(jax.random.key_data(key)).ravel()
    return np.random.default_rng([int(x) for x in data])


def _uniform(key, shape, lo: float, hi: float) -> np.ndarray:
    return _np_rng(key).uniform(lo, hi, shape).astype(np.float32)


def _normal(key, shape, std: float = 1.0) -> np.ndarray:
    return (_np_rng(key).standard_normal(shape) * std).astype(np.float32)


def _prec(x: jnp.ndarray):
    """f32 inputs get true-f32 math; low precision dtypes use the default."""
    return _F32 if x.dtype == jnp.float32 else None


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake1D: x + (1/a)*sin^2(a*x) (reference hifigan.py:68-71, 329-343)."""
    s = jnp.sin(alpha * x)
    return x + (1.0 / alpha) * (s * s)


def dropout(x: jnp.ndarray, rate: float, train: bool, rng) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# linear / embedding
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                w_init_gain: str = "linear"):
    """LinearNorm parity (reference models.py:152-162): xavier-uniform."""
    gain = {"linear": 1.0, "tanh": 5.0 / 3.0, "relu": math.sqrt(2.0)}[w_init_gain]
    bound = gain * math.sqrt(6.0 / (in_dim + out_dim))
    p = {"weight": _uniform(key, (out_dim, in_dim), -bound, bound)}
    if bias:
        p["bias"] = np.zeros((out_dim,), np.float32)
    return p


def torch_linear_init(key, in_dim: int, out_dim: int, bias: bool = True):
    """torch.nn.Linear default init (kaiming uniform a=sqrt(5) + fan-in bias)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"weight": _uniform(kw, (out_dim, in_dim), -bound, bound)}
    if bias:
        p["bias"] = _uniform(kb, (out_dim,), -bound, bound)
    return p


def linear_apply(p, x: jnp.ndarray) -> jnp.ndarray:
    w = p["weight"].astype(x.dtype)
    y = jnp.matmul(x, w.T, precision=_prec(x))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def embedding_init(key, n: int, dim: int):
    return {"weight": _normal(key, (n, dim))}


def embedding_apply(p, ids: jnp.ndarray) -> jnp.ndarray:
    return p["weight"][ids]


# ---------------------------------------------------------------------------
# weight norm
# ---------------------------------------------------------------------------


def weight_norm_init(key_or_weight, shape=None):
    """Split a torch-layout weight into (weight_g, weight_v) like
    torch.nn.utils.weight_norm(dim=0)."""
    w = np.asarray(key_or_weight)
    reduce_axes = tuple(range(1, w.ndim))
    g = np.sqrt(np.sum(w * w, axis=reduce_axes, keepdims=True)).astype(w.dtype)
    return {"weight_g": g, "weight_v": w}


def weight_norm_merge(p) -> jnp.ndarray:
    """w = g * v / ||v||, norms over all-but-dim-0 (torch weight_norm parity)."""
    v = p["weight_v"]
    g = p["weight_g"]
    reduce_axes = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32)), axis=reduce_axes,
                            keepdims=True))
    return (g * v / norm.astype(v.dtype)).astype(v.dtype)


def _get_weight(p) -> jnp.ndarray:
    if "weight_v" in p:
        return weight_norm_merge(p)
    return p["weight"]


# ---------------------------------------------------------------------------
# conv1d / conv2d / transposed conv (channels-last activations)
# ---------------------------------------------------------------------------


def conv1d_init(key, in_ch: int, out_ch: int, k: int, groups: int = 1,
                bias: bool = True, weight_norm: bool = False):
    """torch.nn.Conv1d default init (kaiming uniform a=sqrt(5))."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch // groups * k
    bound = 1.0 / math.sqrt(fan_in)
    w = _uniform(kw, (out_ch, in_ch // groups, k), -bound, bound)
    p = weight_norm_init(w) if weight_norm else {"weight": w}
    if bias:
        p["bias"] = _uniform(kb, (out_ch,), -bound, bound)
    return p


def conv1d_apply(p, x: jnp.ndarray, stride: int = 1, padding: int = 0,
                 dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """x: (B, T, C_in) -> (B, T', C_out); weight torch-layout (out, in/g, k)."""
    w = _get_weight(p).astype(x.dtype)
    w = jnp.transpose(w, (2, 1, 0))  # (k, in/g, out) == 'HIO'
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NHC", "HIO", "NHC"), precision=_prec(x))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose1d_init(key, in_ch: int, out_ch: int, k: int, groups: int = 1,
                          bias: bool = True, weight_norm: bool = False):
    """torch.nn.ConvTranspose1d weight layout (in, out/g, k)."""
    kw, kb = jax.random.split(key)
    fan_in = out_ch // groups * k  # torch uses weight.size(1)*k for transposed
    bound = 1.0 / math.sqrt(fan_in)
    w = _uniform(kw, (in_ch, out_ch // groups, k), -bound, bound)
    p = weight_norm_init(w) if weight_norm else {"weight": w}
    if bias:
        p["bias"] = _uniform(kb, (out_ch,), -bound, bound)
    return p


def conv_transpose1d_apply(p, x: jnp.ndarray, stride: int, padding: int = 0,
                           output_padding: int = 0, groups: int = 1) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d parity via lhs-dilated conv.

    x: (B, T, C_in) -> (B, (T-1)*stride - 2*pad + k + output_padding, C_out).
    """
    w = _get_weight(p).astype(x.dtype)  # (in, out/g, k)
    in_ch = w.shape[0]
    out_per_g = w.shape[1]
    k = w.shape[2]
    # rearrange to 'HIO' with groups: kernel[k, i_local, o_global]
    w = w.reshape(groups, in_ch // groups, out_per_g, k)
    w = jnp.transpose(w, (3, 1, 0, 2))  # (k, in/g, g, out/g)
    w = w.reshape(k, in_ch // groups, groups * out_per_g)
    w = jnp.flip(w, axis=0)
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,), feature_group_count=groups,
        dimension_numbers=("NHC", "HIO", "NHC"), precision=_prec(x))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv2d_init(key, in_ch: int, out_ch: int, k: Tuple[int, int],
                groups: int = 1, bias: bool = True, weight_norm: bool = False):
    kw, kb = jax.random.split(key)
    kh, kw_ = k
    fan_in = in_ch // groups * kh * kw_
    bound = 1.0 / math.sqrt(fan_in)
    w = _uniform(kw, (out_ch, in_ch // groups, kh, kw_), -bound, bound)
    p = weight_norm_init(w) if weight_norm else {"weight": w}
    if bias:
        p["bias"] = _uniform(kb, (out_ch,), -bound, bound)
    return p


def conv2d_apply(p, x: jnp.ndarray, stride=(1, 1), padding=(0, 0),
                 dilation=(1, 1), groups: int = 1) -> jnp.ndarray:
    """x: (B, H, W, C_in); weight torch-layout (out, in/g, kh, kw)."""
    w = _get_weight(p).astype(x.dtype)
    w = jnp.transpose(w, (2, 3, 1, 0))  # 'HWIO'
    if isinstance(padding, int):
        padding = (padding, padding)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=tuple(dilation), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_prec(x))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose2d_apply(p, x: jnp.ndarray, stride=(2, 2), padding=(1, 1),
                           output_padding=(1, 1), groups: int = 1) -> jnp.ndarray:
    """torch.nn.ConvTranspose2d parity; weight (in, out/g, kh, kw)."""
    w = _get_weight(p).astype(x.dtype)
    in_ch, out_per_g, kh, kw_ = w.shape
    w = w.reshape(groups, in_ch // groups, out_per_g, kh, kw_)
    w = jnp.transpose(w, (3, 4, 1, 0, 2)).reshape(kh, kw_, in_ch // groups,
                                                  groups * out_per_g)
    w = jnp.flip(w, axis=(0, 1))
    pads = [(kh - 1 - padding[0], kh - 1 - padding[0] + output_padding[0]),
            (kw_ - 1 - padding[1], kw_ - 1 - padding[1] + output_padding[1])]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=pads,
        lhs_dilation=tuple(stride), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_prec(x))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------


def layer_norm_init(channels: int):
    """reference models.LayerNorm (models.py:224-236): gamma/beta over C."""
    return {"gamma": np.ones((channels,), np.float32),
            "beta": np.zeros((channels,), np.float32)}


def layer_norm_apply(p, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """x: (..., C), normalize over the trailing channel dim."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["gamma"] + p["beta"]
    return y.astype(x.dtype)


def plain_layer_norm(x: jnp.ndarray, eps: float = 1e-5,
                     gamma: Optional[jnp.ndarray] = None,
                     beta: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """F.layer_norm without/with affine, over the trailing dim."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y.astype(x.dtype)


# --- sequence-parallel instance-norm stats ---------------------------------
#
# Inside a frame-sharded (sequence-parallel) decode each device holds a
# haloed window [core ± margin] of the time axis, but the AdaIN instance
# norms need stats over the WHOLE sequence. While a SeqParCtx is active
# (parallel/seqpar.py installs one inside its shard_map body), every
# time-axis mean/var in this module is computed over the device's CORE
# region only and psum'd over the mesh axis — halo positions are other
# devices' core data and must not be double-counted. The context carries
# the window geometry at the base (asr-frame) rate; stage tensors are
# integer upsamples of it, so the core interval scales with T.


class SeqParCtx:
    """axis: mesh axis to psum over; t_base: local window length at the
    base rate; [lo, hi): core interval at the base rate; n_dev: mesh-axis
    size (needed only for the reflection-padded +1 grid, see
    `_seqpar_core_mask`)."""

    __slots__ = ("axis", "t_base", "lo", "hi", "n_dev")

    def __init__(self, axis: str, t_base: int, lo: int, hi: int,
                 n_dev: Optional[int] = None):
        self.axis, self.t_base, self.lo, self.hi = axis, t_base, lo, hi
        self.n_dev = n_dev


# thread-local so a seq-par trace on one thread cannot leak its context
# into a plain decode tracing concurrently on another (e.g. a background
# warmup) — psum over a nonexistent axis fails the foreign compile
_SEQPAR_TLS = threading.local()


def seqpar_ctx() -> Optional[SeqParCtx]:
    return getattr(_SEQPAR_TLS, "ctx", None)


class seqpar_stats:
    """Context manager installing a SeqParCtx for the enclosed apply calls
    (trace-time scoping: shard_map traces its body once, so a per-thread
    global set during tracing is safe)."""

    def __init__(self, ctx: SeqParCtx):
        self.ctx = ctx

    def __enter__(self):
        self._prev = seqpar_ctx()
        _SEQPAR_TLS.ctx = self.ctx
        return self.ctx

    def __exit__(self, *exc):
        _SEQPAR_TLS.ctx = self._prev
        return False


def _seqpar_core_mask(t_local: int) -> jnp.ndarray:
    """(1, t_local, 1) f32 mask of this device's core region at whatever
    rate t_local implies relative to the context's base length.

    rem == 1 is the reflection-padded grid (istftnet's last stage
    prepends ONE frame to the whole sequence, nn/istftnet.py:108-109):
    the global grid has f*T_base + 1 slots, each window carries one extra
    leading slot, and position indexing shifts so the standard
    [lo*f, hi*f) core still tiles the grid — except the one extra global
    tail slot, which the LAST device along the axis claims."""
    ctx = seqpar_ctx()
    f, rem = divmod(t_local, ctx.t_base)
    if rem not in (0, 1):
        raise ValueError(
            f"seq-par stats on T={t_local} not a multiple (or multiple+1, "
            f"the reflection-padded grid) of the base window {ctx.t_base}")
    pos = jnp.arange(t_local)
    core = (pos >= ctx.lo * f) & (pos < ctx.hi * f)
    if rem == 1:
        if ctx.n_dev is None:
            raise ValueError("reflection-padded seq-par stats need "
                             "SeqParCtx.n_dev")
        is_last = jax.lax.axis_index(ctx.axis) == ctx.n_dev - 1
        core = core | ((pos == ctx.hi * f) & is_last)
    return core.astype(jnp.float32)[None, :, None]


def _masked_stats(xf: jnp.ndarray, m: Optional[jnp.ndarray]):
    """Two-pass masked mean/var over the T axis of (B, T, C) f32 input;
    m: (B, T, 1) f32 or None. Under an active SeqParCtx the stats are
    global: summed over core regions and psum'd across the mesh axis."""
    ctx = seqpar_ctx()
    if ctx is not None:
        core = _seqpar_core_mask(xf.shape[1])
        m = core if m is None else m * core
    if m is None:
        mean = xf.mean(axis=1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=1, keepdims=True)
        return mean, var
    s = (xf * m).sum(axis=1, keepdims=True)
    n = m.sum(axis=1, keepdims=True)
    if ctx is not None:
        s, n = jax.lax.psum((s, n), ctx.axis)
    n = jnp.maximum(n, 1.0)
    mean = s / n
    v = (jnp.square(xf - mean) * m).sum(axis=1, keepdims=True)
    if ctx is not None:
        v = jax.lax.psum(v, ctx.axis)
    return mean, v / n


def instance_norm_1d(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                     eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm1d(affine=False) on channels-last (B, T, C).

    Stats over the T axis per (B, C). `mask` (B, T) of 1=valid makes the
    stats padding-invariant (needed because we run on padded static-shape
    buckets; the reference computes exact-length tensors at inference)."""
    xf = x.astype(jnp.float32)
    m = None if mask is None else mask.astype(jnp.float32)[..., None]
    mean, var = _masked_stats(xf, m)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def adain_1d_init(key, style_dim: int, num_features: int):
    """AdaIN1d (reference models.py:303-313): fc style->(2*C)."""
    return {"fc": torch_linear_init(key, style_dim, num_features * 2)}


def adain_1d_apply(p, x: jnp.ndarray, s: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(1+gamma)*InstanceNorm(x) + beta, channels-last (B, T, C)."""
    h = linear_apply(p["fc"], s)  # (B, 2C)
    gamma, beta = jnp.split(h, 2, axis=-1)
    y = instance_norm_1d(x, mask)
    return (1.0 + gamma[:, None, :]) * y + beta[:, None, :]


def adain_1d_act_apply(p, x: jnp.ndarray, s: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None, act: str = "none",
                       alpha: Optional[jnp.ndarray] = None,
                       slope: float = 0.2) -> jnp.ndarray:
    """Fused AdaIN1d + activation + padding re-zero (one fusion group).

    Equivalent to adain_1d_apply -> snake/leaky_relu -> where(mask, ., 0)
    but organized so XLA reads x once for the stats (masked mean/var via
    E[x^2]-mean^2) and once for the output — measured ~2.5x less elementwise
    HBM traffic than the unfused chain in the bf16 vocoder, where ~50 of
    these groups run per synthesis call (reference hifigan.py:26-80 applies
    AdaIN+Snake before every dilated conv)."""
    h = linear_apply(p["fc"], s)  # (B, 2C)
    gamma, beta = jnp.split(h, 2, axis=-1)
    xf = x.astype(jnp.float32)
    # two-pass masked stats (E[(x-mean)^2], not E[x^2]-mean^2: the one-pass
    # form loses enough bits to flip tanh-rail samples in the composed
    # parity test); collective under a seq-par context
    m = None if mask is None else mask.astype(jnp.float32)[..., None]
    mean, var = _masked_stats(xf, m)
    y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
    z = (1.0 + gamma[:, None, :]) * y + beta[:, None, :]
    if act == "snake":
        a = alpha.astype(z.dtype)
        sn = jnp.sin(a * z)
        z = z + (1.0 / a) * (sn * sn)
    elif act == "lrelu":
        z = jnp.where(z >= 0, z, z * slope)
    if mask is not None:
        z = jnp.where(mask[..., None], z, 0.0)
    return z


# ---------------------------------------------------------------------------
# time-folded (space-to-depth) ops for low-channel high-rate conv stacks
# ---------------------------------------------------------------------------
#
# The late HiFi-GAN stages run C=32/64 at up to 24 kHz: XLA's conv lowering
# measures ~1% MFU there (128-lane tiles underfilled), vs ~47% at C=128+
# (v5e). In channels-last layout, (B, T, C) -> (B, T/f, f*C) is a FREE
# reshape (same buffer), and a SAME dilated conv becomes an equivalent
# wider conv at f*C channels with block-structured weights:
#
#   y[f t' + p, co] = sum_i x[f t' + p + d*i, ci] W[co, ci, i]
#   write u = p + d*i = f*j + q  ->  y_f[t', p*C+co] =
#       sum_j x_f[t' + j, q*C + ci] W'[j, q*C+ci, p*C+co]
#
# W' is dense (kp, f*C, f*C) with kp = 2*ceil(d*(k-1)/2 / f) + 1; the f^2
# FLOP inflation is repaid ~5-20x by the MXU-shaped operands. Exact (same
# math, same zero padding); prefix masks stay exact when n_valid % f == 0.


def fold_conv1d_weight(w: jnp.ndarray, f: int, dilation: int) -> jnp.ndarray:
    """w: torch-layout (C_out, C_in, k), odd k, SAME padding. Returns the
    folded HIO weight (kp, f*C_in, f*C_out); use padding (kp-1)//2."""
    c_out, c_in, k = w.shape
    half = (k - 1) // 2
    pad_f = -(-dilation * half // f)  # ceil
    kp = 2 * pad_f + 1
    wt = jnp.swapaxes(w, 0, 1)  # (C_in, C_out, k)
    wp = jnp.zeros((kp, f * c_in, f * c_out), w.dtype)
    for i in range(k):
        o = dilation * (i - half)
        for p in range(f):
            u = p + o
            j = u // f + pad_f
            q = u % f
            wp = wp.at[j, q * c_in:(q + 1) * c_in,
                       p * c_out:(p + 1) * c_out].set(wt[:, :, i])
    return wp


def fold_conv1d_weight_np(w: np.ndarray, f: int, dilation: int) -> np.ndarray:
    """Host-side fold_conv1d_weight (engine init): building the folded
    weight in-graph costs ~k*f dynamic-update-slice ops PER CALL, which
    dominates the folded conv itself — precompute once instead."""
    c_out, c_in, k = w.shape
    half = (k - 1) // 2
    pad_f = -(-dilation * half // f)
    kp = 2 * pad_f + 1
    wt = np.swapaxes(np.asarray(w), 0, 1)  # (C_in, C_out, k)
    wp = np.zeros((kp, f * c_in, f * c_out), wt.dtype)
    for i in range(k):
        o = dilation * (i - half)
        for p in range(f):
            u = p + o
            wp[u // f + pad_f, (u % f) * c_in:(u % f + 1) * c_in,
               p * c_out:(p + 1) * c_out] = wt[:, :, i]
    return wp


def fold_strided_conv1d_weight_np(w: np.ndarray, stride: int, f_out: int,
                                  padding: int) -> np.ndarray:
    """Fold a single-input-channel STRIDED conv (the HiFi-GAN noise convs,
    reference hifigan.py:296-305: Conv1d(1, C, k, stride=s, padding=pad)
    on the sample-rate harmonic source) into a stride-1 kernel-3 conv on
    the source folded by F = stride*f_out:

        y[B, L/F, f_out*C] = conv(har_f[B, L/F, F], wp, pad=1)

    equals the unfolded conv's output time-folded by f_out. A (L, 1)
    sample-rate operand is the worst possible TPU layout (1 of 128 lanes);
    folded, the conv reads F-lane rows and writes f_out*C-lane rows.
    Requires every tap to land within one folded row of its output row
    (k <= 2*stride guarantees it; the reference uses k = 2*stride)."""
    c_out, c_in, k = w.shape
    assert c_in == 1, "noise convs are single-channel-in"
    F = stride * f_out
    wp = np.zeros((3, F, f_out * c_out), np.asarray(w).dtype)
    wt = np.asarray(w)[:, 0, :]  # (C_out, k)
    for p in range(f_out):
        for j in range(k):
            u = p * stride - padding + j
            r, e = divmod(u, F)
            if not -1 <= r <= 1:
                return None  # tap escapes the 3-row window (nonstandard
                # kernel/stride combo) — caller skips the prefold
            wp[r + 1, e, p * c_out:(p + 1) * c_out] += wt[:, j]
    return wp


def conv1d_strided_folded_apply(p, har: jnp.ndarray, dtype) -> jnp.ndarray:
    """Apply a prefolded noise conv ('wsfold'/'bsfold',
    fold_strided_conv1d_weight_np) to the (B, L, 1) harmonic source:
    returns (B, L/F, f_out*C) — the conv output time-folded by f_out
    (f_out = wsfold.shape[2] // C; F = stride * f_out)."""
    wp = p["wsfold"].astype(dtype)
    F = wp.shape[1]
    b, l, _ = har.shape
    har_f = har[..., 0].reshape(b, l // F, F).astype(dtype)
    y = jax.lax.conv_general_dilated(
        har_f, wp, window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"), precision=_prec(har_f))
    return y + p["bsfold"].astype(dtype)


def conv1d_folded_apply(p, x_f: jnp.ndarray, f: int,
                        dilation: int = 1) -> jnp.ndarray:
    """SAME conv on a time-folded tensor x_f (B, T/f, f*C). Uses the
    precomputed 'wfold'/'bfold' params when present (engine init,
    decoder.prefold_generator_params); otherwise folds in-graph."""
    if "wfold" in p:
        wp = p["wfold"].astype(x_f.dtype)
    else:
        wp = fold_conv1d_weight(_get_weight(p), f, dilation).astype(x_f.dtype)
    pad = (wp.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x_f, wp, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"), precision=_prec(x_f))
    if "bias" in p:
        bf = p["bfold"] if "bfold" in p else jnp.tile(p["bias"], f)
        y = y + bf.astype(x_f.dtype)
    return y


def adain_1d_act_folded_apply(p, x_f: jnp.ndarray, s: jnp.ndarray, f: int,
                              n_valid_f: Optional[jnp.ndarray],
                              act: str = "none",
                              alpha: Optional[jnp.ndarray] = None,
                              slope: float = 0.2) -> jnp.ndarray:
    """adain_1d_act_apply on a folded tensor; stats/affine are per ORIGINAL
    channel. Every (B, T', f*C) elementwise op stays in the folded layout —
    the whole point of folding is full 128-lane tiles, so only the (B, f*C)
    REDUCED vectors are reshaped to (f, C) to merge phases; per-channel
    params are tiled f times instead. n_valid_f: (B,) valid folded rows."""
    b, tp, fc = x_f.shape
    c = fc // f
    h = linear_apply(p["fc"], s)  # (B, 2C)
    gamma, beta = jnp.split(h, 2, axis=-1)
    gamma = jnp.tile(gamma, (1, f))[:, None, :]  # (B, 1, FC)
    beta = jnp.tile(beta, (1, f))[:, None, :]

    def phase_merge(v):  # (B, FC) summed over T' -> per-channel, re-tiled
        return jnp.tile(v.reshape(b, f, c).sum(axis=1), (1, f))[:, None, :]

    xf = x_f.astype(jnp.float32)
    if n_valid_f is None:
        n = float(tp * f)
        mean = phase_merge(xf.sum(axis=1)) / n
        var = phase_merge(jnp.square(xf - mean).sum(axis=1)) / n
    else:
        m = (jnp.arange(tp)[None, :] < n_valid_f[:, None]).astype(
            jnp.float32)[:, :, None]  # (B, T', 1)
        n = jnp.maximum(n_valid_f.astype(jnp.float32) * f, 1.0)[:, None, None]
        mean = phase_merge((xf * m).sum(axis=1)) / n
        var = phase_merge((jnp.square(xf - mean) * m).sum(axis=1)) / n
    y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x_f.dtype)
    z = (1.0 + gamma) * y + beta
    if act == "snake":
        a = jnp.tile(alpha.reshape(1, c), (1, f)).reshape(
            1, 1, fc).astype(z.dtype)
        sn = jnp.sin(a * z)
        z = z + (1.0 / a) * (sn * sn)
    elif act == "lrelu":
        z = jnp.where(z >= 0, z, z * slope)
    if n_valid_f is not None:
        z = jnp.where(m > 0, z, 0.0)
    return z


def ada_layer_norm_init(key, style_dim: int, channels: int):
    """AdaLayerNorm (reference models.py:372-392)."""
    return {"fc": torch_linear_init(key, style_dim, channels * 2)}


def ada_layer_norm_apply(p, x: jnp.ndarray, s: jnp.ndarray,
                         eps: float = 1e-5) -> jnp.ndarray:
    """(1+gamma)*LN(x)+beta over channels; x (B, T, C)."""
    h = linear_apply(p["fc"], s)
    gamma, beta = jnp.split(h, 2, axis=-1)
    y = plain_layer_norm(x, eps)
    return (1.0 + gamma[:, None, :]) * y + beta[:, None, :]


def group_norm_init(channels: int):
    return {"weight": np.ones((channels,), np.float32),
            "bias": np.zeros((channels,), np.float32)}


def group_norm_apply(p, x: jnp.ndarray, num_groups: int,
                     eps: float = 1e-5) -> jnp.ndarray:
    """torch GroupNorm parity on channels-last (B, T, C): stats over (T, C/G)."""
    b, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, c)
    y = y * p["weight"] + p["bias"]
    return y.astype(x.dtype)


def batch_norm_init(channels: int):
    return {"weight": np.ones((channels,), np.float32),
            "bias": np.zeros((channels,), np.float32),
            "running_mean": np.zeros((channels,), np.float32),
            "running_var": np.ones((channels,), np.float32)}


def batch_norm_apply(p, x: jnp.ndarray, train: bool = False,
                     eps: float = 1e-5) -> jnp.ndarray:
    """BatchNorm on channels-last input of any rank; batch stats when train.

    Running-stat updates are handled by the train step (functional update);
    this returns the normalized output only (eval mode uses running stats,
    matching the reference's frozen JDC usage, JDC/model.py:20-37)."""
    if train:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=axes)
        var = ((xf - mean) ** 2).mean(axis=axes)
    else:
        mean = p["running_mean"]
        var = p["running_var"]
    scale = (p["weight"] * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    shift = (p["bias"] - p["weight"] * mean * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return x * scale + shift


# ---------------------------------------------------------------------------
# pooling / resizing
# ---------------------------------------------------------------------------


def avg_pool2d_floor(x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """F.avg_pool2d(x, k) floor-mode parity on (B, H, W, C)."""
    b, h, w, c = x.shape
    h2, w2 = (h // k) * k, (w // k) * k
    x = x[:, :h2, :w2, :]
    x = x.reshape(b, h2 // k, k, w2 // k, k, c)
    return x.mean(axis=(2, 4))


def upsample_nearest_1d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, T, C) nearest 2x (reference UpSample1d, models.py:315-324)."""
    return jnp.repeat(x, factor, axis=1)


# ---------------------------------------------------------------------------
# LSTM (torch parity, mask-aware scan)
# ---------------------------------------------------------------------------


def lstm_init(key, input_dim: int, hidden: int, bidirectional: bool = True):
    """torch.nn.LSTM default init: U(-1/sqrt(H), 1/sqrt(H)) on all params."""
    bound = 1.0 / math.sqrt(hidden)
    names = ["weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"]
    shapes = [(4 * hidden, input_dim), (4 * hidden, hidden),
              (4 * hidden,), (4 * hidden,)]
    if bidirectional:
        names += [n + "_reverse" for n in names]
        shapes = shapes * 2
    keys = jax.random.split(key, len(names))
    return {n: _uniform(k, sh, -bound, bound)
            for n, k, sh in zip(names, keys, shapes)}


def _lstm_scan(xw: jnp.ndarray, w_hh: jnp.ndarray, mask: jnp.ndarray,
               hidden: int) -> jnp.ndarray:
    """Scan a single direction. xw: (B, T, 4H) precomputed input projections
    (+biases); mask: (B, T) 1=valid. Returns h sequence (B, T, H).

    The masked carry update reproduces pack_padded_sequence semantics: the
    state freezes through padding, so for the reversed direction (padding at
    the *start* of the reversed sequence) the state is still the zero init
    when the valid region begins — exactly where torch starts it."""
    b = xw.shape[0]
    h0 = jnp.zeros((b, hidden), xw.dtype)
    c0 = jnp.zeros((b, hidden), jnp.float32)

    w_hh_t = w_hh.T.astype(xw.dtype)  # (H, 4H)

    def step(carry, inp):
        h_prev, c_prev = carry
        xw_t, m_t = inp
        gates = xw_t + jnp.matmul(h_prev, w_hh_t, precision=_prec(h_prev))
        gf = gates.astype(jnp.float32)
        i, f, g, o = jnp.split(gf, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c_prev + i * g
        h = (o * jnp.tanh(c)).astype(xw.dtype)
        m = m_t[:, None]
        h = jnp.where(m, h, h_prev)
        c = jnp.where(m, c, c_prev)
        return (h, c), h

    xs = (jnp.swapaxes(xw, 0, 1), jnp.swapaxes(mask, 0, 1).astype(bool))
    _, hs = jax.lax.scan(step, (h0, c0), xs, unroll=SCAN_UNROLL)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


def lstm_apply(p, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
               bidirectional: bool = True) -> jnp.ndarray:
    """torch.nn.LSTM(batch_first=True) parity with variable lengths.

    x: (B, T, In); mask: (B, T) 1=valid (None = all valid). Output (B, T, H)
    or (B, T, 2H); padded positions are zeroed (pad_packed_sequence parity).

    TPU latency note: the two directions run in ONE scan by stacking the
    reversed sequence on the batch axis — T sequential steps instead of 2T
    (the scan step count dominates inference latency, not its FLOPs)."""
    b, t, _ = x.shape
    hidden = p["weight_hh_l0"].shape[1]
    if mask is None:
        mask = jnp.ones((b, t), bool)

    def in_proj(suffix: str, xs: jnp.ndarray) -> jnp.ndarray:
        w_ih = p["weight_ih_l0" + suffix]
        bias = p["bias_ih_l0" + suffix] + p["bias_hh_l0" + suffix]
        xw = jnp.matmul(xs, w_ih.T.astype(xs.dtype), precision=_prec(xs))
        return xw + bias.astype(xs.dtype)

    if not bidirectional:
        h_fwd = _lstm_scan(in_proj("", x), p["weight_hh_l0"], mask, hidden)
        return jnp.where(mask[..., None], h_fwd, 0.0)

    # reverse each row within its valid length == flip the padded array and
    # flip back (padding moves to the front; the masked carry handles it).
    x_rev = jnp.flip(x, axis=1)
    m_rev = jnp.flip(mask, axis=1)
    xw = jnp.concatenate([in_proj("", x), in_proj("_reverse", x_rev)], axis=0)
    mm = jnp.concatenate([mask, m_rev], axis=0)
    # block-diagonal recurrent step: rows 0..b-1 use W_hh, rows b..2b-1 use
    # W_hh_reverse — one scan, fused gates matmul via stacked weights
    w_hh2 = jnp.stack([p["weight_hh_l0"], p["weight_hh_l0_reverse"]])
    hs = _lstm_scan_stacked(xw, w_hh2, mm, hidden, b)
    h_fwd = hs[:b]
    h_bwd = jnp.flip(hs[b:], axis=1)
    out = jnp.concatenate([h_fwd, h_bwd], axis=-1)
    return jnp.where(mask[..., None], out, 0.0)


def _lstm_scan_stacked(xw: jnp.ndarray, w_hh2: jnp.ndarray, mask: jnp.ndarray,
                       hidden: int, b: int) -> jnp.ndarray:
    """One scan for both directions: xw (2B, T, 4H), w_hh2 (2, H, 4H-in-T?)

    w_hh2: (2, 4H, H) torch-layout per direction. The recurrent matmul is
    einsum over per-direction weights (a (2, B, H) x (2, H, 4H) batch
    matmul — same MXU work as two separate scans, half the steps)."""
    h0 = jnp.zeros((xw.shape[0], hidden), xw.dtype)
    c0 = jnp.zeros((xw.shape[0], hidden), jnp.float32)
    w_t = jnp.swapaxes(w_hh2, 1, 2).astype(xw.dtype)  # (2, H, 4H)

    def step(carry, inp):
        h_prev, c_prev = carry
        xw_t, m_t = inp
        h2 = h_prev.reshape(2, b, hidden)
        gates = jnp.einsum("dbh,dhg->dbg", h2, w_t,
                           precision=_prec(h_prev)).reshape(2 * b, 4 * hidden)
        gates = xw_t + gates
        gf = gates.astype(jnp.float32)
        i, f, g, o = jnp.split(gf, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = (jax.nn.sigmoid(o) * jnp.tanh(c)).astype(xw.dtype)
        m = m_t[:, None]
        h = jnp.where(m, h, h_prev)
        c = jnp.where(m, c, c_prev)
        return (h, c), h

    xs = (jnp.swapaxes(xw, 0, 1), jnp.swapaxes(mask, 0, 1).astype(bool))
    _, hs = jax.lax.scan(step, (h0, c0), xs, unroll=SCAN_UNROLL)
    return jnp.swapaxes(hs, 0, 1)  # (2B, T, H)


def lstm_cell_init(key, input_dim: int, hidden: int):
    """torch.nn.LSTMCell param names."""
    bound = 1.0 / math.sqrt(hidden)
    keys = jax.random.split(key, 4)
    return {
        "weight_ih": _uniform(keys[0], (4 * hidden, input_dim), -bound, bound),
        "weight_hh": _uniform(keys[1], (4 * hidden, hidden), -bound, bound),
        "bias_ih": _uniform(keys[2], (4 * hidden,), -bound, bound),
        "bias_hh": _uniform(keys[3], (4 * hidden,), -bound, bound),
    }


def lstm_cell_apply(p, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """One LSTMCell step: x (B, In), h (B, H), c (B, H) -> (h', c')."""
    gates = (jnp.matmul(x, p["weight_ih"].T.astype(x.dtype), precision=_prec(x))
             + jnp.matmul(h, p["weight_hh"].T.astype(x.dtype), precision=_prec(x))
             + (p["bias_ih"] + p["bias_hh"]).astype(x.dtype))
    gf = gates.astype(jnp.float32)
    i, f, g, o = jnp.split(gf, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
    return h2.astype(x.dtype), c2


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------


def length_to_valid_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool, True where position < length.

    The complement of the reference's length_to_mask (utils.py:42-45)."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]
