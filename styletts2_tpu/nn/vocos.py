"""Vocos generator: constant-resolution ConvNeXt stack + iSTFT head.

Parity: reference Modules/vocos.py:27-305 (ConvNeXtBlock, Generator,
ISTFTHead, custom ISTFT with 'same' padding).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu.config import DecoderConfig
from styletts2_tpu.nn import layers as L
from styletts2_tpu.ops import stft as OPS


def convnext_block_init(key, dim: int, intermediate_dim: int,
                        layer_scale_init_value: float, style_dim: int):
    keys = jax.random.split(key, 4)
    return {
        "dwconv": L.conv1d_init(keys[0], dim, dim, 7, groups=dim),
        "norm": L.adain_1d_init(keys[1], style_dim, dim),
        "pwconv1": L.torch_linear_init(keys[2], dim, intermediate_dim),
        "pwconv2": L.torch_linear_init(keys[3], intermediate_dim, dim),
        "gamma": np.full((dim,), layer_scale_init_value, np.float32),
    }


def convnext_block_apply(p, x: jnp.ndarray, s: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, T, C). dwconv k7 -> AdaIN -> pw MLP w/ GELU -> layer scale + res.

    Parity: reference vocos.py:27-69."""
    residual = x
    if mask is not None:
        x = jnp.where(mask[..., None], x, 0.0)
    h = L.conv1d_apply(p["dwconv"], x, padding=3, groups=x.shape[-1])
    h = L.adain_1d_apply(p["norm"], h, s, mask)
    h = L.linear_apply(p["pwconv1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = L.linear_apply(p["pwconv2"], h)
    h = p["gamma"].astype(h.dtype) * h
    return residual + h


def vocos_generator_init(key, cfg: DecoderConfig, style_dim: int = 128,
                         dim: int = 512):
    n = cfg.num_layers
    lsiv = 1.0 / n
    keys = jax.random.split(key, n + 2)
    p = {"convnext": {str(i): convnext_block_init(keys[i], dim,
                                                  cfg.intermediate_dim, lsiv,
                                                  style_dim)
                      for i in range(n)},
         "final_layer_norm": {"weight": np.ones((dim,), np.float32),
                              "bias": np.zeros((dim,), np.float32)},
         "stft": {"out": L.torch_linear_init(keys[n], dim,
                                             cfg.gen_istft_n_fft + 2)}}
    return p


def vocos_generator_apply(p, x: jnp.ndarray, s: jnp.ndarray,
                          cfg: DecoderConfig,
                          frame_mask: Optional[jnp.ndarray] = None,
                          seq_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, T, C) at mel rate -> wav (B, T*hop, 1).

    seq_mask: optional (B, T) in-sequence mask for sequence-parallel
    windows (parallel/seqpar.py): frame slots outside the global sequence
    must not contribute audio or window envelope to the iSTFT overlap-add
    (a single-device tensor has no such slots). Distinct from frame_mask,
    whose invalid-but-in-sequence pad slots DO contribute on one device.

    Parity: reference vocos.py:157-162 + ISTFTHead 271-296."""
    n_fft = cfg.gen_istft_n_fft
    hop = cfg.gen_istft_hop_size
    for i in range(len(p["convnext"])):
        x = convnext_block_apply(p["convnext"][str(i)], x, s, frame_mask)
    x = L.plain_layer_norm(x, 1e-6, p["final_layer_norm"]["weight"],
                           p["final_layer_norm"]["bias"])
    h = L.linear_apply(p["stft"]["out"], x).astype(jnp.float32)  # (B, T, n_fft+2)
    h = jnp.swapaxes(h, 1, 2)
    mag, phase = jnp.split(h, 2, axis=1)
    mag = jnp.minimum(jnp.exp(mag), 1e2)
    real = mag * jnp.cos(phase)
    imag = mag * jnp.sin(phase)
    wav = OPS.istft_vocos(real, imag, n_fft, hop, n_fft,
                          frame_valid=seq_mask)  # (B, L)
    return wav[..., None]
