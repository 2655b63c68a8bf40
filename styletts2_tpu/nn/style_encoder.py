"""StyleEncoder: mel -> conv -> 4x ResBlk('half') -> conv5x5 -> GAP -> linear.

Parity: reference models.py:125-150 (state_dict paths shared.{0,1..4,6}.*,
unshared.*). Input is the normalized log-mel (B, n_mels, T) as the reference
feeds it (with a singleton channel); channels-last here: (B, H=mel, W=T, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from styletts2_tpu.nn import layers as L
from styletts2_tpu.nn import blocks as B


def init(key, dim_in: int = 64, style_dim: int = 128, max_conv_dim: int = 512):
    keys = jax.random.split(key, 8)
    p = {"shared": {"0": L.conv2d_init(keys[0], 1, dim_in, (3, 3))},
         "unshared": L.torch_linear_init(keys[7], max_conv_dim, style_dim)}
    d = dim_in
    for i in range(4):
        d_out = min(d * 2, max_conv_dim)
        p["shared"][str(1 + i)] = B.res_blk2d_init(keys[1 + i], d, d_out, "half")
        d = d_out
    p["shared"]["6"] = L.conv2d_init(keys[5], d, d, (5, 5))
    return p


def apply(p, mel: jnp.ndarray) -> jnp.ndarray:
    """mel: (B, n_mels, T) normalized log-mel -> style (B, style_dim).

    T must be >= 66 frames (~0.8 s): four 'half' downsamples then a 5x5
    VALID conv need ceil(T/16) >= 5, or the global pool averages an empty
    tensor (NaN). The reference has the same constraint; its data pipeline
    guarantees it by padding 0.5 s of silence on each side
    (meldataset.py:111).

    No masking: the reference computes styles on exact-length (or batch
    zero-padded) mels (train.py:228, inference.py:203-220); we keep identical
    semantics and compute styles on exact-length inputs host-side."""
    x = mel[..., None]  # (B, H, W, 1)
    x = L.conv2d_apply(p["shared"]["0"], x, padding=(1, 1))
    for i in range(4):
        x = B.res_blk2d_apply(p["shared"][str(1 + i)], x, "half")
    x = L.leaky_relu(x, 0.2)
    x = L.conv2d_apply(p["shared"]["6"], x)  # 5x5 VALID
    x = x.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1)
    x = L.leaky_relu(x, 0.2)
    return L.linear_apply(p["unshared"], x)
