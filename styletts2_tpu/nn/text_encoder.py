"""TextEncoder: embedding -> 3x(conv+LN+lrelu+dropout) -> BiLSTM.

Parity: reference models.py:238-299 (param tree mirrors its state_dict:
embedding.weight, cnn.{i}.0.*, cnn.{i}.1.{gamma,beta}, lstm.*).

Channels-last: tokens (B, T) -> features (B, T, C). The reference's
pack_padded_sequence is replaced by the mask-aware scan BiLSTM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from styletts2_tpu.nn import layers as L


def init(key, channels: int = 512, kernel_size: int = 5, depth: int = 3,
         n_symbols: int = 178):
    keys = jax.random.split(key, depth + 2)
    p = {
        "embedding": {"weight": L._normal(keys[0], (n_symbols, channels))},
        "cnn": {},
        "lstm": L.lstm_init(keys[1], channels, channels // 2, bidirectional=True),
    }
    for i in range(depth):
        p["cnn"][str(i)] = {
            "0": L.conv1d_init(keys[2 + i], channels, channels, kernel_size,
                               weight_norm=True),
            "1": L.layer_norm_init(channels),
        }
    return p


def apply(p, tokens: jnp.ndarray, mask: jnp.ndarray,
          kernel_size: int = 5, train: bool = False, rng=None) -> jnp.ndarray:
    """tokens: (B, T) int ids; mask: (B, T) True=valid.

    Returns (B, T, C), zero at padded positions (reference returns (B, C, T);
    transpose-equivalent)."""
    pad = (kernel_size - 1) // 2
    x = L.embedding_apply(p["embedding"], tokens)  # (B, T, C)
    m = mask[..., None]
    x = jnp.where(m, x, 0.0)
    n_layers = len(p["cnn"])
    rngs = jax.random.split(rng, n_layers) if rng is not None else [None] * n_layers
    for i in range(n_layers):
        blk = p["cnn"][str(i)]
        x = L.conv1d_apply(blk["0"], x, padding=pad)
        x = L.layer_norm_apply(blk["1"], x)
        x = L.leaky_relu(x, 0.2)
        x = L.dropout(x, 0.2, train, rngs[i])
        x = jnp.where(m, x, 0.0)
    x = L.lstm_apply(p["lstm"], x, mask)
    return jnp.where(m, x, 0.0)
