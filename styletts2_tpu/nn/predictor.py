"""ProsodyPredictor: DurationEncoder (BiLSTM+AdaLayerNorm stack), duration
head, and style-conditioned F0/energy heads.

Parity: reference models.py:394-533. Param tree mirrors the torch
state_dict: text_encoder.lstms.{0,2,4} (BiLSTMs), text_encoder.lstms.{1,3,5}
(AdaLayerNorms), lstm.*, duration_proj.linear_layer.*, shared.*,
F0.{0,1,2}.*, N.{0,1,2}.*, F0_proj.*, N_proj.*.

All activations channels-last (B, T, C).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from styletts2_tpu.nn import layers as L
from styletts2_tpu.nn import blocks as B


def init(key, style_dim: int = 128, d_hid: int = 512, nlayers: int = 3,
         max_dur: int = 50):
    keys = jax.random.split(key, 17)
    p = {"text_encoder": {"lstms": {}}}
    for i in range(nlayers):
        p["text_encoder"]["lstms"][str(2 * i)] = L.lstm_init(
            keys[i], d_hid + style_dim, d_hid // 2)
        p["text_encoder"]["lstms"][str(2 * i + 1)] = L.ada_layer_norm_init(
            keys[3 + i], style_dim, d_hid)
    p["lstm"] = L.lstm_init(keys[6], d_hid + style_dim, d_hid // 2)
    p["duration_proj"] = {"linear_layer": L.linear_init(keys[7], d_hid, max_dur)}
    p["shared"] = L.lstm_init(keys[8], d_hid + style_dim, d_hid // 2)
    for name, base in (("F0", 9), ("N", 12)):
        p[name] = {
            "0": B.adain_res_blk1d_init(keys[base], d_hid, d_hid, style_dim),
            "1": B.adain_res_blk1d_init(keys[base + 1], d_hid, d_hid // 2,
                                        style_dim, upsample=True),
            "2": B.adain_res_blk1d_init(keys[base + 2], d_hid // 2, d_hid // 2,
                                        style_dim),
        }
    p["F0_proj"] = L.conv1d_init(keys[15], d_hid // 2, 1, 1)
    p["N_proj"] = L.conv1d_init(keys[16], d_hid // 2, 1, 1)
    return p


def encode_duration(p, t_en: jnp.ndarray, s: jnp.ndarray, mask: jnp.ndarray,
                    dropout: float = 0.2, train: bool = False,
                    rng=None) -> jnp.ndarray:
    """DurationEncoder (reference models.py:468-520).

    t_en: (B, T, C); s: (B, style); mask: (B, T) True=valid.
    Returns (B, T, C + style): BiLSTM+AdaLN stack with style re-concat."""
    lstms = p["text_encoder"]["lstms"]
    nblocks = len(lstms)
    m = mask[..., None]
    s_seq = jnp.broadcast_to(s[:, None, :], (t_en.shape[0], t_en.shape[1],
                                             s.shape[-1])).astype(t_en.dtype)
    x = jnp.concatenate([t_en, s_seq], axis=-1)
    x = jnp.where(m, x, 0.0)
    rngs = jax.random.split(rng, nblocks) if rng is not None else [None] * nblocks
    for i in range(nblocks):
        blk = lstms[str(i)]
        if i % 2 == 0:  # BiLSTM
            x = L.lstm_apply(blk, x, mask)
            x = L.dropout(x, dropout, train, rngs[i])
        else:  # AdaLayerNorm over the d_hid channels, then re-concat style
            x = L.ada_layer_norm_apply(blk, x, s)
            x = jnp.concatenate([x, s_seq], axis=-1)
            x = jnp.where(m, x, 0.0)
    return x


def duration_head(p, d: jnp.ndarray, mask: jnp.ndarray,
                  train: bool = False, rng=None) -> jnp.ndarray:
    """BiLSTM + duration projection (reference models.py:426-442).

    d: (B, T, C+style) from encode_duration. Returns logits (B, T, max_dur).
    """
    x = L.lstm_apply(p["lstm"], d, mask)
    x = L.dropout(x, 0.5, train, rng)
    return L.linear_apply(p["duration_proj"]["linear_layer"], x)


def forward(p, t_en: jnp.ndarray, s: jnp.ndarray, mask: jnp.ndarray,
            alignment: jnp.ndarray, dropout: float = 0.2,
            train: bool = False, rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training forward (reference models.py:422-446).

    alignment: (B, T_text, F). Returns (duration logits (B, T, max_dur),
    prosody features en (B, F, C+style))."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    d = encode_duration(p, t_en, s, mask, dropout, train, r1)
    duration = duration_head(p, d, mask, train, r2)
    en = jnp.matmul(jnp.swapaxes(alignment, 1, 2), d,
                    precision=L._prec(d))  # (B, F, C+style)
    return duration, en


def f0n_train(p, en: jnp.ndarray, s: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None,
              out_mask: Optional[jnp.ndarray] = None,
              dropout: float = 0.2, train: bool = False,
              rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """F0Ntrain (reference models.py:448-461).

    en: (B, F, C+style) prosody features; returns (F0, N) each (B, 2F)
    (the middle block upsamples 2x). mask at rate F, out_mask at rate 2F.
    """
    x = L.lstm_apply(p["shared"], en, mask)
    rngs = jax.random.split(rng, 6) if rng is not None else [None] * 6
    outs = []
    for bi, name in enumerate(("F0", "N")):
        h = x
        h = B.adain_res_blk1d_apply(p[name]["0"], h, s, mask=mask,
                                    dropout_p=dropout, train=train,
                                    rng=rngs[3 * bi])
        h = B.adain_res_blk1d_apply(p[name]["1"], h, s, upsample=True,
                                    mask=mask, out_mask=out_mask,
                                    dropout_p=dropout, train=train,
                                    rng=rngs[3 * bi + 1])
        h = B.adain_res_blk1d_apply(p[name]["2"], h, s, mask=out_mask,
                                    dropout_p=dropout, train=train,
                                    rng=rngs[3 * bi + 2])
        h = L.conv1d_apply(p[name + "_proj"], h)  # (B, 2F, 1)
        outs.append(h[..., 0])
    return outs[0], outs[1]
