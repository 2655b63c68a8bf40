"""JDC pitch extractor: CRNN F0 estimator (Kum et al. 2019).

Parity: reference Modules/JDC/model.py:10-190 (JDCNet + ResBlock), used as a
frozen ground-truth F0 source in training (reference train.py:260-261).
Param tree mirrors the torch state_dict. Runs in eval mode (running BN
stats); it is never trained in the reference pipeline.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from styletts2_tpu.nn import layers as L


def _res_block_init(key, in_ch: int, out_ch: int):
    keys = jax.random.split(key, 3)
    p = {
        "pre_conv": {"0": L.batch_norm_init(in_ch)},
        "conv": {"0": L.conv2d_init(keys[0], in_ch, out_ch, (3, 3), bias=False),
                 "1": L.batch_norm_init(out_ch),
                 "3": L.conv2d_init(keys[1], out_ch, out_ch, (3, 3), bias=False)},
    }
    if in_ch != out_ch:
        p["conv1by1"] = L.conv2d_init(keys[2], in_ch, out_ch, (1, 1), bias=False)
    return p


def _res_block_apply(p, x: jnp.ndarray, slope: float = 0.01) -> jnp.ndarray:
    """x: (B, T, Fmel, C). Downsamples the mel axis by max-pool 2."""
    h = L.batch_norm_apply(p["pre_conv"]["0"], x)
    h = L.leaky_relu(h, slope)
    # MaxPool2d((1, 2)) on (B, C, T, F): pool the F axis
    b, t, f, c = h.shape
    h = h[:, :, : (f // 2) * 2, :].reshape(b, t, f // 2, 2, c).max(axis=3)
    res = h
    y = L.conv2d_apply(p["conv"]["0"], h, padding=(1, 1))
    y = L.batch_norm_apply(p["conv"]["1"], y)
    y = L.leaky_relu(y, slope)
    y = L.conv2d_apply(p["conv"]["3"], y, padding=(1, 1))
    if "conv1by1" in p:
        return y + L.conv2d_apply(p["conv1by1"], res)
    return y + res


def init(key, num_class: int = 1, leaky_relu_slope: float = 0.01):
    keys = jax.random.split(key, 10)
    return {
        "conv_block": {"0": L.conv2d_init(keys[0], 1, 64, (3, 3), bias=False),
                       "1": L.batch_norm_init(64),
                       "3": L.conv2d_init(keys[1], 64, 64, (3, 3), bias=False)},
        "res_block1": _res_block_init(keys[2], 64, 128),
        "res_block2": _res_block_init(keys[3], 128, 192),
        "res_block3": _res_block_init(keys[4], 192, 256),
        "pool_block": {"0": L.batch_norm_init(256)},
        "bilstm_classifier": L.lstm_init(keys[5], 512, 256, bidirectional=True),
        "classifier": L.torch_linear_init(keys[6], 512, num_class),
        # auxiliary voicing-detector branch: dead in this pipeline's forward
        # (reference JDC/model.py:102-137 uses only the classifier branch)
        # but present in the reference module/checkpoints (model.py:48-69),
        # kept for checkpoint and parameter-budget parity.
        "detector_conv": {"0": L.conv2d_init(keys[7], 640, 256, (1, 1),
                                             bias=False),
                          "1": L.batch_norm_init(256)},
        "bilstm_detector": L.lstm_init(keys[8], 512, 256, bidirectional=True),
        "detector": L.torch_linear_init(keys[9], 512, 2),
    }


def forward(p, mel_norm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mel_norm: (B, n_mels=80, T) normalized log-mel.

    Returns (F0 (B, T), gan_feature) — reference JDC/model.py:102-137
    (abs of the classifier output; num_class=1 regression config)."""
    slope = 0.01
    x = jnp.swapaxes(mel_norm, 1, 2)[..., None]  # (B, T, 80, 1)
    h = L.conv2d_apply(p["conv_block"]["0"], x, padding=(1, 1))
    h = L.batch_norm_apply(p["conv_block"]["1"], h)
    h = L.leaky_relu(h, slope)
    h = L.conv2d_apply(p["conv_block"]["3"], h, padding=(1, 1))

    h = _res_block_apply(p["res_block1"], h)   # mel 80 -> 40
    h = _res_block_apply(p["res_block2"], h)   # 40 -> 20
    h = _res_block_apply(p["res_block3"], h)   # 20 -> 10

    h = L.batch_norm_apply(p["pool_block"]["0"], h)
    h = L.leaky_relu(h, slope)
    gan_feature = h
    # MaxPool2d((1, 4)) on the mel axis: 10 -> 2
    b, t, f, c = h.shape
    h = h[:, :, : (f // 4) * 4, :].reshape(b, t, f // 4, 4, c).max(axis=3)

    # (B, C=256, T, 2) -> (B, T, 512): torch permutes to (B, T, C, 2) then
    # flattens; channels-last here is (B, T, 2, C) so transpose first.
    h = jnp.swapaxes(h, 2, 3).reshape(b, t, 512)
    h = L.lstm_apply(p["bilstm_classifier"], h)
    out = L.linear_apply(p["classifier"], h)  # (B, T, 1)
    return jnp.abs(out[..., 0]), gan_feature
