"""Waveform discriminators: multi-period (MPD), multi-resolution spectrogram
(MSD), and the WavLM discriminator used by the SLM adversarial stage.

Parity: reference Modules/discriminators.py:11-187. Param trees mirror the
torch state_dicts; channels-last activations.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from styletts2_tpu.nn import layers as L
from styletts2_tpu.ops import stft as OPS

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------------------
# DiscriminatorP (reference discriminators.py:96-129)
# ---------------------------------------------------------------------------

_MPD_CHANNELS = [1, 32, 128, 512, 1024, 1024]


def _disc_p_init(key, kernel_size: int = 5):
    keys = jax.random.split(key, 6)
    p = {"convs": {}}
    for i in range(5):
        p["convs"][str(i)] = L.conv2d_init(
            keys[i], _MPD_CHANNELS[i], _MPD_CHANNELS[i + 1],
            (kernel_size, 1), weight_norm=True)
    p["conv_post"] = L.conv2d_init(keys[5], 1024, 1, (3, 1), weight_norm=True)
    return p


def _disc_p_apply(p, wav: jnp.ndarray, period: int,
                  kernel_size: int = 5, stride: int = 3
                  ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """wav: (B, T, 1). Reflect-pad T to a multiple of `period`, fold to 2-D
    (T/p, p), run the (k,1)-conv stack."""
    b, t, _ = wav.shape
    if t % period != 0:
        # torch F.pad(..., "reflect") mirrors about the last sample,
        # EXCLUDING it: [a b c d] -> [a b c d c b] (reference
        # discriminators.py:117) — not symmetric [.. d c]
        n_pad = period - (t % period)
        wav = jnp.concatenate(
            [wav, jnp.flip(wav[:, t - n_pad - 1: t - 1, :], axis=1)], axis=1)
        t = t + n_pad
    x = wav.reshape(b, t // period, period, 1)  # (B, H=T/p, W=p, C=1)
    fmap = []
    for i in range(5):
        s = stride if i < 4 else 1
        pad = (kernel_size - 1) // 2 if i < 4 else 2
        x = L.conv2d_apply(p["convs"][str(i)], x, stride=(s, 1),
                           padding=(pad, 0))
        x = L.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = L.conv2d_apply(p["conv_post"], x, padding=(1, 0))
    fmap.append(x)
    return x.reshape(b, -1), fmap


MPD_PERIODS = (2, 3, 5, 7, 11)


def mpd_init(key):
    keys = jax.random.split(key, len(MPD_PERIODS))
    return {"discriminators": {str(i): _disc_p_init(k)
                               for i, k in enumerate(keys)}}


def mpd_apply(p, y: jnp.ndarray, y_hat: jnp.ndarray):
    """y, y_hat: (B, T, 1) -> (real logits, fake logits, real fmaps, fake
    fmaps), reference discriminators.py:143-156."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for i, period in enumerate(MPD_PERIODS):
        d = p["discriminators"][str(i)]
        r, fr = _disc_p_apply(d, y, period)
        g, fg = _disc_p_apply(d, y_hat, period)
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# SpecDiscriminator / MultiResSpecDiscriminator (reference 29-93)
# ---------------------------------------------------------------------------

MSD_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def _spec_d_init(key):
    keys = jax.random.split(key, 6)
    p = {"discriminators": {}}
    shapes = [(1, 32), (32, 32), (32, 32), (32, 32), (32, 32)]
    for i, (ci, co) in enumerate(shapes):
        k = (3, 9) if i < 4 else (3, 3)
        p["discriminators"][str(i)] = L.conv2d_init(keys[i], ci, co, k,
                                                    weight_norm=True)
    p["out"] = L.conv2d_init(keys[5], 32, 1, (3, 3), weight_norm=True)
    return p


def _spec_d_apply(p, wav: jnp.ndarray, fft_size: int, hop: int, win: int
                  ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """wav: (B, T). STFT magnitude -> (B, frames, freq, 1) conv stack.

    The reference's stft helper (discriminators.py:11-27) returns
    |STFT| transposed to (B, frames, freq)."""
    mag = jnp.sqrt(OPS.stft_power(wav.astype(jnp.float32), fft_size, hop, win)
                   + 1e-14)
    x = jnp.swapaxes(mag, 1, 2)[..., None].astype(wav.dtype)
    fmap = []
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    for i in range(5):
        pad = (1, 4) if i < 4 else (1, 1)
        x = L.conv2d_apply(p["discriminators"][str(i)], x,
                           stride=strides[i], padding=pad)
        x = L.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = L.conv2d_apply(p["out"], x, padding=(1, 1))
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def msd_init(key):
    keys = jax.random.split(key, 3)
    return {"discriminators": {str(i): _spec_d_init(k)
                               for i, k in enumerate(keys)}}


def msd_apply(p, y: jnp.ndarray, y_hat: jnp.ndarray):
    """y, y_hat: (B, T, 1)."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for i, (fft, hop, win) in enumerate(MSD_RESOLUTIONS):
        d = p["discriminators"][str(i)]
        r, fr = _spec_d_apply(d, y[..., 0], fft, hop, win)
        g, fg = _spec_d_apply(d, y_hat[..., 0], fft, hop, win)
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# WavLM discriminator (reference discriminators.py:158-187) — the SLM
# adversarial head. The WavLM backbone itself is supplied by the caller
# (see nn/slm.py); this is the conv head over stacked hidden states.
# ---------------------------------------------------------------------------


def wavlm_d_init(key, slm_hidden: int = 768, slm_layers: int = 13,
                 initial_channel: int = 64):
    keys = jax.random.split(key, 5)
    c = initial_channel
    return {
        "pre": L.conv1d_init(keys[0], slm_hidden * slm_layers, c, 1,
                             weight_norm=True),
        "convs": {"0": L.conv1d_init(keys[1], c, c * 2, 5, weight_norm=True),
                  "1": L.conv1d_init(keys[2], c * 2, c * 4, 5, weight_norm=True),
                  "2": L.conv1d_init(keys[3], c * 4, c * 4, 5, weight_norm=True)},
        "conv_post": L.conv1d_init(keys[4], c * 4, 1, 3, weight_norm=True),
    }


def wavlm_d_apply(p, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, slm_hidden*slm_layers) stacked WavLM hidden states."""
    x = L.conv1d_apply(p["pre"], x)
    for i in range(3):
        x = L.conv1d_apply(p["convs"][str(i)], x, padding=2)
        x = L.leaky_relu(x, LRELU_SLOPE)
    x = L.conv1d_apply(p["conv_post"], x, padding=1)
    return x.reshape(x.shape[0], -1)
