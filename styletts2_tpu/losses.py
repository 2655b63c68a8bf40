"""Loss library: multi-resolution mel STFT, LSGAN, feature matching, TPRLS.

Parity: reference losses.py:7-190. Notes preserved from the reference:
* the "STFT" loss is actually mel-domain (torchaudio MelSpectrogram with the
  default 128 mels) with the frontend's log normalization (losses.py:33-55);
* torch.median is the *lower* median — reproduced here (jnp.median would
  average the middle pair);
* the WavLM (SLM) loss takes an embedder callable so the backbone can be any
  local WavLM implementation (reference losses.py:193-252 downloads it from
  the hub; this environment has no egress).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from styletts2_tpu.nn import discriminators as DISC
from styletts2_tpu.ops import stft as OPS

MRSTFT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def _norm_mel(x: jnp.ndarray, fft: int, hop: int, win: int) -> jnp.ndarray:
    # auto-selects the fused Pallas kernel on TPU (6 of these per train step)
    return OPS.preprocess_wave(x, sr=24000, n_fft=fft, win_length=win,
                               hop_length=hop, n_mels=128)


def multi_resolution_stft_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Spectral-convergence L1 over 3 mel resolutions (losses.py:24-94).

    x, y: (B, T) waveforms. Returns the mean over resolutions of
    ||y_mag - x_mag||_1 / ||y_mag||_1."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    total = 0.0
    for fft, hop, win in MRSTFT_RESOLUTIONS:
        x_mag = _norm_mel(x, fft, hop, win)
        y_mag = _norm_mel(y, fft, hop, win)
        sc = jnp.abs(y_mag - x_mag).sum() / jnp.abs(y_mag).sum()
        total = total + sc
    return total / len(MRSTFT_RESOLUTIONS)


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """2 * sum of mean |real - fake| feature maps (losses.py:97-103)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl.astype(jnp.float32)
                                           - gl.astype(jnp.float32)))
    return loss * 2.0


def generator_adv_loss(disc_outputs) -> jnp.ndarray:
    """LSGAN generator loss: sum mean((1-dg)^2) (losses.py:120-128)."""
    loss = 0.0
    for dg in disc_outputs:
        loss = loss + jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
    return loss


def discriminator_adv_loss(disc_real, disc_fake) -> jnp.ndarray:
    """LSGAN discriminator loss (losses.py:106-117)."""
    loss = 0.0
    for dr, dg in zip(disc_real, disc_fake):
        loss = loss + jnp.mean(jnp.square(1.0 - dr.astype(jnp.float32)))
        loss = loss + jnp.mean(jnp.square(dg.astype(jnp.float32)))
    return loss


def _lower_median(x: jnp.ndarray) -> jnp.ndarray:
    """torch.median parity: element at index (n-1)//2 of the sorted values."""
    flat = jnp.sort(x.reshape(-1))
    return flat[(flat.shape[0] - 1) // 2]


def _tprls_term(dr: jnp.ndarray, dg: jnp.ndarray, tau: float = 0.04) -> jnp.ndarray:
    """Relativistic median loss (losses.py:131-147, TPRLS paper)."""
    dr = dr.astype(jnp.float32)
    dg = dg.astype(jnp.float32)
    diff = dr - dg
    m = _lower_median(diff)
    sel = dr < dg + m
    cnt = jnp.maximum(sel.sum(), 1)
    l_rel = jnp.where(sel, jnp.square(diff - m), 0.0).sum() / cnt
    return tau - jax.nn.relu(tau - l_rel)


def discriminator_tprls_loss(disc_real, disc_fake) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(disc_real, disc_fake):
        loss = loss + _tprls_term(dr, dg)
    return loss


def generator_tprls_loss(disc_real, disc_fake) -> jnp.ndarray:
    """The reference's generator_TPRLS_loss swaps the zip binding
    (losses.py:140-147: `for dg, dr in zip(real, generated)`), so its
    formula effectively runs with dr=generated, dg=real — selecting and
    penalizing the opposite tail of the (dr-dg) distribution around the
    median relative to the discriminator version. NOT the same expression;
    reproduce the swapped binding."""
    loss = 0.0
    for dr, dg in zip(disc_real, disc_fake):
        loss = loss + _tprls_term(dg, dr)
    return loss


def generator_loss(mpd_params, msd_params, y: jnp.ndarray,
                   y_hat: jnp.ndarray) -> jnp.ndarray:
    """GeneratorLoss wrapper (losses.py:149-168): adv + feature-matching +
    TPRLS over MPD and MSD. y, y_hat: (B, T, 1)."""
    y_df_r, y_df_g, fmap_f_r, fmap_f_g = DISC.mpd_apply(mpd_params, y, y_hat)
    y_ds_r, y_ds_g, fmap_s_r, fmap_s_g = DISC.msd_apply(msd_params, y, y_hat)
    loss = (generator_adv_loss(y_df_g) + generator_adv_loss(y_ds_g)
            + feature_loss(fmap_f_r, fmap_f_g)
            + feature_loss(fmap_s_r, fmap_s_g)
            + generator_tprls_loss(y_df_r, y_df_g)
            + generator_tprls_loss(y_ds_r, y_ds_g))
    return loss


def discriminator_loss(mpd_params, msd_params, y: jnp.ndarray,
                       y_hat: jnp.ndarray) -> jnp.ndarray:
    """DiscriminatorLoss wrapper (losses.py:170-190)."""
    y_df_r, y_df_g, _, _ = DISC.mpd_apply(mpd_params, y, y_hat)
    y_ds_r, y_ds_g, _, _ = DISC.msd_apply(msd_params, y, y_hat)
    loss = (discriminator_adv_loss(y_df_r, y_df_g)
            + discriminator_adv_loss(y_ds_r, y_ds_g)
            + discriminator_tprls_loss(y_df_r, y_df_g)
            + discriminator_tprls_loss(y_ds_r, y_ds_g))
    return loss


# ---------------------------------------------------------------------------
# SLM (WavLM) adversarial loss head — upstream StyleTTS2 capability
# (reference losses.py:193-252 + Modules/slmadv.py; dead code in the lite
# train loop but part of the reference's surface).
# ---------------------------------------------------------------------------


class WavLMLoss:
    """SLM feature/adversarial losses over a caller-supplied embedder.

    embedder(wav_16k: (B, T)) -> list of hidden states [(B, L, H), ...]
    (13 layers of 768 for wavlm-base-plus). The reference resamples
    24k -> 16k (losses.py:199); pass `resample=True` for that behavior.
    """

    def __init__(self, embedder: Callable, wd_params=None,
                 model_sr: int = 24000, slm_sr: int = 16000):
        self.embedder = embedder
        self.wd_params = wd_params
        self.model_sr = model_sr
        self.slm_sr = slm_sr

    def _resample(self, wav: jnp.ndarray) -> jnp.ndarray:
        out_len = int(wav.shape[-1] * self.slm_sr / self.model_sr)
        return OPS.interpolate_linear(wav, out_len)

    def _stack(self, hiddens) -> jnp.ndarray:
        # [B, L, H] x n -> (B, L, n*H) matching the reference's
        # stack(dim=1).transpose(-1,-2).flatten(1,2) layout (losses.py:217)
        return jnp.concatenate(list(hiddens), axis=-1)

    def forward(self, wav: jnp.ndarray, y_rec: jnp.ndarray) -> jnp.ndarray:
        """Mean |wavlm(wav) - wavlm(y_rec)| over layers (losses.py:201-212)."""
        er = self.embedder(jax.lax.stop_gradient(self._resample(wav)))
        eg = self.embedder(self._resample(y_rec))
        loss = 0.0
        for r, g in zip(er, eg):
            loss = loss + jnp.mean(jnp.abs(r - g))
        return loss

    def generator(self, y_rec: jnp.ndarray, wd_params=None) -> jnp.ndarray:
        """LSGAN generator loss through the (frozen) WavLM embeddings
        (losses.py:214-219). wd_params overrides the constructor's head
        params so the train step can thread updated values functionally."""
        eg = self._stack(self.embedder(self._resample(y_rec)))
        d_out = DISC.wavlm_d_apply(wd_params if wd_params is not None
                                   else self.wd_params, eg)
        return jnp.mean(jnp.square(1.0 - d_out))

    def discriminator(self, wav: jnp.ndarray, y_rec: jnp.ndarray,
                      wd_params=None) -> jnp.ndarray:
        """LSGAN discriminator loss on (real, synthesized) WavLM embeddings
        (losses.py:221-233)."""
        wd = wd_params if wd_params is not None else self.wd_params
        er = self._stack(self.embedder(jax.lax.stop_gradient(
            self._resample(wav))))
        eg = self._stack(self.embedder(jax.lax.stop_gradient(
            self._resample(y_rec))))
        d_r = DISC.wavlm_d_apply(wd, er)
        d_g = DISC.wavlm_d_apply(wd, eg)
        return jnp.mean(jnp.square(1.0 - d_r)) + jnp.mean(jnp.square(d_g))
