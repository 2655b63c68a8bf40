"""SLM (speech-language-model) adversarial training stage.

Parity target: reference Modules/slmadv.py:5-170 — the upstream StyleTTS2
capability the lite fork keeps on disk but never calls (verified dead code,
SURVEY 2.19). Here it is a first-class, static-shape trainer component:

* differentiable duration modeling: instead of hard rounded durations, a
  gaussian (sigma=1.5) soft alignment is built around the cumulative
  duration centers so gradients flow from the SLM discriminator back into
  the duration predictor (slmadv.py:36-55);
* the per-sample python loop + conv1d-with-per-token-kernels construction
  becomes one vectorized masked softmax over (token, frame) distances;
* the WavLM backbone is injected as a callable (no-egress environment), the
  discriminator head is nn/discriminators.wavlm_d_*.

The lite fork's ref_s is 128-dim (no diffusion style split), so the same
style vector conditions both predictor and decoder — the natural lite
adaptation of slmadv.py:23-24.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from styletts2_tpu.nn import layers as L
from styletts2_tpu.nn import predictor as PR
from styletts2_tpu.nn import text_encoder as TE
from styletts2_tpu.nn import decoder as DE
from styletts2_tpu import losses as LO


def soft_alignment_from_durations(dur_logits: jnp.ndarray,
                                  text_mask: jnp.ndarray, n_frames: int,
                                  sig: float = 1.5) -> jnp.ndarray:
    """Differentiable alignment (slmadv.py:36-55), vectorized.

    dur_logits: (B, T, max_dur); text_mask: (B, T) True=valid.
    Returns (B, T, n_frames): softmax over tokens of a gaussian centered at
    each token's cumulative-duration midpoint."""
    probs = jax.nn.sigmoid(dur_logits.astype(jnp.float32))
    dur = (probs.sum(axis=-1)) * text_mask  # (B, T)
    ends = jnp.cumsum(dur, axis=1)
    centers = ends - dur / 2.0  # (B, T)
    t = jnp.arange(n_frames, dtype=jnp.float32)[None, None, :]
    logits = -0.5 * jnp.square(t - centers[..., None]) / (sig ** 2)
    logits = jnp.where(text_mask[..., None], logits, -1e9)
    return jax.nn.softmax(logits, axis=1)


class SLMAdversarialLoss:
    """Static-shape SLM adversarial step.

    wl: losses.WavLMLoss (embedder + discriminator head params inside).
    """

    def __init__(self, wl: LO.WavLMLoss, min_len: int = 80,
                 max_len: int = 160, sig: float = 1.5,
                 skip_update: int = 10):
        self.wl = wl
        self.min_len = min_len
        self.max_len = max_len
        self.sig = sig
        self.skip_update = skip_update

    def generator_step(self, params: Dict[str, Any], cfg, texts: jnp.ndarray,
                       text_lengths: jnp.ndarray, ref_s: jnp.ndarray,
                       n_frames: int, rng) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Synthesize through differentiable durations, return
        (slm generator loss, y_pred). n_frames: static frame bucket."""
        t_text = texts.shape[1]
        mask = L.length_to_valid_mask(text_lengths, t_text)
        t_en = TE.apply(params["text_encoder"], texts, mask)
        d = PR.encode_duration(params["predictor"], t_en, ref_s, mask)
        dur_logits = PR.duration_head(params["predictor"], d, mask)

        attn = soft_alignment_from_durations(dur_logits, mask, n_frames,
                                             self.sig)
        attn_t = jnp.swapaxes(attn, 1, 2)  # (B, F, T)
        total = jnp.minimum((jax.nn.sigmoid(dur_logits).sum(axis=-1)
                             * mask).sum(axis=1), n_frames)
        frame_mask = jnp.arange(n_frames)[None, :] < total[:, None]
        mel_mask = jnp.repeat(frame_mask, 2, axis=1)

        asr_pred = jnp.matmul(attn_t, jax.lax.stop_gradient(t_en),
                              precision=L._prec(t_en))
        en = jnp.matmul(attn_t, d, precision=L._prec(d))
        f0, n_en = PR.f0n_train(params["predictor"], en, ref_s,
                                mask=frame_mask, out_mask=mel_mask)
        y_pred = DE.decoder_apply(params["decoder"], cfg.decoder, asr_pred,
                                  f0, n_en, ref_s, rng=rng, train=False,
                                  frame_mask=frame_mask)
        gen_loss = self.wl.generator(y_pred[..., 0])
        return gen_loss, y_pred

    def discriminator_step(self, wav: jnp.ndarray,
                           y_pred: jnp.ndarray) -> jnp.ndarray:
        """SLM discriminator LSGAN loss on (real, synthesized) audio
        (slmadv.py:120-163 core branch)."""
        return self.wl.discriminator(wav, jax.lax.stop_gradient(y_pred))
