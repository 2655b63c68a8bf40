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
                       n_frames: int, rng,
                       wd_params=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
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
        gen_loss = self.wl.generator(y_pred[..., 0], wd_params=wd_params)
        return gen_loss, y_pred

    def discriminator_step(self, wav: jnp.ndarray, y_pred: jnp.ndarray,
                           wd_params=None) -> jnp.ndarray:
        """SLM discriminator LSGAN loss on (real, synthesized) audio
        (slmadv.py:120-163 core branch)."""
        return self.wl.discriminator(wav, jax.lax.stop_gradient(y_pred),
                                     wd_params=wd_params)


class SLMAdversarialTrainer:
    """Opt-in SLM adversarial stage for the train loop.

    The reference keeps this capability on disk but never calls it
    (Modules/slmadv.py — dead code in the lite fork; live in upstream
    StyleTTS2). Here it is wired: every `skip_update` iterations the train
    loop runs one generator step (gradients flow through the gaussian soft
    alignment + the frozen WavLM into predictor and decoder) and one
    discriminator step (updates the WavLM-feature conv head `wd`).

    Static shapes: one jitted (g, d) pair per (crop, text-bucket) shape,
    built lazily like the main train steps. The real-audio clip is the
    leading `2*crop` mel frames of each sample's padded waveform (every
    sample is at least that long by the per-bin crop bound)."""

    def __init__(self, cfg, multi_opt, wl: LO.WavLMLoss, wd_params,
                 scale: float = 0.01, sig: float = 1.5,
                 trained_modules: Tuple[str, ...] = ("predictor", "decoder")):
        from styletts2_tpu.optim import make_adamw

        self.cfg = cfg
        self.multi_opt = multi_opt
        self.wl = wl
        self.wd_params = wd_params
        self.scale = scale
        self.sig = sig
        self.trained = trained_modules
        self.wd_tx = make_adamw(cfg.optimizer_params.lr)
        self.wd_state = self.wd_tx.init(wd_params)
        self._steps: Dict[Tuple[int, int], Any] = {}

    def _build(self, crop: int, t_text: int):
        import jax as _jax

        mp = self.cfg.model_params
        sp = self.cfg.preprocess_params.spect_params
        hop = sp.hop_length
        slm = SLMAdversarialLoss(self.wl, sig=self.sig)

        def g_step(params, opt_states, wd_params, texts, text_lengths,
                   waves, rng):
            from styletts2_tpu.ops import stft as OPS
            from styletts2_tpu.nn import style_encoder as SE

            mels = OPS.preprocess_wave(waves, sr=24000, n_fft=sp.n_fft,
                                       win_length=sp.win_length,
                                       hop_length=hop, n_mels=mp.n_mels)
            ref_s = _jax.lax.stop_gradient(
                SE.apply(params["style_encoder"], mels))

            def loss_fn(g_params):
                full = dict(params)
                full.update(g_params)
                loss, y_pred = slm.generator_step(
                    full, mp, texts, text_lengths, ref_s, crop, rng,
                    wd_params=wd_params)
                return loss * self.scale, y_pred

            g_params = {k: params[k] for k in self.trained}
            (loss, y_pred), grads = _jax.value_and_grad(
                loss_fn, has_aux=True)(g_params)
            new_params, new_states = self.multi_opt.step_modules(
                self.trained, grads, opt_states, params)
            return new_params, new_states, loss, y_pred

        def d_step(wd_params, wd_state, waves, y_pred):
            wav = waves[:, : crop * 2 * hop]

            def loss_fn(wd):
                return slm.discriminator_step(wav, y_pred[..., 0],
                                              wd_params=wd)

            loss, grads = _jax.value_and_grad(loss_fn)(wd_params)
            updates, new_state = self.wd_tx.update(grads, wd_state, wd_params)
            import optax

            return optax.apply_updates(wd_params, updates), new_state, loss

        return _jax.jit(g_step), _jax.jit(d_step)

    def step(self, params, opt_states, texts, text_lengths, waves, crop: int,
             rng):
        """One SLM adversarial round. Returns (params, opt_states, metrics);
        updates the internal wd head state."""
        key = (crop, texts.shape[1])
        if key not in self._steps:
            self._steps[key] = self._build(crop, texts.shape[1])
        g_step, d_step = self._steps[key]
        params, opt_states, g_loss, y_pred = g_step(
            params, opt_states, self.wd_params, texts, text_lengths, waves,
            rng)
        self.wd_params, self.wd_state, d_loss = d_step(
            self.wd_params, self.wd_state, waves, y_pred)
        return params, opt_states, {"slm_g": g_loss, "slm_d": d_loss}
