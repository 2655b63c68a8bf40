"""Fused Pallas mel kernel == the XLA matmul path (interpret mode on CPU;
the compiled kernel is additionally verified on the real TPU in bench/drive
runs)."""

import numpy as np

import jax.numpy as jnp

from styletts2_tpu.ops import stft as S
from styletts2_tpu.ops.mel_pallas import fused_log_mel


def test_fused_log_mel_matches_xla_path():
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, 24000)) * 0.3).astype(np.float32)
    ref = np.asarray(S.preprocess_wave(jnp.asarray(wave), backend="xla"))
    ours = np.asarray(fused_log_mel(jnp.asarray(wave), interpret=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_fused_log_mel_loss_resolutions():
    """The three MRSTFT resolutions (losses.py) all produce matching mels."""
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal((1, 9600)) * 0.2).astype(np.float32)
    for fft, hop, win in ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240)):
        ref = np.asarray(S.preprocess_wave(
            jnp.asarray(wave), backend="xla", sr=24000, n_fft=fft,
            win_length=win, hop_length=hop, n_mels=128))
        ours = np.asarray(fused_log_mel(
            jnp.asarray(wave), sr=24000, n_fft=fft, win_length=win,
            hop_length=hop, n_mels=128, interpret=True))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_single_waveform_rank():
    rng = np.random.default_rng(2)
    wave = (rng.standard_normal(12000) * 0.2).astype(np.float32)
    out = np.asarray(fused_log_mel(jnp.asarray(wave), interpret=True))
    assert out.shape[0] == 80
