"""Spectral-gate denoiser (audio.spectral_gate_denoise / maybe_denoise).

The reference blends noisereduce's stationary spectral gate into every
style clip by default (inference.py:190-192, denoise=0.3). noisereduce is
not installed here, so the algorithm is reimplemented from scratch;
these property tests pin its contract: broadband noise floor drops, loud
tonal content survives, and the blend formula matches the reference.
"""

import numpy as np
import pytest

from styletts2_tpu import audio as AUD

SR = 24000


def _tone_plus_noise(seconds=2.0, f=440.0, tone_amp=0.5, noise_amp=0.02,
                     seed=0):
    t = np.arange(int(SR * seconds)) / SR
    tone = (tone_amp * np.sin(2 * np.pi * f * t)).astype(np.float32)
    noise = (np.random.default_rng(seed)
             .standard_normal(len(t)) * noise_amp).astype(np.float32)
    return tone, noise


def _rms(x):
    return float(np.sqrt(np.mean(np.square(x))))


def test_noise_floor_reduced_on_quiet_segments():
    """A clip that is [noise | tone+noise | noise]: the pure-noise segments
    must come out much quieter; the tone segment must keep its energy."""
    tone, noise = _tone_plus_noise()
    n = len(tone)
    sig = np.concatenate([noise[: n // 2], tone + noise, noise[: n // 2]])
    den = AUD.spectral_gate_denoise(sig, SR)
    assert den.shape == sig.shape

    head = slice(2048, n // 2 - 2048)  # away from edges/gate smoothing
    mid = slice(n // 2 + 2048, n // 2 + n - 2048)
    assert _rms(den[head]) < 0.35 * _rms(sig[head])
    assert abs(_rms(den[mid]) - _rms(sig[mid])) < 0.15 * _rms(sig[mid])


def test_stationary_tone_attenuated_not_mangled():
    """A clip that is ONLY a constant tone is, to a stationary gate,
    stationary noise — partial attenuation is correct behavior (noisereduce
    does the same). What must hold: finite output, same length, frequency
    content preserved in whatever remains."""
    tone, _ = _tone_plus_noise(noise_amp=0.0)
    den = AUD.spectral_gate_denoise(tone, SR)
    assert den.shape == tone.shape and np.isfinite(den).all()
    mid = den[2048:-2048]
    assert 0.2 * _rms(tone) < _rms(mid) <= 1.05 * _rms(tone)
    spec = np.abs(np.fft.rfft(mid))
    assert abs(np.argmax(spec) * SR / len(mid) - 440.0) < 2.0


def test_prop_decrease_interpolates():
    """prop_decrease=0 must be (near-)identity; intermediate values sit
    between identity and the full gate."""
    tone, noise = _tone_plus_noise()
    sig = np.concatenate([noise, tone + noise])
    ident = AUD.spectral_gate_denoise(sig, SR, prop_decrease=0.0)
    np.testing.assert_allclose(ident, sig, atol=1e-4)
    full = AUD.spectral_gate_denoise(sig, SR, prop_decrease=1.0)
    half = AUD.spectral_gate_denoise(sig, SR, prop_decrease=0.5)
    n = len(noise)
    q = slice(2048, n - 2048)  # quiet segment
    assert _rms(full[q]) < _rms(half[q]) < _rms(sig[q])


def test_maybe_denoise_blends():
    """maybe_denoise(x, sr, d) == x*(1-d) + gate(x)*d (reference
    inference.py:190-192), and amount<=0 is the identity."""
    tone, noise = _tone_plus_noise(seconds=1.0)
    sig = np.concatenate([noise, tone + noise])
    np.testing.assert_array_equal(AUD.maybe_denoise(sig, SR, 0.0), sig)
    d = 0.3
    got = AUD.maybe_denoise(sig, SR, d)
    want = sig * (1 - d) + AUD.spectral_gate_denoise(sig, SR) * d
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.dtype == np.float32


def test_short_input_passthrough():
    sig = np.ones(100, np.float32) * 0.1
    np.testing.assert_array_equal(AUD.spectral_gate_denoise(sig, SR), sig)


@pytest.mark.parametrize("n", [24000, 24001, 25000])
def test_length_preserved(n):
    sig = (np.random.default_rng(1).standard_normal(n) * 0.1
           ).astype(np.float32)
    assert AUD.spectral_gate_denoise(sig, SR).shape == (n,)
    assert AUD.maybe_denoise(sig, SR, 0.3).shape == (n,)
