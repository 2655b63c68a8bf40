"""DSP parity tests.

torchaudio is not available in this environment, so expected values are
constructed from independent numeric paths:
* torch.stft            (framing / window / FFT — what torchaudio wraps)
* scipy.fft.dct         (DCT-II ortho — what torchaudio.create_dct computes)
* torch irfft + fold    (the reference Vocos ISTFT implementation)
* torch F.interpolate   (linear/nearest resize semantics)
The htk mel-filterbank formula is additionally checked for its documented
invariants (triangle partition of the spectrum).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from styletts2_tpu.ops import stft as S

torch = pytest.importorskip("torch")


def test_hann_window_matches_torch():
    for n in (5, 600, 1200):
        ours = S.hann_window(n)
        theirs = torch.hann_window(n, periodic=True).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_power_matches_torch_stft():
    """Matmul-DFT |STFT|^2 vs torch.stft (center=True, reflect pad, centered
    zero-padded window) — the exact spectrogram torchaudio computes."""
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 24000)).astype(np.float32) * 0.3
    n_fft, win, hop = 2048, 1200, 300

    window = torch.hann_window(win)
    ref = torch.stft(
        torch.from_numpy(wave), n_fft, hop_length=hop, win_length=win,
        window=window, center=True, pad_mode="reflect", return_complex=True,
    )
    ref_power = (ref.real ** 2 + ref.imag ** 2).numpy()

    ours = np.asarray(S.stft_power(jnp.asarray(wave), n_fft, hop, win))
    assert ours.shape == ref_power.shape
    np.testing.assert_allclose(ours, ref_power, atol=2e-2, rtol=1e-4)


def test_mel_filterbank_invariants():
    fb = S.mel_filterbank(24000, 2048, 80)
    assert fb.shape == (1025, 80)
    assert (fb >= 0).all()
    # every filter is a triangle with a single peak and unit-partition
    # structure in mel space: the peak of filter m sits at f_pts[m+1]
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) > 0).all()  # strictly increasing centers
    # interior frequencies are covered by at least one filter
    coverage = fb.sum(axis=1)
    assert (coverage[peaks[0]: peaks[-1]] > 0).all()


def test_mel_frontend_matches_reference_recipe():
    """Full-frontend parity with reference meldataset.preprocess, with the
    spectrogram produced by torch.stft (independent of our matmul DFT)."""
    rng = np.random.default_rng(1)
    wave = rng.standard_normal(24000).astype(np.float32) * 0.3

    window = torch.hann_window(1200)
    spec = torch.stft(
        torch.from_numpy(wave), 2048, hop_length=300, win_length=1200,
        window=window, center=True, pad_mode="reflect", return_complex=True)
    power = (spec.real ** 2 + spec.imag ** 2).numpy()  # (1025, T)
    fb = S.mel_filterbank(24000, 2048, 80)  # (1025, 80)
    mel = fb.T @ power
    ref = (np.log(1e-5 + mel) + 4.0) / 4.0

    ours = np.asarray(S.preprocess_wave(jnp.asarray(wave)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_dct_matrix_matches_scipy():
    import scipy.fft

    ours = S.dct_matrix(40, 80)  # (80, 40)
    # DCT-II ortho matrix rows 0..39, transposed into a matmul basis
    full = scipy.fft.dct(np.eye(80), type=2, norm="ortho", axis=0)
    theirs = full[:40].T
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_log_norm_matches_reference():
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, 80, 50)).astype(np.float32)
    # reference utils.py:47-53 on (B, 1, 80, T): norm over dim=2 (mel axis)
    x = torch.from_numpy(mel).unsqueeze(1)
    ref = torch.log(torch.exp(x * 4 + (-4)).norm(dim=2)).squeeze(1).numpy()
    ours = np.asarray(S.log_norm(jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_interpolate_linear_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 40)).astype(np.float32)
    for out in (13, 40, 121, 12000):
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=out, mode="linear").numpy()
        ours = np.asarray(S.interpolate_linear(jnp.asarray(x), out))
        np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_interpolate_nearest_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 2, 7)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=300, mode="nearest").numpy()
    ours = np.asarray(S.interpolate_nearest(jnp.asarray(x), 300))
    np.testing.assert_allclose(ours, ref, atol=0)


def test_istft_vocos_matches_torch_fold():
    """istft_vocos vs torch irfft+fold (the reference vocos.py:190-232 code path)."""
    n_fft, hop = 20, 5
    rng = np.random.default_rng(5)
    t = 64
    re = rng.standard_normal((2, n_fft // 2 + 1, t)).astype(np.float32)
    im = rng.standard_normal((2, n_fft // 2 + 1, t)).astype(np.float32)

    spec = torch.complex(torch.from_numpy(re), torch.from_numpy(im))
    window = torch.hann_window(n_fft)
    ifft = torch.fft.irfft(spec, n_fft, dim=1, norm="backward")
    ifft = ifft * window[None, :, None]
    output_size = (t - 1) * hop + n_fft
    y = torch.nn.functional.fold(
        ifft, output_size=(1, output_size), kernel_size=(1, n_fft), stride=(1, hop),
    )[:, 0, 0, :]
    window_sq = window.square().expand(1, t, -1).transpose(1, 2)
    env = torch.nn.functional.fold(
        window_sq, output_size=(1, output_size), kernel_size=(1, n_fft), stride=(1, hop),
    ).squeeze()
    pad = (n_fft - hop) // 2
    ref = (y / env.clamp(min=1e-11))[:, pad:-pad].numpy()

    ours = np.asarray(S.istft_vocos(jnp.asarray(re), jnp.asarray(im), n_fft, hop, n_fft))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_custom_stft_matches_reference():
    """stft_mag_phase / istft_conv vs the reference CustomSTFT module
    (istftnet.py:111-301), which defines the iSTFTNet decoder's source STFT
    and output iSTFT. The reference file only needs torch+scipy, so it can be
    imported directly for a golden comparison."""
    from conftest import has_reference, add_reference_to_path

    if not has_reference():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    try:
        from Modules.istftnet import CustomSTFT
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")

    n_fft, hop, win = 20, 5, 20
    mod = CustomSTFT(filter_length=n_fft, hop_length=hop, win_length=win)
    rng = np.random.default_rng(6)
    wav = (rng.standard_normal((2, 1000)) * 0.4).astype(np.float32)

    with torch.no_grad():
        ref_mag, ref_phase = mod.transform(torch.from_numpy(wav))
    mag, phase = S.stft_mag_phase(jnp.asarray(wav), n_fft, hop, win)
    assert np.asarray(mag).shape == tuple(ref_mag.shape)
    np.testing.assert_allclose(np.asarray(mag), ref_mag.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.sin(np.asarray(phase)), torch.sin(ref_phase).numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.cos(np.asarray(phase)), torch.cos(ref_phase).numpy(), atol=1e-3)

    # inverse parity on arbitrary (mag, phase) like the generator head emits
    t = 64
    m = rng.uniform(0.1, 2.0, (2, n_fft // 2 + 1, t)).astype(np.float32)
    p = rng.uniform(-np.pi, np.pi, (2, n_fft // 2 + 1, t)).astype(np.float32)
    with torch.no_grad():
        ref_wav = mod.inverse(torch.from_numpy(m), torch.from_numpy(p)).numpy()
    our_wav = np.asarray(S.istft_conv(jnp.asarray(m), jnp.asarray(p), n_fft, hop, win))
    assert our_wav.shape == ref_wav.shape
    np.testing.assert_allclose(our_wav, ref_wav, atol=1e-4, rtol=1e-3)
