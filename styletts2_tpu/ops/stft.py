"""DSP kernels: STFT/mel/MFCC/iSTFT, formulated as matmuls for the MXU.

Replaces the reference's torchaudio/librosa DSP:
* mel frontend       — reference meldataset.py:48-56 / inference.py:43-49
                       (torchaudio MelSpectrogram: n_mels 80, n_fft 2048,
                        win 1200, hop 300, power 2, htk mels, no norm)
* MFCC DCT           — reference Modules/ASR/layers.py:332-354
* conv-basis STFT    — reference Modules/istftnet.py:111-301 (CustomSTFT)
* overlap-add iSTFT  — reference Modules/vocos.py:164-232 (ISTFT 'same')
* log_norm           — reference utils.py:47-53
* linear interpolate — torch F.interpolate(mode='linear') semantics, used by
                       the NSF sine source (reference Modules/hifigan.py:145-156)

Everything here is jittable, static-shaped, and built from matmuls / convs so
XLA can put the FLOPs on the MXU. The DFT and mel bases are f32 constants
baked into the jaxpr (they are tiny next to HBM-resident activations).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# DSP runs in true f32: the session default matmul precision is bf16 (TPU
# policy), which is fine for the model hot paths but not for spectral
# analysis feeding log-compression.
_F32 = jax.lax.Precision.HIGHEST


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_F32)

# ---------------------------------------------------------------------------
# windows / bases (numpy: computed once at trace time, baked as constants)
# ---------------------------------------------------------------------------


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """torch.hann_window parity (periodic=True by default)."""
    n = win_length if not periodic else win_length + 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return w[:win_length].astype(np.float32)


def _traced_window(n_fft: int, win_length: int,
                   center_window: bool) -> jnp.ndarray:
    """Periodic hann window zero-padded to n_fft, built with jnp ops."""
    n = jnp.arange(win_length, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)
    left = (n_fft - win_length) // 2 if center_window else 0
    return jnp.pad(w, (left, n_fft - win_length - left))


def _traced_dft_bases(n_fft: int, win_length: int, center_window: bool
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, -sin) windowed DFT bases (n_fft, freq_bins), built IN-GRAPH.

    Embedding these as numpy constants puts ~8 MB of dense f32 per
    resolution into the serialized MLIR (the full train step carried ~20 MB
    of such constants, OOM-killing memory-capped compile services); built
    from iota they are a handful of ops and XLA folds or recomputes them as
    it sees fit."""
    freq_bins = n_fft // 2 + 1
    window = _traced_window(n_fft, win_length, center_window)
    n = jax.lax.broadcasted_iota(jnp.int32, (n_fft, freq_bins), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n_fft, freq_bins), 1)
    # integer range reduction BEFORE the trig: cos of ~6e3 rad in f32 loses
    # ~4e-4 of precision to argument reduction
    m = (n * k) % n_fft
    angle = (2.0 * jnp.pi / n_fft) * m.astype(jnp.float32)
    cos_b = jnp.cos(angle) * window[:, None]
    sin_b = -jnp.sin(angle) * window[:, None]
    # exact-zero imaginary parts at DC / Nyquist (see _dft_bases)
    zero_cols = (k == 0) | ((n_fft % 2 == 0) & (k == freq_bins - 1))
    sin_b = jnp.where(zero_cols, 0.0, sin_b)
    return cos_b, sin_b


def _traced_mel_fb(sr: int, n_fft: int, n_mels: int) -> jnp.ndarray:
    """htk mel filterbank (freq_bins, n_mels), built in-graph (same formula
    as mel_filterbank below)."""
    n_freqs = n_fft // 2 + 1
    all_freqs = jnp.linspace(0.0, sr / 2.0, n_freqs)
    m_min = 0.0
    m_max = 2595.0 * jnp.log10(1.0 + (sr / 2.0) / 700.0)
    m_pts = jnp.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    return jnp.maximum(0.0, jnp.minimum(down, up))


@functools.lru_cache(maxsize=None)
def _dft_bases(n_fft: int, win_length: int, center_window: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, -sin) bases of shape (n_fft, freq_bins), window pre-multiplied.

    center_window=True pads the window symmetrically to n_fft like torch.stft
    (window centered in the frame); False pads at the end like the reference's
    CustomSTFT (istftnet.py:144-151).
    """
    freq_bins = n_fft // 2 + 1
    w = hann_window(win_length)
    window = np.zeros(n_fft, dtype=np.float64)
    if center_window:
        left = (n_fft - win_length) // 2
        window[left:left + win_length] = w
    else:
        window[:win_length] = w[:min(win_length, n_fft)]
    n = np.arange(n_fft)
    k = np.arange(freq_bins)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, freq_bins)
    cos_b = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(angle) * window[:, None]).astype(np.float32)
    # DC and (even n_fft) Nyquist imaginary parts are mathematically zero;
    # np.sin(pi*n) returns ~1e-16 garbage whose sign would otherwise turn
    # into randomly-signed +-pi phases out of arctan2.
    sin_b[:, 0] = 0.0
    if n_fft % 2 == 0:
        sin_b[:, -1] = 0.0
    return cos_b, sin_b


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sr: int = 24000,
    n_fft: int = 2048,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """(freq_bins, n_mels) triangular filterbank.

    torchaudio.functional.melscale_fbanks parity with mel_scale='htk',
    norm=None (the MelSpectrogram defaults the reference relies on)."""
    if f_max is None:
        f_max = sr / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr / 2.0, n_freqs)

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=None)
def dct_matrix(n_mfcc: int = 40, n_mels: int = 80) -> np.ndarray:
    """(n_mels, n_mfcc) orthonormal DCT-II basis.

    torchaudio.functional.create_dct(norm='ortho') parity, as used by the
    aligner's MFCC frontend (reference ASR/layers.py:338)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
    dct[:, 0] *= 1.0 / math.sqrt(2.0)
    dct *= math.sqrt(2.0 / n_mels)
    return dct.astype(np.float32)


# ---------------------------------------------------------------------------
# framing + forward STFT (matmul form)
# ---------------------------------------------------------------------------


def frame_signal(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_fft) strided frames.

    center=True pads n_fft//2 on both sides (torch.stft parity).
    """
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        if pad_mode == "reflect":
            x = jnp.pad(x, pad_widths, mode="reflect")
        elif pad_mode == "replicate":
            x = jnp.pad(x, pad_widths, mode="edge")
        else:
            x = jnp.pad(x, pad_widths)
    total = x.shape[-1]
    n_frames = (total - n_fft) // hop_length + 1
    # indices built in-graph (a numpy index constant of (n_frames, n_fft)
    # int32 bloats the serialized program)
    starts = jnp.arange(n_frames, dtype=jnp.int32) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    return x[..., idx]


def stft_power(
    x: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 300,
    win_length: int = 1200,
    center: bool = True,
    pad_mode: str = "reflect",
    center_window: bool = True,
) -> jnp.ndarray:
    """|STFT|^2 as two matmuls: frames @ (win*cos), frames @ (win*-sin).

    Returns (..., freq_bins, n_frames), torch.stft power-spectrogram layout.
    """
    frames = frame_signal(x, n_fft, hop_length, center, pad_mode)
    cos_b, sin_b = _traced_dft_bases(n_fft, win_length, center_window)
    re = _mm(frames, cos_b)   # (..., n_frames, freq_bins)
    im = _mm(frames, sin_b)
    power = re * re + im * im
    return jnp.swapaxes(power, -1, -2)


def stft_mag_phase(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    pad_mode: str = "replicate",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(magnitude, phase), CustomSTFT.transform parity
    (reference istftnet.py:207-243: end-padded window, replicate center pad,
    eps 1e-14 inside the sqrt)."""
    frames = frame_signal(x, n_fft, hop_length, center, pad_mode)
    cos_b, sin_b = _traced_dft_bases(n_fft, win_length, center_window=False)
    re = jnp.swapaxes(_mm(frames, cos_b), -1, -2)
    im = jnp.swapaxes(_mm(frames, sin_b), -1, -2)
    mag = jnp.sqrt(re * re + im * im + 1e-14)
    phase = jnp.arctan2(im, re)
    # Canonicalize the atan2 branch point: when the true phase is ~0/pi the
    # sign of `im` is rounding noise, so atan2 returns a randomly-signed
    # +-pi — the reference's phase features are chaotic there (its own ONNX
    # path patches the imag==0 case, istftnet.py:239-242). Snap near-axis
    # phases to exactly 0 / +pi and silent bins to 0 for determinism.
    near_axis = jnp.abs(im) <= 1e-3 * mag
    phase = jnp.where(near_axis & (re < 0), np.pi, phase)
    phase = jnp.where(near_axis & (re >= 0), 0.0, phase)
    phase = jnp.where(mag < 1e-5, 0.0, phase)
    return mag, phase


# ---------------------------------------------------------------------------
# mel frontend (reference meldataset.py:48-56)
# ---------------------------------------------------------------------------

LOG_MEL_MEAN = -4.0
LOG_MEL_STD = 4.0


def mel_spectrogram(
    wave: jnp.ndarray,
    sr: int = 24000,
    n_fft: int = 2048,
    win_length: int = 1200,
    hop_length: int = 300,
    n_mels: int = 80,
) -> jnp.ndarray:
    """(..., T) -> (..., n_mels, n_frames) power mel spectrogram.

    torchaudio.transforms.MelSpectrogram parity (the reference frontend)."""
    power = stft_power(wave, n_fft, hop_length, win_length)
    fb = _traced_mel_fb(sr, n_fft, n_mels)
    # (..., freq, frames) -> (..., frames, freq) @ (freq, mels) -> transpose
    mel = jnp.swapaxes(_mm(jnp.swapaxes(power, -1, -2), fb), -1, -2)
    return mel


def log_mel_normalize(mel: jnp.ndarray) -> jnp.ndarray:
    """(log(1e-5 + mel) - mean) / std, reference meldataset.py:50-56."""
    return (jnp.log(1e-5 + mel) - LOG_MEL_MEAN) / LOG_MEL_STD


def preprocess_wave(wave: jnp.ndarray, backend: Optional[str] = None,
                    **mel_kwargs) -> jnp.ndarray:
    """wave -> normalized log mel; reference meldataset.preprocess /
    inference.Preprocess.wave_preprocess.

    backend: None = auto (the fused Pallas kernel on TPU, the XLA matmul
    path elsewhere); 'xla' | 'pallas' to force. The kernel uses pltpu VMEM
    scratch, so only 'tpu' selects it — any other accelerator would fail at
    Pallas lowering rather than fall back."""
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from styletts2_tpu.ops.mel_pallas import fused_log_mel

        return fused_log_mel(wave, **mel_kwargs)
    return log_mel_normalize(mel_spectrogram(wave, **mel_kwargs))


def log_norm(x: jnp.ndarray, mean: float = -4.0, std: float = 4.0, axis: int = -2) -> jnp.ndarray:
    """Energy curve from normalized log-mel: log(||exp(x*std+mean)||_2 over mels).

    Parity: reference utils.py:47-53 (dim=2 on (B,1,80,T) inputs == mel axis)."""
    return jnp.log(jnp.linalg.norm(jnp.exp(x * std + mean), axis=axis))


def mfcc(mel_norm: jnp.ndarray, n_mfcc: int = 40, n_mels: int = 80) -> jnp.ndarray:
    """(..., n_mels, T) normalized log-mel -> (..., n_mfcc, T).

    Parity: reference ASR/layers.py:341-354 (a plain DCT matmul)."""
    d = jnp.asarray(dct_matrix(n_mfcc, n_mels))
    return jnp.swapaxes(_mm(jnp.swapaxes(mel_norm, -1, -2), d), -1, -2)


# ---------------------------------------------------------------------------
# inverse STFT
# ---------------------------------------------------------------------------


def _traced_idft_bases(n_fft: int, win_length: int, scale: bool,
                       center_window: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-graph inverse-DFT bases (freq_bins, n_fft), window/scale folded in
    (see _traced_dft_bases for why these are not numpy constants)."""
    freq_bins = n_fft // 2 + 1
    window = _traced_window(n_fft, win_length, center_window)
    n = jax.lax.broadcasted_iota(jnp.int32, (freq_bins, n_fft), 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (freq_bins, n_fft), 0)
    m = (n * k) % n_fft
    angle = (2.0 * jnp.pi / n_fft) * m.astype(jnp.float32)
    inv_scale = (1.0 / n_fft) if scale else 1.0
    cos_b = jnp.cos(angle) * window[None, :] * inv_scale
    sin_b = jnp.sin(angle) * window[None, :] * inv_scale
    return cos_b, sin_b


@functools.lru_cache(maxsize=None)
def _idft_bases(n_fft: int, win_length: int, scale: bool, center_window: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse-DFT bases (freq_bins, n_fft), window (and 1/n_fft) folded in."""
    freq_bins = n_fft // 2 + 1
    w = hann_window(win_length)
    window = np.zeros(n_fft, dtype=np.float64)
    if center_window:
        left = (n_fft - win_length) // 2
        window[left:left + win_length] = w
    else:
        window[:win_length] = w[:min(win_length, n_fft)]
    n = np.arange(n_fft)
    k = np.arange(freq_bins)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, freq_bins)
    inv_scale = (1.0 / n_fft) if scale else 1.0
    cos_b = (np.cos(angle).T * window[None, :] * inv_scale).astype(np.float32)
    sin_b = (np.sin(angle).T * window[None, :] * inv_scale).astype(np.float32)
    return cos_b, sin_b


def _overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """(B, n_frames, frame_len) -> (B, (n_frames-1)*hop + frame_len) OLA.

    When frame_len is a multiple of hop (all our uses: 1200/300, 20/5) this
    is K = frame_len/hop shifted adds of a reshaped array — pure VPU work,
    no scatter. Generic fall-back uses an index-add scatter."""
    b, t, fl = frames.shape
    if fl % hop_length == 0:
        k = fl // hop_length
        chunks = frames.reshape(b, t, k, hop_length)
        out = jnp.zeros((b, t + k - 1, hop_length), frames.dtype)
        for c in range(k):
            out = out.at[:, c:c + t].add(chunks[:, :, c])
        return out.reshape(b, (t + k - 1) * hop_length)
    idx = (np.arange(t) * hop_length)[:, None] + np.arange(fl)[None, :]
    out_len = (t - 1) * hop_length + fl
    out = jnp.zeros((b, out_len), frames.dtype)
    return out.at[:, idx.reshape(-1)].add(frames.reshape(b, -1))


def istft_conv(
    magnitude: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    length: Optional[int] = None,
    frame_valid=None,
) -> jnp.ndarray:
    """CustomSTFT.inverse parity (reference istftnet.py:246-293).

    (B, freq_bins, frames) mag/phase -> (B, 1, T) waveform. Transposed-conv
    iSTFT: real/imag frames through windowed inverse-DFT bases, difference,
    no window-envelope division (matches the reference bit-for-bit).

    frame_valid: optional (T_f,) or (B, T_f) bool — frames marked False
    contribute nothing to the overlap-add, as if those frame slots did not
    exist (used by the sequence-parallel windowed decode for slots outside
    the global frame grid; there is no window-envelope division here, so
    zeroing the frames is the complete fix)."""
    real = magnitude * jnp.cos(phase)
    imag = magnitude * jnp.sin(phase)
    cos_b, sin_b = _traced_idft_bases(n_fft, win_length, scale=True,
                                      center_window=False)
    # frames_time[b, t, n] = sum_k real[b,k,t] * cos_b[k,n]  (and sin for imag)
    real_frames = _mm(jnp.swapaxes(real, 1, 2), cos_b)  # (B, T_f, n_fft)
    imag_frames = _mm(jnp.swapaxes(imag, 1, 2), sin_b)
    frames = real_frames - imag_frames
    if frame_valid is not None:
        fv = jnp.asarray(frame_valid)
        if fv.ndim == 1:
            fv = fv[None, :]
        frames = frames * fv[..., None].astype(frames.dtype)
    wav = _overlap_add(frames, hop_length)
    if center:
        pad = n_fft // 2
        wav = wav[:, pad:-pad]
    if length is not None:
        wav = wav[:, :length]
    return wav[:, None, :]


def istft_vocos(
    spec_real: jnp.ndarray,
    spec_imag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    frame_valid=None,
) -> jnp.ndarray:
    """Vocos ISTFT parity with padding='same' (reference vocos.py:190-232).

    (B, freq_bins, T) real/imag -> (B, L) waveform: irfft -> window ->
    overlap-add -> divide by window envelope -> trim (win-hop)//2.

    frame_valid: optional (B, T) bool — frames marked False contribute
    neither audio nor window envelope, as if those frame slots did not
    exist. Used by the sequence-parallel decode for the out-of-sequence
    halo margins of the edge devices (a single-device call has no such
    slots, so its grid == all-valid)."""
    pad = (win_length - hop_length) // 2
    b, nbins, t = spec_real.shape
    # irfft as matmul with windowed inverse bases; fold the irfft symmetry
    # (bins 1..n-1 doubled) into the basis instead of materializing negatives.
    cos_b, sin_b = _traced_idft_bases(n_fft, win_length, scale=True,
                                      center_window=False)
    kk = jnp.arange(nbins, dtype=jnp.float32)[:, None]
    if n_fft % 2 == 0:
        freq_scale = jnp.where((kk > 0) & (kk < nbins - 1), 2.0, 1.0)
    else:
        freq_scale = jnp.where(kk > 0, 2.0, 1.0)
    w = _traced_window(win_length, win_length, False)
    cos_p = cos_b * freq_scale
    sin_p = sin_b * freq_scale
    real_frames = _mm(jnp.swapaxes(spec_real, 1, 2), cos_p)
    imag_frames = _mm(jnp.swapaxes(spec_imag, 1, 2), sin_p)
    frames = real_frames - imag_frames  # (B, T, n_fft): window already folded in
    # window envelope: OLA of window^2 over the same frame grid
    env_frames = jnp.broadcast_to((w * w)[None, None, :], (1, t, win_length))
    if frame_valid is not None:
        fv = frame_valid[..., None].astype(frames.dtype)  # (B, T, 1)
        frames = frames * fv
        env_frames = env_frames * fv
    y = _overlap_add(frames, hop_length)
    env = _overlap_add(env_frames, hop_length)
    y = y / jnp.maximum(env, 1e-11)
    return y[:, pad:-pad] if pad > 0 else y


# ---------------------------------------------------------------------------
# interpolation (torch.nn.functional.interpolate parity)
# ---------------------------------------------------------------------------


def _interp_linear_int_up(x: jnp.ndarray, u: int) -> jnp.ndarray:
    """Integer-factor linear upsample WITHOUT gathers: output q*u + r
    interpolates source q-1/q/q+1 with a FIXED per-phase weight, so the
    whole resize is two edge-clamped shifts + a (N, 1)x(u,) broadcast —
    one write of the output, no waveform-rate index tensors (the gather
    form cost ~18 ms per phase-2 batch at 600k samples on v5e). Exact
    align_corners=False math: pos of output i is (i+0.5)/u - 0.5 = q + fr
    with fr = (r+0.5)/u - 0.5 (this decomposition is also the better-
    conditioned f32: q + fr instead of (i+0.5)*scale at i ~ 6e5)."""
    n = x.shape[-1]
    r = np.arange(u, dtype=np.float32)
    fr = (r + 0.5) / u - 0.5                      # (u,)
    use_prev = fr < 0
    w_nb = np.where(use_prev, -fr, fr).astype(np.float32)  # neighbor weight
    x_prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    x_next = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    # neighbor per phase: prev for fr<0 (left-leaning), next otherwise.
    # At the edges prev/next clamp to x itself, reproducing the reference's
    # frac clipping (out = x[0] / x[n-1]) automatically.
    nb = jnp.where(jnp.asarray(use_prev), x_prev[..., None],
                   x_next[..., None])             # (..., N, u)
    w = jnp.asarray(w_nb).astype(x.dtype)
    out = x[..., None] * (1.0 - w) + nb * w
    return out.reshape(x.shape[:-1] + (n * u,))


def interpolate_linear(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """1-D linear resize on the last axis, align_corners=False.

    torch F.interpolate(mode='linear') parity: source position of output i is
    (i + 0.5) * (in/out) - 0.5, edge-clamped. Integer up/down factors take
    gather-free broadcast/strided-slice forms; the general case builds
    indices in-graph (as numpy constants these reach ~17 MB at waveform
    rates)."""
    in_size = x.shape[-1]
    if out_size > in_size and out_size % in_size == 0:
        return _interp_linear_int_up(x, out_size // in_size)
    if out_size <= in_size and in_size % out_size == 0:
        # integer downsample: pos = i*D + (D-1)/2 — a strided slice (D
        # odd: exact sample; D even: midpoint of two adjacent samples)
        d = in_size // out_size
        if d % 2 == 1:
            return x[..., (d - 1) // 2::d]
        lo = x[..., d // 2 - 1::d]
        hi = x[..., d // 2::d]
        return lo + (hi - lo) * jnp.asarray(0.5, x.dtype)
    scale = in_size / out_size
    pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = jnp.clip(pos - jnp.floor(pos), 0.0, 1.0)
    frac = jnp.where(pos < 0, 0.0, frac)
    xl = x[..., lo]
    xh = x[..., hi]
    return xl + (xh - xl) * frac.astype(x.dtype)


def interpolate_nearest(x: jnp.ndarray, scale_factor: int) -> jnp.ndarray:
    """Nearest-neighbor upsample on the last axis (integer factor) ==
    repeat; torch F.interpolate(mode='nearest') / nn.Upsample parity."""
    return jnp.repeat(x, scale_factor, axis=-1)
