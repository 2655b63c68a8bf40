"""Host-side audio IO and preprocessing.

The reference leans on librosa/soundfile/noisereduce (inference.py:183-192,
meldataset.py:101-111); none are present in this environment, so:

* WAV read/write via the stdlib `wave` module (+ float32/PCM conversion)
* resampling via scipy.signal.resample_poly
* librosa.effects.trim(top_db=30) reimplemented (frame RMS vs peak dB)
* noisereduce is optional: gated import, warn-and-skip when absent

These run on host (they are per-clip, not hot); the mel analysis itself runs
on device via ops/stft.py.
"""

from __future__ import annotations

import math
import wave as _wave
from typing import Optional, Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM/float WAV file -> (float32 mono samples in [-1, 1], sr)."""
    with _wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch)[:, 0]  # first channel (meldataset.py:104-105)
    return data, sr


def write_wav(path: str, wav: np.ndarray, sr: int = 24000) -> None:
    wav = np.clip(np.asarray(wav, dtype=np.float32), -1.0, 1.0)
    pcm = (wav * 32767.0).astype("<i2")
    with _wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return wav
    from scipy.signal import resample_poly

    g = math.gcd(orig_sr, target_sr)
    return resample_poly(wav, target_sr // g, orig_sr // g).astype(np.float32)


def trim_silence(wav: np.ndarray, top_db: float = 30.0,
                 frame_length: int = 2048, hop_length: int = 512
                 ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """librosa.effects.trim parity: drop leading/trailing frames more than
    top_db below the peak RMS (reference inference.py:184)."""
    if len(wav) == 0:
        return wav, (0, 0)
    pad = frame_length // 2
    padded = np.pad(wav.astype(np.float32), (pad, pad))
    n_frames = 1 + (len(padded) - frame_length) // hop_length
    idx = (np.arange(n_frames) * hop_length)[:, None] + np.arange(frame_length)
    rms = np.sqrt(np.mean(padded[idx] ** 2, axis=1))
    ref = rms.max()
    if ref <= 0:
        return wav, (0, len(wav))
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
    keep = np.nonzero(db > -top_db)[0]
    if len(keep) == 0:
        return wav[:0], (0, 0)
    start = int(keep[0] * hop_length)
    end = int(min(len(wav), (keep[-1] + 1) * hop_length))
    return wav[start:end], (start, end)


def maybe_denoise(wav: np.ndarray, sr: int, amount: float) -> np.ndarray:
    """Blend with a denoised copy (reference inference.py:190-192).
    noisereduce is not installed in this environment: warn and skip."""
    if amount <= 0:
        return wav
    try:
        import noisereduce as nr  # pragma: no cover - optional dep
    except ImportError:
        print("styletts2_tpu: noisereduce not installed; skipping denoise")
        return wav
    den = nr.reduce_noise(y=wav, sr=sr, n_fft=2048, win_length=1200,
                          hop_length=300)  # pragma: no cover
    return wav * (1.0 - amount) + den * amount  # pragma: no cover
