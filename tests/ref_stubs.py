"""Stubs that make the (read-only) torch reference importable in this
environment, which lacks torchaudio/munch. Only the numeric behavior the
reference actually uses is provided:

* munch.Munch — attribute-access dict
* torchaudio.functional.create_dct — DCT-II ortho basis via scipy
* torchaudio.transforms.MelSpectrogram — torch.stft power spectrogram + htk
  mel filterbank (exactly what torchaudio computes with the reference's
  arguments; the filterbank comes from styletts2_tpu.ops.stft, which is
  itself invariant-tested)
"""

import importlib.machinery
import sys
import types

import numpy as np


def _module(name):
    mod = types.ModuleType(name)
    # transformers probes dependencies via importlib.util.find_spec, which
    # raises on modules with __spec__ = None
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def install():
    import torch

    if "munch" not in sys.modules:
        munch = _module("munch")

        class Munch(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        munch.Munch = Munch
        sys.modules["munch"] = munch

    if "torchaudio" not in sys.modules:
        from styletts2_tpu.ops.stft import mel_filterbank
        import scipy.fft as sfft

        ta = _module("torchaudio")
        taf = _module("torchaudio.functional")
        tat = _module("torchaudio.transforms")

        def create_dct(n_mfcc, n_mels, norm):
            m = sfft.dct(np.eye(n_mels), type=2,
                         norm="ortho" if norm == "ortho" else None,
                         axis=0)[:n_mfcc].T
            return torch.from_numpy(np.ascontiguousarray(m)).float()

        class MelSpectrogram(torch.nn.Module):
            def __init__(self, sample_rate=24000, n_fft=2048, win_length=None,
                         hop_length=None, n_mels=128, window_fn=torch.hann_window,
                         power=2.0, **kw):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                fb = mel_filterbank(sample_rate, n_fft, n_mels)
                self.register_buffer("fb", torch.from_numpy(np.asarray(fb)))
                self.register_buffer("window", window_fn(self.win_length))

            def forward(self, wav):
                # torchaudio accepts (..., L); torch.stft only <= 2D
                shape = wav.shape
                spec = torch.stft(wav.reshape(-1, shape[-1]), self.n_fft,
                                  hop_length=self.hop_length,
                                  win_length=self.win_length, window=self.window,
                                  center=True, pad_mode="reflect",
                                  return_complex=True)
                power = spec.real ** 2 + spec.imag ** 2
                out = torch.matmul(self.fb.T, power)
                return out.reshape(shape[:-1] + out.shape[-2:])

        class Resample(torch.nn.Module):
            def __init__(self, orig_freq, new_freq):
                super().__init__()

            def forward(self, x):  # pragma: no cover - unused numerics
                return x

        taf.create_dct = create_dct
        tat.MelSpectrogram = MelSpectrogram
        tat.Resample = Resample
        ta.functional = taf
        ta.transforms = tat
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = taf
        sys.modules["torchaudio.transforms"] = tat
