"""Audio format breadth: float32/24-bit WAV and FLAC (the reference reads
anything soundfile supports, meldataset.py:101 — LibriTTS ships FLAC)."""

import os
import struct

import numpy as np
import pytest

from styletts2_tpu import audio as AUD
from styletts2_tpu import flac as FL


def _write_float32_wav(path, wav, sr=24000):
    data = np.asarray(wav, np.float32).tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def _write_pcm24_wav(path, wav, sr=24000):
    v = (np.clip(np.asarray(wav, np.float64), -1, 1) * 8388607).astype(np.int32)
    b = np.zeros((len(v), 3), np.uint8)
    b[:, 0] = v & 0xFF
    b[:, 1] = (v >> 8) & 0xFF
    b[:, 2] = (v >> 16) & 0xFF
    data = b.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 3, 3, 24))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


@pytest.fixture
def sig():
    t = np.arange(12000) / 24000.0
    return (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def test_float32_wav(tmp_path, sig):
    p = str(tmp_path / "f32.wav")
    _write_float32_wav(p, sig)
    back, sr = AUD.read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(back, sig, atol=1e-6)
    assert AUD.probe_duration_samples(p, 24000) == len(sig)


def test_pcm24_wav(tmp_path, sig):
    p = str(tmp_path / "p24.wav")
    _write_pcm24_wav(p, sig)
    back, sr = AUD.read_wav(p)
    np.testing.assert_allclose(back, sig, atol=2e-7)


@pytest.mark.parametrize("subframe", ["verbatim", "fixed2", "lpc2"])
def test_flac_roundtrip(tmp_path, sig, subframe):
    p = str(tmp_path / f"{subframe}.flac")
    FL.write_flac(p, sig, subframe=subframe)
    back, sr = AUD.read_audio(p)
    assert sr == 24000
    ref = np.clip(sig, -1, 1)
    ref16 = np.round(ref.astype(np.float64) * 32767) / 32768.0
    np.testing.assert_allclose(back, ref16, atol=1e-4)
    n, psr = FL.probe_flac_info(p)
    assert (n, psr) == (len(sig), 24000)
    assert AUD.probe_duration_samples(p, 24000) == len(sig)


def test_flac_constant(tmp_path):
    wav = np.full(5000, 0.25, np.float32)
    p = str(tmp_path / "c.flac")
    FL.write_flac(p, wav, subframe="constant")
    back, sr = FL.read_flac(p)
    np.testing.assert_allclose(back, np.full(5000, 8191 / 32768.0), atol=2e-4)


def test_dataset_reads_flac(tmp_path, sig):
    from styletts2_tpu.config import SymbolConfig
    from styletts2_tpu.data.dataset import FilePathDataset
    from styletts2_tpu.text import build_symbol_dict

    p = str(tmp_path / "x.flac")
    FL.write_flac(p, sig, subframe="fixed2")
    ds = FilePathDataset(["x.flac|hello"], str(tmp_path),
                         build_symbol_dict(SymbolConfig()), debug=False)
    assert ds.lengths() == [len(sig)]
    wave, tokens, path = ds[0]
    assert len(wave) == len(sig) + 24000  # 0.5 s pads both ends
    assert path == "x.flac"


@pytest.mark.parametrize("subframe", ["constant", "verbatim", "fixed2",
                                      "lpc2"])
def test_flac_native_matches_python(tmp_path, subframe, monkeypatch):
    """The C++ decoder (native/flac_decode.cpp) must be bit-exact with the
    pure-python bitstream decoder on every subframe type the in-repo
    encoder emits (constant / verbatim / fixed / LPC + Rice residuals)."""
    if subframe == "constant":
        wav = np.full(9000, -0.125, np.float32)
    else:
        t = np.arange(9000) / 24000.0
        rng = np.random.default_rng(3)
        wav = (0.4 * np.sin(2 * np.pi * 180 * t)
               + 0.05 * rng.standard_normal(9000)).astype(np.float32)
    p = str(tmp_path / f"{subframe}.flac")
    FL.write_flac(p, wav, subframe=subframe)

    native = FL._read_flac_native(open(p, "rb").read())
    if native is None:
        pytest.skip("native FLAC decoder unavailable (no g++)")
    monkeypatch.setenv("STYLETTS2_TPU_NO_NATIVE_FLAC", "1")
    py, sr_py = FL.read_flac(p)
    got, sr = native
    assert sr == sr_py == 24000
    assert got.dtype == np.float32 and got.shape == py.shape
    np.testing.assert_array_equal(got, py)


def test_flac_native_routed_by_default(tmp_path, sig, monkeypatch):
    """read_flac routes through the native decoder when it compiles (and
    still matches the python path end to end)."""
    p = str(tmp_path / "routed.flac")
    FL.write_flac(p, sig, subframe="lpc2")
    if FL._native_lib() is None:
        pytest.skip("native FLAC decoder unavailable (no g++)")
    via_native, _ = FL.read_flac(p)
    monkeypatch.setenv("STYLETTS2_TPU_NO_NATIVE_FLAC", "1")
    via_py, _ = FL.read_flac(p)
    np.testing.assert_array_equal(via_native, via_py)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
def test_flac_stereo_decorrelation(tmp_path, mode, monkeypatch):
    """Stereo channel-decorrelation paths (independent / left-side /
    right-side / mid-side): first channel out == left, python and native
    decoders bit-exact."""
    rng = np.random.default_rng(7)
    t = np.arange(6000) / 24000.0
    left = (0.4 * np.sin(2 * np.pi * 200 * t)
            + 0.02 * rng.standard_normal(6000)).astype(np.float32)
    right = (0.3 * np.sin(2 * np.pi * 330 * t)
             + 0.02 * rng.standard_normal(6000)).astype(np.float32)
    p = str(tmp_path / f"{mode}.flac")
    FL.write_flac_stereo(p, left, right, mode=mode)

    native = FL._read_flac_native(open(p, "rb").read())
    monkeypatch.setenv("STYLETTS2_TPU_NO_NATIVE_FLAC", "1")
    py, sr = FL.read_flac(p)
    assert sr == 24000
    # the fixture encoder TRUNCATES: (pcm * 32767).astype(int64)
    want = np.trunc(np.clip(left, -1, 1).astype(np.float64)
                    * 32767).astype(np.float32) / 32768.0
    np.testing.assert_allclose(py, want, atol=1e-6)
    if native is None:
        pytest.skip("native FLAC decoder unavailable (no g++)")
    got, sr_n = native
    assert sr_n == 24000
    np.testing.assert_array_equal(got, py)


def test_flac_native_rejects_corrupt_header(tmp_path, sig):
    """A FLAC whose first metadata block is not STREAMINFO (or whose total
    is absurd) must not reach the native path's allocation — the python
    decoder's error surfaces instead."""
    p = str(tmp_path / "ok.flac")
    FL.write_flac(p, sig, subframe="fixed2")
    data = bytearray(open(p, "rb").read())
    data[4] = (data[4] & 0x80) | 0x02  # block type 2 (application)
    assert FL._read_flac_native(bytes(data)) is None
