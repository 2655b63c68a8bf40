"""Data pipeline: dataset loading, duration binning, static batch shapes."""

import os

import numpy as np
import pytest

from styletts2_tpu import audio as AUD
from styletts2_tpu.config import SymbolConfig
from styletts2_tpu.data import build_dataloader
from styletts2_tpu.data.sampler import DurationBinSampler, time_bin
from styletts2_tpu.data.loader import bin_upper_frames
from styletts2_tpu.text import build_symbol_dict


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    lines = []
    for i, dur_s in enumerate([0.8, 1.1, 1.15, 2.3, 2.35, 0.9]):
        wav = (rng.standard_normal(int(24000 * dur_s)) * 0.1).astype(np.float32)
        AUD.write_wav(str(d / f"{i}.wav"), wav)
        lines.append(f"{i}.wav|hello world {i}")
    return str(d), lines


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    wav = rng.uniform(-0.9, 0.9, 1000).astype(np.float32)
    p = str(tmp_path / "x.wav")
    AUD.write_wav(p, wav)
    back, sr = AUD.read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(back, wav, atol=1e-4)


def test_trim_silence():
    wav = np.concatenate([np.zeros(5000), np.sin(np.arange(8000) * 0.1) * 0.5,
                          np.zeros(6000)]).astype(np.float32)
    trimmed, (s, e) = AUD.trim_silence(wav, top_db=30)
    assert s <= 5000 + 1024 and s > 2000
    assert len(trimmed) < len(wav)


def test_time_bins():
    # reference meldataset.py:302-307: 20-frame bins after a 20-frame floor
    assert time_bin(19 * 300) == -1
    assert time_bin(20 * 300) == 0
    assert time_bin(39 * 300) == 0
    assert time_bin(40 * 300) == 1
    # static batch shape = raw bin edge (40) + the dataset's 2x0.5 s
    # silence padding (80 frames) that binning-by-raw-length doesn't see
    assert bin_upper_frames(0) == 120


def test_collate_never_truncates(wav_dir):
    """Binning uses RAW file length but the dataset pads 0.5 s of silence on
    both ends — the static shape must cover raw + padding, so no trailing
    audio is dropped (round-1 bug: every sample lost its last ~0.5-1 s)."""
    root, lines = wav_dir
    symbol_dict = build_symbol_dict(SymbolConfig())
    loader = build_dataloader(lines, root, symbol_dict, batch_size=2,
                              debug=False)
    for bin_id, batch in loader:
        for row, path in zip(batch.waves, batch.paths):
            full, sr = AUD.read_wav(os.path.join(root, path))
            n = len(full)
            # the padded item = [12000 zeros, full, 12000 zeros]; the
            # collated row must contain ALL of it (trailing zeros and all)
            np.testing.assert_array_equal(row[12000:12000 + n], full)
            assert batch.waves.shape[1] >= n + 24000 - 1


def test_bin_crop_frames():
    from styletts2_tpu.data.loader import bin_crop_frames, bin_min_frames

    # bin 0: raw frames [20, 40) + 80 pad frames -> min padded mel 100
    assert bin_min_frames(0) == 100
    # reference crop bound (train.py:235): min(batch_min//2 - 1, max_len//2)
    assert bin_crop_frames(0, 300) == 49
    assert bin_crop_frames(20, 300) == 150  # long bins hit the max_len cap
    # crops always satisfy the style encoder's 66-frame minimum (2*crop)
    assert 2 * bin_crop_frames(0, 300) >= 66


def test_sampler_rank_sharding():
    lengths = [300 * f for f in [25, 26, 27, 28, 45, 46, 47, 48]]
    batches_by_rank = {}
    for rank in (0, 1):
        s = DurationBinSampler(lengths, batch_size=2, num_replicas=2,
                               rank=rank, shuffle=False, drop_last=True)
        batches_by_rank[rank] = list(s)
    seen0 = {i for _, b in batches_by_rank[0] for i in b}
    seen1 = {i for _, b in batches_by_rank[1] for i in b}
    assert seen0.isdisjoint(seen1)
    assert len(seen0) + len(seen1) == 8
    # every batch stays within one duration bin
    for _, batch in batches_by_rank[0] + batches_by_rank[1]:
        bins = {time_bin(lengths[i]) for i in batch}
        assert len(bins) == 1


def test_dataloader_static_shapes(wav_dir):
    root, lines = wav_dir
    symbol_dict = build_symbol_dict(SymbolConfig())
    loader = build_dataloader(lines, root, symbol_dict, batch_size=2,
                              debug=False)
    n = 0
    for bin_id, batch in loader:
        n += 1
        frames = bin_upper_frames(bin_id)
        assert batch.waves.shape[1] == frames * 300
        assert batch.texts.shape[1] % 32 == 0
        assert (batch.mel_lengths % 2 == 0).all()
        assert (batch.mel_lengths <= frames).all()
        # 0.5 s pads put every clip over the style-encoder minimum
        assert (batch.mel_lengths >= 66).all()
    assert n >= 2
