"""Inference engine end-to-end (random weights, CPU, tiny buckets)."""

import numpy as np
import pytest

import jax.numpy as jnp

from styletts2_tpu.config import load_config
from styletts2_tpu.infer import StyleTTS2, _bucket, _partition_exact


@pytest.fixture(scope="module")
def engine():
    cfg = load_config({
        "model_params": {"decoder": {"type": "hifigan"}},
        "tpu": {"token_buckets": [32, 64],
                "frame_buckets": [80, 160, 240, 480, 960],
                "decoder_dtype": "float32"},
        "debug": False,
    })
    return StyleTTS2(cfg, seed=0)


def test_bucket_selection():
    assert _bucket((32, 64, 128), 1) == 32
    assert _bucket((32, 64, 128), 32) == 32
    assert _bucket((32, 64, 128), 33) == 64
    with pytest.raises(ValueError):
        _bucket((32,), 64)


def test_compute_style_shapes(engine):
    sr = 24000
    rng = np.random.default_rng(0)
    # > 4 s -> averaged 3 s windows; < 4 s -> single pass
    for seconds in (2.5, 7.2):
        wav = (rng.standard_normal(int(sr * seconds)) * 0.1).astype(np.float32)
        style = engine.compute_style(wav, denoise=0.0)
        assert np.asarray(style).shape == (1, 128)
        assert np.isfinite(np.asarray(style)).all()


def test_generate_end_to_end(engine):
    rng = np.random.default_rng(1)
    wav_ref = (rng.standard_normal(24000 * 5) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)
    style = engine.get_styles({"path": None, "speed": 1.0}, load_styles=True)

    out = engine.generate("Hello there. How are you?", style,
                          stabilize=True, n_merge=2)
    assert out.ndim == 1 and len(out) > 8000
    assert np.isfinite(out).all()
    # silence padding at both ends (reference inference.py:318)
    assert np.abs(out[:4000]).max() == 0 and np.abs(out[-4000:]).max() == 0


def test_generate_deterministic_without_stabilize(engine):
    rng = np.random.default_rng(2)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)
    style = engine.get_styles({"path": None, "speed": 1.0}, load_styles=True)
    a = engine.generate("one two three", style, stabilize=False, n_merge=1)
    b = engine.generate("one two three", style, stabilize=False, n_merge=1)
    np.testing.assert_array_equal(a, b)


def test_speed_control(engine):
    rng = np.random.default_rng(3)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)
    slow = engine.generate("some words to say here",
                           {"style": engine.ref_s, "speed": 0.5},
                           stabilize=False, n_merge=1)
    fast = engine.generate("some words to say here",
                           {"style": engine.ref_s, "speed": 2.0},
                           stabilize=False, n_merge=1)
    assert len(slow) > len(fast)


def test_chunk_batching_matches_single(engine):
    """Batched same-bucket chunks must produce the same audio as one-by-one
    synthesis (padding rows are discarded)."""
    rng = np.random.default_rng(7)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)
    sentences = ["one two three", "four five six seven", "eight nine"]

    batched, _, _ = engine._synthesize_chunks(sentences, engine.ref_s, 1.0,
                                              0.0, 0.0)
    singles = []
    for sent in sentences:
        w, _, _ = engine._synthesize_chunks([sent], engine.ref_s, 1.0,
                                            0.0, 0.0)
        singles.append(w[0])
    assert len(batched) == len(singles)
    for a, b in zip(batched, singles):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_generate_stream_matches_generate(engine):
    rng = np.random.default_rng(8)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)
    style = {"style": engine.ref_s, "speed": 1.0}
    text = "one two three. four five six. seven eight nine ten."
    full = engine.generate(text, style, stabilize=False, n_merge=1)
    segs = list(engine.generate_stream(text, style, stabilize=False,
                                       n_merge=1))
    assert len(segs) > 1  # actually streamed in chunks
    np.testing.assert_array_equal(np.concatenate(segs), full)


def test_generate_batch_matches_per_text(engine):
    rng = np.random.default_rng(9)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)
    style = {"style": engine.ref_s, "speed": 1.0}
    texts = ["one two three. four five.", "six seven eight nine.", ""]
    batch = engine.generate_batch(texts, style, stabilize=False, n_merge=1)
    for text, got in zip(texts, batch):
        want = engine.generate(text, style, stabilize=False, n_merge=1)
        np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.fixture(scope="module")
def mesh_engine():
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    assert len(devices) >= 4  # conftest provisions 8 virtual CPU devices
    mesh = Mesh(np.array(devices[:4]), ("dp",))
    cfg = load_config({
        "model_params": {"decoder": {"type": "hifigan"}},
        "tpu": {"token_buckets": [32, 64],
                "frame_buckets": [80, 160, 240, 480, 960],
                "decoder_dtype": "float32"},
        "debug": False,
    })
    return StyleTTS2(cfg, seed=0, mesh=mesh)


def test_mesh_sharded_inference_matches_single_device(engine, mesh_engine):
    """Batch-sharded phase graphs over a 4-device 'dp' mesh produce the
    same audio as the single-device engine (multi-chip serving path)."""
    meshed = mesh_engine
    assert meshed.batch_buckets == (4, 8, 16)

    rng = np.random.default_rng(11)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)
    meshed.ref_s = meshed.compute_style(wav_ref, denoise=0.0)
    np.testing.assert_allclose(np.asarray(meshed.ref_s),
                               np.asarray(engine.ref_s), atol=1e-5)
    style_a = {"style": engine.ref_s, "speed": 1.0}
    style_b = {"style": meshed.ref_s, "speed": 1.0}
    text = "one two three. four five six. seven eight."
    a = engine.generate(text, style_a, stabilize=False, n_merge=1)
    b = meshed.generate(text, style_b, stabilize=False, n_merge=1)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_mesh_padded_tail_group_matches_single_device(engine, mesh_engine):
    """A piece count that is not a bucket multiple exercises the
    exact-groups-then-padded-tail partition (5 pieces on a 4-device mesh
    -> batch of 4 + batch of 1 padded to 4) and must still reproduce the
    single-device audio per text."""
    meshed = mesh_engine
    rng = np.random.default_rng(13)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)
    meshed.ref_s = meshed.compute_style(wav_ref, denoise=0.0)
    engine.fixed_duration = meshed.fixed_duration = 4
    try:
        texts = [f"speak part {i} now." for i in range(5)]
        style_a = {"style": engine.ref_s, "speed": 1.0}
        style_b = {"style": meshed.ref_s, "speed": 1.0}
        outs = meshed.generate_batch(texts, style_b, stabilize=False,
                                     n_merge=1)
        assert len(outs) == 5
        for text, got in zip(texts, outs):
            want = engine.generate(text, style_a, stabilize=False, n_merge=1)
            np.testing.assert_allclose(got, want, atol=2e-4)
    finally:
        engine.fixed_duration = meshed.fixed_duration = None


def test_frame_overflow_splits_without_rate_change(engine, capsys):
    """A chunk needing ~2x the largest frame bucket is split at a token
    boundary into pieces — audio length equals the unsplit durations' sum
    exactly (the old behavior compressed durations: a silent speed-up).
    Reference: no frame limit at all (inference.py:258-263)."""
    rng = np.random.default_rng(21)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)

    sentence = "one two three four five six seven eight nine ten"
    tokens = engine.cleaner(sentence)
    n_tok = len(tokens) + 2  # pad wrap
    max_fb = engine.cfg.tpu.frame_buckets[-1]
    per_tok = int(np.ceil(2.0 * max_fb / n_tok))  # ~2x the largest bucket
    engine.fixed_duration = per_tok
    try:
        wavs, _, _ = engine._synthesize_chunks([sentence], engine.ref_s,
                                               1.0, 0.0, 0.0)
    finally:
        engine.fixed_duration = None
    want_frames = n_tok * per_tok
    assert want_frames > max_fb  # the premise: this chunk overflows
    assert len(wavs[0]) == want_frames * 2 * engine.hop
    assert np.isfinite(wavs[0]).all()
    assert "compressing durations" not in capsys.readouterr().out


def test_partition_exact():
    # exact mode (single-chip: sizes include 1)
    sizes = (1, 2, 4, 8, 16)
    assert [len(g) for g in _partition_exact(list(range(6)), sizes)] == [4, 2]
    got = _partition_exact(list(range(23)), sizes)
    assert [len(g) for g in got] == [16, 4, 2, 1]
    assert [i for g in got for i in g] == list(range(23))

    # mesh mode (sizes are device-count multiples): exact groups first,
    # one short tail for the caller to pad — a 17-piece list must NOT
    # become a single padded batch of 32
    sizes = (8, 16, 32)
    got = _partition_exact(list(range(17)), sizes, pad_tail=True)
    assert [len(g) for g in got] == [16, 1]
    got = _partition_exact(list(range(40)), sizes, pad_tail=True)
    assert [len(g) for g in got] == [32, 8]
    got = _partition_exact(list(range(5)), sizes, pad_tail=True)
    assert [len(g) for g in got] == [5]

    with pytest.raises(ValueError):
        _partition_exact(list(range(17)), sizes)


def test_split_spans_partition():
    spans = StyleTTS2._split_spans(np.array([5, 5, 5, 5, 5]), 12)
    assert spans == [(0, 2), (2, 4), (4, 5)]
    spans = StyleTTS2._split_spans(np.array([5, 5]), 12)
    assert spans == [(0, 2)]
    # spans tile the token range exactly
    d = np.array([3, 9, 1, 7, 2, 8, 4])
    spans = StyleTTS2._split_spans(d, 10)
    assert spans[0][0] == 0 and spans[-1][1] == len(d)
    for (a, b), (a2, _) in zip(spans, spans[1:]):
        assert b == a2
    for a, b in spans:
        assert d[a:b].sum() <= 10


def test_generate_batch_composition_independent_with_stabilize():
    """With stabilize=True, a text's audio must not depend on which other
    texts share the batch (per-chain noise streams)."""
    cfg = load_config({
        "model_params": {"decoder": {"type": "hifigan"}},
        "tpu": {"token_buckets": [32, 64],
                "frame_buckets": [80, 160, 240, 480, 960],
                "decoder_dtype": "float32"},
        "debug": False,
    })
    rng = np.random.default_rng(22)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    text_a = "one two three. four five six."
    e1 = StyleTTS2(cfg, seed=5)
    s1 = {"style": e1.compute_style(wav_ref, denoise=0.0), "speed": 1.0}
    out1 = e1.generate_batch([text_a, "seven eight."], s1, stabilize=True,
                             n_merge=1)
    e2 = StyleTTS2(cfg, seed=5)
    s2 = {"style": e2.compute_style(wav_ref, denoise=0.0), "speed": 1.0}
    out2 = e2.generate_batch([text_a, "nine ten eleven twelve. thirteen."],
                             s2, stabilize=True, n_merge=1)
    np.testing.assert_allclose(out1[0], out2[0], atol=2e-4)


def test_save_load_styles(engine, tmp_path):
    rng = np.random.default_rng(4)
    wav_ref = (rng.standard_normal(24000 * 3) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(wav_ref, denoise=0.0)
    p = str(tmp_path / "style.npy")
    engine.save_styles(p)
    before = np.asarray(engine.ref_s).copy()
    engine.ref_s = None
    engine.load_styles(p)
    np.testing.assert_array_equal(np.asarray(engine.ref_s), before)
