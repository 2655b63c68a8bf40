"""Tiny end-to-end synthesis smoke for the quick tier.

Same code paths as test_infer.py (engine init, style, two-phase bucketed
synthesis, stream/batch equivalence) but on a scaled-down model config so
the whole file compiles and runs in well under a minute on 1 CPU — the
regression canary that always gets run. Full-size coverage stays in
test_infer.py (unmarked tier).
"""

import numpy as np
import pytest

from styletts2_tpu.config import load_config
from styletts2_tpu.infer import StyleTTS2


@pytest.fixture(scope="module")
def engine():
    cfg = load_config({
        # invariant: prod(upsample_rates) == hop_length (each asr frame is
        # 2 mel frames -> 2*hop samples), so the tiny 60x decoder pairs
        # with hop 60
        "preprocess_params": {"spect_params": {"n_fft": 512,
                                               "win_length": 240,
                                               "hop_length": 60}},
        "model_params": {
            "hidden_dim": 64, "max_conv_dim": 64, "dim_in": 16,
            "style_dim": 32, "max_dur": 10,
            "decoder": {"type": "hifigan",
                        # the decode shell's 512-ch output is a reference
                        # architecture constant (hifigan.py:434)
                        "upsample_initial_channel": 512,
                        "upsample_rates": [10, 6],
                        "upsample_kernel_sizes": [20, 12],
                        "resblock_kernel_sizes": [3],
                        "resblock_dilation_sizes": [[1, 3]]},
        },
        "tpu": {"token_buckets": [24, 48],
                "frame_buckets": [60, 120, 240],
                "decoder_dtype": "float32"},
        "debug": False,
    })
    return StyleTTS2(cfg, seed=0)


@pytest.fixture(scope="module")
def style(engine):
    rng = np.random.default_rng(0)
    wav_ref = (rng.standard_normal(24000 * 2) * 0.1).astype(np.float32)
    ref_s = engine.compute_style(wav_ref, denoise=0.3)  # exercises the gate
    return {"style": ref_s, "speed": 1.0}


def test_generate_e2e(engine, style):
    # pinned durations: with hop 60 the random-weight duration head can
    # emit chunks shorter than the 2x4000-sample trim (full-size duration
    # coverage lives in test_infer.py)
    engine.fixed_duration = 10
    try:
        out = engine.generate("Hello there. How are you?", style,
                              stabilize=True, n_merge=2)
    finally:
        engine.fixed_duration = None
    assert out.ndim == 1 and len(out) > 8000
    assert np.isfinite(out).all()
    assert np.abs(out[:4000]).max() == 0 and np.abs(out[-4000:]).max() == 0


def test_stream_matches_generate(engine, style):
    text = "one two three. four five six."
    full = engine.generate(text, style, stabilize=False, n_merge=1)
    segs = list(engine.generate_stream(text, style, stabilize=False,
                                       n_merge=1))
    np.testing.assert_array_equal(np.concatenate(segs), full)
    # single chunk: both sides take the fused single-dispatch path.
    # Equality holds from the SAME engine state — pin the adaptive rate
    # estimate so both calls pick the same frame bucket (a generate call
    # updates it, which could shift the next call's bucket by one step)
    one = "one two three"
    engine._fpt_ema = 5.0
    full1 = engine.generate(one, style, stabilize=False, n_merge=1)
    engine._fpt_ema = 5.0
    segs1 = list(engine.generate_stream(one, style, stabilize=False,
                                        n_merge=1))
    np.testing.assert_array_equal(np.concatenate(segs1), full1)


def test_frame_overflow_splits(engine, style):
    """Quick-tier cover of the no-rate-change overflow split."""
    sentence = "one two three four"
    n_tok = len(engine.cleaner(sentence)) + 2
    max_fb = engine.cfg.tpu.frame_buckets[-1]
    per_tok = int(np.ceil(1.5 * max_fb / n_tok))
    engine.fixed_duration = per_tok
    try:
        wavs, _, _ = engine._synthesize_chunks([sentence], style["style"],
                                               1.0, 0.0, 0.0)
    finally:
        engine.fixed_duration = None
    assert n_tok * per_tok > max_fb
    assert len(wavs[0]) == n_tok * per_tok * 2 * engine.hop


def test_serve_matches_generate_batch(engine, style):
    """Double-buffered serve() must be bit-identical to generate_batch on
    every batch (pipelining changes scheduling, never results)."""
    engine.fixed_duration = 6
    try:
        batches = [["one two three. four five.", "six seven."],
                   ["eight nine ten."]]
        want = [engine.generate_batch(b, style, stabilize=False, n_merge=1)
                for b in batches]
        got = list(engine.serve(batches, style, stabilize=False, n_merge=1))
    finally:
        engine.fixed_duration = None
    assert len(got) == len(want)
    for g_batch, w_batch in zip(got, want):
        assert len(g_batch) == len(w_batch)
        for g, w in zip(g_batch, w_batch):
            np.testing.assert_array_equal(g, w)


def test_duration_scale_calibrates_mean(engine, style):
    """duration_scale multiplies the duration head's raw output exactly."""
    _, means, _ = engine._synthesize_chunks(["one two three"],
                                            style["style"], 1.0, 0.0, 0.0)
    engine.duration_scale = 5.0 / means[-1]
    try:
        _, means2, _ = engine._synthesize_chunks(["one two three"],
                                                 style["style"], 1.0, 0.0,
                                                 0.0)
    finally:
        engine.duration_scale = None
    assert means2[-1] == pytest.approx(5.0, rel=1e-5)


def test_fused_single_dispatch_matches_two_phase(engine, style):
    """The fused tokens->audio graph (one dispatch, durations
    postprocessed on device) must be bit-identical to the 2-phase path it
    shortcuts — pinned, unpinned (on-device z-score clamp + rounding vs
    the host numpy glue), and speed-adjusted."""
    # short enough that every case fits the fused attempt (17 tokens:
    # first-call prior 8 f/t -> 136 <= largest bucket 240)
    text = "hello there you"
    n_tok = len(engine.cleaner(text)) + 2
    assert 8 * n_tok <= engine.cfg.tpu.frame_buckets[-1]
    for fixed, scale, speed in [(5, None, 1.0), (None, None, 1.0),
                                (None, None, 1.3)]:
        engine.fixed_duration = fixed
        engine.duration_scale = scale
        engine._fpt_ema = None
        st = dict(style, speed=speed)
        try:
            engine.fused_enabled = True
            a = engine.generate(text, st, stabilize=False, n_merge=8)
            assert (engine._fpt_ema is not None) == (fixed is None), \
                "fused path did not actually run"
            engine.fused_enabled = False
            b = engine.generate(text, st, stabilize=False, n_merge=8)
        finally:
            engine.fused_enabled = True
            engine.fixed_duration = None
            engine.duration_scale = None
        assert len(a) == len(b)
        if fixed is not None:
            # pinned durations -> fused picks the IDENTICAL frame bucket
            # -> bit-exact
            np.testing.assert_array_equal(a, b)
        else:
            # the fused heuristic may pick a different (larger) frame
            # bucket than 2-phase; XLA tiling at a different static shape
            # moves the f32 waveform by ulps, so the int16 PCM may differ
            # by at most one quantization step (measured: same bucket ->
            # bit-exact, cross-bucket -> +-1/32767)
            assert np.abs(a - b).max() <= 1.01 / 32767
    # the learned rate now sizes a smaller bucket; same +-1-step contract
    engine.fused_enabled = True
    a = engine.generate(text, style, stabilize=False, n_merge=8)
    engine.fused_enabled = False
    b = engine.generate(text, style, stabilize=False, n_merge=8)
    engine.fused_enabled = True
    assert len(a) == len(b) and np.abs(a - b).max() <= 1.01 / 32767


def test_fused_stabilize_matches_two_phase(engine, style):
    """stabilize=True single-chunk calls (the production default) also take
    the fused path: the stabilization noise is drawn host-side from the
    same chain stream the 2-phase plan uses and blended on device — same
    engine seed => same audio as the fallback path (to the cross-bucket
    +-1 PCM step contract of the t=0 test above)."""
    text = "hello there you"
    engine.fixed_duration = None
    engine.duration_scale = None
    outs = []
    for fused in (True, False):
        engine.fused_enabled = fused
        engine._rng = np.random.default_rng(123)
        engine._fpt_ema = 5.0
        outs.append(engine.generate(text, style, stabilize=True, n_merge=8))
    engine.fused_enabled = True
    a, b = outs
    assert len(a) == len(b)
    assert np.abs(a - b).max() <= 1.01 / 32767


def test_fused_overflow_falls_back(engine, style):
    """When the duration head's total overflows the heuristically chosen
    frame bucket, the fused path must defer to the exact 2-phase path
    (which splits at token boundaries) — never truncate or change rate."""
    text = "hello there you"
    n_tok = len(engine.cleaner(text)) + 2
    fbs = engine.cfg.tpu.frame_buckets
    assert 8 * n_tok <= fbs[-1], "text too long for a fused attempt"
    engine.duration_scale = 3.0  # ~15 frames/token >> the 8/token headroom
    try:
        engine.fused_enabled = True
        a = engine.generate(text, style, stabilize=False, n_merge=8)
        engine.fused_enabled = False
        b = engine.generate(text, style, stabilize=False, n_merge=8)
    finally:
        engine.fused_enabled = True
        engine.duration_scale = None
    np.testing.assert_array_equal(a, b)


def test_device_duration_postprocess_matches_host(engine):
    """_device_postprocess_durations is the in-graph mirror of the host
    _postprocess_durations glue: the stochastic stabilization blend (t>0,
    noise = the host chain stream's standard-normal draws), z-score clamp
    on duration[1:-2] (ddof=1, threshold 3, factor .95), speed
    clamp/divide, round, min-1 — must agree with the host numpy per row,
    padding included."""
    import jax.numpy as jnp

    from styletts2_tpu.infer import _device_postprocess_durations

    rng = np.random.default_rng(3)
    engine.fixed_duration = None
    engine.duration_scale = None
    tb = 24
    for it in range(25):
        n = int(rng.integers(1, tb + 1))
        dur = (rng.random(n, dtype=np.float32) * 10).astype(np.float32)
        if n > 5 and rng.random() < 0.5:
            dur[int(rng.integers(1, n - 2))] += 40.0  # force an outlier
        speed = float(rng.choice([0.7, 1.0, 1.3, 2.5]))
        t = float(rng.choice([0.0, 0.2, 0.2]))
        prev = float(rng.choice([0.0, 4.5]))
        # host draws N(mean, std, n); device gets the SAME underlying
        # standard normals (numpy Generator: normal(m, s) == m + s*N(0,1)
        # draw-for-draw) and blends in-graph
        seed = 1000 + it
        want, want_total, _ = engine._postprocess_durations(
            dur.copy(), speed, prev, t,
            rng=np.random.default_rng([seed, 0]))
        noise = np.zeros((1, tb), np.float32)
        if t > 0:
            noise[0, :n] = np.random.default_rng([seed, 0]).normal(
                0.0, 1.0, size=n)
        dd = np.zeros((1, tb), np.float32)
        dd[0, :n] = dur
        mm = np.zeros((1, tb), bool)
        mm[0, :n] = True
        got, got_total = _device_postprocess_durations(
            jnp.asarray(dd), jnp.asarray(mm), jnp.float32(speed),
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0),
            jnp.float32(t), jnp.float32(prev), jnp.asarray(noise))
        np.testing.assert_array_equal(np.asarray(got)[0, :n], want)
        np.testing.assert_array_equal(np.asarray(got)[0, n:], 0)
        assert int(np.asarray(got_total)[0]) == want_total


def test_fused_preserves_engine_rng_stream(engine, style):
    """Toggling fused_enabled must not change later stabilize=True audio:
    the fused path draws exactly one base seed per synthesis, like the
    2-phase plan it shortcuts (fallbacks draw via the plan instead)."""
    short, text = "one two three", "one two three. four five six."
    outs = []
    for fused in (True, False):
        engine.fused_enabled = fused
        engine._rng = np.random.default_rng(7)
        engine._fpt_ema = 5.0
        engine.generate(short, style, stabilize=False, n_merge=1)
        outs.append(engine.generate(text, style, stabilize=True, n_merge=1))
    engine.fused_enabled = True
    np.testing.assert_array_equal(outs[0], outs[1])


def test_rate_estimate_snaps_on_large_step(engine):
    """A speaking-rate step >25% must SNAP the estimate in one observation
    (a 0.8x-per-call EMA decay would walk the fused path's frame-bucket
    choice through every intermediate bucket — one cold XLA compile each).
    Small drift still smooths."""
    engine._fpt_ema = None
    engine._observe_rate(25.0)
    assert engine._fpt_ema == 25.0
    engine._observe_rate(4.0)  # rate step down (e.g. rate-calibrated bench)
    assert engine._fpt_ema == 4.0
    engine._observe_rate(4.2)  # small drift: EMA
    assert abs(engine._fpt_ema - (0.8 * 4.0 + 0.2 * 4.2)) < 1e-9
    engine._observe_rate(8.0)  # rate step up
    assert engine._fpt_ema == 8.0
    engine._fpt_ema = None


def test_fused_async_compile_serves_then_hits(engine, style):
    """fused_compile='async': a cold fused bucket is served by the 2-phase
    path (identical audio) while the fused graph compiles on a background
    thread; once ready, the same request runs fused."""
    text = "hello there you"
    engine.fixed_duration = 5  # pinned -> fused picks the same bucket as
    try:                       # 2-phase -> bit-exact comparisons
        engine.fused_compile = "async"
        engine._fused_ready = set()
        engine.fused_enabled = False
        want = engine.generate(text, style, stabilize=False, n_merge=8)
        engine.fused_enabled = True
        a = engine.generate(text, style, stabilize=False, n_merge=8)
        np.testing.assert_array_equal(a, want)  # served by 2-phase
        engine.wait_fused_compiles()
        assert engine._fused_ready, "background compile did not land"
        b = engine.generate(text, style, stabilize=False, n_merge=8)
        np.testing.assert_array_equal(b, want)  # now fused, same audio
    finally:
        engine.fused_compile = "sync"
        engine.fixed_duration = None
