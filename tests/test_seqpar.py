"""Sequence-parallel decoder parity: the frame-sharded decode over an
8-device mesh must reproduce the single-device waveform.

What this proves: the halo margins cover the decoder's receptive field,
the psum'd AdaIN stats equal the global stats, and the replicated NSF
source keeps the sine phase bit-identical — i.e. the SURVEY §5 "shard the
vocoder frame axis with halo exchange" design is exact, not approximate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.config import load_config
from styletts2_tpu.nn import decoder as DE
from styletts2_tpu.parallel import make_mesh
from styletts2_tpu.parallel.seqpar import (
    decoder_receptive_field, sp_decoder_apply)

# the two full parity tests compile multi-device decoder graphs (a few
# minutes on 1 CPU) — default tier; the cheap validation tests are quick


def _small_cfg(decoder_type="hifigan"):
    """Reduced-but-structured hifigan: 2 upsample stages, a dilated stack,
    so the receptive-field bound is exercised for real. The initial channel
    count must stay 512 (the decoder shell's output width)."""
    return load_config({
        "model_params": {
            "style_dim": 32,
            "decoder": {
                "type": decoder_type,
                "upsample_initial_channel": 512,
                "upsample_rates": [10, 6],
                "upsample_kernel_sizes": [20, 12],
                "resblock_kernel_sizes": [3, 7],
                "resblock_dilation_sizes": [[1, 3], [1, 3, 5]],
            },
        },
    }).model_params


def _decoder_inputs(rng, b, f_total, style_dim=32, dim_in=512):
    asr = jnp.asarray(rng.standard_normal((b, f_total, dim_in)), jnp.float32)
    f0 = jnp.asarray(
        100.0 + 50.0 * rng.standard_normal((b, 2 * f_total)), jnp.float32)
    n = jnp.asarray(rng.standard_normal((b, 2 * f_total)) * 0.3, jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, style_dim)), jnp.float32)
    return asr, f0, n, s


def test_sp_decoder_matches_single_device():
    mp = _small_cfg()
    cfg = mp.decoder
    key = jax.random.PRNGKey(0)
    p_dec = DE.decoder_init(key, cfg, dim_in=512, style_dim=mp.style_dim)

    n_dev = 8
    mesh = make_mesh(n_dev, axis="sp")
    margin = decoder_receptive_field(cfg)
    f_total = n_dev * max(16, margin + 2)
    rng = np.random.default_rng(1)
    asr, f0, n, s = _decoder_inputs(rng, 2, f_total,
                                    style_dim=mp.style_dim)

    ref = DE.decoder_apply(p_dec, cfg, asr, f0, n, s, rng=None, train=False,
                           frame_mask=None)
    got = sp_decoder_apply(mesh, p_dec, cfg, asr, f0, n, s, margin=margin,
                           axis="sp")

    ref = np.asarray(ref)
    got = np.asarray(got)
    assert got.shape == ref.shape
    # only the norm stats' psum association differs from one device (f32):
    # the waveforms must agree to rounding noise, not "roughly"
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


def test_sp_vocos_matches_single_device():
    """Vocos head under SP: the iSTFT overlap-add sees exactly the global
    frame grid (seq_mask), so the 8-device waveform matches one device —
    including the envelope-divided global edges."""
    mp = load_config({
        "model_params": {
            "style_dim": 32,
            "decoder": {
                "type": "vocos",
                "num_layers": 3,
                "intermediate_dim": 256,
                "gen_istft_n_fft": 240,
                "gen_istft_hop_size": 60,
            },
        },
    }).model_params
    cfg = mp.decoder
    p_dec = DE.decoder_init(jax.random.PRNGKey(5), cfg, dim_in=512,
                            style_dim=mp.style_dim)
    n_dev = 8
    mesh = make_mesh(n_dev, axis="sp")
    margin = decoder_receptive_field(cfg)
    f_total = n_dev * max(16, margin + 2)
    rng = np.random.default_rng(6)
    asr, f0, n, s = _decoder_inputs(rng, 2, f_total, style_dim=mp.style_dim)

    ref = DE.decoder_apply(p_dec, cfg, asr, f0, n, s, rng=None, train=False,
                           frame_mask=None)
    got = sp_decoder_apply(mesh, p_dec, cfg, asr, f0, n, s, margin=margin,
                           axis="sp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_sp_istftnet_matches_single_device():
    """iSTFTNet head under SP: the replicated source STFT (center=True)
    and the reflection-padded +1 frame grid are reproduced per window
    (seq_win), so the 8-device waveform matches one device."""
    mp = _small_cfg("istftnet")
    cfg = mp.decoder
    p_dec = DE.decoder_init(jax.random.PRNGKey(7), cfg, dim_in=512,
                            style_dim=mp.style_dim)
    n_dev = 8
    mesh = make_mesh(n_dev, axis="sp")
    margin = decoder_receptive_field(cfg)
    f_total = n_dev * max(16, margin + 2)
    rng = np.random.default_rng(8)
    asr, f0, n, s = _decoder_inputs(rng, 2, f_total, style_dim=mp.style_dim)

    ref = DE.decoder_apply(p_dec, cfg, asr, f0, n, s, rng=None, train=False,
                           frame_mask=None)
    got = sp_decoder_apply(mesh, p_dec, cfg, asr, f0, n, s, margin=margin,
                           axis="sp")
    ref = np.asarray(ref)
    got = np.asarray(got)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


def test_sp_istftnet_padded_prefix_matches_masked_single_device():
    """istftnet + n_valid: the padded-coordinate validity mask (mask_pad)
    must reproduce the single-device prefix frame_mask semantics through
    the reflection-padded last stage."""
    mp = _small_cfg("istftnet")
    cfg = mp.decoder
    p_dec = DE.decoder_init(jax.random.PRNGKey(9), cfg, dim_in=512,
                            style_dim=mp.style_dim)
    n_dev = 8
    mesh = make_mesh(n_dev, axis="sp")
    margin = decoder_receptive_field(cfg)
    f_total = n_dev * max(16, margin + 2)
    rng = np.random.default_rng(10)
    asr, f0, n, s = _decoder_inputs(rng, 2, f_total, style_dim=mp.style_dim)
    nv = np.array([f_total - f_total // 3, f_total], np.int32)
    frame_mask = jnp.arange(f_total)[None, :] < jnp.asarray(nv)[:, None]

    ref = DE.decoder_apply(p_dec, cfg, asr, f0, n, s, rng=None, train=False,
                           frame_mask=frame_mask)
    got = sp_decoder_apply(mesh, p_dec, cfg, asr, f0, n, s, margin=margin,
                           axis="sp", n_valid=nv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_sp_decoder_padded_prefix_matches_masked_single_device():
    """n_valid (padded static bucket) == single-device prefix frame_mask:
    the engine's bucketed phase-2 contract, frame-sharded."""
    mp = _small_cfg()
    cfg = mp.decoder
    p_dec = DE.decoder_init(jax.random.PRNGKey(3), cfg, dim_in=512,
                            style_dim=mp.style_dim)
    n_dev = 8
    mesh = make_mesh(n_dev, axis="sp")
    margin = decoder_receptive_field(cfg)
    f_total = n_dev * max(16, margin + 2)
    rng = np.random.default_rng(4)
    asr, f0, n, s = _decoder_inputs(rng, 2, f_total, style_dim=mp.style_dim)
    # valid prefixes: one ends mid-device, one a full-length row
    nv = np.array([f_total - f_total // 3, f_total], np.int32)
    frame_mask = jnp.arange(f_total)[None, :] < jnp.asarray(nv)[:, None]

    ref = DE.decoder_apply(p_dec, cfg, asr, f0, n, s, rng=None, train=False,
                           frame_mask=frame_mask)
    got = sp_decoder_apply(mesh, p_dec, cfg, asr, f0, n, s, margin=margin,
                           axis="sp", n_valid=nv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


@pytest.mark.quick
def test_sp_decoder_validates_inputs():
    mp = _small_cfg()
    cfg = mp.decoder
    p_dec = DE.decoder_init(jax.random.PRNGKey(0), cfg, dim_in=512,
                            style_dim=mp.style_dim)
    mesh = make_mesh(8, axis="sp")
    rng = np.random.default_rng(2)
    asr, f0, n, s = _decoder_inputs(rng, 1, 8 * 32, style_dim=mp.style_dim)

    with pytest.raises(ValueError, match="not divisible"):
        sp_decoder_apply(mesh, p_dec, cfg, asr[:, :100], f0[:, :200],
                         n[:, :200], s)
    with pytest.raises(ValueError, match="receptive field"):
        sp_decoder_apply(mesh, p_dec, cfg, asr, f0, n, s, margin=2)
    with pytest.raises(ValueError, match="per-device frames"):
        sp_decoder_apply(mesh, p_dec, cfg, asr, f0, n, s, margin=40)


def test_engine_seq_parallel_matches_single_chip(monkeypatch):
    """StyleTTS2(mesh=..., seq_parallel=True) end-to-end: same audio as
    the single-chip engine (int16 PCM may differ by one quantization step
    from the psum'd norm stats), and the SP decode path actually runs."""
    from styletts2_tpu.infer import StyleTTS2
    import styletts2_tpu.parallel.seqpar as SPmod

    cfg = load_config({
        "preprocess_params": {"spect_params": {"n_fft": 512,
                                               "win_length": 240,
                                               "hop_length": 60}},
        "model_params": {
            "hidden_dim": 64, "max_conv_dim": 64, "dim_in": 16,
            "style_dim": 32, "max_dur": 10,
            "decoder": {"type": "hifigan",
                        "upsample_initial_channel": 512,
                        "upsample_rates": [10, 6],
                        "upsample_kernel_sizes": [20, 12],
                        "resblock_kernel_sizes": [3],
                        "resblock_dilation_sizes": [[1, 3]]},
        },
        # one frame bucket, sized for the SP gate: 256 % 8 == 0 and
        # 256 / 8 = 32 >= margin
        "tpu": {"token_buckets": [32], "frame_buckets": [256],
                "decoder_dtype": "float32"},
        "debug": False,
    })
    e1 = StyleTTS2(cfg, seed=0)
    e2 = StyleTTS2(cfg, seed=0, mesh=make_mesh(8, axis="dp"),
                   seq_parallel=True)

    calls = []
    orig = SPmod.sp_decoder_apply

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(SPmod, "sp_decoder_apply", spy)

    wav_ref = (np.random.default_rng(0).standard_normal(24000 * 2)
               * 0.1).astype(np.float32)
    style = {"style": e1.compute_style(wav_ref, denoise=0.0), "speed": 1.0}
    text = "one two three four five"
    for e in (e1, e2):
        e.fixed_duration = 10  # ~170 frames -> the 256 bucket, SP active
        e.fused_enabled = False
    try:
        a = e1.generate(text, style, stabilize=False, n_merge=1)
        b = e2.generate(text, style, stabilize=False, n_merge=1)
    finally:
        for e in (e1, e2):
            e.fixed_duration = None
            e.fused_enabled = True
    assert calls, "seq-parallel decode path was not taken"
    assert a.shape == b.shape
    assert np.abs(a.astype(np.float32) - b.astype(np.float32)).max() \
        <= 1.01 / 32767


def test_engine_seq_parallel_validates():
    from styletts2_tpu.infer import StyleTTS2

    cfg = load_config({"tpu": {"decoder_dtype": "float32"}})
    with pytest.raises(ValueError, match="requires a mesh"):
        StyleTTS2(cfg, seed=0, seq_parallel=True)


@pytest.mark.quick
def test_receptive_field_bound_is_meaningful():
    # the bound must be small enough to be usable (margin <= realistic
    # per-device frame counts) and nonzero
    cfg = _small_cfg().decoder
    rf = decoder_receptive_field(cfg)
    assert 5 < rf < 64
    # default full-size config
    full = load_config({}).model_params.decoder
    rf_full = decoder_receptive_field(full)
    assert 5 < rf_full <= 32, rf_full  # DEFAULT_MARGIN must cover it
