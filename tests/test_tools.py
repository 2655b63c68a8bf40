"""Tooling: checkpoint save/load/strip, token extension, voicepacks, SLM."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.checkpoint import (apply_checkpoint, load_checkpoint,
                                      save_checkpoint, strip_for_inference)
from styletts2_tpu.config import load_config
from styletts2_tpu.models import build_model, param_count


@pytest.fixture(scope="module")
def small_params():
    # genuinely scaled-down (checkpoint/tooling logic is size-independent;
    # the full-size tree previously made each save/load roundtrip here a
    # ~580 MB npz pass and this file the slowest of the quick tier)
    cfg = load_config({
        "model_params": {
            "hidden_dim": 64, "max_conv_dim": 64, "dim_in": 16,
            "style_dim": 32, "max_dur": 10,
            "ASR_params": {"input_dim": 80, "hidden_dim": 64,
                           "n_layers": 3, "token_embedding_dim": 128},
            "decoder": {"type": "hifigan",
                        "upsample_initial_channel": 64,
                        "upsample_rates": [10, 6],
                        "upsample_kernel_sizes": [20, 12],
                        "resblock_kernel_sizes": [3],
                        "resblock_dilation_sizes": [[1, 3]]},
        },
    }).model_params
    return cfg, build_model(jax.random.PRNGKey(0), cfg)


@pytest.mark.slow  # multi-second model build + save/load; full-suite only
def test_checkpoint_roundtrip(tmp_path, small_params):
    cfg, params = small_params
    p = str(tmp_path / "ckpt.ckpt")
    save_checkpoint(p, params, optimizer=None, iters=123, epoch=4)
    state = load_checkpoint(p)
    assert state["iters"] == 123 and state["epoch"] == 4
    fresh = build_model(jax.random.PRNGKey(1), cfg)
    merged = apply_checkpoint(fresh, state)
    a = params["text_encoder"]["embedding"]["weight"]
    b = merged["text_encoder"]["embedding"]["weight"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_ignore_modules(tmp_path, small_params):
    cfg, params = small_params
    p = str(tmp_path / "ckpt2.ckpt")
    save_checkpoint(p, params)
    fresh = build_model(jax.random.PRNGKey(2), cfg)
    merged = apply_checkpoint(fresh, load_checkpoint(p),
                              ignore_modules={"decoder"})
    # decoder keeps the fresh init; text_encoder gets loaded
    dec_fresh = fresh["decoder"]["F0_conv"]["weight_v"]
    assert np.array_equal(np.asarray(merged["decoder"]["F0_conv"]["weight_v"]),
                          np.asarray(dec_fresh))
    assert np.array_equal(
        np.asarray(merged["text_encoder"]["embedding"]["weight"]),
        np.asarray(params["text_encoder"]["embedding"]["weight"]))


def test_strip_for_inference(tmp_path, small_params):
    _, params = small_params
    p = str(tmp_path / "full.ckpt")
    save_checkpoint(p, params, iters=7)
    stripped = strip_for_inference(load_checkpoint(p))
    assert sorted(stripped["net"]) == ["decoder", "predictor",
                                      "style_encoder", "text_encoder"]
    assert stripped["iters"] == 7


def test_extend_tokens(small_params):
    from styletts2_tpu.tools.extend_tokens import extend_token_set

    _, params = small_params
    net = extend_token_set(params, 11, seed=0)
    old = params["text_encoder"]["embedding"]["weight"]
    new = net["text_encoder"]["embedding"]["weight"]
    assert new.shape[0] == old.shape[0] + 11
    np.testing.assert_array_equal(np.asarray(new[: old.shape[0]]),
                                  np.asarray(old))
    # new rows are small-variance gaussian (reference extend.ipynb)
    tail = np.asarray(new[old.shape[0]:])
    assert 0 < np.abs(tail).max() < 0.1
    for path in (("text_aligner", "ctc_linear"),
                 ("text_aligner", "asr_s2s")):
        sub = net
        for k in path:
            sub = sub[k]
    s2s = net["text_aligner"]["asr_s2s"]
    assert s2s["embedding"]["weight"].shape[0] == old.shape[0] + 11
    assert s2s["project_to_n_symbols"]["weight"].shape[0] == old.shape[0] + 11
    c2 = net["text_aligner"]["ctc_linear"]["2"]["linear_layer"]
    assert c2["weight"].shape[0] == old.shape[0] + 11


@pytest.mark.slow  # grad-through-blur compile is multi-second; full-suite
def test_soft_alignment_differentiable():
    from styletts2_tpu.nn.slm import soft_alignment_from_durations

    b, t, f = 2, 6, 24
    logits = jax.random.normal(jax.random.PRNGKey(0), (b, t, 50))
    mask = jnp.ones((b, t), bool)

    attn = soft_alignment_from_durations(logits, mask, f)
    assert attn.shape == (b, t, f)
    np.testing.assert_allclose(np.asarray(attn.sum(axis=1)), 1.0, atol=1e-5)

    # gradients flow back to the duration logits (the whole point of the
    # differentiable duration modeling, slmadv.py:36-55)
    def loss(lg):
        return soft_alignment_from_durations(lg, mask, f).var()

    g = jax.grad(loss)(logits)
    assert float(jnp.abs(g).max()) > 0


def test_wavlm_loss_with_stub_embedder():
    from styletts2_tpu.losses import WavLMLoss
    from styletts2_tpu.nn.discriminators import wavlm_d_init

    layers, hidden = 3, 16

    def stub_embedder(wav16):
        # deterministic toy embedder: strided frames -> linear maps
        frames = wav16[:, : (wav16.shape[1] // 320) * 320]
        frames = frames.reshape(wav16.shape[0], -1, 320)
        base = frames @ jnp.ones((320, hidden)) * 0.01
        return [base * (i + 1) for i in range(layers)]

    wd = wavlm_d_init(jax.random.PRNGKey(0), slm_hidden=hidden,
                      slm_layers=layers)
    wl = WavLMLoss(stub_embedder, wd)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 24000)) * 0.1
    rec = wav * 0.9
    assert float(wl.forward(wav, rec)) > 0
    assert np.isfinite(float(wl.generator(rec)))
    assert np.isfinite(float(wl.discriminator(wav, rec)))


def test_voicepack_roundtrip(tmp_path):
    import json

    from styletts2_tpu.tools.export_serving import load_voicepack

    p = str(tmp_path / "pack.npz")
    np.savez(p, symbol_table=json.dumps({"a": 1}),
             **{"style/alice": np.ones((1, 128), np.float32)})
    table, styles = load_voicepack(p)
    assert table == {"a": 1}
    assert styles["alice"].shape == (1, 128)
