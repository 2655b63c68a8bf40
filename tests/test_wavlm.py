"""WavLM backbone parity vs the local torch implementation (random weights).

The reference's SLM stage consumes hub-downloaded WavLM hidden states
(losses.py:193-252); this environment has no egress, so parity is checked
against a locally-instantiated torch WavLMModel with random weights — the
same architecture the published checkpoint would load into.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.nn import wavlm as WL


def _small_cfgs():
    from transformers import WavLMConfig as HFConfig

    hf = HFConfig(
        hidden_size=96, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, conv_dim=[48] * 7,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=64, max_bucket_distance=100,
        do_stable_layer_norm=False, feat_extract_norm="group",
        conv_bias=False, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, activation_dropout=0.0,
    )
    ours = WL.WavLMConfig(
        hidden_size=96, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, conv_dim=(48,) * 7,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=64, max_bucket_distance=100,
    )
    return hf, ours


def test_wavlm_hidden_states_parity():
    import torch
    from transformers import WavLMModel

    hf_cfg, cfg = _small_cfgs()
    torch.manual_seed(0)
    model = WavLMModel(hf_cfg).eval()

    params = WL.convert_torch_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 3200)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(wav), output_hidden_states=True)
    ours = WL.apply(params, jnp.asarray(wav), cfg)

    assert len(ours) == len(ref.hidden_states) == cfg.num_hidden_layers + 1
    for i, (a, b) in enumerate(zip(ours, ref.hidden_states)):
        np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"hidden state {i}")


def test_wavlm_feature_lengths():
    hf_cfg, cfg = _small_cfgs()
    n = WL.feature_lengths(cfg, 3200)
    from transformers import WavLMModel
    import torch

    model = WavLMModel(hf_cfg).eval()
    with torch.no_grad():
        out = model(torch.zeros(1, 3200))
    assert out.last_hidden_state.shape[1] == n


def test_wavlm_differentiable():
    """The SLM generator loss backprops THROGH the frozen WavLM into the
    waveform (reference losses.py:207-212) — the forward must carry
    gradients to its input."""
    _, cfg = _small_cfgs()
    params = WL.init(jax.random.PRNGKey(0), cfg)

    def loss(wav):
        hs = WL.apply(params, wav, cfg)
        return sum(jnp.abs(h).mean() for h in hs)

    g = jax.grad(loss)(jnp.ones((1, 1600)) * 0.01)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
