"""SLM adversarial stage integration: real WavLM-base-plus architecture
(random weights), finite losses, gradients reach the duration predictor
through the soft-alignment path (reference Modules/slmadv.py:5-170 +
losses.py:193-252 — dead code there, wired here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.config import load_config
from styletts2_tpu.losses import WavLMLoss
from styletts2_tpu.models import build_model
from styletts2_tpu.nn import wavlm as WL
from styletts2_tpu.nn.discriminators import wavlm_d_init
from styletts2_tpu.nn.slm import SLMAdversarialTrainer
from styletts2_tpu.optim import MultiOptimizer


def test_slm_adversarial_round():
    cfg = load_config({
        "max_len": 80,
        "model_params": {"decoder": {"type": "hifigan"}},
        "slmadv_params": {"enabled": True, "scale": 1.0},
    })
    params = build_model(jax.random.PRNGKey(0), cfg.model_params)
    opt = MultiOptimizer(params)
    states = opt.init(params)

    # REAL wavlm-base-plus architecture, random weights (no-egress env)
    wl_cfg = WL.WavLMConfig()
    wavlm_params = WL.init(jax.random.PRNGKey(7), wl_cfg)
    wd_params = wavlm_d_init(jax.random.PRNGKey(8),
                             slm_hidden=wl_cfg.hidden_size,
                             slm_layers=wl_cfg.num_hidden_layers + 1)
    wl = WavLMLoss(WL.make_embedder(wavlm_params, wl_cfg), wd_params)
    trainer = SLMAdversarialTrainer(cfg, opt, wl, wd_params, scale=1.0)

    b, t_text, t_mel = 2, 12, 100
    rng = np.random.default_rng(0)
    texts = jnp.asarray(rng.integers(4, 170, (b, t_text)).astype("int32"))
    lens = jnp.asarray([t_text, t_text - 3], jnp.int32)
    waves = jnp.asarray(
        (rng.standard_normal((b, t_mel * 300)) * 0.1).astype("float32"))

    crop = 40
    wd_before = [np.asarray(x).copy()
                 for x in jax.tree_util.tree_leaves(trainer.wd_params)]
    new_params, new_states, m = trainer.step(params, states, texts, lens,
                                             waves, crop,
                                             jax.random.PRNGKey(1))
    m = {k: float(v) for k, v in m.items()}
    assert all(np.isfinite(v) for v in m.values()), m

    # the duration predictor moved THROUGH the soft-alignment gradient path
    def moved(a, b):
        return any(float(jnp.abs(x - y).max()) > 0
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    assert moved(new_params["predictor"]["duration_proj"],
                 params["predictor"]["duration_proj"])
    assert moved(new_params["predictor"]["text_encoder"],
                 params["predictor"]["text_encoder"])
    assert moved(new_params["decoder"], params["decoder"])
    # discriminator head updated too
    wd_after = jax.tree_util.tree_leaves(trainer.wd_params)
    assert any(not np.array_equal(np.asarray(a), b)
               for a, b in zip(wd_after, wd_before))
    # untouched modules stay put
    assert not moved(new_params["text_encoder"], params["text_encoder"])
