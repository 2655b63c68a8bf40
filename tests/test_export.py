"""Serving export: StableHLO AOT graphs round-trip through jax.export."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.config import load_config
from styletts2_tpu.infer import StyleTTS2
from styletts2_tpu.tools.export_serving import export_engine


@pytest.fixture(scope="module")
def engine():
    cfg = load_config({
        "model_params": {"decoder": {"type": "hifigan"}},
        "tpu": {"token_buckets": [32], "frame_buckets": [80],
                "decoder_dtype": "float32"},
        "debug": False,
    })
    return StyleTTS2(cfg, seed=0)


def test_export_and_replay(engine, tmp_path):
    from jax import export as jexport

    out = str(tmp_path / "export")
    manifest = export_engine(engine, out, [32], [80])
    assert "phase1/32" in manifest and "phase2/32/80" in manifest
    assert os.path.exists(os.path.join(out, "manifest.json"))

    # replay phase-1 from the serialized artifact, no model code involved
    with open(os.path.join(out, manifest["phase1/32"]), "rb") as f:
        exp = jexport.deserialize(f.read())
    tokens = jnp.zeros((1, 32), jnp.int32).at[0, :5].set(
        jnp.asarray([1, 40, 50, 60, 2]))
    mask = jnp.zeros((1, 32), bool).at[0, :5].set(True)
    s = jnp.ones((1, 128), jnp.float32) * 0.1

    live = engine._phase1(engine.params, tokens, mask, s)
    replay = exp.call(tokens, mask, s)
    for a, b in zip(live, replay):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
