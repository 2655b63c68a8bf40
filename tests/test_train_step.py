"""Full train-step integration: one D+G alternating update, finite losses,
parameters actually move, frozen modules don't. (Compiles the complete
training graph — the slowest test in the suite, ~4 min on CPU.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.config import load_config
from styletts2_tpu.models import build_model
from styletts2_tpu.optim import MultiOptimizer
from styletts2_tpu.train import (Batch, GEN_MODULES, DISC_MODULES,
                                 eval_step_fn, make_train_step)


@pytest.fixture(scope="module")
def setup():
    cfg = load_config({
        "max_len": 80,  # 40-frame crops (gt mels 80 >= 66 minimum)
        "model_params": {"decoder": {"type": "hifigan"}},
    })
    params = build_model(jax.random.PRNGKey(0), cfg.model_params)
    opt = MultiOptimizer(params)
    states = opt.init(params)
    b, t_text, t_mel = 2, 12, 100
    rng = np.random.default_rng(0)
    batch = Batch(
        waves=jnp.asarray(rng.standard_normal((b, t_mel * 300))
                          .astype("float32") * 0.1),
        texts=jnp.asarray(rng.integers(4, 170, (b, t_text)).astype("int32")),
        input_lengths=jnp.asarray([t_text, t_text - 3], jnp.int32),
        mel_lengths=jnp.asarray([t_mel, t_mel - 10], jnp.int32),
    )
    return cfg, params, opt, states, batch


def test_train_step_updates_and_finite(setup):
    cfg, params, opt, states, batch = setup
    step = jax.jit(make_train_step(cfg, opt))
    new_params, new_states, metrics = step(params, states, batch,
                                           jax.random.PRNGKey(1))
    m = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in m.values()), m
    # every trainable module moved
    for k in GEN_MODULES + DISC_MODULES:
        before = jax.tree_util.tree_leaves(params[k])[0]
        after = jax.tree_util.tree_leaves(new_params[k])[0]
        moved = any(
            float(jnp.abs(a - b).max()) > 0
            for a, b in zip(jax.tree_util.tree_leaves(new_params[k]),
                            jax.tree_util.tree_leaves(params[k])))
        assert moved, f"{k} did not update"
    # pitch extractor is frozen (reference uses it under no_grad)
    same = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(new_params["pitch_extractor"]),
            jax.tree_util.tree_leaves(params["pitch_extractor"])))
    assert same

    # one more step to ensure optimizer state chains
    _, _, metrics2 = step(new_params, new_states, batch, jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in metrics2.values())


def test_eval_step_finite(setup):
    cfg, params, opt, states, batch = setup
    ev = jax.jit(eval_step_fn(cfg))
    m = ev(params, batch, jax.random.PRNGKey(3))
    assert all(np.isfinite(float(v)) for v in m.values())
