"""Multi-device SPMD correctness + per-bin crop integration.

* 8-way data-parallel train step (make_parallel_train_step on the conftest
  virtual CPU mesh) produces the same metrics/params as the single-device
  step on the same batch/rng — the builder-side multi-chip evidence.
* Real loader batches from SHORT duration bins (< max_len frames) train
  without the round-1 crop crash (static crop must follow the reference's
  batch-min bound, train.py:235) — exercised over two bins.

Compiles three full train graphs; the slowest file in the suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu import audio as AUD
from styletts2_tpu.config import SymbolConfig, load_config
from styletts2_tpu.data import build_dataloader
from styletts2_tpu.data.loader import bin_crop_frames
from styletts2_tpu.models import build_model
from styletts2_tpu.optim import MultiOptimizer
from styletts2_tpu.parallel import make_mesh
from styletts2_tpu.text import build_symbol_dict
from styletts2_tpu.train import (Batch, make_parallel_train_step,
                                 make_train_step)

B = 8  # one sample per virtual device


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """8 clips in bin 0 (0.25-0.5 s raw) + 8 in bin 2 (0.75-1.0 s raw) —
    both bins are far below the default max_len=300 frames."""
    d = tmp_path_factory.mktemp("bins")
    rng = np.random.default_rng(0)
    lines = []
    durs = [0.30 + 0.015 * i for i in range(B)] + \
           [0.80 + 0.015 * i for i in range(B)]
    for i, dur_s in enumerate(durs):
        n = int(24000 * dur_s)
        t = np.arange(n) / 24000.0
        wav = (0.3 * np.sin(2 * np.pi * 160 * t)
               + 0.05 * rng.standard_normal(n)).astype(np.float32)
        AUD.write_wav(str(d / f"{i}.wav"), wav)
        lines.append(f"{i}.wav|short utterance number {i}")
    return str(d), lines


@pytest.fixture(scope="module")
def setup(corpus):
    root, lines = corpus
    cfg = load_config({"model_params": {"decoder": {"type": "hifigan"}}})
    assert cfg.max_len == 300  # both test bins are shorter than this
    symbol_dict = build_symbol_dict(SymbolConfig())
    loader = build_dataloader(lines, root, symbol_dict, validation=True,
                              batch_size=B, debug=False)
    batches = {bin_id: nb for bin_id, nb in loader}
    assert set(batches) == {0, 2}, set(batches)
    params = build_model(jax.random.PRNGKey(0), cfg.model_params)
    opt = MultiOptimizer(params)
    states = opt.init(params)
    return cfg, params, opt, states, batches


def _to_batch(nb) -> Batch:
    return Batch(waves=jnp.asarray(nb.waves), texts=jnp.asarray(nb.texts),
                 input_lengths=jnp.asarray(nb.input_lengths),
                 mel_lengths=jnp.asarray(nb.mel_lengths))


def test_mesh_parity_and_short_bins(setup):
    cfg, params, opt, states, batches = setup
    assert len(jax.devices()) >= 8

    # --- single-device reference run on the bin-0 batch ------------------
    crop0 = bin_crop_frames(0, cfg.max_len)
    assert crop0 == 49  # the round-1 static max_len//2=150 crashed here
    batch0 = _to_batch(batches[0])
    rng = jax.random.PRNGKey(1)
    single = jax.jit(make_train_step(cfg, opt, crop_frames=crop0))
    p1, s1, m1 = single(params, states, batch0, rng)
    m1 = {k: float(v) for k, v in m1.items()}
    assert all(np.isfinite(v) for v in m1.values()), m1

    # --- same batch, 8-way data parallel ---------------------------------
    mesh = make_mesh(8)
    par = make_parallel_train_step(cfg, opt, mesh, crop_frames=crop0)
    p8, s8, m8 = par(params, states, batch0, rng)
    m8 = {k: float(v) for k, v in m8.items()}
    assert all(np.isfinite(v) for v in m8.values()), m8

    # identical math modulo all-reduce summation order
    for k in m1:
        assert m8[k] == pytest.approx(m1[k], rel=2e-3, abs=1e-5), \
            (k, m1[k], m8[k])
    for mod in ("decoder", "text_encoder", "mpd"):
        l1 = jax.tree_util.tree_leaves(p1[mod])
        l8 = jax.tree_util.tree_leaves(p8[mod])
        for a, b in zip(l1, l8):
            # atol: one AdamW step is lr*m/(sqrt(v)+eps) <= 1e-4; elements
            # with near-zero gradients can flip sign under a different
            # all-reduce summation order, so allow a few lr quanta
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=3e-4)

    # --- second (longer, still < max_len) bin through the parallel step --
    crop2 = bin_crop_frames(2, cfg.max_len)
    assert crop2 == 69
    par2 = make_parallel_train_step(cfg, opt, mesh, crop_frames=crop2)
    params2 = build_model(jax.random.PRNGKey(0), cfg.model_params)
    states2 = opt.init(params2)
    _, _, m2 = par2(params2, states2, _to_batch(batches[2]),
                    jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in m2.values())
