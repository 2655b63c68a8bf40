"""End-to-end train driver CLI: `train_loop.main()` over a tiny synthetic
dataset (reference `python train.py -p config.yaml`, train.py:40-481).

Everything between the step functions and the user is exercised here —
config load, symbol table, duration-binned loader, mesh setup, pretrained
load (train.py:170-171 'Must have a pretrained!'), the epoch loop, logging
and TensorBoard event emission, the eval pass, and the save_freq epoch
checkpoint — none of which test_train_step (step functions only) covers.

Compiles the full D/G train pair at the bin's static shapes: slow tier.
"""

import os

import numpy as np
import pytest

import jax

from styletts2_tpu import audio as AUD
from styletts2_tpu.checkpoint import load_checkpoint, save_checkpoint
from styletts2_tpu.config import load_config
from styletts2_tpu.models import build_model


WORDS = ("the quick brown fox jumps over a lazy dog while eager cats "
         "watch from warm windows and dream of distant silver fish").split()


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Six ~0.3 s WAVs (one duration bin), list files, seed ckpt, config."""
    root = tmp_path_factory.mktemp("train_cli")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        n = 7000 + 400 * i  # 23-24 mel frames raw -> all in bin 0
        wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
        path = wav_dir / f"clip{i}.wav"
        AUD.write_wav(str(path), wav)
        text = " ".join(WORDS[3 * i: 3 * i + 3])
        lines.append(f"wavs/clip{i}.wav|{text}\n")
    (root / "train_list.txt").write_text("".join(lines[:4]))
    (root / "val_list.txt").write_text("".join(lines[4:]))

    cfg = load_config({"model_params": {"decoder": {"type": "hifigan"}}})
    seed_params = build_model(jax.random.PRNGKey(42), cfg.model_params)
    seed_ckpt = root / "seed.ckpt"
    save_checkpoint(str(seed_ckpt), seed_params)

    log_dir = root / "runs"
    config_path = root / "config.yaml"
    config_path.write_text(f"""
log_dir: "{log_dir}"
save_freq: 1
log_interval: 1
epochs: 1
batch_size: 2
max_len: 80
pretrained_model: "{seed_ckpt}"
load_only_params: true
debug: false
data_params:
  train_data: "{root / 'train_list.txt'}"
  val_data: "{root / 'val_list.txt'}"
  root_path: "{root}"
model_params:
  decoder:
    type: hifigan
tpu:
  dp: 1
""")
    return root, str(config_path), str(log_dir), str(seed_ckpt)


def test_train_cli_one_epoch_saves_and_logs(workspace):
    from styletts2_tpu.train_loop import main

    root, config_path, log_dir, seed_ckpt = workspace
    main(["-p", config_path, "--nan-action", "raise"])

    # epoch checkpoint written (save_freq=1), resumable, and trained:
    # 4 train samples / batch 2 = 2 iters recorded
    ckpt_path = os.path.join(log_dir, "epoch_00000.ckpt")
    assert os.path.exists(ckpt_path)
    state = load_checkpoint(ckpt_path)
    assert state["iters"] == 2
    assert state["epoch"] == 0
    assert state["optimizer"] is not None

    seed = load_checkpoint(seed_ckpt)
    moved = np.max(np.abs(
        state["net"]["text_encoder"]["embedding"]["weight"]
        - seed["net"]["text_encoder"]["embedding"]["weight"]))
    assert moved > 0  # the G step actually updated the generator modules

    # observability surfaces (SURVEY section 5): train.log, TB events, JSONL
    assert os.path.exists(os.path.join(log_dir, "train.log"))
    tb_dir = os.path.join(log_dir, "tensorboard")
    names = os.listdir(tb_dir)
    assert any(n.startswith("events.out.tfevents.") for n in names)
    assert any(n.endswith(".jsonl") for n in names)
    # config snapshot copied into log_dir (reference train.py:47)
    assert os.path.exists(os.path.join(log_dir, "config.yaml"))


def test_train_cli_resume_restores_counters(workspace):
    """Resuming from the epoch checkpoint restores iters + optimizer state
    (reference models.py:623-632, load_only_params=False): the saved epoch
    re-runs (reference semantics) and the new epoch checkpoint's iters
    count continues from the restored value."""
    from styletts2_tpu.train_loop import main

    root, config_path, log_dir, _ = workspace
    ckpt_path = os.path.join(log_dir, "epoch_00000.ckpt")
    base = (root / "config.yaml").read_text()
    resume_cfg = root / "resume.yaml"
    resume_cfg.write_text(
        base.replace(f'pretrained_model: "{root / "seed.ckpt"}"',
                     f'pretrained_model: "{ckpt_path}"')
            .replace("load_only_params: true", "load_only_params: false")
            .replace(f'log_dir: "{log_dir}"',
                     f'log_dir: "{log_dir}_resume"'))
    main(["-p", str(resume_cfg)])
    resumed = load_checkpoint(
        os.path.join(f"{log_dir}_resume", "epoch_00000.ckpt"))
    assert resumed["iters"] == 4  # 2 restored + 2 new steps


def test_train_cli_requires_pretrained(workspace):
    from styletts2_tpu.train_loop import main

    root, config_path, _, _ = workspace
    bad = root / "nopretrain.yaml"
    txt = (root / "config.yaml").read_text()
    bad.write_text(txt.replace('pretrained_model: "', 'x_ignored: "'))
    with pytest.raises(RuntimeError, match="Must have a pretrained"):
        main(["-p", str(bad)])
