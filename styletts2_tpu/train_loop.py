"""Finetune driver: CLI + epoch loop around the jitted train step.

Parity: reference train.py:40-481 —
* YAML config, symbol table, duration-binned loaders
* finetune-only (requires a pretrained checkpoint, train.py:170-171)
* per-module AdamW with acoustic ft_lr, freeze/ignore modules
* alternating D/G updates, loss logging every log_interval
* autosave current_model every 1000 iters; epoch checkpoints every
  save_freq epochs; per-epoch validation (mel/dur/F0)

TPU redesign: one jitted step per duration bin (static shapes), batch
sharded over the 'dp' mesh axis, metrics fetched asynchronously.

Usage: python -m styletts2_tpu.train_loop -p configs/config.yaml
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import time
from typing import Any, Dict

import numpy as np

logger = logging.getLogger("styletts2_tpu.train")


def setup_logging(log_dir: str) -> None:
    os.makedirs(log_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s:%(asctime)s: %(message)s")
    fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(logging.Formatter("%(levelname)s:%(asctime)s: %(message)s"))
    logger.addHandler(fh)


class MetricsWriter:
    """Scalar log, written twice: JSONL (grep/pandas-readable anywhere) and
    a real TensorBoard `events.out.tfevents.*` file via the from-scratch
    writer in tb_events.py — same ecosystem surface as the reference's
    SummaryWriter (train.py:48) without a tensorboard dependency."""

    def __init__(self, log_dir: str):
        from styletts2_tpu.tb_events import TBEventWriter

        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = TBEventWriter(log_dir)

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step), "time": time.time()})
                      + "\n")
        self._f.flush()
        self._tb.add_scalar(tag, value, step)


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from styletts2_tpu.cache import enable_compilation_cache
    from styletts2_tpu.parallel import make_mesh, shard_batch
    from styletts2_tpu.checkpoint import (apply_checkpoint, load_checkpoint,
                                          save_checkpoint)
    from styletts2_tpu.config import load_config
    from styletts2_tpu.data import build_dataloader
    from styletts2_tpu.models import build_model
    from styletts2_tpu.optim import MultiOptimizer
    from styletts2_tpu.text import build_symbol_dict
    from styletts2_tpu.train import (Batch, eval_step_fn,
                                     make_parallel_train_step)

    from styletts2_tpu.profiling import StepTimer, check_finite, trace

    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--config_path", default="configs/config.yaml")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler trace of steps 10-15")
    ap.add_argument("--nan-action", default="raise",
                    choices=["raise", "skip", "ignore"])
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize() from the "
                         "standard env (COORDINATOR_ADDRESS etc.); the "
                         "duration-binned sampler shards per process over "
                         "DCN (reference meldataset.py:239-246 interface)")
    args = ap.parse_args(argv)

    if args.distributed:
        jax.distributed.initialize()

    enable_compilation_cache()
    cfg = load_config(args.config_path)
    log_dir = cfg.log_dir
    setup_logging(log_dir)
    shutil.copy(args.config_path,
                os.path.join(log_dir, os.path.basename(args.config_path)))
    writer = MetricsWriter(os.path.join(log_dir, "tensorboard"))

    symbol_dict = build_symbol_dict(cfg.symbol)
    print(f"\nFound: {len(symbol_dict) + 1} symbols")

    with open(cfg.data_params.train_data, encoding="utf-8") as f:
        train_list = f.readlines()
    with open(cfg.data_params.val_data, encoding="utf-8") as f:
        val_list = f.readlines()

    # data-parallel mesh over all local devices (or cfg.tpu.dp)
    mesh = make_mesh(cfg.tpu.dp)
    logger.info("mesh: %d-way data parallel on %s", mesh.size,
                jax.devices()[0])

    # per-host input sharding over DCN: each process draws its own disjoint
    # shard of every duration bin (the reference's DistributedSampler-
    # within-bin interface, meldataset.py:239-246, which its train.py pins
    # to (1, 0) — multi-host is first-class here)
    train_loader = build_dataloader(
        train_list, cfg.data_params.root_path, symbol_dict,
        batch_size=cfg.batch_size, debug=cfg.debug,
        num_replicas=jax.process_count(), rank=jax.process_index())
    val_loader = build_dataloader(
        val_list, cfg.data_params.root_path, symbol_dict, validation=True,
        batch_size=cfg.batch_size, debug=cfg.debug,
        num_replicas=jax.process_count(), rank=jax.process_index())

    params = build_model(jax.random.PRNGKey(0), cfg.model_params)
    opt = MultiOptimizer(params, lr=cfg.optimizer_params.lr,
                         ft_lr=cfg.optimizer_params.ft_lr)
    opt_states = opt.init(params)

    if not cfg.pretrained_model:
        raise RuntimeError("Must have a pretrained!")  # train.py:170-171
    state = load_checkpoint(cfg.pretrained_model)
    params = apply_checkpoint(params, state,
                              ignore_modules=set(
                                  cfg.training_strats.ignore_modules) - {""})
    start_epoch, iters = 0, 0
    if not cfg.load_only_params and state.get("optimizer") is not None:
        opt_states = state["optimizer"]
        start_epoch = state.get("epoch", 0)
        iters = state.get("iters", 0)

    # freeze_modules: zero their lr (optax.adamw scales decay by lr too, so
    # lr=0 is a true freeze). The pitch extractor is inherently frozen: it
    # is not in train.GEN_MODULES and is only read under stop_gradient.
    from styletts2_tpu.optim import make_adamw

    frozen = set(cfg.training_strats.freeze_modules) - {""}
    for k in frozen:
        if k in opt.txs:
            opt.txs[k] = make_adamw(0.0)
        print(f"{k} Freezed")

    # One compiled step per duration bin: each bin's static crop follows the
    # reference's batch-min bound (train.py:235) so short bins never try to
    # slice more frames than any of their samples have.
    from styletts2_tpu.data.loader import bin_crop_frames

    train_steps: Dict[int, Any] = {}
    eval_steps: Dict[int, Any] = {}

    def train_step_for(bin_id: int):
        if bin_id not in train_steps:
            train_steps[bin_id] = make_parallel_train_step(
                cfg, opt, mesh,
                crop_frames=bin_crop_frames(bin_id, cfg.max_len))
        return train_steps[bin_id]

    def eval_step_for(bin_id: int):
        if bin_id not in eval_steps:
            eval_steps[bin_id] = jax.jit(eval_step_fn(
                cfg, crop_frames=bin_crop_frames(bin_id, cfg.max_len)))
        return eval_steps[bin_id]

    # ---- opt-in SLM (WavLM) adversarial stage (upstream capability) ------
    slm_trainer = None
    if cfg.slmadv_params.enabled:
        from styletts2_tpu.losses import WavLMLoss
        from styletts2_tpu.nn import wavlm as WL
        from styletts2_tpu.nn.discriminators import wavlm_d_init
        from styletts2_tpu.nn.slm import SLMAdversarialTrainer

        wl_cfg = WL.WavLMConfig()
        if cfg.slmadv_params.wavlm_path:
            import torch

            sd = torch.load(cfg.slmadv_params.wavlm_path, map_location="cpu")
            wavlm_params = WL.convert_torch_state_dict(sd, wl_cfg)
        elif not cfg.slmadv_params.allow_random_wavlm:
            raise RuntimeError(
                "slmadv_params.enabled requires slmadv_params.wavlm_path "
                "(a wavlm-base-plus state_dict): without pretrained WavLM "
                "weights the adversarial stage trains against noise. Set "
                "slmadv_params.allow_random_wavlm: true only for smoke "
                "tests.")
        else:
            logger.warning("slmadv enabled without wavlm_path: the WavLM "
                           "backbone is RANDOMLY initialized (smoke only)")
            wavlm_params = WL.init(jax.random.PRNGKey(7), wl_cfg)
        wavlm_params = jax.device_put(wavlm_params)
        wd_params = jax.device_put(wavlm_d_init(
            jax.random.PRNGKey(8), slm_hidden=wl_cfg.hidden_size,
            slm_layers=wl_cfg.num_hidden_layers + 1))
        wl = WavLMLoss(WL.make_embedder(wavlm_params, wl_cfg), wd_params)
        slm_trainer = SLMAdversarialTrainer(
            cfg, opt, wl, wd_params, scale=cfg.slmadv_params.scale,
            sig=cfg.slmadv_params.sig)

    rng = jax.random.PRNGKey(1)
    best_loss = float("inf")
    timer = StepTimer()

    for epoch in range(start_epoch, cfg.epochs):
        running_mel = 0.0
        start_time = time.time()
        train_loader.sampler.set_epoch(epoch)
        for i, (bin_id, nb) in enumerate(train_loader):
            rng, step_key = jax.random.split(rng)
            batch = shard_batch(mesh, Batch(
                waves=nb.waves, texts=nb.texts,
                input_lengths=nb.input_lengths,
                mel_lengths=nb.mel_lengths))
            profiling = (args.profile_dir and epoch == start_epoch
                         and 10 <= i < 15)
            with trace(args.profile_dir if profiling else None):
                params, opt_states, metrics = train_step_for(bin_id)(
                    params, opt_states, batch, step_key)
            if slm_trainer is not None and \
                    (i + 1) % cfg.slmadv_params.iter == 0:
                rng, slm_key = jax.random.split(rng)
                params, opt_states, slm_m = slm_trainer.step(
                    params, opt_states, batch.texts, batch.input_lengths,
                    batch.waves, bin_crop_frames(bin_id, cfg.max_len),
                    slm_key)
                metrics = dict(metrics)
                metrics.update(slm_m)
            timer.tick()
            iters += 1
            if (i + 1) % cfg.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                check_finite(m, iters, args.nan_action)
                writer.add_scalar("train/step_time_p50", timer.p50, iters)
                running_mel += m["mel"]
                logger.info(
                    "Epoch [%d/%d], Step [%d], Mel: %.5f, Disc: %.5f, "
                    "Dur: %.5f, CE: %.5f, Norm: %.5f, F0: %.5f, Gen: %.5f, "
                    "S2S: %.5f, Mono: %.5f (%.2fs)",
                    epoch + 1, cfg.epochs, i + 1, m["mel"], m["d_loss"],
                    m["dur"], m["ce"], m["norm"], m["f0"], m["gen"],
                    m["s2s"], m["mono"], time.time() - start_time)
                for k, v in m.items():
                    writer.add_scalar(f"train/{k}", v, iters)
            if iters % 1000 == 0 and jax.process_index() == 0:
                save_checkpoint(os.path.join(log_dir, "current_model.ckpt"),
                                params, opt_states, iters=iters, epoch=epoch)

        # ---------------- eval (train.py:363-463) ------------------------
        tot = {"mel": 0.0, "dur": 0.0, "f0": 0.0}
        n_eval = 0
        for bin_id, nb in val_loader:
            rng, ek = jax.random.split(rng)
            batch = Batch(waves=jnp.asarray(nb.waves),
                          texts=jnp.asarray(nb.texts),
                          input_lengths=jnp.asarray(nb.input_lengths),
                          mel_lengths=jnp.asarray(nb.mel_lengths))
            m = eval_step_for(bin_id)(params, batch, ek)
            for k in tot:
                tot[k] += float(m[k])
            n_eval += 1
        if n_eval:
            logger.info("Validation loss: %.3f, Dur loss: %.3f, F0 loss: %.3f",
                        tot["mel"] / n_eval, tot["dur"] / n_eval,
                        tot["f0"] / n_eval)
            writer.add_scalar("eval/mel_loss", tot["mel"] / n_eval, epoch + 1)
            writer.add_scalar("eval/dur_loss", tot["dur"] / n_eval, epoch + 1)
            writer.add_scalar("eval/F0_loss", tot["f0"] / n_eval, epoch + 1)
            best_loss = min(best_loss, tot["mel"] / n_eval)

        if (epoch + 1) % cfg.save_freq == 0 and jax.process_index() == 0:
            save_checkpoint(
                os.path.join(log_dir, f"epoch_{epoch:05d}.ckpt"),
                params, opt_states, iters=iters, epoch=epoch,
                val_loss=tot["mel"] / max(n_eval, 1))
            logger.info("Saving..")


if __name__ == "__main__":
    main()
