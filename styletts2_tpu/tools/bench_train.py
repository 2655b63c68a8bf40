"""Training-step throughput benchmark on the current JAX backend.

Times the production alternating D/G update (train.make_step_pair — the
same jitted pair train_loop dispatches) at the reference train recipe
(batch_size 5, max_len 300 mel frames, config_example.yaml:5-7) and
prints steps/s, mel-frames/s and wall ms/step. The reference publishes
no training speed (BASELINE.md) — only a memory guidance of batch 2 @
max_len 310 on a 24 GB GPU (README.md:64-68) — so this records OUR
number for regression tracking rather than a comparison.

Usage:
    python -m styletts2_tpu.tools.bench_train [--batch 5] [--max-len 300]
        [--steps 10] [--decoder hifigan]

The step is jitted with donated params/opt-state buffers exactly like
train_loop, so the measured time includes optimizer updates and the
on-device mel frontend, monotonic align and all nine losses.
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--max-len", type=int, default=300,
                    help="mel frames per sample (reference max_len)")
    ap.add_argument("--t-text", type=int, default=120,
                    help="tokens per sample")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--decoder", default="hifigan",
                    choices=("hifigan", "istftnet", "vocos"))
    ap.add_argument("--remat", action="store_true",
                    help="tpu.remat: jax.checkpoint the decoder synthesis "
                         "+ G-side discriminator forwards (HBM lever)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="tpu.grad_accum: micro-batches per optimizer "
                         "update (batch must divide; HBM lever)")
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS even under plugin backends that ignore the env
    # var (the tunneled axon TPU plugin does; tests/conftest.py has the
    # same workaround) so `JAX_PLATFORMS=cpu python -m ...bench_train`
    # really benches CPU instead of hanging on a down tunnel
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from styletts2_tpu.cache import enable_compilation_cache
    from styletts2_tpu.config import load_config
    from styletts2_tpu.models import build_model
    from styletts2_tpu.optim import MultiOptimizer
    from styletts2_tpu.train import Batch, make_step_pair

    enable_compilation_cache()
    cfg = load_config({
        "max_len": args.max_len,
        "batch_size": args.batch,
        "model_params": {"decoder": {"type": args.decoder}},
        "tpu": {"remat": args.remat, "grad_accum": args.grad_accum},
    })
    params = build_model(jax.random.PRNGKey(0), cfg.model_params)
    opt = MultiOptimizer(params)
    states = opt.init(params)
    params = jax.device_put(params)
    states = jax.device_put(states)

    b, t_text, t_mel = args.batch, args.t_text, args.max_len
    rng = np.random.default_rng(0)
    batch = Batch(
        waves=jnp.asarray(rng.standard_normal((b, t_mel * 300))
                          .astype("float32") * 0.1),
        texts=jnp.asarray(rng.integers(4, 170, (b, t_text)).astype("int32")),
        input_lengths=jnp.full((b,), t_text, jnp.int32),
        mel_lengths=jnp.full((b,), t_mel, jnp.int32),
    )

    d_step, g_step = make_step_pair(cfg, opt)
    kw = dict(donate_argnums=(0, 1))
    d_jit = jax.jit(d_step, **kw)
    g_jit = jax.jit(g_step, **kw)

    def step(params, states, batch, key):
        params, states, d_loss = d_jit(params, states, batch, key)
        params, states, metrics = g_jit(params, states, batch, key)
        metrics["d_loss"] = d_loss
        return params, states, metrics

    # compile + one warm step
    t0 = time.perf_counter()
    params, states, metrics = step(params, states, batch,
                                   jax.random.PRNGKey(1))
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, states, metrics = step(params, states, batch,
                                       jax.random.PRNGKey(2 + i))
    jax.block_until_ready(metrics)
    wall = time.perf_counter() - t0

    ms_per_step = 1000.0 * wall / args.steps
    out = {
        "metric": f"train step ({args.decoder}, batch {b}, "
                  f"max_len {t_mel}"
                  + (", remat" if args.remat else "")
                  + (f", accum {args.grad_accum}"
                     if args.grad_accum > 1 else "") + ")",
        "ms_per_step": round(ms_per_step, 2),
        "steps_per_s": round(args.steps / wall, 3),
        "mel_frames_per_s": round(b * t_mel * args.steps / wall, 1),
        "audio_s_per_train_s": round(b * t_mel * args.steps
                                     / 80.0 / wall, 2),
        "compile_plus_first_step_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "losses": {k: round(float(v), 4) for k, v in metrics.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
