"""Profile the inference hot path on the real TPU chip.

Times (median of reps, after warmup):
  * dispatch overhead (trivial jitted op)
  * phase-1 (text encode + duration) per token bucket
  * phase-2 (align + F0/N + vocoder) per frame bucket
  * decoder-only and generator-only subgraphs, to localize the cost

Run:  python -m styletts2_tpu.tools.profile_inference [hifigan|istftnet|vocos] [batch]

The optional batch argument (default 1) profiles the serving shapes:
phase-1/phase-2/decoder at batch N — how the per-call serial scans
amortize over rows is what separates single-stream from multi-stream
throughput.
"""

import sys
import time

import numpy as np


def med_time(fn, reps=10):
    import jax
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    dec_type = sys.argv[1] if len(sys.argv) > 1 else "hifigan"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    import os

    import jax

    # honor JAX_PLATFORMS=cpu even under plugin backends that ignore the
    # env var (the tunneled axon TPU plugin does) — profiling CPU must not
    # hang on a down tunnel. Only the cpu request is forwarded: blindly
    # copying the env var (e.g. the harness's JAX_PLATFORMS=axon) into the
    # config would REPLACE the default 'axon,cpu' list and unregister the
    # host backend that model init runs on (models.py:28)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from styletts2_tpu.cache import enable_compilation_cache
    from styletts2_tpu.config import load_config
    from styletts2_tpu.infer import StyleTTS2
    from styletts2_tpu.nn import decoder as DE
    from styletts2_tpu.nn import predictor as PR

    enable_compilation_cache()
    print("device:", jax.devices()[0])

    cfg = load_config({
        "model_params": {"decoder": {"type": dec_type}},
        "tpu": {"decoder_dtype": "bfloat16"},
        "debug": False,
    })
    engine = StyleTTS2(cfg, seed=0)
    rng = np.random.default_rng(0)
    ref_wav = (rng.standard_normal(24000 * 6) * 0.1).astype(np.float32)
    s = engine.compute_style(ref_wav, denoise=0.0)

    # dispatch overhead
    trivial = jax.jit(lambda x: x + 1.0)
    xsmall = jnp.zeros((8, 128))
    trivial(xsmall)
    t_disp = med_time(lambda: trivial(xsmall), reps=30)
    print(f"dispatch overhead: {t_disp*1e3:.2f} ms")

    b = batch
    sB = jnp.broadcast_to(s, (b,) + s.shape[1:])
    tb = 64
    tokens = jnp.zeros((b, tb), jnp.int32).at[:, :50].set(
        jnp.asarray(rng.integers(4, 170, (b, 50))))
    mask = jnp.zeros((b, tb), bool).at[:, :50].set(True)

    # phase 1
    t_en, d, dur = engine._phase1(engine.params, tokens, mask, sB)
    jax.block_until_ready(dur)
    t_p1 = med_time(lambda: engine._phase1(engine.params, tokens, mask, sB))
    print(f"phase1 (b={b}, tb={tb}): {t_p1*1e3:.2f} ms")

    for fb in (400, 800, 1600):
        durs = jnp.full((b, tb), fb // tb, jnp.int32)
        out = engine._phase2(engine.params, t_en, d, sB, durs, n_frames=fb)
        jax.block_until_ready(out)
        t_p2 = med_time(lambda: engine._phase2(engine.params, t_en, d, sB,
                                               durs, n_frames=fb))
        audio_s = b * fb * 2 * 300 / 24000.0
        print(f"phase2 (b={b}, fb={fb}, {audio_s:.1f}s audio): "
              f"{t_p2*1e3:.2f} ms -> {audio_s/t_p2:.1f}x realtime")

    # decoder-only: fabricate inputs at fb=800
    fb = 800
    mel_t = fb * 2
    dt = engine.dtype
    asr = jnp.asarray(rng.standard_normal((b, fb, 512)), dt)
    f0 = jnp.asarray(np.abs(rng.standard_normal((b, mel_t))) * 100, jnp.float32)
    n_en = jnp.asarray(np.abs(rng.standard_normal((b, mel_t))), jnp.float32)
    sb = sB.astype(dt)
    frame_mask = jnp.ones((b, fb), bool)

    dec_fn = jax.jit(lambda p, a, f, n, ss: DE.decoder_apply(
        p["decoder"], cfg.model_params.decoder, a, f, n, ss, rng=None,
        train=False, frame_mask=frame_mask))
    out = dec_fn(engine.params, asr, f0, n_en, sb)
    jax.block_until_ready(out)
    t_dec = med_time(lambda: dec_fn(engine.params, asr, f0, n_en, sb))
    audio_s = b * fb * 2 * 300 / 24000.0
    print(f"decoder-only (b={b}, fb={fb}): {t_dec*1e3:.2f} ms "
          f"-> {audio_s/t_dec:.1f}x")

    # generator-only (skip the shell): x at mel rate 1600 frames, 512 ch
    if dec_type == "hifigan":
        from styletts2_tpu.nn.decoder import hifigan_generator_apply
        x = jnp.asarray(rng.standard_normal((b, mel_t, 512)), dt)
        gen_fn = jax.jit(lambda p, xx, ss, ff: hifigan_generator_apply(
            p["decoder"]["generator"], xx, ss, ff, None,
            cfg.model_params.decoder, None))
        out = gen_fn(engine.params, x, sb, f0)
        jax.block_until_ready(out)
        t_gen = med_time(lambda: gen_fn(engine.params, x, sb, f0))
        print(f"generator-only: {t_gen*1e3:.2f} ms -> {audio_s/t_gen:.1f}x")

    # f0n only
    en = jnp.asarray(rng.standard_normal((b, fb, 640)), jnp.float32)
    f0n_fn = jax.jit(lambda p, e, ss: PR.f0n_train(
        p["predictor"], e, ss, mask=frame_mask,
        out_mask=jnp.ones((b, mel_t), bool)))
    out = f0n_fn(engine.params, en, sB)
    jax.block_until_ready(out)
    t_f0n = med_time(lambda: f0n_fn(engine.params, en, sB))
    print(f"f0n-only (b={b}, fb={fb}): {t_f0n*1e3:.2f} ms")


if __name__ == "__main__":
    main()
