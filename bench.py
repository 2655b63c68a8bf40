"""Benchmark: single-stream synthesis throughput (1/RTF) on one TPU chip.

Measures the full user-facing path (StyleTTS2.generate: text chunking ->
token bucket -> phase-1 jit -> host duration glue -> phase-2 jit -> host
copy) end to end, plus p50 utterance latency for a 10-word utterance —
the BASELINE.md targets (>=50x realtime, <200 ms p50 on one v5e chip).

No published checkpoints exist in this environment, so weights are randomly
initialized; RTF is weight-independent (the compute per audio-second is
fixed by the architecture), and the synthesized audio length is whatever the
duration predictor chooses.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from styletts2_tpu.cache import enable_compilation_cache
    from styletts2_tpu.config import load_config
    from styletts2_tpu.infer import StyleTTS2

    enable_compilation_cache()
    dec_type = os.environ.get("BENCH_DECODER", "hifigan")
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    cfg = load_config({
        "model_params": {"decoder": {"type": dec_type}},
        "tpu": {"decoder_dtype": dtype,
                "token_buckets": [32, 64, 96, 128, 192, 256],
                "frame_buckets": [100, 200, 300, 400, 600, 800, 1200,
                                  1600, 2400]},
        "debug": False,
    })
    engine = StyleTTS2(cfg, seed=0)
    # randomly-initialized weights predict unrealistic durations (~25
    # frames/token); pin a realistic 4 frames/token (100 ms/phoneme) so the
    # synthesized audio lengths — and therefore RTF and latency — match what
    # a trained checkpoint produces. The measured compute path is identical.
    engine.fixed_duration = 4

    # style from a synthetic 6 s reference clip
    rng = np.random.default_rng(0)
    ref_wav = (rng.standard_normal(24000 * 6) * 0.1).astype(np.float32)
    engine.ref_s = engine.compute_style(ref_wav, denoise=0.0)
    style = {"style": engine.ref_s, "speed": 1.0}

    utterance = ("the quick brown fox jumps over the lazy sleeping dog")
    long_text = " ".join(["this is sentence number %d of the benchmark "
                          "paragraph, with a few more words added." % i
                          for i in range(12)])
    # long-form synthesis merges sentences into ~10 s chunks: larger frame
    # buckets amortize fixed per-call cost (the reference's n_merge knob,
    # inference.py:303)
    merge_long = 32

    # warmup/compile: one short + one long call populates the bucket caches
    engine.generate(utterance, style, stabilize=False, n_merge=16)
    engine.generate(long_text, style, stabilize=False, n_merge=merge_long)

    # p50 utterance latency (10-word utterance)
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        wav = engine.generate(utterance, style, stabilize=False, n_merge=16)
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lat, 50) * 1000.0)
    audio_s = (len(wav) - 8000) / 24000.0

    # sustained single-stream throughput on long-form text
    t0 = time.perf_counter()
    reps = 8
    total_audio = 0.0
    for _ in range(reps):
        w = engine.generate(long_text, style, stabilize=False,
                            n_merge=merge_long)
        total_audio += (len(w) - 8000) / 24000.0
    wall = time.perf_counter() - t0
    inv_rtf = total_audio / wall

    result = {
        "metric": "single-stream synthesis throughput (1/RTF), "
                  f"{dec_type} decoder, {dtype}",
        "value": round(inv_rtf, 2),
        "unit": "x realtime (audio-sec/sec/chip)",
        "vs_baseline": round(inv_rtf / 50.0, 3),
        "extra": {
            "p50_utterance_latency_ms": round(p50_ms, 2),
            "latency_target_ms": 200.0,
            "utterance_audio_s": round(audio_s, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
