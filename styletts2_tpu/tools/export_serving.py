"""Serving export: AOT-compiled StableHLO graphs + voicepacks.

The reference's deployment story is ONNX (reference ONNX/: re-implemented
ONNX-safe modules, opset-19 export, onnxruntime serving). The TPU-native
equivalent is `jax.export`: the bucketed phase-1/phase-2 synthesis graphs
are serialized as StableHLO artifacts that a serving binary (or any later
JAX process) can load and run without the Python model code, plus
"voicepacks" — precomputed style vectors + the symbol table — matching
ONNX/with_voicepacks.py's dependency-free serving flow.

Usage:
  python -m styletts2_tpu.tools.export_serving \
      --config configs/config_example.yaml --ckpt model.ckpt \
      --out export_dir --token-buckets 64,128 --frame-buckets 200,400
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np


def export_engine(engine, out_dir: str, token_buckets: List[int],
                  frame_buckets: List[int]) -> Dict[str, str]:
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)
    manifest: Dict[str, str] = {}
    style_dim = engine.cfg.model_params.style_dim

    s = jnp.zeros((1, style_dim), jnp.float32)
    for tb in token_buckets:
        tokens = jnp.zeros((1, tb), jnp.int32)
        mask = jnp.ones((1, tb), bool)

        def phase1(tokens, mask, s):
            return engine._phase1_impl(engine.params, tokens, mask, s)

        exp = jexport.export(jax.jit(phase1))(tokens, mask, s)
        name = f"phase1_t{tb}.stablehlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        manifest[f"phase1/{tb}"] = name

        t_en, d, _ = engine._phase1(engine.params, tokens, mask, s)
        for fb in frame_buckets:
            durs = jnp.ones((1, tb), jnp.int32)

            def phase2(t_en, d, s, durs):
                return engine._phase2_impl(engine.params, t_en, d, s, durs,
                                           n_frames=fb)

            exp2 = jexport.export(jax.jit(phase2))(t_en, d, s, durs)
            name2 = f"phase2_t{tb}_f{fb}.stablehlo"
            with open(os.path.join(out_dir, name2), "wb") as f:
                f.write(exp2.serialize())
            manifest[f"phase2/{tb}/{fb}"] = name2

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({"graphs": manifest,
                   "sr": engine.sr, "hop": engine.hop,
                   "style_dim": style_dim}, f, indent=2)
    return manifest


def save_voicepack(engine, out_path: str, voices: Dict[str, str],
                   denoise: float = 0.3) -> None:
    """Precompute styles for named reference wavs + bundle the tokenizer
    (ONNX/with_voicepacks.py parity)."""
    styles = {}
    for name, wav_path in voices.items():
        styles[name] = np.asarray(engine.compute_style(wav_path,
                                                       denoise=denoise))
    np.savez(out_path,
             symbol_table=json.dumps(engine.symbol_dict),
             **{f"style/{k}": v for k, v in styles.items()})
    print(f"voicepack with {len(styles)} voices -> {out_path}")


def load_voicepack(path: str):
    data = np.load(path, allow_pickle=False)
    symbol_table = json.loads(str(data["symbol_table"]))
    styles = {k.split("/", 1)[1]: data[k] for k in data.files
              if k.startswith("style/")}
    return symbol_table, styles


def main(argv=None) -> None:
    from styletts2_tpu.infer import StyleTTS2

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--token-buckets", default="64,128")
    ap.add_argument("--frame-buckets", default="200,400,800")
    args = ap.parse_args(argv)

    engine = StyleTTS2(args.config, args.ckpt)
    tbs = [int(x) for x in args.token_buckets.split(",")]
    fbs = [int(x) for x in args.frame_buckets.split(",")]
    manifest = export_engine(engine, args.out, tbs, fbs)
    print(f"exported {len(manifest)} graphs to {args.out}")


if __name__ == "__main__":
    main()
