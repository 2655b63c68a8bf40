#!/usr/bin/env python
"""Export a checkpoint to ONNX (reference ONNX/export_onnx.py).

    python -m styletts2_tpu.tools.export_onnx --config config.yaml \
        [--checkpoint model.safetensors|.pth] [--out model.onnx]

Without a checkpoint, random weights are exported (graph-structure and
shape validation). The emitted graph takes (tokens int64 [T], style
f32 [1,S], speed f32 scalar) and returns the trimmed waveform — the same
I/O contract as the reference's model.onnx, so downstream onnxruntime
consumers (ONNX/inference_onnx.py, voicepack flows) work unchanged.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="model.onnx")
    ap.add_argument("--seed", type=int, default=0,
                    help="init seed when no checkpoint is given")
    args = ap.parse_args(argv)

    from styletts2_tpu.config import load_config
    from styletts2_tpu.models import build_model, INFERENCE_MODULES
    from styletts2_tpu.onnx import export_onnx

    cfg = load_config(args.config)
    params = build_model(jax.random.PRNGKey(args.seed), cfg.model_params)
    params = {k: params[k] for k in INFERENCE_MODULES if k != "style_encoder"}
    if args.checkpoint:
        from styletts2_tpu.checkpoint import apply_checkpoint, load_checkpoint

        params = apply_checkpoint(params, load_checkpoint(args.checkpoint))
    params = {k: jax.tree.map(np.asarray, v) for k, v in params.items()}

    data = export_onnx(params, cfg, path=args.out)
    print(f"wrote {args.out} ({len(data) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
