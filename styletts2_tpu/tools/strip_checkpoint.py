"""Strip a training checkpoint to the 4 inference modules.

Parity: reference Demo/del_training.ipynb (drops text_aligner,
pitch_extractor, mpd, msd and the optimizer state, shrinking a 144M-param
training checkpoint to the 90M inference set).

Usage:
  python -m styletts2_tpu.tools.strip_checkpoint --ckpt in.ckpt --out out.ckpt
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    from styletts2_tpu.checkpoint import (load_checkpoint, save_checkpoint,
                                          strip_for_inference)

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    state = strip_for_inference(load_checkpoint(args.ckpt))
    save_checkpoint(args.out, state["net"], optimizer=None,
                    iters=state["iters"], epoch=state["epoch"])
    print(f"wrote inference-only checkpoint to {args.out} "
          f"({sorted(state['net'])})")


if __name__ == "__main__":
    main()
