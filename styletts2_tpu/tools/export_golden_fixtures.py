#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_*.npz from the torch reference.

Needs torch + /root/reference mounted (any environment where the live
parity tests run). The fixtures let tests/test_golden_fixtures.py verify
numeric parity WITHOUT torch or the reference — see
styletts2_tpu/tools/golden.py for the shared specs.

Usage: python styletts2_tpu/tools/export_golden_fixtures.py [out_dir]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import torch  # noqa: E402

import ref_stubs  # noqa: E402  (tests/ref_stubs.py)

ref_stubs.install()
sys.path.insert(0, "/root/reference")

from styletts2_tpu.tools.golden import (SINE_NOISE_CONST, SPECS,  # noqa: E402
                                        make_inputs)


def sd_to_numpy(mod):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()
            if "num_batches_tracked" not in k}


def save_fixture(path, mod, inputs, outputs):
    arrays = {}
    for k, v in sd_to_numpy(mod).items():
        arrays["sd:" + k] = v
    for k, v in outputs.items():
        arrays["out:" + k] = np.asarray(v)
    np.savez_compressed(path, **arrays)
    total = sum(a.nbytes for a in arrays.values())
    print(f"wrote {path} ({len(arrays)} arrays, {total/1e6:.2f} MB raw)")


def patch_sine_determinism():
    """Reference-side half of test_models_parity._patch_determinism: zero
    initial phase, constant noise."""
    torch_rand = torch.rand

    def zeros_rand(*a, **k):
        k.pop("device", None)
        return torch.zeros(*a, **k)

    torch.rand = zeros_rand
    torch.randn_like = lambda x, **k: torch.full_like(x, SINE_NOISE_CONST)
    return torch_rand


def main(out_dir=None):
    out_dir = out_dir or os.path.join(REPO, "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)

    import models as ref_models  # reference models.py

    # --- text encoder -----------------------------------------------------
    spec = SPECS["text_encoder"]
    torch.manual_seed(10)
    mod = ref_models.TextEncoder(**spec).eval()
    inp = make_inputs("text_encoder")
    tokens = torch.from_numpy(inp["tokens"])
    lengths = torch.from_numpy(inp["lengths"])
    pad_mask = ref_models.TextEncoder.length_to_mask(mod, lengths)
    with torch.no_grad():
        out = mod(tokens, lengths, pad_mask)  # (B, C, T)
    save_fixture(os.path.join(out_dir, "golden_text_encoder.npz"), mod,
                 inp, {"t_en": out.numpy()})

    # --- style encoder ----------------------------------------------------
    spec = SPECS["style_encoder"]
    torch.manual_seed(11)
    mod = ref_models.StyleEncoder(**spec).eval()
    inp = make_inputs("style_encoder")
    with torch.no_grad():
        out = mod(torch.from_numpy(inp["mel"]))
    save_fixture(os.path.join(out_dir, "golden_style_encoder.npz"), mod,
                 inp, {"style": out.numpy()})

    # --- prosody predictor ------------------------------------------------
    spec = SPECS["predictor"]
    torch.manual_seed(12)
    mod = ref_models.ProsodyPredictor(**spec).eval()
    inp = make_inputs("predictor")
    t_en = torch.from_numpy(inp["t_en"])
    s = torch.from_numpy(inp["s"])
    lengths = torch.from_numpy(inp["lengths"])
    align = torch.from_numpy(inp["align"])
    pad_mask = ref_models.ProsodyPredictor.length_to_mask(mod, lengths)
    with torch.no_grad():
        d, en = mod(t_en, s, lengths, align, pad_mask)
        f0, n = mod.F0Ntrain(en, s)
    save_fixture(os.path.join(out_dir, "golden_predictor.npz"), mod, inp,
                 {"dur": d.numpy(), "en": en.numpy(), "f0": f0.numpy(),
                  "n": n.numpy()})

    # --- hifigan generator (deterministic sine source) ---------------------
    from Modules.hifigan import Generator as HifiGenerator

    spec = SPECS["hifigan_generator"]
    torch.manual_seed(13)
    mod = HifiGenerator(**spec).eval()
    inp = make_inputs("hifigan_generator")
    orig_rand = patch_sine_determinism()
    try:
        with torch.no_grad():
            out = mod(torch.from_numpy(inp["x"]),
                      torch.from_numpy(inp["s"]),
                      torch.from_numpy(inp["f0"]))
    finally:
        torch.rand = orig_rand
    save_fixture(os.path.join(out_dir, "golden_hifigan_generator.npz"), mod,
                 inp, {"wav": out.numpy()})

    # --- vocos generator (fully deterministic) -----------------------------
    from Modules.vocos import Generator as VocosGenerator

    spec = dict(SPECS["vocos_generator"])
    dim = spec.pop("dim")
    torch.manual_seed(14)
    mod = VocosGenerator(input_channels=dim, dim=dim, **spec).eval()
    inp = make_inputs("vocos_generator")
    with torch.no_grad():
        out = mod(torch.from_numpy(inp["x"]), torch.from_numpy(inp["s"]))
    save_fixture(os.path.join(out_dir, "golden_vocos_generator.npz"), mod,
                 inp, {"wav": out.numpy()})


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
