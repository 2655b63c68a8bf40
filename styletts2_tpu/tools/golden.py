"""Golden parity fixtures: shared module specs + deterministic inputs.

`styletts2_tpu/tools/export_golden_fixtures.py` (needs torch + the reference repo
mounted) instantiates the reference torch modules at the sizes below,
records their state_dicts and outputs into `tests/fixtures/golden_*.npz`;
`tests/test_golden_fixtures.py` replays those fixtures against this repo's
modules with NEITHER torch NOR the reference present — the parity signal
survives any environment (the live parity tests in test_models_parity.py
additionally cover the full-size modules when torch+reference exist).

Module sizes are scaled down (the math is dimension-generic) so the
committed fixtures stay ~1 MB; inputs are regenerated identically on both
sides from numpy seeds, so only weights and reference outputs are stored.
Layouts in the fixture files are TORCH layouts (B, C, T); the test side
transposes exactly like test_models_parity.py does.

Reference modules covered: TextEncoder (models.py:238-299), StyleEncoder
(models.py:125-150), ProsodyPredictor + F0Ntrain (models.py:394-461),
hifigan.Generator (hifigan.py:272-356), vocos.Generator (vocos.py:108-162),
plus two COMPOSED fixtures: the train-step glue losses (train.py:202-315,
"composed_train") and the loss library (losses.py:24-147, "losses" — MSD
adversarial/feature/TPRLS halves + mel-domain MRSTFT).
istftnet.Generator (istftnet.py:494-600) is covered via the
shared-intermediate strategy: its source-STFT phase is branch-cut
ambiguous, so the fixture records the reference's harmonic source and its
exact source-STFT (mag, phase) alongside the output — see the
"istftnet_generator" SPECS note below.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

FIXTURE_DIR_NAME = "fixtures"

# the constant that replaces the sine source's noise draws on both sides
# (a strictly-zero noise floor is numerically chaotic in the reference; see
# test_models_parity._patch_determinism)
SINE_NOISE_CONST = 0.3

SPECS: Dict[str, Dict[str, Any]] = {
    "text_encoder": dict(channels=64, kernel_size=5, depth=2, n_symbols=50),
    "style_encoder": dict(dim_in=16, style_dim=32, max_conv_dim=64),
    "predictor": dict(style_dim=32, d_hid=64, nlayers=2, max_dur=10,
                      dropout=0.2),
    "hifigan_generator": dict(style_dim=32,
                              resblock_kernel_sizes=[3, 7],
                              upsample_rates=[10, 6],
                              upsample_initial_channel=64,
                              # the reference AdaINResBlock1 hard-codes 3
                              # dilation taps (hifigan.py:28-45)
                              resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
                              upsample_kernel_sizes=[20, 12]),
    "vocos_generator": dict(style_dim=32, dim=64, intermediate_dim=128,
                            num_layers=2, gen_istft_n_fft=40,
                            gen_istft_hop_size=10),
    # istftnet: the source-STFT *phase* features are branch-cut ambiguous
    # (not reproducible between the reference's own CPU/CUDA runs), so the
    # fixture also records the reference's harmonic source and its exact
    # source-STFT (mag, phase); the replay injects them on our side — the
    # same shared-intermediate strategy as the live
    # test_models_parity.py::test_decoder_parity[istftnet]. The sine
    # source and the STFT are each verified exactly elsewhere
    # (test_models_parity.py / test_stft.py).
    "istftnet_generator": dict(style_dim=32,
                               resblock_kernel_sizes=[3, 7],
                               upsample_rates=[10, 6],
                               upsample_initial_channel=64,
                               resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
                               upsample_kernel_sizes=[20, 12],
                               gen_istft_n_fft=20, gen_istft_hop_size=5),
    # composed train-step glue (VERDICT r02 #7's "composed train-step loss
    # vector"): the six losses whose value depends on the GLUE transcribed
    # from reference train.py:202-315 — aligner -> monotonic path -> d_gt,
    # masked dur/ce/s2s denominators, crop bookkeeping, f0/norm targets.
    # The decoder/discriminator losses (mel/gen/d) stay live-only: the
    # reference Decoder shell hard-codes 1024-wide blocks + a 41M MPD
    # (hifigan.py:416-440, discriminators.py:96-156) — too large to commit;
    # their module numerics are covered by the generator goldens above and
    # the msd half of the "losses" fixture below.
    "composed_train": dict(
        text_encoder=dict(channels=64, kernel_size=5, depth=2, n_symbols=50),
        style_encoder=dict(dim_in=16, style_dim=32, max_conv_dim=64),
        predictor=dict(style_dim=32, d_hid=64, nlayers=2, max_dur=10,
                       dropout=0.2),
        aligner=dict(input_dim=80, hidden_dim=64, n_token=50, n_layers=2,
                     token_embedding_dim=64),
        b=2, t_text=10, crop=41,
    ),
    # loss library golden: the full-size MSD (280,902 params — committable,
    # unlike the 41M MPD) + the weight-free mel-domain MRSTFT, recorded
    # through the reference loss functions (losses.py:24-147). t=6000
    # (down from 12000 in round 5) still spans multiple frames of every
    # MRSTFT/MSD resolution (largest fft 2048, hop 1200) at half the
    # replay cost — the quick tier's slowest test.
    "losses": dict(b=2, t=6000),
    # ASR aligner DIRECT golden (reference ASR/models.py:8-186): scaled-down
    # ASRCNN, full forward — CTC head, teacher-forced ASRS2S attention
    # decoder, soft attention map. Complements the composed_train fixture
    # (which replaces the attention with a synthetic tensor) with a direct
    # module-level comparison. The reference's 10% token->unk masking is
    # disabled on both sides (export patches torch.rand; replay passes
    # rng=None).
    "asr": dict(input_dim=80, hidden_dim=64, n_token=50, n_layers=3,
                token_embedding_dim=128),
    # JDC pitch extractor DIRECT golden (reference JDC/model.py:102-137,
    # full-size: channels are hard-coded, 5.2M params). Committing 5.2M
    # torch-init weights would dominate the fixture set, so the weights are
    # SYNTHESIZED identically on both sides from per-key seeded rngs
    # (synth_state_dict below) and only the reference OUTPUT is stored —
    # the fixture proves the full CRNN forward (conv block, 3 res blocks
    # with BN running stats, pool, BiLSTM, |classifier|) on shared weights.
    "jdc": dict(b=2, t=48, seed=50),
    # One full-size DiscriminatorP weight set (reference
    # discriminators.py:96-129; 8.2M params, synthesized like "jdc"),
    # evaluated at periods 2 AND 3 (the period only changes the fold/pad
    # geometry, not the weights) — covers MultiPeriodDiscriminator's
    # per-period math incl. the reflect pad on non-divisible lengths.
    # The MSD half already has a committed-weights fixture ("losses").
    "mpd_p": dict(b=2, t=1501, periods=(2, 3), seed=51),
}


def synth_state_dict(shapes, seed: int):
    """Deterministic synthetic torch-style state_dict: each entry's values
    depend only on (seed, key name, shape) — the exporter builds `shapes`
    from the reference module's state_dict, the replay side from this
    repo's param tree via convert.tree_to_state_dict, and parity of the
    two key/shape sets is asserted by construction (values can only match
    if the trees mirror each other). Scales keep the modules
    well-conditioned: unit-ish BN stats, fan-in-scaled weights."""
    import zlib

    out = {}
    for k in sorted(shapes):
        shape = tuple(int(d) for d in shapes[k])
        rng = np.random.default_rng([seed, zlib.crc32(k.encode())])
        n = rng.standard_normal(shape).astype(np.float32)
        leaf = k.rsplit(".", 1)[-1]
        if leaf == "running_var":
            v = 0.5 + np.abs(0.3 * n)
        elif leaf == "running_mean":
            v = 0.2 * n
        elif leaf == "weight_g":
            v = 0.4 + np.abs(0.2 * n)
        elif leaf.startswith("bias"):
            v = 0.1 * n
        elif len(shape) == 1:  # BatchNorm weight
            v = 1.0 + 0.2 * n
        else:
            v = n / np.sqrt(max(1, int(np.prod(shape[1:]))))
        out[k] = v.astype(np.float32)
    return out


def make_inputs(name: str) -> Dict[str, np.ndarray]:
    """Deterministic inputs in TORCH layout, identical on both sides."""
    rng = np.random.default_rng([17, len(name), sum(map(ord, name))])
    s = SPECS[name]
    if name == "text_encoder":
        return {
            "tokens": rng.integers(0, s["n_symbols"], (2, 12)).astype(np.int64),
            "lengths": np.array([12, 8], np.int64),
        }
    if name == "style_encoder":
        # odd T exercises the edge-duplication path (models.py:53-63)
        return {"mel": rng.standard_normal((2, 1, 80, 121)).astype(np.float32)}
    if name == "predictor":
        b, t, f = 2, 10, 16
        lengths = np.array([t, 7], np.int64)
        valid = (np.arange(t)[None, :] < lengths[:, None])
        t_en = rng.standard_normal((b, s["d_hid"], t)).astype(np.float32)
        t_en *= valid[:, None, :]
        align = (rng.random((b, t, f)).astype(np.float32)
                 * valid[..., None])
        return {
            "t_en": t_en, "s": rng.standard_normal(
                (b, s["style_dim"])).astype(np.float32),
            "lengths": lengths, "align": align,
        }
    if name == "hifigan_generator":
        b, f = 1, 20  # x and f0 are both at MEL rate (hifigan.py:321-325)
        return {
            "x": rng.standard_normal(
                (b, s["upsample_initial_channel"], f)).astype(np.float32),
            "s": rng.standard_normal((b, s["style_dim"])).astype(np.float32),
            "f0": (np.abs(rng.standard_normal((b, f))) * 100.0
                   + 80.0).astype(np.float32),
        }
    if name == "vocos_generator":
        b, f = 1, 20
        return {
            "x": rng.standard_normal((b, s["dim"], f)).astype(np.float32),
            "s": rng.standard_normal((b, s["style_dim"])).astype(np.float32),
        }
    if name == "istftnet_generator":
        b, f = 1, 20
        return {
            "x": rng.standard_normal(
                (b, s["upsample_initial_channel"], f)).astype(np.float32),
            "s": rng.standard_normal((b, s["style_dim"])).astype(np.float32),
            "f0": (np.abs(rng.standard_normal((b, f))) * 100.0
                   + 80.0).astype(np.float32),
        }
    if name == "composed_train":
        b, t_text, crop = s["b"], s["t_text"], s["crop"]
        t_mel = 2 * crop + 2  # crop offset forced to 0 on both sides
        lens = np.array([t_text, t_text - 3], np.int64)
        texts = rng.integers(4, s["aligner"]["n_token"],
                             (b, t_text)).astype(np.int64)
        texts[1, t_text - 3:] = 0
        waves = (rng.standard_normal((b, t_mel * 300)) * 0.1).astype(
            np.float32)
        # identical peaked soft attention injected on BOTH sides: with
        # random small weights the aligner's attention is near-uniform, so
        # the monotonic DP path flips under float noise; a diagonal
        # gaussian keeps the composed comparison well-conditioned while
        # still exercising every loss and denominator (same trick as
        # tests/test_composed_parity.py)
        l_half = t_mel // 2
        ii = np.arange(t_text)[None, :, None]
        jj = np.arange(l_half)[None, None, :]
        centers = (jj + 0.5) * lens[:, None, None] / l_half - 0.5
        logits = -0.5 * ((ii - centers) / 0.7) ** 2
        logits = np.where(ii < lens[:, None, None], logits, -1e9)
        synth = np.exp(logits - logits.max(axis=1, keepdims=True))
        synth = (synth / synth.sum(axis=1, keepdims=True)).astype(np.float32)
        return {"waves": waves, "texts": texts, "lengths": lens,
                "attn": synth}
    if name == "losses":
        b, t = s["b"], s["t"]
        return {
            "y": (rng.standard_normal((b, t)) * 0.2).astype(np.float32),
            "y_hat": (rng.standard_normal((b, t)) * 0.2).astype(np.float32),
        }
    if name == "asr":
        b, t_mel, t_text = 2, 40, 7
        lengths = np.array([t_mel // 2, t_mel // 2 - 5], np.int64)
        return {
            "mel": rng.standard_normal((b, 80, t_mel)).astype(np.float32),
            "text": rng.integers(4, s["n_token"],
                                 (b, t_text)).astype(np.int64),
            "lengths": lengths,  # DOWNSAMPLED (T_mel//2) memory lengths
        }
    if name == "jdc":
        # (B, 80, T) normalized-log-mel-scale input, the layout the train
        # loop feeds pitch_extractor (reference train.py:260-261)
        return {"mel": rng.standard_normal(
            (s["b"], 80, s["t"])).astype(np.float32)}
    if name == "mpd_p":
        # t not divisible by 2 or 3 -> both periods exercise the reflect pad
        return {"y": (0.3 * rng.standard_normal(
            (s["b"], s["t"]))).astype(np.float32)}
    raise KeyError(name)
