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
                                        make_inputs, synth_state_dict)


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

    # --- istftnet generator (shared source + source-STFT intermediates) ----
    # The source-STFT phase is branch-cut ambiguous (see golden.SPECS), so
    # the fixture records the reference's exact harmonic source and its
    # (mag, phase) for injection on the replay side — the committed-fixture
    # form of test_models_parity.py::test_decoder_parity[istftnet]. The
    # sine determinism patch makes the separately-recorded preamble equal
    # the values mod(x, s, f0) computes internally.
    from Modules.istftnet import Generator as IstftGenerator

    spec = SPECS["istftnet_generator"]
    torch.manual_seed(15)
    mod = IstftGenerator(**spec).eval()
    inp = make_inputs("istftnet_generator")
    orig_randn_like = torch.randn_like
    orig_rand = patch_sine_determinism()
    try:
        with torch.no_grad():
            f0_t = torch.from_numpy(inp["f0"])
            f0_up = mod.f0_upsamp(f0_t[:, None]).transpose(1, 2)
            har_source, _, _ = mod.m_source(f0_up)
            har_flat = har_source.transpose(1, 2).squeeze(1)  # (B, L)
            har_spec, har_phase = mod.stft.transform(har_flat)
            out = mod(torch.from_numpy(inp["x"]),
                      torch.from_numpy(inp["s"]), f0_t)
    finally:
        torch.rand = orig_rand
        torch.randn_like = orig_randn_like
    save_fixture(os.path.join(out_dir, "golden_istftnet_generator.npz"), mod,
                 inp, {"wav": out.numpy(), "har": har_flat.numpy(),
                       "har_spec": har_spec.numpy(),
                       "har_phase": har_phase.numpy()})

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

    export_asr(out_dir)
    export_jdc(out_dir)
    export_mpd(out_dir)
    export_composed_train(out_dir)
    export_losses(out_dir)


def load_synth_weights(mod, seed):
    """Load a synth_state_dict (golden.py) into a torch module, asserting
    the key/shape sets line up with what the replay side will derive from
    this repo's param tree (values match only if the trees mirror)."""
    shapes = {k: tuple(v.shape) for k, v in mod.state_dict().items()
              if "num_batches_tracked" not in k}
    sd = synth_state_dict(shapes, seed)
    missing, unexpected = mod.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing


def export_jdc(out_dir):
    """JDC pitch extractor direct golden (reference JDC/model.py:102-137)
    at full size on synthesized shared weights — only the F0 output is
    stored (the one JDC product the lite pipeline consumes,
    train.py:260-261; GAN_feature feeds nothing here)."""
    from Modules.JDC.model import JDCNet

    spec = SPECS["jdc"]
    mod = JDCNet(num_class=1, seq_len=192).eval()
    load_synth_weights(mod, spec["seed"])
    inp = make_inputs("jdc")
    with torch.no_grad():
        f0, _gan, _ = mod(torch.from_numpy(inp["mel"]).unsqueeze(1))
    path = os.path.join(out_dir, "golden_jdc.npz")
    np.savez_compressed(path, **{"out:f0": f0.numpy()})
    print(f"wrote {path} (f0 {tuple(f0.shape)})")


def export_mpd(out_dir):
    """One full-size DiscriminatorP weight set (synthesized) evaluated at
    periods 2 and 3 (reference discriminators.py:96-129): logits + every
    feature map. The period is fold geometry only, so loading the same
    weights into DiscriminatorP(3) is exact."""
    from Modules.discriminators import DiscriminatorP

    spec = SPECS["mpd_p"]
    inp = make_inputs("mpd_p")
    y = torch.from_numpy(inp["y"]).unsqueeze(1)
    arrays = {}
    for period in spec["periods"]:
        mod = DiscriminatorP(period).eval()
        load_synth_weights(mod, spec["seed"])
        with torch.no_grad():
            logits, fmap = mod(y)
        arrays[f"out:p{period}_logits"] = logits.numpy()
        for j, f in enumerate(fmap):
            arrays[f"out:p{period}_fmap{j}"] = f.numpy()
    path = os.path.join(out_dir, "golden_mpd.npz")
    np.savez_compressed(path, **arrays)
    total = sum(a.nbytes for a in arrays.values())
    print(f"wrote {path} ({len(arrays)} arrays, {total/1e6:.2f} MB raw)")


def export_asr(out_dir):
    """ASR aligner direct golden (reference ASR/models.py:8-186): full
    forward — CTC logits, teacher-forced ASRS2S logits, soft attention.
    The 10% token->unk masking has no self.training gate (ASR/models.py:126),
    so torch.rand is patched to ones; the replay side runs rng=None."""
    from Modules.ASR.models import ASRCNN

    spec = SPECS["asr"]
    torch.manual_seed(40)
    mod = ASRCNN(**spec).eval()
    inp = make_inputs("asr")
    mel = torch.from_numpy(inp["mel"])
    text = torch.from_numpy(inp["text"])
    lengths = torch.from_numpy(inp["lengths"])
    pad_mask = mod.length_to_mask(lengths)  # True at padding
    orig_rand = torch.rand

    def ones_rand(*a, **k):
        k.pop("device", None)  # mirror patch_sine_determinism's kwarg handling
        return torch.ones(*a, **k)

    torch.rand = ones_rand
    try:
        with torch.no_grad():
            ctc, s2s, attn = mod(mel, pad_mask, text)
    finally:
        torch.rand = orig_rand
    save_fixture(os.path.join(out_dir, "golden_asr.npz"), mod, inp,
                 {"ctc": ctc.numpy(), "s2s": s2s.numpy(),
                  "attn": attn.numpy()})


def export_composed_train(out_dir):
    """Composed train-step GLUE losses (reference train.py:202-315,
    deterministic eval branch: mono attention, crop offset 0, no dropout):
    dur/ce/s2s/mono/f0/norm on small modules, with the JDC pitch target
    recorded as an array (JDCNet is not size-parameterized; 5.2M params
    would dominate the fixture). The decoder/discriminator losses stay in
    the live tests (see golden.SPECS['composed_train'] note)."""
    import torch.nn.functional as F

    import models as ref_models
    from Modules.JDC.model import JDCNet

    import jax.numpy as jnp

    from styletts2_tpu.ops import align as ALN
    from styletts2_tpu.ops import stft as OPS

    spec = SPECS["composed_train"]
    torch.manual_seed(20)
    te = ref_models.TextEncoder(**spec["text_encoder"]).eval()
    torch.manual_seed(21)
    se = ref_models.StyleEncoder(**spec["style_encoder"]).eval()
    torch.manual_seed(22)
    pr = ref_models.ProsodyPredictor(**spec["predictor"]).eval()
    torch.manual_seed(23)
    al = ref_models.ASRCNN(**spec["aligner"]).eval()
    # the reference applies its 10% unk masking unconditionally (even in
    # eval, ASR/models.py:125-128) — disable via the threshold; the replay
    # side runs rng=None => no masking
    al.asr_s2s.random_mask = -1.0
    torch.manual_seed(24)
    jdc = JDCNet(num_class=1, seq_len=192).eval()

    inp = make_inputs("composed_train")
    b, crop = spec["b"], spec["crop"]
    waves = torch.from_numpy(inp["waves"])
    texts = torch.from_numpy(inp["texts"])
    input_lengths = torch.from_numpy(inp["lengths"])
    synth = inp["attn"]

    # both sides share the repo mel frontend (parity-tested vs torchaudio
    # in tests/test_stft.py), even-truncated like meldataset.py:93-97
    mels_j = OPS.preprocess_wave(jnp.asarray(inp["waves"]), backend="xla")
    mels_j = mels_j[..., : mels_j.shape[-1] - mels_j.shape[-1] % 2]
    mels = torch.from_numpy(np.asarray(mels_j))
    t_mel = mels.shape[-1]
    mel_input_length = torch.full((b,), t_mel, dtype=torch.long)

    with torch.no_grad():
        mask = al.length_to_mask(mel_input_length // 2)
        text_mask = te.length_to_mask(input_lengths)

        _, s2s_pred, _ = al(mels, mask, texts)
        # injected attention (train.py:206-209 drops the sos step; the
        # synthetic tensor replaces the post-drop (B, T, L/2) attention)
        mask_st = ALN.mask_from_lens(
            jnp.asarray(input_lengths.numpy()),
            jnp.asarray((mel_input_length // 2).numpy()),
            synth.shape[1], synth.shape[2])
        attn_np = synth * np.asarray(mask_st, np.float32)
        mono = ALN.maximum_path(jnp.asarray(attn_np),
                                jnp.asarray(input_lengths.numpy()),
                                jnp.asarray((mel_input_length // 2).numpy()))
        s2s_attn = torch.from_numpy(attn_np)
        s2s_attn_mono = torch.from_numpy(np.asarray(mono, np.float32))

        t_en = te(texts, input_lengths, text_mask)
        d_gt = s2s_attn_mono.sum(axis=-1)

        s_full = se(mels.unsqueeze(1))
        d, p = pr(t_en, s_full, input_lengths, s2s_attn_mono, text_mask)

        # crops (train.py:235-256), offset 0 on both sides
        p_en = p[:, :, :crop]
        gt = mels[:, :, : 2 * crop]

        s = se(gt.unsqueeze(1))
        f0_real, _, _ = jdc(gt.unsqueeze(1))
        n_real = torch.from_numpy(np.asarray(OPS.log_norm(
            jnp.asarray(gt.numpy()), axis=-2)))

        f0_fake, n_fake = pr.F0Ntrain(p_en, s)
        loss_f0 = F.smooth_l1_loss(f0_real, f0_fake) / 10
        loss_norm = F.smooth_l1_loss(n_real, n_fake)

        loss_ce = 0.0
        loss_dur = 0.0
        for _s2s_pred, _text_input, _text_length in zip(d, d_gt,
                                                        input_lengths):
            _s2s_pred = _s2s_pred[:_text_length, :]
            _text_input = _text_input[:_text_length].long()
            _s2s_trg = torch.zeros_like(_s2s_pred)
            for pp in range(_s2s_trg.shape[0]):
                _s2s_trg[pp, : _text_input[pp]] = 1
            _dur_pred = torch.sigmoid(_s2s_pred).sum(axis=1)
            loss_dur += F.l1_loss(_dur_pred[1: _text_length - 1],
                                  _text_input[1: _text_length - 1].float())
            loss_ce += F.binary_cross_entropy_with_logits(
                _s2s_pred.flatten(), _s2s_trg.flatten())
        loss_ce /= texts.size(0)
        loss_dur /= texts.size(0)

        loss_s2s = 0.0
        for _s2s_pred, _text_input, _text_length in zip(s2s_pred, texts,
                                                        input_lengths):
            loss_s2s += F.cross_entropy(_s2s_pred[:_text_length],
                                        _text_input[:_text_length])
        loss_s2s /= texts.size(0)

        loss_mono = F.l1_loss(s2s_attn, s2s_attn_mono) * 10

    arrays = {}
    for prefix, mod in (("text_encoder", te), ("style_encoder", se),
                        ("predictor", pr), ("text_aligner", al)):
        for k, v in sd_to_numpy(mod).items():
            arrays[f"sd:{prefix}.{k}"] = v
    arrays["out:f0_real"] = f0_real.numpy()
    losses = {"dur": loss_dur, "ce": loss_ce, "s2s": loss_s2s,
              "mono": loss_mono, "f0": loss_f0, "norm": loss_norm}
    for k, v in losses.items():
        arrays[f"out:loss_{k}"] = np.float32(float(v))
    path = os.path.join(out_dir, "golden_composed_train.npz")
    np.savez_compressed(path, **arrays)
    total = sum(a.nbytes for a in arrays.values())
    print(f"wrote {path} ({len(arrays)} arrays, {total/1e6:.2f} MB raw)")
    print("  losses:", {k: round(float(v), 6) for k, v in losses.items()})


def export_losses(out_dir):
    """Loss library golden (reference losses.py:24-147): the MSD halves of
    the adversarial/feature/TPRLS losses (full-size MultiResSpecDiscriminator,
    280,902 params) + the weight-free mel-domain MRSTFT value."""
    import losses as ref_losses
    from Modules.discriminators import MultiResSpecDiscriminator

    torch.manual_seed(30)
    msd = MultiResSpecDiscriminator().eval()
    inp = make_inputs("losses")
    y = torch.from_numpy(inp["y"]).unsqueeze(1)
    y_hat = torch.from_numpy(inp["y_hat"]).unsqueeze(1)

    # the reference stft helper calls window.to(y.get_device()), a CUDA-ism
    # that crashes on CPU (get_device() == -1)
    orig_get_device = torch.Tensor.get_device
    torch.Tensor.get_device = lambda self: "cpu"
    try:
        with torch.no_grad():
            rs, gs, frs, fgs = msd(y, y_hat)
            gen_adv, _ = ref_losses.generator_loss(gs)
            feat = ref_losses.feature_loss(frs, fgs)
            gen_tprls = ref_losses.generator_TPRLS_loss(rs, gs)
            disc_adv, _, _ = ref_losses.discriminator_loss(rs, gs)
            disc_tprls = ref_losses.discriminator_TPRLS_loss(rs, gs)
            mrstft = ref_losses.MultiResolutionSTFTLoss()(
                y_hat.squeeze(1), y.squeeze(1))
    finally:
        torch.Tensor.get_device = orig_get_device

    arrays = {f"sd:{k}": v for k, v in sd_to_numpy(msd).items()}
    losses = {"msd_gen_adv": gen_adv, "msd_feature": feat,
              "msd_gen_tprls": gen_tprls, "msd_disc_adv": disc_adv,
              "msd_disc_tprls": disc_tprls, "mrstft": mrstft}
    for k, v in losses.items():
        arrays[f"out:{k}"] = np.float32(float(v))
    path = os.path.join(out_dir, "golden_losses.npz")
    np.savez_compressed(path, **arrays)
    total = sum(a.nbytes for a in arrays.values())
    print(f"wrote {path} ({len(arrays)} arrays, {total/1e6:.2f} MB raw)")
    print("  losses:", {k: round(float(v), 6) for k, v in losses.items()})


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
