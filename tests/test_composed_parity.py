"""Composed-graph parity vs the reference (random converted weights).

Module-level parity (test_models_parity.py) cannot catch bugs in the GLUE:
duration rounding, the z-score outlier clamp's [1:-2] slice, alignment
build, crop bookkeeping, loss denominators. These tests run the reference's
composed computations — transcribed line-by-line from inference.py:224-272
and train.py:184-315 in torch, using the reference's own modules — against
our engine/_train-step code on identical converted weights and inputs.

The reference's inference/train entry files cannot be imported directly
(they require librosa/noisereduce/nltk-punkt/Cython monotonic_align, absent
here), so the glue is transcribed with file:line citations; the reference
MODULES (models.py, Modules/*) are the real imported code. Randomness is
pinned: deterministic sine source on both sides (same patch as
test_models_parity), t=0 duration blend, crop offset 0 (mel length chosen
so the only valid offset is 0).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import has_reference, add_reference_to_path

torch = pytest.importorskip("torch")

if not has_reference():  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)

import ref_stubs

ref_stubs.install()
add_reference_to_path()

import torch.nn.functional as F  # noqa: E402

from test_models_parity import _patch_determinism, t2j  # noqa: E402

from styletts2_tpu.config import load_config  # noqa: E402
from styletts2_tpu.convert import module_to_tree  # noqa: E402
from styletts2_tpu.ops import align as ALN  # noqa: E402
from styletts2_tpu.ops import stft as OPS  # noqa: E402


def _ref_inference_modules(seed=0):
    import models as ref_models
    from Modules.hifigan import Decoder

    torch.manual_seed(seed)
    return {
        "text_encoder": ref_models.TextEncoder(
            channels=512, kernel_size=5, depth=3, n_symbols=178).eval(),
        "style_encoder": ref_models.StyleEncoder(
            dim_in=64, style_dim=128, max_conv_dim=512).eval(),
        "predictor": ref_models.ProsodyPredictor(
            style_dim=128, d_hid=512, nlayers=3, max_dur=50,
            dropout=0.2).eval(),
        "decoder": Decoder(dim_in=512, style_dim=128, dim_out=80).eval(),
    }


def _ref_inference(mods, tokens, ref_s, speed=1.0, t=0.0):
    """Transcription of StyleTTS2.__inference (inference.py:224-272),
    deterministic branch (t=0 zeroes the stochastic blend)."""
    from models import TextEncoder

    tokens_t = torch.LongTensor(tokens).unsqueeze(0)
    with torch.no_grad():
        input_lengths = torch.LongTensor([tokens_t.shape[-1]])
        text_mask = TextEncoder.length_to_mask(
            mods["text_encoder"], input_lengths)

        t_en = mods["text_encoder"](tokens_t, input_lengths, text_mask)
        s = ref_s

        d = mods["predictor"].text_encoder(t_en, s, input_lengths, text_mask)
        x, _ = mods["predictor"].lstm(d)
        duration = mods["predictor"].duration_proj(x)
        duration = torch.sigmoid(duration).sum(axis=-1)

        # t=0: duration*(1-0) + stats*0 (inference.py:248-252)
        duration = duration * (1 - t)
        # __replace_outliers_zscore on [:, 1:-2] (inference.py:253, 134-148)
        seg = duration[:, 1:-2]
        mean, std = seg.mean(), seg.std()
        z = (seg - mean) / std
        outlier = torch.abs(z) > 3.0
        repl = mean + torch.sign(seg - mean) * (3.0 * std * 0.95)
        seg = torch.where(outlier, repl, seg)
        duration = duration.clone()
        duration[:, 1:-2] = seg
        duration = duration / min(max(speed, 0.0001), 2)

        pred_dur = torch.round(duration.squeeze()).clamp(min=1)
        pred_aln_trg = torch.zeros(int(input_lengths), int(pred_dur.sum()))
        c_frame = 0
        for i in range(pred_aln_trg.size(0)):
            pred_aln_trg[i, c_frame: c_frame + int(pred_dur[i])] = 1
            c_frame += int(pred_dur[i])
        alignment = pred_aln_trg.unsqueeze(0)

        en = d.transpose(-1, -2) @ alignment
        f0_pred, n_pred = mods["predictor"].F0Ntrain(en, s)
        asr = t_en @ alignment
        out = mods["decoder"](asr, f0_pred, n_pred, s)
    return out.squeeze().numpy(), pred_dur.numpy()


def test_composed_inference_parity(monkeypatch):
    """Full synthesis chain: reference __inference vs infer engine
    (_synthesize_chunk + duration glue), identical weights, t=0."""
    _patch_determinism(monkeypatch)
    from styletts2_tpu.infer import StyleTTS2
    from styletts2_tpu.text import TextCleaner, build_symbol_dict, \
        tokens_for_sentence

    mods = _ref_inference_modules()
    params = {k: module_to_tree(m) for k, m in mods.items()}

    cfg = load_config({
        # random weights predict ~25 frames/token (~500 total): keep the
        # largest bucket above that so the overflow compressor stays off
        # (the reference has no frame limit)
        "tpu": {"decoder_dtype": "float32",
                "token_buckets": [32, 64],
                "frame_buckets": [100, 200, 400, 800, 1200]},
        "debug": False,
    })
    engine = StyleTTS2(cfg, params=params, seed=0)

    torch.manual_seed(42)
    ref_s = torch.randn(1, 128) * 0.3

    sentence = "hello there world"
    cleaner = TextCleaner(build_symbol_dict(cfg.symbol), debug=False)
    tokens = tokens_for_sentence(sentence, cleaner)

    ref_wav, ref_dur = _ref_inference(mods, tokens, ref_s, speed=1.0, t=0.0)
    wav, _ = engine._synthesize_chunk(sentence, t2j(ref_s), speed=1.0,
                                      prev_d_mean=0.0, t=0.0)

    # identical rounded durations -> identical audio length
    assert len(wav) == len(ref_wav), (len(wav), len(ref_wav))
    corr = np.corrcoef(wav, ref_wav)[0, 1]
    assert corr > 0.9999, corr
    scale = np.abs(ref_wav).max() + 1e-6
    # int16 PCM transport quantizes to ~3e-5; conv stacks add rounding, and
    # random-weight outputs slam into the tanh rails where tiny pre-tanh
    # differences flip a handful of samples — bound the bulk and the tail
    diff = np.abs(wav - ref_wav) / scale
    assert np.percentile(diff, 99.99) < 2e-2, np.percentile(diff, 99.99)
    assert diff.max() < 0.1, diff.max()


# ---------------------------------------------------------------------------
# composed train-step losses
# ---------------------------------------------------------------------------


def _ref_train_losses(mods, waves, texts, input_lengths, mel_input_length,
                      mels, crop, loss_fns, attn_override=None):
    """Transcription of one reference train step's nine losses
    (train.py:202-315), eval-mode deterministic: mono attention branch
    (the 50% coin), crop offset 0 (mel lengths chosen so 0 is the only
    valid offset), no dropout/unk-masking.

    attn_override: replaces the aligner's soft attention on both sides of
    the comparison — with random weights the attention is near-uniform, so
    the monotonic DP path flips under float differences inside the ASR
    module's own parity tolerance (~5e-3); a peaked synthetic attention
    makes the composed comparison well-conditioned while still exercising
    every loss and the crop/denominator bookkeeping."""
    from models import TextEncoder

    dl, gl, stft_loss = loss_fns
    with torch.no_grad():
        mask = TextEncoder.length_to_mask(mods["text_encoder"],
                                          mel_input_length // 2)
        text_mask = TextEncoder.length_to_mask(mods["text_encoder"],
                                               input_lengths)

        ppgs, s2s_pred, s2s_attn = mods["text_aligner"](mels, mask, texts)
        s2s_attn = s2s_attn.transpose(-1, -2)
        s2s_attn = s2s_attn[..., 1:]
        s2s_attn = s2s_attn.transpose(-1, -2)
        if attn_override is not None:
            s2s_attn = torch.from_numpy(attn_override)

        # mask_from_lens + maximum_path (train.py:213-214) via our DP
        # (== the reference's Cython kernel; tests/test_align.py)
        mask_st = ALN.mask_from_lens(
            jnp.asarray(input_lengths.numpy()),
            jnp.asarray((mel_input_length // 2).numpy()),
            s2s_attn.shape[1], s2s_attn.shape[2])
        attn_np = s2s_attn.numpy() * np.asarray(mask_st, np.float32)
        mono = ALN.maximum_path(jnp.asarray(attn_np),
                                jnp.asarray(input_lengths.numpy()),
                                jnp.asarray((mel_input_length // 2).numpy()))
        s2s_attn = torch.from_numpy(attn_np)
        s2s_attn_mono = torch.from_numpy(np.asarray(mono, np.float32))

        t_en = mods["text_encoder"](texts, input_lengths, text_mask)
        asr = t_en @ s2s_attn_mono  # the coin's mono branch (train.py:220-223)
        d_gt = s2s_attn_mono.sum(axis=-1)

        s_full = mods["style_encoder"](mels.unsqueeze(1))
        d, p = mods["predictor"](t_en, s_full, input_lengths, s2s_attn_mono,
                                 text_mask)

        # crops (train.py:235-256), offset 0 by construction
        en = asr[:, :, :crop]
        p_en = p[:, :, :crop]
        gt = mels[:, :, : 2 * crop]
        wav = waves[:, : crop * 2 * 300].unsqueeze(1)

        s = mods["style_encoder"](gt.unsqueeze(1))
        F0_real, _, _ = mods["pitch_extractor"](gt.unsqueeze(1))
        # log_norm (utils.py:47-53) via our parity-tested equivalent
        N_real = torch.from_numpy(np.asarray(OPS.log_norm(
            jnp.asarray(gt.numpy()), axis=-2)))

        F0_fake, N_fake = mods["predictor"].F0Ntrain(p_en, s)
        y_rec = mods["decoder"](en, F0_fake, N_fake, s)

        loss_f0 = F.smooth_l1_loss(F0_real, F0_fake) / 10
        loss_norm = F.smooth_l1_loss(N_real, N_fake)
        d_loss = dl(wav.detach(), y_rec.detach()).mean()
        loss_mel = stft_loss(y_rec, wav)
        loss_gen = gl(wav, y_rec).mean()

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

    return {"mel": loss_mel.item(), "gen": loss_gen.item(),
            "ce": loss_ce.item(), "dur": loss_dur.item(),
            "norm": loss_norm.item(), "f0": loss_f0.item(),
            "s2s": loss_s2s.item(), "mono": loss_mono.item(),
            "d_loss": d_loss.item()}


def test_composed_train_losses_parity(monkeypatch):
    """All nine train-step losses: reference composition vs
    train.generator_losses + losses.discriminator_loss on identical
    converted weights and batch (settles the padded-denominator question)."""
    _patch_determinism(monkeypatch)
    import models as ref_models
    from Modules.hifigan import Decoder
    from Modules.discriminators import (MultiPeriodDiscriminator,
                                        MultiResSpecDiscriminator)
    from Modules.JDC.model import JDCNet
    import losses as ref_losses

    from styletts2_tpu import losses as LO
    from styletts2_tpu import train as TR
    from styletts2_tpu.train import Batch

    torch.manual_seed(0)
    mods = _ref_inference_modules()
    mods["text_aligner"] = ref_models.ASRCNN(
        input_dim=80, hidden_dim=256, n_token=178, n_layers=6,
        token_embedding_dim=512).eval()
    # the reference applies its 10% unk masking UNCONDITIONALLY (even in
    # eval, ASR/models.py:125-128); with torch.rand patched to zeros that
    # would mask EVERY token — disable via the threshold instead (our side
    # runs rng=None => no masking)
    mods["text_aligner"].asr_s2s.random_mask = -1.0
    mods["pitch_extractor"] = JDCNet(num_class=1, seq_len=192).eval()
    mods["mpd"] = MultiPeriodDiscriminator().eval()
    mods["msd"] = MultiResSpecDiscriminator().eval()

    dl = ref_losses.DiscriminatorLoss(mods["mpd"], mods["msd"])
    gl = ref_losses.GeneratorLoss(mods["mpd"], mods["msd"])
    stft_loss = ref_losses.MultiResolutionSTFTLoss()
    # the reference's SpecDiscriminator calls window.to(y.get_device()),
    # a CUDA-ism that crashes on CPU (get_device() == -1)
    monkeypatch.setattr(torch.Tensor, "get_device", lambda self: "cpu")

    b, t_text, crop = 2, 10, 41
    t_mel = 2 * crop + 2  # crop offset 0 is the only valid start both sides
    rng = np.random.default_rng(0)
    waves_np = (rng.standard_normal((b, t_mel * 300)) * 0.1).astype("float32")
    texts_np = rng.integers(4, 170, (b, t_text)).astype("int64")
    lens_np = np.array([t_text, t_text - 3], np.int64)
    texts_np[1, t_text - 3:] = 0

    # reference-side mels: the frontend recipe (meldataset.py:48-56),
    # even-truncated
    mels_j = OPS.preprocess_wave(jnp.asarray(waves_np), backend="xla")
    mels_j = mels_j[..., : mels_j.shape[-1] - mels_j.shape[-1] % 2]
    mels = torch.from_numpy(np.asarray(mels_j))
    assert mels.shape[-1] == t_mel

    # identical peaked soft attention injected on BOTH sides (see
    # _ref_train_losses docstring): diagonal gaussian, masked, frame-softmax
    l_half = t_mel // 2
    ii = np.arange(t_text)[None, :, None]
    jj = np.arange(l_half)[None, None, :]
    centers = (jj + 0.5) * lens_np[:, None, None] / l_half - 0.5
    logits = -0.5 * ((ii - centers) / 0.7) ** 2
    logits = np.where(ii < lens_np[:, None, None], logits, -1e9)
    synth = np.exp(logits - logits.max(axis=1, keepdims=True))
    synth = (synth / synth.sum(axis=1, keepdims=True)).astype(np.float32)

    ref = _ref_train_losses(
        mods, torch.from_numpy(waves_np), torch.from_numpy(texts_np),
        torch.from_numpy(lens_np), torch.full((b,), t_mel, dtype=torch.long),
        mels, crop, (dl, gl, stft_loss), attn_override=synth)

    # --- our side: identical weights, same deterministic branch ----------
    params = {k: module_to_tree(m) for k, m in mods.items()}
    cfg = load_config({"max_len": 2 * crop,
                       "model_params": {"decoder": {"type": "hifigan"}}})
    batch = Batch(waves=jnp.asarray(waves_np),
                  texts=jnp.asarray(texts_np.astype("int32")),
                  input_lengths=jnp.asarray(lens_np.astype("int32")),
                  mel_lengths=jnp.full((b,), t_mel, jnp.int32))

    # train=False kills dropout/unk-mask; force the mono branch + crop 0
    # (the reference transcription above uses the same branch/offset)
    monkeypatch.setattr(
        jax.random, "bernoulli",
        lambda *a, **k: jnp.asarray(False))
    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape=(), *a, **k: jnp.zeros(shape))
    # inject the same synthetic attention into our aligner output (the
    # aligner's own numerics are parity-tested in test_asr_s2s_parity)
    from styletts2_tpu.nn import asr as ASR_mod

    orig_asr_forward = ASR_mod.forward

    def patched_asr_forward(p, mels_, mel_pad_mask, texts_, rng=None,
                            train=False):
        ctc, s2s_pred_o, attn_full = orig_asr_forward(
            p, mels_, mel_pad_mask, texts_, rng=rng, train=train)
        attn_full = jnp.concatenate(
            [attn_full[:, :1, :], jnp.asarray(synth)], axis=1)
        return ctc, s2s_pred_o, attn_full

    monkeypatch.setattr(ASR_mod, "forward", patched_asr_forward)
    import styletts2_tpu.train as TR_mod

    monkeypatch.setattr(TR_mod.ASR, "forward", patched_asr_forward)

    mels_ours = TR.compute_mels(batch.waves, cfg.model_params,
                                cfg.preprocess_params.spect_params)
    _, (_, _, metrics) = TR.generator_losses(
        params, batch, mels_ours, jax.random.PRNGKey(0), cfg.model_params,
        cfg.loss_params, crop, train=False)
    y_rec, wav, _ = TR.generator_forward(
        params, batch, mels_ours, jax.random.PRNGKey(0), cfg.model_params,
        crop, train=False)
    d_loss = LO.discriminator_loss(params["mpd"], params["msd"], wav,
                                   jax.lax.stop_gradient(y_rec))
    ours = {k: float(v) for k, v in metrics.items()}
    ours["d_loss"] = float(d_loss)

    for k in ref:
        assert ours[k] == pytest.approx(ref[k], rel=2e-2, abs=2e-3), \
            (k, ours[k], ref[k])
