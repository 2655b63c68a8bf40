"""Parity for the training-side models: ASR aligner, JDC pitch extractor,
MPD/MSD discriminators — vs the live torch reference with converted weights.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import has_reference, add_reference_to_path

torch = pytest.importorskip("torch")

if not has_reference():  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)

import ref_stubs

ref_stubs.install()
add_reference_to_path()

from styletts2_tpu.convert import module_to_tree
from styletts2_tpu.nn import asr as ASR
from styletts2_tpu.nn import jdc as JDC
from styletts2_tpu.nn import discriminators as DISC
from styletts2_tpu.nn import layers as L


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_asr_feature_and_ctc_parity():
    from Modules.ASR.models import ASRCNN

    torch.manual_seed(0)
    mod = ASRCNN(input_dim=80, hidden_dim=256, n_token=178, n_layers=6,
                 token_embedding_dim=512).eval()
    mel = torch.randn(2, 80, 40)
    with torch.no_grad():
        feat_ref = mod.get_feature(mel)          # (B, 128, 20)
        ctc_ref = mod(mel)                        # (B, 20, 178)
    tree = module_to_tree(mod)
    feat = ASR.get_feature(tree, t2j(mel))        # (B, 20, 128)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(feat, 1, 2)),
                               feat_ref.numpy(), atol=1e-3, rtol=1e-2)
    ctc = L.linear_apply(tree["ctc_linear"]["0"]["linear_layer"], feat)
    import jax
    ctc = jax.nn.relu(ctc)
    ctc = L.linear_apply(tree["ctc_linear"]["2"]["linear_layer"], ctc)
    np.testing.assert_allclose(np.asarray(ctc), ctc_ref.numpy(),
                               atol=2e-3, rtol=1e-2)


def test_asr_s2s_parity(monkeypatch):
    """Full aligner forward with the teacher-forced attention decoder.

    The reference applies its 10% random token->unk masking even in eval
    (ASR/models.py:126 has no self.training gate); disable it by patching
    torch.rand so both sides are deterministic."""
    from Modules.ASR.models import ASRCNN

    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.ones(*a))
    torch.manual_seed(1)
    mod = ASRCNN(input_dim=80, hidden_dim=256, n_token=178, n_layers=6,
                 token_embedding_dim=512).eval()
    b, t_mel, t_text = 2, 40, 7
    mel = torch.randn(b, 80, t_mel)
    text = torch.randint(4, 170, (b, t_text))
    lengths = torch.tensor([t_mel // 2, t_mel // 2 - 5])
    pad_mask = mod.length_to_mask(lengths)  # True at padding

    with torch.no_grad():
        ctc_ref, s2s_ref, attn_ref = mod(mel, pad_mask, text)

    tree = module_to_tree(mod)
    ctc, s2s, attn = ASR.forward(tree, t2j(mel), t2j(pad_mask), t2j(text))
    np.testing.assert_allclose(np.asarray(s2s), s2s_ref.numpy(),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(attn), attn_ref.numpy(), atol=2e-4)


def test_jdc_parity():
    from Modules.JDC.model import JDCNet

    torch.manual_seed(2)
    mod = JDCNet(num_class=1, seq_len=192).eval()
    mel = torch.randn(2, 80, 48)  # (B, mel, T) -> unsqueeze(1) in reference
    with torch.no_grad():
        f0_ref, gan_ref, _ = mod(mel.unsqueeze(1))
    tree = module_to_tree(mod)
    f0, _ = JDC.forward(tree, t2j(mel))
    np.testing.assert_allclose(np.asarray(f0), f0_ref.numpy(),
                               atol=2e-3, rtol=1e-2)


def test_mpd_parity():
    from Modules.discriminators import MultiPeriodDiscriminator

    torch.manual_seed(3)
    mod = MultiPeriodDiscriminator().eval()
    y = torch.randn(2, 1, 9000) * 0.3
    y_hat = torch.randn(2, 1, 9000) * 0.3
    with torch.no_grad():
        rs, gs, frs, fgs = mod(y, y_hat)
    tree = module_to_tree(mod)
    ours = DISC.mpd_apply(tree, t2j(y.transpose(1, 2)), t2j(y_hat.transpose(1, 2)))
    for i in range(len(rs)):
        np.testing.assert_allclose(np.asarray(ours[0][i]), rs[i].numpy(),
                                   atol=2e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(ours[1][i]), gs[i].numpy(),
                                   atol=2e-3, rtol=1e-2)
    # feature maps: compare the last of each stack (layout: ours NHWC)
    for i in range(len(frs)):
        ref_last = frs[i][-1].numpy()  # (B, 1, H, W)
        our_last = np.asarray(jnp.transpose(ours[2][i][-1], (0, 3, 1, 2)))
        np.testing.assert_allclose(our_last, ref_last, atol=2e-3, rtol=1e-2)


def test_msd_parity():
    from Modules.discriminators import MultiResSpecDiscriminator

    torch.manual_seed(4)
    mod = MultiResSpecDiscriminator().eval()

    # the reference stft helper calls tensor.get_device() which needs CUDA;
    # patch the window onto CPU by evaluating via the module's forward with
    # get_device monkeypatched
    orig_get_device = torch.Tensor.get_device
    torch.Tensor.get_device = lambda self: "cpu"
    try:
        y = torch.randn(2, 1, 9000) * 0.3
        y_hat = torch.randn(2, 1, 9000) * 0.3
        with torch.no_grad():
            rs, gs, _, _ = mod(y, y_hat)
    finally:
        torch.Tensor.get_device = orig_get_device

    tree = module_to_tree(mod)
    ours = DISC.msd_apply(tree, t2j(y.transpose(1, 2)), t2j(y_hat.transpose(1, 2)))
    for i in range(len(rs)):
        np.testing.assert_allclose(np.asarray(ours[0][i]), rs[i].numpy(),
                                   atol=3e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(ours[1][i]), gs[i].numpy(),
                                   atol=3e-3, rtol=1e-2)


def test_param_counts_match_readme():
    """Parameter budget parity with the reference README.md:17-29."""
    import jax
    from styletts2_tpu.config import ModelConfig
    from styletts2_tpu.models import build_model, param_count

    cfg = ModelConfig()  # n_token=178 default
    params = build_model(jax.random.PRNGKey(0), cfg)
    assert param_count(params["text_encoder"]) == 5_606_400
    assert param_count(params["style_encoder"]) == 13_845_440
    assert param_count(params["predictor"]) == 16_194_612
    assert param_count(params["decoder"]) == 54_289_492
    assert param_count(params["text_aligner"]) == 7_865_252
    assert param_count(params["pitch_extractor"]) == 5_248_067
    assert param_count(params["mpd"]) == 41_105_770
    assert param_count(params["msd"]) == 280_902
    total = sum(param_count(params[k]) for k in params)
    assert total == 144_435_935  # README.md:29
