"""Checkpoint round trip: torch .pth -> JAX tree -> torch .pth.

The reverse converter (convert.tree_to_state_dict / save_torch_checkpoint)
must produce state_dicts the REFERENCE modules load strictly — including
the vocos decoder's new-style parametrizations weight-norm keys and
re-synthesized BatchNorm num_batches_tracked buffers — with every weight
bit-identical after the round trip.
"""

import numpy as np
import pytest

from styletts2_tpu.convert import module_to_tree, tree_to_state_dict

from conftest import add_reference_to_path, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")


def _roundtrip(mod, fresh, new_style=False):
    import torch

    sd = mod.state_dict()
    tree = module_to_tree(mod)
    back = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in tree_to_state_dict(
                tree, new_style_weight_norm=new_style).items()}
    missing, unexpected = fresh.load_state_dict(back, strict=True)
    assert not missing and not unexpected
    out = fresh.state_dict()
    assert set(out) == set(sd)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue  # re-synthesized as 0 (dropped on import)
        np.testing.assert_array_equal(out[k].numpy(), sd[k].numpy(),
                                      err_msg=k)


def test_hifigan_decoder_roundtrip():
    add_reference_to_path()
    import torch
    from Modules.hifigan import Decoder

    torch.manual_seed(0)
    kw = dict(dim_in=512, style_dim=128, dim_out=80)
    _roundtrip(Decoder(**kw), Decoder(**kw))


def test_vocos_decoder_roundtrip_new_style():
    add_reference_to_path()
    import torch
    from Modules.vocos import Decoder

    torch.manual_seed(1)
    kw = dict(dim_in=512, style_dim=128, dim_out=80, intermediate_dim=64,
              num_layers=2, gen_istft_n_fft=1200, gen_istft_hop_size=300)
    _roundtrip(Decoder(**kw), Decoder(**kw), new_style=True)


def test_jdc_roundtrip_batchnorm_buffers():
    add_reference_to_path()
    import torch
    from Modules.JDC.model import JDCNet

    torch.manual_seed(2)
    _roundtrip(JDCNet(num_class=1, seq_len=192),
               JDCNet(num_class=1, seq_len=192))


def test_save_torch_checkpoint_reference_layout(tmp_path):
    """The written .pth has the reference's state layout (train.py:349-357)
    and loads back through the forward converter unchanged."""
    add_reference_to_path()
    import torch
    from Modules.hifigan import Decoder

    from styletts2_tpu.checkpoint import load_checkpoint
    from styletts2_tpu.convert import save_torch_checkpoint

    torch.manual_seed(3)
    mod = Decoder(dim_in=512, style_dim=128, dim_out=80)
    tree = module_to_tree(mod)
    p = str(tmp_path / "model.pth")
    save_torch_checkpoint({"decoder": tree}, p, iters=123, epoch=4,
                          val_loss=0.5)

    raw = torch.load(p, map_location="cpu", weights_only=False)
    assert set(raw) == {"net", "optimizer", "iters", "epoch", "val_loss"}
    assert raw["iters"] == 123 and raw["epoch"] == 4

    state = load_checkpoint(p)  # auto-detects .pth
    a = sorted((k, v.shape) for k, v in
               tree_to_state_dict(state["net"]["decoder"]).items())
    b = sorted((k, v.shape) for k, v in tree_to_state_dict(tree).items())
    assert a == b
    for (k, _), (_, _) in zip(a, b):
        got = tree_to_state_dict(state["net"]["decoder"])[k]
        want = tree_to_state_dict(tree)[k]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=k)
