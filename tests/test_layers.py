"""Layer-primitive parity vs torch (layouts, weight norm, packed LSTMs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.nn import layers as L

torch = pytest.importorskip("torch")


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def assert_close(ours, theirs, atol=2e-5, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               atol=atol, rtol=rtol)


def test_linear_matches_torch():
    torch.manual_seed(0)
    lin = torch.nn.Linear(16, 8)
    x = torch.randn(4, 16)
    p = {"weight": t2j(lin.weight), "bias": t2j(lin.bias)}
    assert_close(L.linear_apply(p, t2j(x)), lin(x))


def test_conv1d_weight_norm_matches_torch():
    torch.manual_seed(1)
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(6, 10, 5, padding=2))
    x = torch.randn(2, 6, 33)
    p = {"weight_g": t2j(conv.weight_g), "weight_v": t2j(conv.weight_v),
         "bias": t2j(conv.bias)}
    ours = L.conv1d_apply(p, t2j(x.transpose(1, 2)), padding=2)
    assert_close(jnp.swapaxes(ours, 1, 2), conv(x))


def test_conv1d_dilated_matches_torch():
    torch.manual_seed(2)
    conv = torch.nn.Conv1d(8, 8, 3, dilation=5, padding=5)
    x = torch.randn(2, 8, 50)
    p = {"weight": t2j(conv.weight), "bias": t2j(conv.bias)}
    ours = L.conv1d_apply(p, t2j(x.transpose(1, 2)), padding=5, dilation=5)
    assert_close(jnp.swapaxes(ours, 1, 2), conv(x))


def test_conv1d_strided_grouped_matches_torch():
    torch.manual_seed(3)
    conv = torch.nn.Conv1d(12, 12, 3, stride=2, padding=1, groups=12)
    x = torch.randn(2, 12, 41)
    p = {"weight": t2j(conv.weight), "bias": t2j(conv.bias)}
    ours = L.conv1d_apply(p, t2j(x.transpose(1, 2)), stride=2, padding=1, groups=12)
    assert_close(jnp.swapaxes(ours, 1, 2), conv(x))


@pytest.mark.parametrize("u,k,groups", [
    (10, 20, 1), (5, 10, 1), (3, 6, 1), (2, 4, 1), (2, 3, 8),
])
def test_conv_transpose1d_matches_torch(u, k, groups):
    torch.manual_seed(4)
    in_ch = out_ch = 8
    pad = u // 2 + u % 2 if groups == 1 else 1
    outpad = u % 2 if groups == 1 else 1
    conv = torch.nn.ConvTranspose1d(in_ch, out_ch, k, u, padding=pad,
                                    output_padding=outpad, groups=groups)
    x = torch.randn(2, in_ch, 17)
    p = {"weight": t2j(conv.weight), "bias": t2j(conv.bias)}
    ours = L.conv_transpose1d_apply(p, t2j(x.transpose(1, 2)), stride=u,
                                    padding=pad, output_padding=outpad,
                                    groups=groups)
    assert_close(jnp.swapaxes(ours, 1, 2), conv(x))


def test_conv2d_matches_torch():
    torch.manual_seed(5)
    conv = torch.nn.Conv2d(3, 7, 3, stride=1, padding=1)
    x = torch.randn(2, 3, 20, 15)
    p = {"weight": t2j(conv.weight), "bias": t2j(conv.bias)}
    ours = L.conv2d_apply(p, t2j(x.permute(0, 2, 3, 1)), padding=(1, 1))
    assert_close(jnp.transpose(ours, (0, 3, 1, 2)), conv(x))


def test_conv2d_depthwise_strided_matches_torch():
    # LearnedDownSample 'half' (reference models.py:23)
    torch.manual_seed(6)
    conv = torch.nn.Conv2d(16, 16, (3, 3), stride=(2, 2), groups=16, padding=1)
    x = torch.randn(2, 16, 21, 13)
    p = {"weight": t2j(conv.weight), "bias": t2j(conv.bias)}
    ours = L.conv2d_apply(p, t2j(x.permute(0, 2, 3, 1)), stride=(2, 2),
                          padding=(1, 1), groups=16)
    assert_close(jnp.transpose(ours, (0, 3, 1, 2)), conv(x))


def test_avg_pool2d_floor_matches_torch():
    x = torch.randn(2, 4, 5, 7)  # odd H and W exercise floor mode
    ref = torch.nn.functional.avg_pool2d(x, 2)
    ours = L.avg_pool2d_floor(t2j(x.permute(0, 2, 3, 1)))
    assert_close(jnp.transpose(ours, (0, 3, 1, 2)), ref)


def test_layer_norm_matches_torch():
    torch.manual_seed(7)
    g = torch.randn(12)
    b = torch.randn(12)
    x = torch.randn(3, 9, 12)
    ref = torch.nn.functional.layer_norm(x, (12,), g, b, 1e-5)
    p = {"gamma": t2j(g), "beta": t2j(b)}
    assert_close(L.layer_norm_apply(p, t2j(x)), ref)


def test_instance_norm_matches_torch():
    torch.manual_seed(8)
    x = torch.randn(3, 10, 25)  # (B, C, T)
    ref = torch.nn.functional.instance_norm(x)
    ours = L.instance_norm_1d(t2j(x.transpose(1, 2)))
    assert_close(jnp.swapaxes(ours, 1, 2), ref, atol=1e-4)


def test_instance_norm_masked_equals_exact_crop():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 30, 8)).astype(np.float32)
    lengths = np.array([30, 21])
    mask = np.asarray(L.length_to_valid_mask(jnp.asarray(lengths), 30))
    x_pad = x.copy()
    x_pad[1, 21:] = 0.0
    out = np.asarray(L.instance_norm_1d(jnp.asarray(x_pad), jnp.asarray(mask)))
    exact = np.asarray(L.instance_norm_1d(jnp.asarray(x[1:2, :21])))
    np.testing.assert_allclose(out[1, :21], exact[0], atol=1e-5)


def test_group_norm_matches_torch():
    torch.manual_seed(9)
    gn = torch.nn.GroupNorm(8, 64)
    x = torch.randn(2, 64, 19)
    p = {"weight": t2j(gn.weight), "bias": t2j(gn.bias)}
    ours = L.group_norm_apply(p, t2j(x.transpose(1, 2)), num_groups=8)
    assert_close(jnp.swapaxes(ours, 1, 2), gn(x), atol=1e-4)


def test_snake_matches_reference_formula():
    x = torch.randn(2, 6, 11)
    a = torch.rand(1, 6, 1) + 0.5
    ref = x + (1 / a) * (torch.sin(a * x) ** 2)
    ours = L.snake(t2j(x.transpose(1, 2)), t2j(a.transpose(1, 2)))
    assert_close(jnp.swapaxes(ours, 1, 2), ref)


def test_lstm_full_length_matches_torch():
    torch.manual_seed(10)
    lstm = torch.nn.LSTM(12, 7, 1, batch_first=True, bidirectional=True)
    x = torch.randn(3, 15, 12)
    out, _ = lstm(x)
    p = {k: t2j(v) for k, v in lstm.state_dict().items()}
    ours = L.lstm_apply(p, t2j(x))
    assert_close(ours, out, atol=1e-4)


def test_lstm_packed_variable_lengths_matches_torch():
    """Mask-aware scan == pack_padded_sequence/pad_packed_sequence
    (the construct used throughout the reference: models.py:268-275,
    426-440, 499-518)."""
    torch.manual_seed(11)
    lstm = torch.nn.LSTM(6, 5, 1, batch_first=True, bidirectional=True)
    x = torch.randn(3, 12, 6)
    lengths = torch.tensor([12, 7, 3])
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, lengths, batch_first=True, enforce_sorted=False)
    out, _ = lstm(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True)

    p = {k: t2j(v) for k, v in lstm.state_dict().items()}
    mask = L.length_to_valid_mask(jnp.asarray(lengths.numpy()), 12)
    ours = L.lstm_apply(p, t2j(x), mask)
    assert_close(ours, out, atol=1e-4)


def test_lstm_cell_matches_torch():
    torch.manual_seed(12)
    cell = torch.nn.LSTMCell(9, 6)
    x = torch.randn(4, 9)
    h = torch.randn(4, 6)
    c = torch.randn(4, 6)
    h2, c2 = cell(x, (h, c))
    p = {k: t2j(v) for k, v in cell.state_dict().items()}
    oh, oc = L.lstm_cell_apply(p, t2j(x), t2j(h), t2j(c))
    assert_close(oh, h2, atol=1e-5)
    assert_close(oc, c2, atol=1e-5)


def test_adain_matches_reference_module():
    from conftest import has_reference, add_reference_to_path
    if not has_reference():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from Modules.hifigan import AdaIN1d  # torch-only import

    torch.manual_seed(13)
    mod = AdaIN1d(style_dim=128, num_features=32)
    x = torch.randn(2, 32, 40)
    s = torch.randn(2, 128)
    ref = mod(x, s)
    p = {"fc": {"weight": t2j(mod.fc.weight), "bias": t2j(mod.fc.bias)}}
    ours = L.adain_1d_apply(p, t2j(x.transpose(1, 2)), t2j(s))
    assert_close(jnp.swapaxes(ours, 1, 2), ref, atol=1e-4)


def test_ada_layer_norm_matches_reference_formula():
    torch.manual_seed(14)
    fc = torch.nn.Linear(128, 64)
    x = torch.randn(2, 10, 32)  # (B, T, C=32)
    s = torch.randn(2, 128)
    # reference models.py:380-392 on (B, T, C) input
    h = fc(s).view(2, 64, 1)
    gamma, beta = torch.chunk(h, 2, dim=1)
    gamma, beta = gamma.transpose(1, -1), beta.transpose(1, -1)
    ref = torch.nn.functional.layer_norm(x, (32,), eps=1e-5)
    ref = (1 + gamma) * ref + beta
    p = {"fc": {"weight": t2j(fc.weight), "bias": t2j(fc.bias)}}
    ours = L.ada_layer_norm_apply(p, t2j(x), t2j(s))
    assert_close(ours, ref, atol=1e-4)
