"""ONNX interchange: proto round-trip, graph structure, numeric parity.

The parity test runs the exported graph through the in-repo numpy
evaluator (styletts2_tpu.onnx.runtime — onnxruntime is not installed in
this environment) and compares the waveform against the same forward
composed from the JAX modules. Reference surface: ONNX/export_onnx.py +
ONNX/inference_onnx.py:225-261 (single graph, dynamic token count).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.config import load_config
from styletts2_tpu.models import build_model
from styletts2_tpu.onnx import export_onnx
from styletts2_tpu.onnx import proto as P
from styletts2_tpu.onnx.builder import GraphBuilder
from styletts2_tpu.onnx.runtime import OnnxModel

SMALL_CFG = {
    "model_params": {
        "hidden_dim": 64, "style_dim": 32, "n_layer": 2, "max_dur": 10,
        "dim_in": 16, "max_conv_dim": 64,
        # upsample_initial_channel must equal the decoder shell's fixed
        # 512-channel output (nn/decoder.py decode.3)
        "decoder": {"type": "hifigan",
                    "upsample_rates": [10, 6],
                    "upsample_kernel_sizes": [20, 12],
                    "upsample_initial_channel": 512,
                    "resblock_kernel_sizes": [3, 7],
                    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]]},
    },
}


@pytest.fixture(scope="module")
def small_model():
    cfg = load_config(SMALL_CFG)
    params = build_model(jax.random.PRNGKey(3), cfg.model_params)
    params = {k: jax.tree.map(np.asarray, params[k])
              for k in ("text_encoder", "predictor", "decoder")}
    return params, cfg


# --------------------------------------------------------------------------
# proto layer
# --------------------------------------------------------------------------


def test_proto_round_trip():
    b = GraphBuilder("t")
    b.add_input("x", P.FLOAT, [1, "T"])
    w = b.init("w", np.arange(6, dtype=np.float32).reshape(2, 3))
    y = b.add("MatMul", ["x", w])
    b.add("Identity", [y], outputs=["y"])
    b.add_output("y", P.FLOAT, [1, "T2"])
    data = b.build(opset=19)

    m = P.decode(data, "Model")
    assert m["ir_version"] == [9]
    assert m["opset_import"][0]["version"] == [19]
    g = m["graph"][0]
    assert [n["op_type"][0] for n in g["node"]] == ["MatMul", "Identity"]
    t = P.tensor_to_numpy(g["initializer"][0])
    np.testing.assert_array_equal(t, np.arange(6, np.float32).reshape(2, 3)
                                  if False else
                                  np.arange(6, dtype=np.float32).reshape(2, 3))
    vi = g["input"][0]
    assert vi["name"] == ["x"]
    dims = vi["type"][0]["tensor_type"][0]["shape"][0]["dim"]
    assert dims[0]["dim_value"] == [1]
    assert dims[1]["dim_param"] == ["T"]


def test_attribute_kinds_round_trip():
    for value in (3, 2.5, "linear", [1, 2, 3], [0.5, 1.5], ["a", "b"]):
        enc = P.attribute("k", value)
        dec = P.decode(enc, "Attribute")
        got = P.attr_value(dec)
        if isinstance(value, float):
            assert got == pytest.approx(value)
        elif isinstance(value, list) and isinstance(value[0], float):
            assert got == pytest.approx(value)
        else:
            assert got == value


# --------------------------------------------------------------------------
# runtime ops vs the JAX layers they must reproduce
# --------------------------------------------------------------------------


def _run_single(op_type, inputs, n_outputs=1, **attrs):
    b = GraphBuilder("op")
    names = []
    for i, arr in enumerate(inputs):
        n = f"in{i}"
        b.add_input(n, P.NP_TO_ONNX[np.asarray(arr).dtype],
                    list(np.asarray(arr).shape))
        names.append(n)
    out = b.add(op_type, names, n_outputs=n_outputs, **attrs)
    first = out if isinstance(out, str) else out[0]
    b.add_output(first, P.FLOAT, [])
    model = OnnxModel(b.build())
    return model.run({f"in{i}": np.asarray(a) for i, a in enumerate(inputs)})[0]


def test_runtime_conv_matches_jax():
    from styletts2_tpu.nn import layers as L

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 50)).astype(np.float32)  # NCW
    w = rng.standard_normal((16, 8, 5)).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    got = _run_single("Conv", [x, w, bias], strides=[1], pads=[4, 4],
                      dilations=[2], group=1)
    want = L.conv1d_apply({"weight": w, "bias": bias},
                          jnp.asarray(x.transpose(0, 2, 1)), padding=4,
                          dilation=2)
    np.testing.assert_allclose(got, np.asarray(want).transpose(0, 2, 1),
                               atol=1e-4, rtol=1e-4)


def test_runtime_conv_transpose_matches_jax():
    from styletts2_tpu.nn import layers as L

    rng = np.random.default_rng(1)
    c = 6
    x = rng.standard_normal((1, c, 30)).astype(np.float32)
    w = rng.standard_normal((c, 1, 3)).astype(np.float32)  # depthwise
    bias = rng.standard_normal(c).astype(np.float32)
    got = _run_single("ConvTranspose", [x, w, bias], strides=[2],
                      pads=[1, 1], output_padding=[1], group=c)
    want = L.conv_transpose1d_apply({"weight": w, "bias": bias},
                                    jnp.asarray(x.transpose(0, 2, 1)),
                                    stride=2, padding=1, output_padding=1,
                                    groups=c)
    np.testing.assert_allclose(got, np.asarray(want).transpose(0, 2, 1),
                               atol=1e-4, rtol=1e-4)


def test_runtime_lstm_matches_jax():
    from styletts2_tpu.nn import layers as L
    from styletts2_tpu.onnx.export import _Exporter

    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(0)
    in_dim, hidden, t = 12, 8, 9
    p = L.lstm_init(key, in_dim, hidden, bidirectional=True)
    p = jax.tree.map(np.asarray, p)
    x = rng.standard_normal((1, t, in_dim)).astype(np.float32)

    cfg = load_config(SMALL_CFG)
    ex = _Exporter({}, cfg)
    ex.b.add_input("x", P.FLOAT, [1, in_dim, t])
    out = ex.lstm("x", p, "l")
    ex.b.add_output(out, P.FLOAT, [1, 2 * hidden, t])
    model = OnnxModel(ex.b.build())
    got = model.run({"x": x.transpose(0, 2, 1)})[0]

    want = L.lstm_apply(p, jnp.asarray(x))  # (1, T, 2H)
    np.testing.assert_allclose(got, np.asarray(want).transpose(0, 2, 1),
                               atol=1e-4, rtol=1e-3)


def test_runtime_resize_matches_jax_interpolate():
    from styletts2_tpu.ops import stft as OPS

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 40)).astype(np.float32)
    got = _run_single("Resize",
                      [x, np.zeros(0, np.float32),
                       np.zeros(0, np.float32),
                       np.asarray([1, 3, 13], np.int64)],
                      mode="linear",
                      coordinate_transformation_mode="pytorch_half_pixel")
    want = OPS.interpolate_linear(jnp.asarray(x), 13)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)

    got = _run_single("Resize",
                      [x, np.zeros(0, np.float32),
                       np.asarray([1.0, 1.0, 4.0], np.float32)],
                      mode="nearest",
                      coordinate_transformation_mode="asymmetric",
                      nearest_mode="floor")
    want = OPS.interpolate_nearest(jnp.asarray(x), 4)
    np.testing.assert_allclose(got, np.asarray(want), atol=0, rtol=0)


# --------------------------------------------------------------------------
# full graph
# --------------------------------------------------------------------------


def test_export_structure(small_model):
    params, cfg = small_model
    data = export_onnx(params, cfg)
    m = OnnxModel(data)
    assert m.input_names == ["tokens", "style", "speed"]
    assert m.output_names == ["output_wav"]
    # every node input resolves (initializer, graph input, or prior output)
    known = set(m.initializers) | set(m.input_names) | {""}
    for nd in m.nodes:
        for i in nd.get("input", []):
            assert i in known, f"dangling input {i}"
        known.update(nd["output"])


def _jax_forward(params, cfg, tokens, style, speed):
    """The same pipeline composed from the JAX modules (mask-free, exact
    length) — what the ONNX graph must reproduce."""
    from styletts2_tpu.nn import decoder as DEC
    from styletts2_tpu.nn import predictor as PR
    from styletts2_tpu.nn import text_encoder as TE

    t = len(tokens)
    tok = jnp.asarray(tokens, jnp.int32)[None]
    mask = jnp.ones((1, t), bool)
    s = jnp.asarray(style, jnp.float32)

    t_en = TE.apply(params["text_encoder"], tok, mask)  # (1, T, C)
    d = PR.encode_duration(params["predictor"], t_en, s, mask)
    logits = PR.duration_head(params["predictor"], d, mask)
    dur = np.asarray(jax.nn.sigmoid(logits).sum(-1))[0]  # (T,)

    mid = dur[1:-2]
    mean, std = mid.mean(), mid.std(ddof=1)  # torch .std() is unbiased
    z = (mid - mean) / std
    repl = mean + np.sign(mid - mean) * (3.0 * std * 0.95)
    mid = np.where(np.abs(z) > 3.0, repl, mid)
    dur = np.concatenate([dur[:1], mid, dur[-2:]])
    pred_dur = np.clip(np.round(dur / speed), 1, None).astype(np.int64)

    frames = int(pred_dur.sum())
    align = np.zeros((t, frames), np.float32)
    c = 0
    for i, di in enumerate(pred_dur):
        align[i, c:c + di] = 1.0
        c += di
    align_t = jnp.asarray(align.T)[None]  # (1, L, T)

    en = jnp.matmul(align_t, d)
    f0, n = PR.f0n_train(params["predictor"], en, s)
    asr = jnp.matmul(align_t, t_en)
    wav = DEC.decoder_apply(params["decoder"], cfg.model_params.decoder,
                            asr, f0, n, s, rng=None, train=False)
    return np.asarray(wav)[0, :, 0][4000:-4000], pred_dur


def test_onnx_matches_jax_forward(small_model):
    params, cfg = small_model
    rng = np.random.default_rng(7)
    tokens = rng.integers(1, 40, 16).astype(np.int64)
    style = rng.standard_normal((1, 32)).astype(np.float32)
    speed = np.float32(1.0)

    want, pred_dur = _jax_forward(params, cfg, tokens, style, float(speed))
    assert len(want) > 500  # trim left something to compare

    data = export_onnx(params, cfg)
    model = OnnxModel(data)
    got = model.run({"tokens": tokens, "style": style, "speed": speed})[0]

    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=5e-3)


def test_onnx_matches_jax_forward_istftnet():
    """Same e2e parity for the istftnet decoder (STFT-domain source +
    matmul-DFT iSTFT head as strided Conv/ConvTranspose)."""
    cfg_dict = {k: dict(v) if isinstance(v, dict) else v
                for k, v in SMALL_CFG["model_params"].items()}
    cfg_dict["decoder"] = {"type": "istftnet"}  # reference istftnet defaults
    cfg = load_config({"model_params": cfg_dict})
    params = build_model(jax.random.PRNGKey(4), cfg.model_params)
    params = {k: jax.tree.map(np.asarray, params[k])
              for k in ("text_encoder", "predictor", "decoder")}

    rng = np.random.default_rng(9)
    tokens = rng.integers(1, 40, 16).astype(np.int64)
    style = rng.standard_normal((1, 32)).astype(np.float32)

    want, _ = _jax_forward(params, cfg, tokens, style, 1.0)
    data = export_onnx(params, cfg)
    got = OnnxModel(data).run({"tokens": tokens, "style": style,
                               "speed": np.float32(1.0)})[0]
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=5e-3)


def test_onnx_matches_jax_forward_vocos():
    """Same e2e parity for the vocos decoder (ConvNeXt stack + iSTFT head
    with window-envelope division) — beyond the reference, whose ONNX
    stack exports only hifigan/istftnet (inference_onnx.py:130)."""
    cfg_dict = {k: dict(v) if isinstance(v, dict) else v
                for k, v in SMALL_CFG["model_params"].items()}
    cfg_dict["decoder"] = {"type": "vocos", "num_layers": 3}
    cfg = load_config({"model_params": cfg_dict})
    params = build_model(jax.random.PRNGKey(5), cfg.model_params)
    params = {k: jax.tree.map(np.asarray, params[k])
              for k in ("text_encoder", "predictor", "decoder")}

    rng = np.random.default_rng(11)
    tokens = rng.integers(1, 40, 16).astype(np.int64)
    style = rng.standard_normal((1, 32)).astype(np.float32)

    want, _ = _jax_forward(params, cfg, tokens, style, 1.0)
    data = export_onnx(params, cfg)
    got = OnnxModel(data).run({"tokens": tokens, "style": style,
                               "speed": np.float32(1.0)})[0]
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=5e-3)


def test_onnx_speed_scales_duration(small_model):
    params, cfg = small_model
    rng = np.random.default_rng(8)
    tokens = rng.integers(1, 40, 16).astype(np.int64)
    style = rng.standard_normal((1, 32)).astype(np.float32)
    data = export_onnx(params, cfg)
    model = OnnxModel(data)
    slow = model.run({"tokens": tokens, "style": style,
                      "speed": np.float32(0.5)})[0]
    fast = model.run({"tokens": tokens, "style": style,
                      "speed": np.float32(1.5)})[0]
    assert len(slow) > len(fast)
