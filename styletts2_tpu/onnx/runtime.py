"""Minimal numpy evaluator for the ONNX op subset the exporter emits.

Two jobs:
1. Tests prove the exported graph computes the same audio as the JAX
   engine WITHOUT onnxruntime in the environment (none is installed here).
2. A no-dependency CPU fallback runtime (`OnnxModel.run`).

Op semantics follow the ONNX operator spec (opset 19) for exactly the
attributes the exporter uses; unsupported attribute combinations raise.
Convs run as im2col matmuls (BLAS), LSTM as a python scan — fast enough
for the second-scale test graphs, not a production path.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from styletts2_tpu.onnx import proto as P


class OnnxModel:
    """Parse ModelProto bytes and evaluate with numpy."""

    def __init__(self, data: bytes):
        m = P.decode(data, "Model")
        self.ir_version = m["ir_version"][0]
        g = m["graph"][0]
        self.graph_name = g.get("name", [""])[0]
        self.nodes = g.get("node", [])
        self.initializers = {
            t["name"][0]: P.tensor_to_numpy(t) for t in g.get("initializer", [])
        }
        self.input_names = [vi["name"][0] for vi in g.get("input", [])]
        self.output_names = [vi["name"][0] for vi in g.get("output", [])]

    def run(self, feeds: Dict[str, np.ndarray]) -> List[np.ndarray]:
        env: Dict[str, np.ndarray] = dict(self.initializers)
        env[""] = None  # optional (empty) input slots
        env.update(feeds)
        for nd in self.nodes:
            op = nd["op_type"][0]
            ins = [env[i] for i in nd.get("input", [])]
            attrs = {a["name"][0]: P.attr_value(a)
                     for a in nd.get("attribute", [])}
            fn = _OPS.get(op)
            if fn is None:
                raise NotImplementedError(f"op {op}")
            outs = fn(ins, attrs)
            if not isinstance(outs, (list, tuple)):
                outs = [outs]
            for name, val in zip(nd["output"], outs):
                env[name] = val
        return [env[n] for n in self.output_names]


# --------------------------------------------------------------------------
# op implementations
# --------------------------------------------------------------------------

_OPS: Dict[str, Any] = {}


def op(name):
    def deco(fn):
        _OPS[name] = fn
        return fn
    return deco


@op("Identity")
def _identity(ins, a):
    return ins[0]


@op("Add")
def _add(ins, a):
    return ins[0] + ins[1]


@op("Sub")
def _sub(ins, a):
    return ins[0] - ins[1]


@op("Mul")
def _mul(ins, a):
    return ins[0] * ins[1]


@op("Div")
def _div(ins, a):
    x, y = ins
    if np.issubdtype(x.dtype, np.integer) and np.issubdtype(y.dtype,
                                                            np.integer):
        return x // y
    # ONNX Div is IEEE: 0/0 -> nan, x/0 -> inf (e.g. the iSTFT
    # window-envelope division over zero-padding, cropped downstream) —
    # intended, so don't let numpy warn about it
    with np.errstate(divide="ignore", invalid="ignore"):
        return x / y


@op("Min")
def _min(ins, a):
    out = ins[0]
    for x in ins[1:]:
        out = np.minimum(out, x)
    return out


@op("Max")
def _max(ins, a):
    out = ins[0]
    for x in ins[1:]:
        out = np.maximum(out, x)
    return out


@op("Abs")
def _abs(ins, a):
    return np.abs(ins[0])


@op("Sign")
def _sign(ins, a):
    return np.sign(ins[0])


@op("Sqrt")
def _sqrt(ins, a):
    return np.sqrt(ins[0])


@op("Sin")
def _sin(ins, a):
    return np.sin(ins[0])


@op("Cos")
def _cos(ins, a):
    return np.cos(ins[0])


@op("Exp")
def _exp(ins, a):
    return np.exp(ins[0])


@op("Atan")
def _atan(ins, a):
    return np.arctan(ins[0])


@op("Pad")
def _pad(ins, a):
    x, pads = ins[0], ins[1]
    mode = a.get("mode", "constant")
    n = x.ndim
    widths = [(int(pads[i]), int(pads[i + n])) for i in range(n)]
    np_mode = {"constant": "constant", "edge": "edge",
               "reflect": "reflect"}[mode]
    return np.pad(x, widths, mode=np_mode)


@op("Tanh")
def _tanh(ins, a):
    return np.tanh(ins[0])


@op("Erf")
def _erf(ins, a):
    from scipy.special import erf  # scipy is a core dependency

    x = ins[0]
    return erf(x).astype(x.dtype)


@op("Sigmoid")
def _sigmoid(ins, a):
    x = ins[0]
    return (1.0 / (1.0 + np.exp(-x.astype(np.float64)))).astype(x.dtype)


@op("LeakyRelu")
def _leaky(ins, a):
    x = ins[0]
    alpha = a.get("alpha", 0.01)
    return np.where(x >= 0, x, alpha * x).astype(x.dtype)


@op("Round")
def _round(ins, a):
    return np.round(ins[0])  # banker's rounding == ONNX spec


@op("Floor")
def _floor(ins, a):
    return np.floor(ins[0])


@op("Clip")
def _clip(ins, a):
    x = ins[0]
    lo = ins[1] if len(ins) > 1 and ins[1] is not None else None
    hi = ins[2] if len(ins) > 2 and ins[2] is not None else None
    return np.clip(x, lo, hi)


@op("Neg")
def _neg(ins, a):
    return -ins[0]


@op("Greater")
def _greater(ins, a):
    return ins[0] > ins[1]


@op("GreaterOrEqual")
def _ge(ins, a):
    return ins[0] >= ins[1]


@op("Less")
def _less(ins, a):
    return ins[0] < ins[1]


@op("LessOrEqual")
def _le(ins, a):
    return ins[0] <= ins[1]


@op("And")
def _and(ins, a):
    return np.logical_and(ins[0], ins[1])


@op("Where")
def _where(ins, a):
    return np.where(ins[0], ins[1], ins[2])


@op("Cast")
def _cast(ins, a):
    return ins[0].astype(P.ONNX_TO_NP[a["to"]])


@op("Shape")
def _shape(ins, a):
    return np.asarray(ins[0].shape, np.int64)


@op("Reshape")
def _reshape(ins, a):
    shape = [int(s) for s in ins[1]]
    return ins[0].reshape(shape)


@op("Transpose")
def _transpose(ins, a):
    return np.transpose(ins[0], a["perm"])


@op("Unsqueeze")
def _unsqueeze(ins, a):
    x = ins[0]
    for ax in sorted(int(v) for v in ins[1]):
        x = np.expand_dims(x, ax)
    return x


@op("Squeeze")
def _squeeze(ins, a):
    return np.squeeze(ins[0], tuple(int(v) for v in ins[1]))


@op("Concat")
def _concat(ins, a):
    return np.concatenate(ins, axis=a["axis"])


@op("Slice")
def _slice(ins, a):
    x, starts, ends, axes = ins[0], ins[1], ins[2], ins[3]
    steps = ins[4] if len(ins) > 4 else np.ones_like(starts)
    sl = [slice(None)] * x.ndim
    for s, e, ax, st in zip(starts, ends, axes, steps):
        sl[int(ax)] = slice(int(s), None if int(e) >= 2**62 else int(e),
                            int(st))
    return x[tuple(sl)]


@op("Gather")
def _gather(ins, a):
    return np.take(ins[0], ins[1], axis=a.get("axis", 0))


@op("Expand")
def _expand(ins, a):
    return np.broadcast_to(ins[0], np.broadcast_shapes(
        ins[0].shape, tuple(int(v) for v in ins[1]))).copy()


@op("Range")
def _range(ins, a):
    start, limit, delta = (np.asarray(v).reshape(()).item() for v in ins)
    return np.arange(start, limit, delta,
                     dtype=np.asarray(ins[0]).dtype)


@op("CumSum")
def _cumsum(ins, a):
    assert not a.get("exclusive", 0) and not a.get("reverse", 0)
    return np.cumsum(ins[0], axis=int(np.asarray(ins[1]).item()),
                     dtype=ins[0].dtype)


@op("ReduceSum")
def _reduce_sum(ins, a):
    axes = tuple(int(v) for v in ins[1]) if len(ins) > 1 else None
    return np.sum(ins[0], axis=axes, keepdims=bool(a.get("keepdims", 1)))


@op("ReduceMean")
def _reduce_mean(ins, a):
    axes = tuple(int(v) for v in ins[1]) if len(ins) > 1 else None
    return np.mean(ins[0], axis=axes, keepdims=bool(a.get("keepdims", 1)))


@op("MatMul")
def _matmul(ins, a):
    x = ins[0].astype(np.float32)
    y = ins[1].astype(np.float32)
    return np.matmul(x, y)


@op("Gemm")
def _gemm(ins, a):
    x, w = ins[0].astype(np.float32), ins[1].astype(np.float32)
    if a.get("transA", 0):
        x = x.T
    if a.get("transB", 0):
        w = w.T
    y = a.get("alpha", 1.0) * (x @ w)
    if len(ins) > 2:
        y = y + a.get("beta", 1.0) * ins[2]
    return y.astype(np.float32)


@op("LayerNormalization")
def _layernorm(ins, a):
    x = ins[0].astype(np.float32)
    axis = a.get("axis", -1)
    assert axis in (-1, x.ndim - 1), "exporter only emits last-axis LN"
    eps = a.get("epsilon", 1e-5)
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    y = y * ins[1]
    if len(ins) > 2 and ins[2] is not None:
        y = y + ins[2]
    return y.astype(ins[0].dtype)


@op("InstanceNormalization")
def _instancenorm(ins, a):
    x = ins[0].astype(np.float32)  # (B, C, *spatial)
    eps = a.get("epsilon", 1e-5)
    sp = tuple(range(2, x.ndim))
    mean = x.mean(axis=sp, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=sp, keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (y * ins[1].reshape(shape) + ins[2].reshape(shape)).astype(
        ins[0].dtype)


@op("Conv")
def _conv(ins, a):
    x, w = ins[0].astype(np.float32), ins[1].astype(np.float32)
    b = ins[2].astype(np.float32) if len(ins) > 2 else None
    assert x.ndim == 3, "exporter emits 1-D convs (2-D ops are pre-folded)"
    group = a.get("group", 1)
    (stride,) = a.get("strides", [1])
    (dil,) = a.get("dilations", [1])
    pads = a.get("pads", [0, 0])
    bsz, cin, t = x.shape
    cout, cin_g, k = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pads[0], pads[1])))
    eff_k = (k - 1) * dil + 1
    t_out = (xp.shape[2] - eff_k) // stride + 1
    # im2col: windows (B, C, t_out, k)
    idx = (np.arange(t_out)[:, None] * stride
           + np.arange(k)[None, :] * dil)  # (t_out, k)
    cols = xp[:, :, idx]  # (B, C, t_out, k)
    out = np.empty((bsz, cout, t_out), np.float32)
    cpg_out = cout // group
    for g in range(group):
        xg = cols[:, g * cin_g:(g + 1) * cin_g]  # (B, cin_g, t_out, k)
        wg = w[g * cpg_out:(g + 1) * cpg_out]  # (cpg_out, cin_g, k)
        out[:, g * cpg_out:(g + 1) * cpg_out] = np.einsum(
            "bctk,ock->bot", xg, wg, optimize=True)
    if b is not None:
        out += b[None, :, None]
    return out


@op("ConvTranspose")
def _conv_transpose(ins, a):
    x, w = ins[0].astype(np.float32), ins[1].astype(np.float32)
    b = ins[2].astype(np.float32) if len(ins) > 2 else None
    assert x.ndim == 3
    group = a.get("group", 1)
    (stride,) = a.get("strides", [1])
    pads = a.get("pads", [0, 0])
    (outpad,) = a.get("output_padding", [0])
    bsz, cin, t = x.shape
    cin_w, cout_g, k = w.shape
    cpg_in = cin // group
    cout = group * cout_g
    # frames[b, t, o, :] = sum_i x[b, i, t] * w[i, o, :], overlap-added at
    # `stride` — same math as zero-stuff+correlate, WITHOUT materializing a
    # (t_out, k) im2col (the vocos iSTFT's 1200-tap stride-300 kernel made
    # that ~100 GB; this is one BLAS matmul + a k/stride-chunk OLA)
    frames = np.empty((bsz, t, cout, k), np.float32)
    for g in range(group):
        xg = x[:, g * cpg_in:(g + 1) * cpg_in]   # (B, cin_g, T)
        wg = w[g * cpg_in:(g + 1) * cpg_in]      # (cin_g, cout_g, k)
        frames[:, :, g * cout_g:(g + 1) * cout_g] = np.einsum(
            "bct,cok->btok", xg, wg, optimize=True)
    full_len = (t - 1) * stride + k
    if k % stride == 0:
        q = k // stride
        chunks = frames.transpose(0, 2, 1, 3).reshape(bsz, cout, t, q,
                                                      stride)
        buf = np.zeros((bsz, cout, t + q - 1, stride), np.float32)
        for c in range(q):
            buf[:, :, c:c + t] += chunks[:, :, :, c]
        full = buf.reshape(bsz, cout, full_len)
    else:
        full = np.zeros((bsz, cout, full_len), np.float32)
        idx = np.arange(t)[:, None] * stride + np.arange(k)[None, :]
        np.add.at(full, (slice(None), slice(None), idx),
                  frames.transpose(0, 2, 1, 3))
    # output_padding extends the output INTO the overlap-add tail that
    # pads[1] would have cropped (zeros only past the last real sample)
    end = full_len - pads[1] + outpad
    out = full[:, :, pads[0]: min(end, full_len)]
    if end > full_len:
        out = np.pad(out, ((0, 0), (0, 0), (0, end - full_len)))
    if b is not None:
        out = out + b[None, :, None]
    return out


@op("Resize")
def _resize(ins, a):
    x = ins[0]  # (B, C, T)
    assert x.ndim == 3
    scales = ins[2] if len(ins) > 2 and ins[2] is not None and len(ins[2]) \
        else None
    if scales is not None:
        t_out = int(np.floor(x.shape[2] * float(scales[2])))
    else:
        t_out = int(ins[3][2])
    mode = a.get("mode", "nearest")
    ct = a.get("coordinate_transformation_mode", "half_pixel")
    t_in = x.shape[2]
    if mode == "nearest":
        assert ct == "asymmetric" and a.get("nearest_mode",
                                            "round_prefer_floor") == "floor"
        src = np.floor(np.arange(t_out) * (t_in / t_out)).astype(np.int64)
        return x[:, :, np.clip(src, 0, t_in - 1)]
    assert mode == "linear" and ct == "pytorch_half_pixel"
    scale = t_in / t_out
    coords = (np.arange(t_out) + 0.5) * scale - 0.5 if t_out > 1 else \
        np.zeros(1)
    lo = np.floor(coords).astype(np.int64)
    frac = (coords - lo).astype(np.float32)
    lo_c = np.clip(lo, 0, t_in - 1)
    hi_c = np.clip(lo + 1, 0, t_in - 1)
    return (x[:, :, lo_c] * (1 - frac) + x[:, :, hi_c] * frac).astype(x.dtype)


@op("LSTM")
def _lstm(ins, a):
    # X (T, B, In), W (D, 4H, In), R (D, 4H, H), B (D, 8H); gate order iofc
    x, w, r = ins[0].astype(np.float32), ins[1], ins[2]
    bias = ins[3] if len(ins) > 3 and ins[3] is not None else \
        np.zeros((w.shape[0], 8 * r.shape[2]), np.float32)
    hidden = a["hidden_size"]
    direction = a.get("direction", "forward")
    dirs = 2 if direction == "bidirectional" else 1
    t, bsz, _ = x.shape
    y = np.zeros((t, dirs, bsz, hidden), np.float32)

    def run_dir(d, seq):
        wb = bias[d, :4 * hidden] + bias[d, 4 * hidden:]
        h = np.zeros((bsz, hidden), np.float32)
        c = np.zeros((bsz, hidden), np.float32)
        outs = []
        for xt in seq:
            g = xt @ w[d].T + h @ r[d].T + wb
            i = 1.0 / (1.0 + np.exp(-g[:, :hidden]))
            o = 1.0 / (1.0 + np.exp(-g[:, hidden:2 * hidden]))
            f = 1.0 / (1.0 + np.exp(-g[:, 2 * hidden:3 * hidden]))
            cand = np.tanh(g[:, 3 * hidden:])
            c = f * c + i * cand
            h = o * np.tanh(c)
            outs.append(h)
        return outs

    y[:, 0] = run_dir(0, x)
    if dirs == 2:
        y[:, 1] = run_dir(1, x[::-1])[::-1]
    return [y]
