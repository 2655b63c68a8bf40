"""WavLM backbone (microsoft/wavlm-base-plus architecture) — the SLM
embedder for the adversarial stage.

Parity target: the reference's `WavLMLoss` downloads the torch model from
the hub (`/root/reference/losses.py:193-252`, `AutoModel.from_pretrained`)
and consumes `output_hidden_states=True` — a list of 13 (B, L, 768) tensors
for wavlm-base-plus. This is a from-scratch functional JAX forward of the
same architecture, loadable from a local HF state_dict via
`convert_torch_state_dict` (no-egress environment: weights come from disk).

Architecture (HF `WavLMModel`, base / non-stable-layer-norm variant):
* feature extractor: 7 conv1d layers (512 ch, strides 5,2,2,2,2,2,2,
  kernels 10,3,3,3,3,2,2, no bias), GELU; GroupNorm(512, 512) after the
  first conv only ("group" feat_extract_norm);
* feature projection: LayerNorm(512) -> Linear(512->768);
* encoder: gated-relative-position-bias transformer, post-norm:
  - positional conv embedding (k=128, groups=16, weight-normed) + GELU,
    added to the input, then LayerNorm;
  - layer 0 computes a T5-style bucketed relative position bias
    (320 buckets, max distance 800) shared by all layers;
  - every layer gates that bias with a per-position scalar computed from
    its own hidden states (the WavLM "gru_rel_pos" gate);
  - self-attention (12 heads) with the gated bias added to the logits,
    residual -> LayerNorm -> FFN(3072, GELU) -> residual -> LayerNorm.

Returns the [input-to-layer-0, ..., final] hidden-state list, matching
`output_hidden_states=True` (13 tensors for 12 layers). Everything is
differentiable: the reference's SLM generator loss backpropagates THROUGH
the frozen WavLM into the synthesized waveform (losses.py:207-212).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu.nn import layers as L


@dataclass
class WavLMConfig:
    """wavlm-base-plus defaults."""
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5


def feature_lengths(cfg: WavLMConfig, n_samples: int) -> int:
    """Output frame count of the conv feature extractor."""
    n = n_samples
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        n = (n - k) // s + 1
    return n


# ---------------------------------------------------------------------------
# init (HF-layout param tree; random weights for tests)
# ---------------------------------------------------------------------------


def init(key, cfg: WavLMConfig = WavLMConfig()) -> Dict[str, Any]:
    keys = jax.random.split(key, 8 + 8 * cfg.num_hidden_layers)
    ki = iter(range(len(keys)))
    h = cfg.hidden_size
    p: Dict[str, Any] = {"feature_extractor": {"conv_layers": {}}}
    c_in = 1
    for i, (c, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel,
                                      cfg.conv_stride)):
        layer = {"conv": {"weight": L._normal(
            keys[next(ki)], (c, c_in, k), std=1.0 / math.sqrt(c_in * k))}}
        if i == 0:
            layer["layer_norm"] = {"weight": np.ones((c,), np.float32),
                                   "bias": np.zeros((c,), np.float32)}
        p["feature_extractor"]["conv_layers"][str(i)] = layer
        c_in = c
    p["feature_projection"] = {
        "layer_norm": {"weight": np.ones((c_in,), np.float32),
                       "bias": np.zeros((c_in,), np.float32)},
        "projection": L.torch_linear_init(keys[next(ki)], c_in, h),
    }
    pos_w = L._normal(keys[next(ki)],
                      (h, h // cfg.num_conv_pos_embedding_groups,
                       cfg.num_conv_pos_embeddings),
                      std=math.sqrt(4.0 / (cfg.num_conv_pos_embeddings * h)))
    enc: Dict[str, Any] = {
        # HF weight-norms this conv with dim=2; the backbone is frozen, so
        # the merged plain weight is stored (merging happens in the converter)
        "pos_conv_embed": {"conv": {
            "weight": pos_w,
            "bias": np.zeros((h,), np.float32)}},
        "layer_norm": {"weight": np.ones((h,), np.float32),
                       "bias": np.zeros((h,), np.float32)},
        "layers": {},
    }
    head_dim = h // cfg.num_attention_heads
    for i in range(cfg.num_hidden_layers):
        attn = {
            "q_proj": L.torch_linear_init(keys[next(ki)], h, h),
            "k_proj": L.torch_linear_init(keys[next(ki)], h, h),
            "v_proj": L.torch_linear_init(keys[next(ki)], h, h),
            "out_proj": L.torch_linear_init(keys[next(ki)], h, h),
            "gru_rel_pos_linear": L.torch_linear_init(keys[next(ki)],
                                                      head_dim, 8),
            "gru_rel_pos_const": np.ones(
                (1, cfg.num_attention_heads, 1, 1), np.float32),
        }
        if i == 0:
            attn["rel_attn_embed"] = {"weight": L._normal(
                keys[next(ki)], (cfg.num_buckets, cfg.num_attention_heads),
                std=0.02)}
        enc["layers"][str(i)] = {
            "attention": attn,
            "layer_norm": {"weight": np.ones((h,), np.float32),
                           "bias": np.zeros((h,), np.float32)},
            "feed_forward": {
                "intermediate_dense": L.torch_linear_init(
                    keys[next(ki)], h, cfg.intermediate_size),
                "output_dense": L.torch_linear_init(
                    keys[next(ki)], cfg.intermediate_size, h),
            },
            "final_layer_norm": {"weight": np.ones((h,), np.float32),
                                 "bias": np.zeros((h,), np.float32)},
        }
    p["encoder"] = enc
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _relative_positions_bucket(rel_pos: jnp.ndarray, num_buckets: int,
                               max_distance: int) -> jnp.ndarray:
    """T5-style log-bucketed relative positions (HF
    WavLMAttention._relative_positions_bucket)."""
    nb = num_buckets // 2
    buckets = (rel_pos > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel_pos)
    max_exact = nb // 2
    is_small = rel < max_exact
    rel_f = jnp.maximum(rel.astype(jnp.float32), 1.0)
    large = jnp.log(rel_f / max_exact) / math.log(max_distance / max_exact)
    large = (max_exact + large * (nb - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return buckets + jnp.where(is_small, rel, large)


def compute_position_bias(p_attn, t: int, num_buckets: int,
                          max_distance: int) -> jnp.ndarray:
    """(H, T, T) relative position bias from layer-0's bucket embedding."""
    ctx = jnp.arange(t)[:, None]
    mem = jnp.arange(t)[None, :]
    buckets = _relative_positions_bucket(mem - ctx, num_buckets, max_distance)
    # params may still be host numpy before the first device_put; jnp.take
    # handles traced indices either way
    values = jnp.take(jnp.asarray(p_attn["rel_attn_embed"]["weight"]),
                      buckets, axis=0)  # (T, T, H)
    return jnp.transpose(values, (2, 0, 1))


def _attention(p, x: jnp.ndarray, position_bias: jnp.ndarray,
               n_heads: int, pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """WavLM gated-relative-position self-attention.

    x: (B, T, H); position_bias: (H_heads, T, T); pad_mask: (B, T) True=valid.
    """
    b, t, h = x.shape
    head_dim = h // n_heads

    # gate from the layer's own hidden states (HF WavLMAttention.forward)
    gated = x.reshape(b, t, n_heads, head_dim)
    gated = jnp.swapaxes(gated, 1, 2)  # (B, heads, T, hd)
    proj = L.linear_apply(p["gru_rel_pos_linear"], gated)  # (B, heads, T, 8)
    proj = proj.reshape(b, n_heads, t, 2, 4).sum(-1)
    gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)
    const = jnp.asarray(p["gru_rel_pos_const"])  # (1, heads, 1, 1)
    gate = gate_a * (gate_b * const - 1.0) + 2.0  # (B, heads, T, 1)
    # gated bias: per-(batch, head, query-position) scalar times the shared
    # (heads, T, T) bias table; the gate broadcasts over the key axis
    bias = gate * position_bias[None]  # (B, heads, T, T)

    q = L.linear_apply(p["q_proj"], x).reshape(b, t, n_heads, head_dim)
    k = L.linear_apply(p["k_proj"], x).reshape(b, t, n_heads, head_dim)
    v = L.linear_apply(p["v_proj"], x).reshape(b, t, n_heads, head_dim)
    q = jnp.swapaxes(q, 1, 2) * (head_dim ** -0.5)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        precision=L._prec(q)) + bias
    if pad_mask is not None:
        logits = jnp.where(pad_mask[:, None, None, :], logits, -1e9)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v, precision=L._prec(v))
    out = jnp.swapaxes(out, 1, 2).reshape(b, t, h)
    return L.linear_apply(p["out_proj"], out)


def apply(p, wav: jnp.ndarray, cfg: WavLMConfig = WavLMConfig(),
          pad_mask: Optional[jnp.ndarray] = None) -> List[jnp.ndarray]:
    """wav: (B, T_samples) 16 kHz -> list of hidden states
    [(B, L, hidden)] * (num_layers + 1), HF output_hidden_states order."""
    x = wav[..., None]  # (B, T, 1) channels-last
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        layer = p["feature_extractor"]["conv_layers"][str(i)]
        x = L.conv1d_apply(layer["conv"], x, stride=s)
        if i == 0:
            # GroupNorm(512, 512) == per-channel instance norm with affine
            ln = layer["layer_norm"]
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=1, keepdims=True)
            var = ((xf - mean) ** 2).mean(axis=1, keepdims=True)
            x = ((xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
                 * ln["weight"] + ln["bias"]).astype(x.dtype)
        x = jax.nn.gelu(x, approximate=False)

    fp = p["feature_projection"]
    x = L.plain_layer_norm(x, cfg.layer_norm_eps,
                           fp["layer_norm"]["weight"],
                           fp["layer_norm"]["bias"])
    x = L.linear_apply(fp["projection"], x)

    enc = p["encoder"]
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], x, 0.0)
    # positional conv embedding (k=128, groups=16, same-pad with one trim)
    kpos = cfg.num_conv_pos_embeddings
    pos = L.conv1d_apply(enc["pos_conv_embed"]["conv"], x, padding=kpos // 2,
                         groups=cfg.num_conv_pos_embedding_groups)
    if kpos % 2 == 0:
        pos = pos[:, :-1, :]
    x = x + jax.nn.gelu(pos, approximate=False)
    x = L.plain_layer_norm(x, cfg.layer_norm_eps,
                           enc["layer_norm"]["weight"],
                           enc["layer_norm"]["bias"])

    t = x.shape[1]
    position_bias = compute_position_bias(
        enc["layers"]["0"]["attention"], t, cfg.num_buckets,
        cfg.max_bucket_distance).astype(x.dtype)

    hiddens = [x]
    for i in range(cfg.num_hidden_layers):
        layer = enc["layers"][str(i)]
        attn_out = _attention(layer["attention"], x, position_bias,
                              cfg.num_attention_heads, pad_mask)
        x = x + attn_out
        x = L.plain_layer_norm(x, cfg.layer_norm_eps,
                               layer["layer_norm"]["weight"],
                               layer["layer_norm"]["bias"])
        ff = layer["feed_forward"]
        hff = jax.nn.gelu(L.linear_apply(ff["intermediate_dense"], x),
                          approximate=False)
        x = x + L.linear_apply(ff["output_dense"], hff)
        x = L.plain_layer_norm(x, cfg.layer_norm_eps,
                               layer["final_layer_norm"]["weight"],
                               layer["final_layer_norm"]["bias"])
        hiddens.append(x)
    return hiddens


def make_embedder(params, cfg: WavLMConfig = WavLMConfig()):
    """Closure matching losses.WavLMLoss's embedder signature:
    wav_16k (B, T) -> list of hidden states."""
    def embedder(wav: jnp.ndarray) -> List[jnp.ndarray]:
        return apply(params, wav, cfg)
    return embedder


# ---------------------------------------------------------------------------
# torch state_dict conversion
# ---------------------------------------------------------------------------


def convert_torch_state_dict(sd: Dict[str, Any],
                             cfg: WavLMConfig = WavLMConfig()) -> Dict[str, Any]:
    """HF WavLMModel.state_dict() -> this module's param tree.

    Handles both the legacy weight-norm naming (conv.weight_g/weight_v) and
    the parametrized naming (conv.parametrizations.weight.original0/1) for
    the positional conv embedding."""
    def np_of(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t, dtype=np.float32)

    sd = {k: np_of(v) for k, v in sd.items()}
    p = init(jax.random.PRNGKey(0), cfg)

    def put(tree, path: List[str], value):
        node = tree
        for part in path[:-1]:
            node = node[part]
        assert path[-1] in node, f"unknown param {'.'.join(path)}"
        assert node[path[-1]].shape == value.shape, \
            (path, node[path[-1]].shape, value.shape)
        node[path[-1]] = value

    pos_g = pos_v = None
    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] == "masked_spec_embed":
            continue  # train-time spec-augment embedding; unused at eval
        if "pos_conv_embed" in key:
            if parts[-1] in ("original0", "weight_g"):
                pos_g = val
            elif parts[-1] in ("original1", "weight_v"):
                pos_v = val
            elif parts[-1] == "weight":
                put(p, ["encoder", "pos_conv_embed", "conv", "weight"], val)
            elif parts[-1] == "bias":
                put(p, ["encoder", "pos_conv_embed", "conv", "bias"], val)
            continue
        put(p, parts, val)
    if pos_g is not None:
        # torch weight_norm(dim=2): norms over dims (0, 1), g shape (1, 1, k)
        norm = np.sqrt((pos_v * pos_v).sum(axis=(0, 1), keepdims=True))
        put(p, ["encoder", "pos_conv_embed", "conv", "weight"],
            (pos_g * pos_v / norm).astype(np.float32))
    return p
