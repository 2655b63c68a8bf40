"""ASR text aligner: MFCC -> dilated conv stack -> CTC head + attention
seq2seq decoder (provides the training-time text/mel alignment).

Parity: reference Modules/ASR/models.py (ASRCNN, ASRS2S) and
Modules/ASR/layers.py (ConvNorm, ConvBlock, Attention, LocationLayer, MFCC).
Param tree mirrors the torch state_dict.

The reference's per-character python while-loop with an LSTMCell
(ASR/models.py:135-141) becomes a `lax.scan` with teacher forcing — one
compiled kernel instead of T python iterations.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu.nn import layers as L
from styletts2_tpu.ops import stft as OPS


# ---------------------------------------------------------------------------
# ConvBlock stack (reference ASR/layers.py:105-131)
# ---------------------------------------------------------------------------


def _conv_norm_init(key, in_ch, out_ch, k=1, w_init_gain="linear",
                    bias: bool = True):
    kw, kb = jax.random.split(key)
    gain = {"linear": 1.0, "relu": math.sqrt(2.0), "tanh": 5.0 / 3.0}[w_init_gain]
    fan_in, fan_out = in_ch * k, out_ch * k
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    p = {"conv": {
        "weight": L._uniform(kw, (out_ch, in_ch, k), -bound, bound),
    }}
    if bias:
        p["conv"]["bias"] = np.zeros((out_ch,), np.float32)
    return p


def conv_block_init(key, hidden: int, n_conv: int = 3):
    keys = jax.random.split(key, 2 * n_conv)
    p = {"blocks": {}}
    for i in range(n_conv):
        p["blocks"][str(i)] = {
            "0": _conv_norm_init(keys[2 * i], hidden, hidden, 3),
            "2": L.group_norm_init(hidden),
            "4": _conv_norm_init(keys[2 * i + 1], hidden, hidden, 3),
        }
    return p


def conv_block_apply(p, x: jnp.ndarray, train: bool = False, rng=None,
                     dropout_p: float = 0.2) -> jnp.ndarray:
    """x: (B, T, C); 3 residual sub-blocks with dilation 3^i."""
    n = len(p["blocks"])
    rngs = jax.random.split(rng, 2 * n) if rng is not None else [None] * (2 * n)
    for i in range(n):
        blk = p["blocks"][str(i)]
        d = 3 ** i
        h = L.conv1d_apply(blk["0"]["conv"], x, padding=d, dilation=d)
        h = jax.nn.relu(h)
        h = L.group_norm_apply(blk["2"], h, num_groups=8)
        h = L.dropout(h, dropout_p, train, rngs[2 * i])
        h = L.conv1d_apply(blk["4"]["conv"], h, padding=1)
        h = jax.nn.relu(h)
        h = L.dropout(h, dropout_p, train, rngs[2 * i + 1])
        x = x + h
    return x


# ---------------------------------------------------------------------------
# location-sensitive attention (reference ASR/layers.py:133-208)
# ---------------------------------------------------------------------------


def attention_init(key, rnn_dim: int, embed_dim: int, attn_dim: int,
                   n_filters: int = 32, kernel: int = 63):
    keys = jax.random.split(key, 5)
    return {
        "query_layer": {"linear_layer": L.linear_init(keys[0], rnn_dim, attn_dim,
                                                      bias=False, w_init_gain="tanh")},
        "memory_layer": {"linear_layer": L.linear_init(keys[1], embed_dim, attn_dim,
                                                       bias=False, w_init_gain="tanh")},
        "v": {"linear_layer": L.linear_init(keys[2], attn_dim, 1, bias=False)},
        "location_layer": {
            "location_conv": _conv_norm_init(keys[3], 2, n_filters, kernel,
                                             bias=False),
            "location_dense": {"linear_layer": L.linear_init(
                keys[4], n_filters, attn_dim, bias=False, w_init_gain="tanh")},
        },
    }


def attention_apply(p, query: jnp.ndarray, memory: jnp.ndarray,
                    processed_memory: jnp.ndarray, attn_weights_cat: jnp.ndarray,
                    pad_mask: Optional[jnp.ndarray], kernel: int = 63
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One attention step. query (B, rnn_dim); memory (B, L, H);
    attn_weights_cat (B, L, 2) [prev, cum]; pad_mask (B, L) True=PAD."""
    pq = L.linear_apply(p["query_layer"]["linear_layer"], query)[:, None, :]
    loc = p["location_layer"]
    pa = L.conv1d_apply(loc["location_conv"]["conv"], attn_weights_cat,
                        padding=(kernel - 1) // 2)
    pa = L.linear_apply(loc["location_dense"]["linear_layer"], pa)
    energies = L.linear_apply(p["v"]["linear_layer"],
                              jnp.tanh(pq + pa + processed_memory))[..., 0]
    if pad_mask is not None:
        energies = jnp.where(pad_mask, -jnp.inf, energies)
    weights = jax.nn.softmax(energies.astype(jnp.float32), axis=1).astype(memory.dtype)
    context = jnp.einsum("bl,blh->bh", weights, memory,
                         precision=L._prec(memory))
    return context, weights


# ---------------------------------------------------------------------------
# ASRS2S decoder (reference ASR/models.py:74-186)
# ---------------------------------------------------------------------------


def asr_s2s_init(key, embedding_dim: int = 512, hidden_dim: int = 128,
                 n_token: int = 178, n_filters: int = 32, kernel: int = 63):
    keys = jax.random.split(key, 5)
    val_range = math.sqrt(6.0 / hidden_dim)
    return {
        "embedding": {"weight": L._uniform(
            keys[0], (n_token, embedding_dim), -val_range, val_range)},
        "project_to_n_symbols": L.torch_linear_init(keys[1], hidden_dim, n_token),
        "attention_layer": attention_init(keys[2], hidden_dim, hidden_dim,
                                          hidden_dim, n_filters, kernel),
        "decoder_rnn": L.lstm_cell_init(keys[3], hidden_dim + embedding_dim,
                                        hidden_dim),
        "project_to_hidden": {"0": {"linear_layer": L.linear_init(
            keys[4], hidden_dim * 2, hidden_dim)}},
    }


def asr_s2s_apply(p, memory: jnp.ndarray, mem_pad_mask: jnp.ndarray,
                  text_input: jnp.ndarray, rng=None, train: bool = False,
                  sos: int = 1, unk: int = 3, random_mask: float = 0.1,
                  dropout_p: float = 0.5
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Teacher-forced attention decoder as a lax.scan.

    memory: (B, L, H); mem_pad_mask: (B, L) True=pad; text_input: (B, T).
    Returns (hidden (B,T+1,H), logits (B,T+1,n_token), attn (B,T+1,L)).
    """
    b, l, h = memory.shape
    t = text_input.shape[1]
    rnn_dim = p["decoder_rnn"]["weight_hh"].shape[1]

    if train and rng is not None:
        k_mask, k_drop = jax.random.split(rng)
        mask = jax.random.uniform(k_mask, text_input.shape) < random_mask
        text_in = jnp.where(mask, unk, text_input)
    else:
        k_drop = None
        text_in = text_input

    emb = L.embedding_apply(p["embedding"], text_in)  # (B, T, E)
    sos_emb = jnp.broadcast_to(p["embedding"]["weight"][sos][None, None, :],
                               (b, 1, emb.shape[-1]))
    dec_in = jnp.concatenate([sos_emb, emb], axis=1)  # (B, T+1, E)

    processed_memory = L.linear_apply(
        p["attention_layer"]["memory_layer"]["linear_layer"], memory)

    h0 = jnp.zeros((b, rnn_dim), memory.dtype)
    c0 = jnp.zeros((b, rnn_dim), jnp.float32)
    aw0 = jnp.zeros((b, l), memory.dtype)
    ctx0 = jnp.zeros((b, h), memory.dtype)

    drop_keys = (jax.random.split(k_drop, t + 1) if k_drop is not None
                 else jnp.zeros((t + 1, 2), jnp.uint32))

    def step(carry, inp):
        hs, cs, aw, aw_cum, ctx = carry
        x_t, dk = inp
        cell_in = jnp.concatenate([x_t, ctx], axis=-1)
        hs, cs = L.lstm_cell_apply(p["decoder_rnn"], cell_in, hs, cs)
        awc = jnp.stack([aw, aw_cum], axis=-1)  # (B, L, 2)
        ctx, aw = attention_apply(p["attention_layer"], hs, memory,
                                  processed_memory, awc, mem_pad_mask)
        aw_cum = aw_cum + aw
        hidden = jnp.tanh(L.linear_apply(
            p["project_to_hidden"]["0"]["linear_layer"],
            jnp.concatenate([hs, ctx], axis=-1)))
        hdrop = L.dropout(hidden, dropout_p, train and k_drop is not None,
                          dk if k_drop is not None else None)
        logit = L.linear_apply(p["project_to_n_symbols"], hdrop)
        return (hs, cs, aw, aw_cum, ctx), (hidden, logit, aw)

    xs = (jnp.swapaxes(dec_in, 0, 1), drop_keys)
    _, (hiddens, logits, aligns) = jax.lax.scan(
        step, (h0, c0, aw0, aw0, ctx0), xs)
    return (jnp.swapaxes(hiddens, 0, 1), jnp.swapaxes(logits, 0, 1),
            jnp.swapaxes(aligns, 0, 1))


# ---------------------------------------------------------------------------
# ASRCNN (reference ASR/models.py:8-72)
# ---------------------------------------------------------------------------


def init(key, input_dim: int = 80, hidden_dim: int = 256, n_token: int = 178,
         n_layers: int = 6, token_embedding_dim: int = 512):
    keys = jax.random.split(key, n_layers + 5)
    p = {
        "init_cnn": _conv_norm_init(keys[0], input_dim // 2, hidden_dim, 7),
        "cnns": {},
        "projection": _conv_norm_init(keys[n_layers + 1], hidden_dim,
                                      hidden_dim // 2, 1),
        "ctc_linear": {
            "0": {"linear_layer": L.linear_init(keys[n_layers + 2],
                                                hidden_dim // 2, hidden_dim)},
            "2": {"linear_layer": L.linear_init(keys[n_layers + 3],
                                                hidden_dim, n_token)},
        },
        "asr_s2s": asr_s2s_init(keys[n_layers + 4], token_embedding_dim,
                                hidden_dim // 2, n_token),
    }
    for i in range(n_layers):
        p["cnns"][str(i)] = {"0": conv_block_init(keys[1 + i], hidden_dim),
                             "1": L.group_norm_init(hidden_dim)}
    return p


def get_feature(p, mel_norm: jnp.ndarray, train: bool = False,
                rng=None) -> jnp.ndarray:
    """mel (B, n_mels, T) normalized log-mel -> features (B, T//2, H/2)."""
    x = OPS.mfcc(mel_norm)  # (B, 40, T)
    x = jnp.swapaxes(x, 1, 2)  # (B, T, 40)
    x = L.conv1d_apply(p["init_cnn"]["conv"], x, stride=2, padding=3)
    n = len(p["cnns"])
    rngs = jax.random.split(rng, n) if rng is not None else [None] * n
    for i in range(n):
        x = conv_block_apply(p["cnns"][str(i)]["0"], x, train, rngs[i])
        x = L.group_norm_apply(p["cnns"][str(i)]["1"], x, num_groups=1)
    return L.conv1d_apply(p["projection"]["conv"], x)


def forward(p, mel_norm: jnp.ndarray, mem_pad_mask: jnp.ndarray,
            text_input: jnp.ndarray, train: bool = False, rng=None):
    """Full aligner forward (reference ASR/models.py:37-48).

    Returns (ctc_logits (B, L, n_token), s2s_logits (B, T+1, n_token),
    s2s_attn (B, T+1, L)) where L = T_mel // 2."""
    k_feat = k_s2s = None
    if rng is not None:
        k_feat, k_s2s = jax.random.split(rng)
    x = get_feature(p, mel_norm, train, k_feat)  # (B, L, H/2)
    ctc = L.linear_apply(p["ctc_linear"]["0"]["linear_layer"], x)
    ctc = jax.nn.relu(ctc)
    ctc = L.linear_apply(p["ctc_linear"]["2"]["linear_layer"], ctc)
    _, s2s_logit, s2s_attn = asr_s2s_apply(p["asr_s2s"], x, mem_pad_mask,
                                           text_input, k_s2s, train)
    return ctc, s2s_logit, s2s_attn
