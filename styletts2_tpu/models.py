"""Model zoo assembly: build all 8 components as param trees.

Parity: reference models.build_model (models.py:535-576) — same module keys
('decoder', 'predictor', 'text_encoder', 'style_encoder', 'text_aligner',
'pitch_extractor', 'mpd', 'msd') so reference checkpoints map 1:1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from styletts2_tpu.config import ModelConfig
from styletts2_tpu.nn import (asr, decoder, discriminators, jdc, predictor,
                              style_encoder, text_encoder)


def build_model(key, args: ModelConfig) -> Dict[str, Any]:
    """Returns {module_key: param_tree} for all 8 modules.

    Initialization runs on the host CPU backend: the init functions are
    eager per-tensor ops, and dispatching hundreds of them to a remote TPU
    (axon tunnel) costs minutes. The caller moves params to the accelerator
    implicitly on first jitted use (or explicitly via jax.device_put)."""
    assert args.decoder.type in ("istftnet", "hifigan", "vocos"), \
        "Decoder type unknown"
    with jax.default_device(jax.devices("cpu")[0]):
        return _build_model(key, args)


def _build_model(key, args: ModelConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 8)
    return {
        "decoder": decoder.decoder_init(keys[0], args.decoder,
                                        dim_in=args.hidden_dim,
                                        style_dim=args.style_dim),
        "predictor": predictor.init(keys[1], style_dim=args.style_dim,
                                    d_hid=args.hidden_dim,
                                    nlayers=args.n_layer,
                                    max_dur=args.max_dur),
        "text_encoder": text_encoder.init(keys[2], channels=args.hidden_dim,
                                          kernel_size=5, depth=args.n_layer,
                                          n_symbols=args.n_token),
        "style_encoder": style_encoder.init(keys[3], dim_in=args.dim_in,
                                            style_dim=args.style_dim,
                                            max_conv_dim=args.max_conv_dim),
        "text_aligner": asr.init(keys[4],
                                 input_dim=args.ASR_params.input_dim,
                                 hidden_dim=args.ASR_params.hidden_dim,
                                 n_token=args.n_token,
                                 n_layers=args.ASR_params.n_layers,
                                 token_embedding_dim=args.ASR_params.token_embedding_dim),
        "pitch_extractor": jdc.init(keys[5],
                                    num_class=args.JDC_params.num_class),
        "mpd": discriminators.mpd_init(keys[6]),
        "msd": discriminators.msd_init(keys[7]),
    }


INFERENCE_MODULES = ("decoder", "predictor", "text_encoder", "style_encoder")


def param_count(tree) -> int:
    """Trainable parameter count (excludes BN running-stat buffers, matching
    torch's module.parameters() accounting)."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    total = 0
    for path, x in leaves:
        name = str(path[-1])
        if "running_mean" in name or "running_var" in name:
            continue
        total += x.size
    return total
