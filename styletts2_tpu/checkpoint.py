"""Checkpoint I/O: module-keyed state with resume, freeze and ignore.

Parity: reference train.py:349-357 (state layout {'net': {module: params},
'optimizer', 'iters', 'val_loss', 'epoch'}) and models.load_checkpoint
(models.py:578-633: load_only_params / ignore_modules / freeze_modules).

Formats:
* native  — a single pickle of numpy-ified pytrees (our own trusted format;
            params, optimizer states, counters)
* torch   — reference .pth checkpoints via convert.load_torch_checkpoint
            (auto-detected by extension/magic), so published reference
            weights drop straight in.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_jax(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


def save_checkpoint(path: str, net: Dict[str, Any],
                    optimizer: Optional[Any] = None, iters: int = 0,
                    epoch: int = 0, val_loss: float = 0.0) -> None:
    state = {
        "net": _to_numpy(net),
        "optimizer": _to_numpy(optimizer) if optimizer is not None else None,
        "iters": iters,
        "epoch": epoch,
        "val_loss": val_loss,
        "format": "styletts2_tpu.v1",
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic: crash-safe autosave (train.py:348-357)


def _is_torch_checkpoint(path: str) -> bool:
    if path.endswith((".pth", ".pt")):
        return True
    with open(path, "rb") as f:
        magic = f.read(4)
    return magic[:2] == b"PK" or magic == b"\x80\x02"  # zipfile / old pickle


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load either a native checkpoint or a reference .pth; returns the
    state dict {'net': {module: tree}, 'optimizer', 'iters', 'epoch'}."""
    if _is_torch_checkpoint(path):
        from styletts2_tpu.convert import load_torch_checkpoint

        net = load_torch_checkpoint(path)
        return {"net": _to_jax(net), "optimizer": None, "iters": 0,
                "epoch": 0, "val_loss": 0.0}
    with open(path, "rb") as f:
        state = pickle.load(f)
    state["net"] = _to_jax(state["net"])
    if state.get("optimizer") is not None:
        state["optimizer"] = _to_jax(state["optimizer"])
    return state


def apply_checkpoint(params: Dict[str, Any], state: Dict[str, Any],
                     ignore_modules=(), strict_shapes: bool = True
                     ) -> Dict[str, Any]:
    """Merge loaded module trees into freshly-built params, per-module
    (reference models.py:583-613). Modules in ignore_modules keep their
    fresh init ('fresh start', config_example.yaml:34)."""
    out = dict(params)
    loaded = state["net"]
    for key in params:
        if key in ignore_modules or key not in loaded:
            if key in ignore_modules:
                print(f"{key} Ignored")
            continue
        out[key] = _merge_trees(params[key], loaded[key], key, strict_shapes)
        print(f"{key} Loaded")
    return out


def _merge_trees(template, loaded, path, strict):
    if isinstance(template, dict):
        merged = {}
        for k, v in template.items():
            if isinstance(loaded, dict) and k in loaded:
                merged[k] = _merge_trees(v, loaded[k], f"{path}.{k}", strict)
            else:
                if strict:
                    raise KeyError(f"checkpoint missing {path}.{k}")
                merged[k] = v
        return merged
    arr = jnp.asarray(loaded)
    if strict and tuple(arr.shape) != tuple(template.shape):
        raise ValueError(
            f"shape mismatch at {path}: ckpt {arr.shape} vs model "
            f"{template.shape}")
    return arr.astype(template.dtype)


def strip_for_inference(state: Dict[str, Any]) -> Dict[str, Any]:
    """Checkpoint-stripping tool (reference Demo/del_training.ipynb): keep
    only the 4 inference modules."""
    keep = ("decoder", "predictor", "text_encoder", "style_encoder")
    return {"net": {k: state["net"][k] for k in keep if k in state["net"]},
            "optimizer": None, "iters": state.get("iters", 0),
            "epoch": state.get("epoch", 0), "val_loss": state.get("val_loss", 0.0)}
