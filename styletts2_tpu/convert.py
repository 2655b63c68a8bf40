"""PyTorch checkpoint -> JAX param-tree converter.

Because every module's param tree mirrors its torch state_dict paths, the
conversion is a mechanical unflatten:
  'generator.resblocks.3.convs1.0.weight_v' ->
  params['generator']['resblocks']['3']['convs1']['0']['weight_v']

Handles the reference's quirks:
* DataParallel 'module.' prefixes (reference models.py:578-612)
* old-style weight_norm ('weight_g'/'weight_v') and new-style
  parametrizations ('parametrizations.weight.original0/1' — used by the
  vocos decoder, reference vocos.py:10)
* buffers we don't need (num_batches_tracked) are dropped.

torch is only imported inside load_torch_checkpoint, so the module stays
importable in torch-free deployments.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

# torch tensors for these leaves are kept verbatim; everything else too —
# layouts are handled at apply time.
_DROP_LEAVES = {"num_batches_tracked"}


def state_dict_to_tree(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Flat torch state_dict (str -> tensor/ndarray) -> nested dict of
    jnp arrays keyed by the torch module path components."""
    tree: Dict[str, Any] = {}
    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "module":  # DataParallel prefix
            parts = parts[1:]
        # new-style weight norm: <mod>.parametrizations.weight.original{0,1}
        if len(parts) >= 3 and parts[-3] == "parametrizations" and parts[-2] == "weight":
            leaf = {"original0": "weight_g", "original1": "weight_v"}[parts[-1]]
            parts = parts[:-3] + [leaf]
        if parts[-1] in _DROP_LEAVES:
            continue
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach")
                         else value)
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def load_torch_checkpoint(path: str) -> Dict[str, Dict[str, Any]]:
    """Load a reference .pth training checkpoint: state['net'][module_key]
    (reference train.py:349-357) -> {module_key: param_tree}."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    net = state.get("net", state)
    out = {}
    for module_key, sd in net.items():
        if isinstance(sd, Mapping):
            out[module_key] = state_dict_to_tree(sd)
    return out


def module_to_tree(torch_module) -> Dict[str, Any]:
    """Convert a live torch module's state_dict (testing convenience)."""
    return state_dict_to_tree(torch_module.state_dict())


def tree_to_state_dict(tree: Mapping[str, Any],
                       new_style_weight_norm: bool = False
                       ) -> Dict[str, np.ndarray]:
    """Reverse of state_dict_to_tree: nested param tree -> flat torch-style
    state_dict (numpy values; caller wraps in torch tensors).

    new_style_weight_norm re-emits weight_g/weight_v as
    '<mod>.parametrizations.weight.original{0,1}' — the key format the
    reference's vocos decoder uses (torch parametrizations API, reference
    vocos.py:10); hifigan/istftnet and everything else use the old-style
    keys. BatchNorm 'num_batches_tracked' buffers (dropped on import) are
    re-synthesized as 0 wherever running stats are present, so the
    reference's strict load_state_dict accepts the result."""
    flat: Dict[str, np.ndarray] = {}

    def rec(node, parts):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(v, parts + [k])
            if ("running_mean" in node and "running_var" in node
                    and "num_batches_tracked" not in node):
                flat[".".join(parts + ["num_batches_tracked"])] = \
                    np.asarray(0, np.int64)
        else:
            leaf = parts[-1]
            if new_style_weight_norm and leaf in ("weight_g", "weight_v"):
                orig = {"weight_g": "original0",
                        "weight_v": "original1"}[leaf]
                key = ".".join(parts[:-1]
                               + ["parametrizations", "weight", orig])
            else:
                key = ".".join(parts)
            flat[key] = np.asarray(node)

    rec(tree, [])
    return flat


def save_torch_checkpoint(net: Mapping[str, Mapping[str, Any]], path: str,
                          iters: int = 0, epoch: int = 0,
                          val_loss: float = 0.0,
                          new_style_modules=()) -> None:
    """Write a reference-format .pth training checkpoint
    (state['net'][module_key] flat state_dicts + iters/epoch/val_loss,
    reference train.py:349-357) from native {module: param_tree} weights —
    the round trip back to the torch ecosystem. new_style_modules: module
    keys whose weight-norm leaves use the parametrizations key format
    (the 'decoder' when decoder.type == 'vocos')."""
    import torch

    def tensor(v: np.ndarray):
        a = np.ascontiguousarray(v)
        if not a.flags.writeable:  # jax-backed arrays are read-only views
            a = a.copy()
        return torch.from_numpy(a)

    state = {
        "net": {
            key: {k: tensor(v)
                  for k, v in tree_to_state_dict(
                      tree, new_style_weight_norm=key in new_style_modules
                  ).items()}
            for key, tree in net.items()
        },
        "optimizer": {},
        "iters": iters,
        "epoch": epoch,
        "val_loss": val_loss,
    }
    torch.save(state, path)


def fuse_weight_norm(tree):
    """Pre-merge weight-norm (weight_g, weight_v) pairs into plain weights
    for inference: w = g * v / ||v|| computed once instead of per call.

    Computed in host numpy: doing this eagerly in jnp dispatches hundreds of
    tiny ops to the accelerator (minutes over a tunneled TPU)."""
    if not isinstance(tree, Mapping):
        return tree
    if "weight_v" in tree:
        v = np.asarray(tree["weight_v"], dtype=np.float32)
        g = np.asarray(tree["weight_g"], dtype=np.float32)
        axes = tuple(range(1, v.ndim))
        norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
        fused = {"weight": g * v / norm}  # numpy; device_put happens in bulk
        for k, val in tree.items():
            if k not in ("weight_v", "weight_g"):
                fused[k] = val
        return fused
    return {k: fuse_weight_norm(v) for k, v in tree.items()}
