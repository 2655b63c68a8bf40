"""Alignment core: monotonic Viterbi DP, masks, duration->alignment build.

Replaces the reference's device->CPU->Cython round trip per training step
(reference utils.py:14-27 copies the attention to numpy and calls the
compiled `monotonic_align.core.maximum_path_c`):

* `maximum_path`       — on-device lax.scan DP: forward column recurrence +
                         reverse backtrack, fully masked for variable
                         (t_x, t_y) extents; runs under jit on TPU.
* `maximum_path_cpu`   — ctypes binding to the C++ kernel
                         (native/monotonic_align.cpp), the host-side golden
                         oracle and CPU fallback.
* `mask_from_lens`     — (B, t_x, t_y) joint validity mask.
* `build_alignment`    — vectorized duration->hard-alignment matrix (the
                         cumsum/position-mask construction the reference
                         uses for ONNX export, inference_onnx.py:155-175,
                         replacing the python loop at inference.py:258-263).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e9


def mask_from_lens(t_x: jnp.ndarray, t_y: jnp.ndarray, max_x: int,
                   max_y: int) -> jnp.ndarray:
    """(B,) text/mel lengths -> (B, max_x, max_y) bool joint valid mask
    (the reference imports this from the monotonic_align package;
    call site train.py:213)."""
    mx = jnp.arange(max_x)[None, :, None] < t_x[:, None, None]
    my = jnp.arange(max_y)[None, None, :] < t_y[:, None, None]
    return mx & my


def maximum_path(value: jnp.ndarray, t_x: jnp.ndarray,
                 t_y: jnp.ndarray) -> jnp.ndarray:
    """Monotonic max-sum path, on-device.

    value: (B, X, Y) alignment scores (x: text, y: mel frames);
    t_x, t_y: (B,) valid extents. Returns (B, X, Y) 0/1 path (float32).

    DP: v[x, y] = value[x, y] + max(v[x, y-1], v[x-1, y-1]) within the
    monotonic band; then a reverse scan backtracks the argmax path.
    Both scans are over the Y axis (one fused TPU kernel each), carrying a
    length-X column — no host transfer.
    """
    b, max_x, max_y = value.shape
    value = value.astype(jnp.float32)
    x_idx = jnp.arange(max_x)[None, :]  # (1, X)

    tx = t_x[:, None].astype(jnp.int32)  # (B, 1)
    ty = t_y[:, None].astype(jnp.int32)

    def fwd_step(v_prev_col, inp):
        """v_prev_col: (B, X) DP values of column y-1."""
        val_col, y = inp  # (B, X), scalar
        # band: max(0, tx + y - ty) <= x < min(y+1, tx)
        lo = jnp.maximum(0, tx + y - ty)  # (B, 1)
        hi = jnp.minimum(y + 1, tx)
        in_band = (x_idx >= lo) & (x_idx < hi)
        v_stay = jnp.where(x_idx == y, _NEG, v_prev_col)
        v_shift = jnp.roll(v_prev_col, 1, axis=1)
        v_shift = jnp.where(x_idx == 0,
                            jnp.where(y == 0, 0.0, _NEG), v_shift)
        v_col = val_col + jnp.maximum(v_stay, v_shift)
        v_col = jnp.where(in_band, v_col, _NEG)
        return v_col, v_col

    ys = (jnp.swapaxes(value, 0, 2).swapaxes(1, 2),  # (Y, B, X)
          jnp.arange(max_y, dtype=jnp.int32))
    init = jnp.full((b, max_x), _NEG, jnp.float32)
    _, v_all = jax.lax.scan(fwd_step, init, ys)
    v_all = jnp.swapaxes(jnp.swapaxes(v_all, 0, 1), 1, 2)  # (B, X, Y)

    # backtrack from y = ty-1 at index = tx-1 down to y = 0
    def bwd_step(index, y):
        active = y < ty[:, 0]  # (B,)
        onehot = (x_idx == index[:, None]) & active[:, None]
        # gather v_all[:, index, y-1] and v_all[:, index-1, y-1]
        ym1 = jnp.maximum(y - 1, 0)
        col = v_all[:, :, ym1]  # (B, X)
        v_stay = jnp.take_along_axis(col, index[:, None], axis=1)[:, 0]
        v_diag = jnp.take_along_axis(col, jnp.maximum(index - 1, 0)[:, None],
                                     axis=1)[:, 0]
        move = (index != 0) & ((index == y) | (v_stay < v_diag)) & active
        new_index = jnp.where(move, index - 1, index)
        return new_index, onehot

    ys_rev = jnp.arange(max_y - 1, -1, -1, dtype=jnp.int32)
    init_index = jnp.maximum(t_x.astype(jnp.int32) - 1, 0)
    _, path_cols = jax.lax.scan(bwd_step, init_index, ys_rev)
    # path_cols: (Y, B, X) in reversed y order
    path = jnp.flip(jnp.swapaxes(jnp.swapaxes(path_cols, 0, 1), 1, 2), axis=2)
    return path.astype(jnp.float32)


def maximum_path_from_mask(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Reference-signature wrapper: mask (B, X, Y) -> extents, then DP
    (reference utils.py:14-27 derives t_x/t_y the same way)."""
    t_x = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_y = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
    return maximum_path(value, t_x, t_y) * mask.astype(jnp.float32)


# ---------------------------------------------------------------------------
# native CPU kernel (golden oracle / fallback)
# ---------------------------------------------------------------------------

_LIB = None


def _native_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "native", "monotonic_align.cpp")
    build_dir = os.path.join(here, "..", "native", "_build")
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, "libmonotonic_align.so")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, src],
            check=True)
    lib = ctypes.CDLL(so_path)
    lib.maximum_path.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.maximum_path.restype = None
    _LIB = lib
    return lib


def maximum_path_cpu(value: np.ndarray, t_x: np.ndarray,
                     t_y: np.ndarray) -> np.ndarray:
    """C++ kernel (native/monotonic_align.cpp). value: (B, X, Y) float32."""
    lib = _native_lib()
    value = np.ascontiguousarray(value, dtype=np.float32)
    b, max_x, max_y = value.shape
    path = np.zeros((b, max_x, max_y), dtype=np.int32)
    t_x = np.ascontiguousarray(t_x, dtype=np.int32)
    t_y = np.ascontiguousarray(t_y, dtype=np.int32)
    lib.maximum_path(
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, max_x, max_y)
    return path


# ---------------------------------------------------------------------------
# duration -> hard alignment (inference length regulator)
# ---------------------------------------------------------------------------


def build_alignment(durations: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """durations: (B, T) integer frame counts -> (B, T, n_frames) 0/1.

    alignment[b, i, t] = 1  iff  sum(d[:i]) <= t < sum(d[:i+1]).
    Vectorized (the construction the reference itself derived for ONNX,
    inference_onnx.py:155-175); n_frames is the static padded bucket."""
    d = durations.astype(jnp.float32)
    ends = jnp.cumsum(d, axis=1)
    starts = ends - d
    pos = jnp.arange(n_frames, dtype=jnp.float32)[None, None, :]
    return ((pos >= starts[..., None]) & (pos < ends[..., None])).astype(
        jnp.float32)
