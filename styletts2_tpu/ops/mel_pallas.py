"""Pallas TPU kernel: fused mel-spectrogram frontend.

Computes, in one kernel pass per frame tile:
    power = (frames @ (win*cos))^2 + (frames @ (win*-sin))^2
    mel   = power @ mel_fb
    out   = (log(1e-5 + mel) - mean) / std
i.e. the whole reference frontend (meldataset.py:48-56) after framing. The
XLA path (ops/stft.py) materializes the (T, n_fft//2+1) power spectrum in
HBM between the two matmuls; here it lives only in VMEM scratch — the MXU
consumes the DFT product immediately and only the (T, n_mels) mels ever
reach HBM. Used by the training losses (6 mel transforms per step:
losses.multi_resolution_stft_loss) and the data path (train.compute_mels).

Grid: (frame_tiles, freq_tiles); the freq axis accumulates into the same
output block (index_map ignores j), with the log-normalization applied on
the last freq tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from styletts2_tpu.ops import stft as OPS

TILE_N = 128      # frames per tile (sublane-major)
TILE_F = 256      # padded-freq columns per tile (keeps the true-f32 6-pass
                  # matmul inside the 16 MB VMEM scoped limit)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _padded_bases(sr: int, n_fft: int, win_length: int, n_mels: int):
    """(cos, sin) (n_fft, Fpad) and mel fb (Fpad, Mpad), zero-padded so the
    freq axis tiles evenly and mels fill a 128 lane block. Built in-graph
    (as baked constants these add ~20 MB to the serialized program)."""
    cos_b, sin_b = OPS._traced_dft_bases(n_fft, win_length, True)
    fb = OPS._traced_mel_fb(sr, n_fft, n_mels)
    freq = cos_b.shape[1]
    fpad = _round_up(freq, TILE_F)
    mpad = _round_up(n_mels, 128)
    cos_p = jnp.pad(cos_b, ((0, 0), (0, fpad - freq)))
    sin_p = jnp.pad(sin_b, ((0, 0), (0, fpad - freq)))
    fb_p = jnp.pad(fb, ((0, fpad - freq), (0, mpad - n_mels)))
    return cos_p, sin_p, fb_p


def _kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref, power_scratch,
            *, n_freq_tiles: int, mean: float, std: float):
    j = pl.program_id(1)
    hi = jax.lax.Precision.HIGHEST  # true-f32 MXU passes (match ops.stft._mm)
    re = jnp.dot(frames_ref[:], cos_ref[:],
                 preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames_ref[:], sin_ref[:],
                 preferred_element_type=jnp.float32, precision=hi)
    power_scratch[:] = re * re + im * im
    partial = jnp.dot(power_scratch[:], fb_ref[:],
                      preferred_element_type=jnp.float32, precision=hi)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial

    @pl.when(j == n_freq_tiles - 1)
    def _():
        out_ref[:] = (jnp.log(1e-5 + out_ref[:]) - mean) / std


def fused_log_mel(
    wave: jnp.ndarray,
    sr: int = 24000,
    n_fft: int = 2048,
    win_length: int = 1200,
    hop_length: int = 300,
    n_mels: int = 80,
    mean: float = OPS.LOG_MEL_MEAN,
    std: float = OPS.LOG_MEL_STD,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T) waveforms -> (B, n_mels, n_frames) normalized log-mels.

    Numerically equivalent to ops.stft.preprocess_wave (tested); the framing
    gather stays in XLA (it fuses with the producer), everything after is
    one Pallas kernel. Differentiable: the custom VJP backward runs through
    the XLA formulation (the MRSTFT training loss differentiates this)."""
    if wave.ndim == 1:
        return fused_log_mel(wave[None], sr, n_fft, win_length, hop_length,
                             n_mels, mean, std, interpret)[0]
    return _fused_log_mel_vjp(wave, sr, n_fft, win_length, hop_length,
                              n_mels, mean, std, interpret)


def _xla_log_mel(wave, sr, n_fft, win_length, hop_length, n_mels, mean, std):
    mel = OPS.mel_spectrogram(wave, sr=sr, n_fft=n_fft, win_length=win_length,
                              hop_length=hop_length, n_mels=n_mels)
    return (jnp.log(1e-5 + mel) - mean) / std


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def _fused_log_mel_vjp(wave, sr, n_fft, win_length, hop_length, n_mels,
                       mean, std, interpret):
    return _fused_forward(wave, sr, n_fft, win_length, hop_length, n_mels,
                          mean, std, interpret)


def _fused_fwd(wave, sr, n_fft, win_length, hop_length, n_mels, mean, std,
               interpret):
    out = _fused_forward(wave, sr, n_fft, win_length, hop_length, n_mels,
                         mean, std, interpret)
    return out, wave


def _fused_bwd(sr, n_fft, win_length, hop_length, n_mels, mean, std,
               interpret, wave, ct):
    _, vjp = jax.vjp(lambda w: _xla_log_mel(w, sr, n_fft, win_length,
                                            hop_length, n_mels, mean, std),
                     wave)
    return (vjp(ct)[0],)


_fused_log_mel_vjp.defvjp(_fused_fwd, _fused_bwd)


def _fused_forward(
    wave: jnp.ndarray,
    sr: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_mels: int,
    mean: float,
    std: float,
    interpret: bool,
) -> jnp.ndarray:
    b = wave.shape[0]
    frames = OPS.frame_signal(wave.astype(jnp.float32), n_fft, hop_length)
    n_frames = frames.shape[1]
    flat = frames.reshape(b * n_frames, n_fft)
    n_rows = flat.shape[0]
    rows_pad = _round_up(n_rows, TILE_N)
    if rows_pad != n_rows:
        flat = jnp.pad(flat, ((0, rows_pad - n_rows), (0, 0)))

    cos_p, sin_p, fb_p = _padded_bases(sr, n_fft, win_length, n_mels)
    fpad, mpad = fb_p.shape
    n_freq_tiles = fpad // TILE_F

    grid = (rows_pad // TILE_N, n_freq_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, n_freq_tiles=n_freq_tiles,
                          mean=mean, std=std),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, n_fft), lambda i, j: (i, 0)),
            pl.BlockSpec((n_fft, TILE_F), lambda i, j: (0, j)),
            pl.BlockSpec((n_fft, TILE_F), lambda i, j: (0, j)),
            pl.BlockSpec((TILE_F, mpad), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_N, mpad), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, mpad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_N, TILE_F), jnp.float32)],
        interpret=interpret,
    )(flat, cos_p, sin_p, fb_p)

    mels = out[:n_rows, :n_mels].reshape(b, n_frames, n_mels)
    return jnp.swapaxes(mels, 1, 2)
