"""iSTFTNet generator: 2-stage upsampling + STFT-domain harmonic source +
matmul-DFT iSTFT head.

Parity: reference Modules/istftnet.py:494-600 (Generator) with the
conv-basis CustomSTFT (istftnet.py:111-301) replaced by the matmul
formulation in ops/stft.py — the same math, MXU-shaped.

Key shape fact reproduced from the reference: the source STFT uses
center=True (replicate) padding so `har` has L/hop + 1 frames, matching the
reflection-padded main branch at the last stage.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu.config import DecoderConfig
from styletts2_tpu.nn import layers as L
from styletts2_tpu.nn import blocks as B
from styletts2_tpu.nn.decoder import source_module_init, source_module_apply
from styletts2_tpu.ops import stft as OPS


def istftnet_generator_init(key, cfg: DecoderConfig, style_dim: int = 128):
    rates = cfg.upsample_rates
    kernels = cfg.upsample_kernel_sizes
    c0 = cfg.upsample_initial_channel
    n_up = len(rates)
    nk = len(cfg.resblock_kernel_sizes)
    keys = jax.random.split(key, 3 * n_up + nk * n_up + 4)
    ki = iter(range(len(keys)))
    p = {"m_source": source_module_init(keys[next(ki)]),
         "ups": {}, "noise_convs": {}, "noise_res": {}, "resblocks": {}}
    n_fft_ch = cfg.gen_istft_n_fft + 2
    for i, (u, k) in enumerate(zip(rates, kernels)):
        c_in = c0 // (2 ** i)
        c_cur = c0 // (2 ** (i + 1))
        p["ups"][str(i)] = L.conv_transpose1d_init(
            keys[next(ki)], c_in, c_cur, k, weight_norm=True)
        if i + 1 < n_up:
            stride_f0 = int(np.prod(rates[i + 1:]))
            p["noise_convs"][str(i)] = L.conv1d_init(
                keys[next(ki)], n_fft_ch, c_cur, stride_f0 * 2)
            p["noise_res"][str(i)] = B.adain_res_block1_init(
                keys[next(ki)], c_cur, 7, (1, 3, 5), style_dim)
        else:
            p["noise_convs"][str(i)] = L.conv1d_init(
                keys[next(ki)], n_fft_ch, c_cur, 1)
            p["noise_res"][str(i)] = B.adain_res_block1_init(
                keys[next(ki)], c_cur, 11, (1, 3, 5), style_dim)
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            p["resblocks"][str(i * nk + j)] = B.adain_res_block1_init(
                keys[next(ki)], c_cur, rk, tuple(rd), style_dim)
    p["conv_post"] = L.conv1d_init(keys[next(ki)], c_cur, n_fft_ch, 7,
                                   weight_norm=True)
    return p


def istftnet_generator_apply(p, x: jnp.ndarray, s: jnp.ndarray,
                             f0_curve: jnp.ndarray, rng, cfg: DecoderConfig,
                             frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, T, C) at mel rate; f0_curve: (B, T); -> wav (B, T*300, 1)."""
    rates = cfg.upsample_rates
    n_up = len(rates)
    nk = len(cfg.resblock_kernel_sizes)
    n_fft = cfg.gen_istft_n_fft
    hop = cfg.gen_istft_hop_size
    total_up = int(np.prod(rates)) * hop
    slope = 0.1

    # harmonic source at sample rate, then its STFT (reference 543-550)
    f0_up = jnp.swapaxes(OPS.interpolate_nearest(f0_curve[:, None, :],
                                                 total_up), 1, 2)
    har_source, _ = source_module_apply(p["m_source"], f0_up, rng, total_up)
    har_source = jax.lax.stop_gradient(har_source[..., 0])  # (B, L)
    har_spec, har_phase = OPS.stft_mag_phase(har_source, n_fft, hop, n_fft,
                                             center=True, pad_mode="replicate")
    har = jnp.concatenate([har_spec, har_phase], axis=1)  # (B, n_fft+2, L/hop+1)
    har = jnp.swapaxes(har, 1, 2).astype(x.dtype)  # channels-last

    def stage_mask(i):
        if frame_mask is None:
            return None
        f = int(np.prod(rates[:i])) if i > 0 else 1
        return jnp.repeat(frame_mask, f, axis=1)

    for i, (u, k) in enumerate(zip(rates, cfg.upsample_kernel_sizes)):
        last = (i == n_up - 1)
        m_in = stage_mask(i)
        x = L.leaky_relu(x, slope)
        if m_in is not None:
            x = jnp.where(m_in[..., None], x, 0.0)
        if not last:
            stride_f0 = int(np.prod(rates[i + 1:]))
            x_source = L.conv1d_apply(p["noise_convs"][str(i)], har,
                                      stride=stride_f0,
                                      padding=(stride_f0 + 1) // 2)
        else:
            x_source = L.conv1d_apply(p["noise_convs"][str(i)], har)
        x = L.conv_transpose1d_apply(p["ups"][str(i)], x, stride=u,
                                     padding=(k - u) // 2)
        if last:
            # ReflectionPad1d((1, 0)) — reference istftnet.py:538,559
            x = jnp.concatenate([x[:, 1:2, :], x], axis=1)
        m_out = None
        if frame_mask is not None:
            m_out = stage_mask(i + 1)
            if last:
                m_out = jnp.pad(m_out, ((0, 0), (1, 0)), constant_values=True)
        x_source = B.adain_res_block1_apply(p["noise_res"][str(i)], x_source, s,
                                            7 if not last else 11, (1, 3, 5),
                                            m_out)
        x = x + x_source
        xs = None
        for j in range(nk):
            r = B.adain_res_block1_apply(
                p["resblocks"][str(i * nk + j)], x, s,
                cfg.resblock_kernel_sizes[j],
                tuple(cfg.resblock_dilation_sizes[j]), m_out)
            xs = r if xs is None else xs + r
        x = xs / nk
    x = L.leaky_relu(x, 0.01)  # F.leaky_relu default slope (istftnet.py:569)
    x = L.conv1d_apply(p["conv_post"], x, padding=3)  # (B, Tf, n_fft+2)
    x = jnp.swapaxes(x, 1, 2).astype(jnp.float32)
    spec = jnp.exp(x[:, : n_fft // 2 + 1, :])
    phase = jnp.sin(x[:, n_fft // 2 + 1:, :])
    return jnp.swapaxes(OPS.istft_conv(spec, phase, n_fft, hop, n_fft), 1, 2)
