"""Style-conditioned vocoder decoder: shared shell + pluggable generators.

The reference carries three near-identical copies of the decoder shell
(hifigan.py:416-475, istftnet.py:660-722, vocos.py:364-422); here there is
one shell (`decoder_apply`) dispatching on generator type. Generators:

* hifigan  — harmonic-plus-noise NSF source + 4-stage transposed-conv
             upsampling with Snake/AdaIN dilated resblocks
             (reference Modules/hifigan.py:82-356)
* istftnet — 2-stage upsampling + STFT-domain source injection + iSTFT head
             (reference Modules/istftnet.py:303-600)
* vocos    — constant-resolution ConvNeXt stack + iSTFT head
             (reference Modules/vocos.py:27-305)

Param trees mirror the torch state_dicts. Channels-last activations.
PRNG-threaded randomness replaces torch's global RNG (sine phase, noise,
training-time F0/N smoothing).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu.config import DecoderConfig
from styletts2_tpu.nn import layers as L
from styletts2_tpu.nn import blocks as B
from styletts2_tpu.ops import stft as OPS


# ---------------------------------------------------------------------------
# NSF source (reference hifigan.py:82-268)
# ---------------------------------------------------------------------------


def source_module_init(key, harmonic_num: int = 8):
    return {"l_linear": L.torch_linear_init(key, harmonic_num + 1, 1)}


def sine_gen(f0_up: jnp.ndarray, rng, upsample_scale: int,
             sampling_rate: int = 24000, harmonic_num: int = 8,
             sine_amp: float = 0.1, noise_std: float = 0.003,
             voiced_threshold: float = 10.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SineGen parity (reference hifigan.py:112-218).

    f0_up: (B, L, 1) F0 at sample rate. Returns (sine_waves (B, L, H+1),
    uv (B, L, 1)). Randomness (initial phase + noise) from `rng`.

    The down-up interpolation of the instantaneous frequency before/after
    the cumsum is reproduced exactly (it shapes the harmonic phase)."""
    b, length, _ = f0_up.shape
    dim = harmonic_num + 1
    deterministic = rng is None  # zero phase + zero noise (testing/serving)
    if not deterministic:
        k_phase, k_noise = jax.random.split(rng)

    harmonics = jnp.arange(1, dim + 1, dtype=f0_up.dtype)
    fn = f0_up * harmonics[None, None, :]  # (B, L, dim)
    rad = (fn / sampling_rate) % 1.0

    if not deterministic:
        rand_ini = jax.random.uniform(k_phase, (b, dim), rad.dtype)
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)

    # downsample inst. freq by 1/upsample_scale (linear), cumsum, upsample back
    rad_t = jnp.swapaxes(rad, 1, 2)  # (B, dim, L)
    rad_down = OPS.interpolate_linear(rad_t, length // upsample_scale)
    phase = jnp.cumsum(jnp.swapaxes(rad_down, 1, 2).astype(jnp.float32),
                       axis=1) * 2.0 * np.pi
    phase = OPS.interpolate_linear(
        jnp.swapaxes(phase, 1, 2) * float(upsample_scale), length)
    sines = jnp.sin(jnp.swapaxes(phase, 1, 2)).astype(f0_up.dtype)

    uv = (f0_up > voiced_threshold).astype(f0_up.dtype)  # (B, L, 1)
    sine_waves = sines * sine_amp * uv
    if not deterministic:
        noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
        noise = noise_amp * jax.random.normal(k_noise, sines.shape, sines.dtype)
        sine_waves = sine_waves + noise
    return sine_waves, uv


def source_module_apply(p, f0_up: jnp.ndarray, rng, upsample_scale: int,
                        harmonic_num: int = 8,
                        sine_amp: float = 0.1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SourceModuleHnNSF (reference hifigan.py:221-268): harmonics -> tanh
    linear merge. Returns (har_source (B, L, 1), uv)."""
    sine_wavs, uv = sine_gen(f0_up, rng, upsample_scale,
                             harmonic_num=harmonic_num, sine_amp=sine_amp)
    sine_wavs = jax.lax.stop_gradient(sine_wavs)  # reference: no_grad sine gen
    sine_merge = jnp.tanh(L.linear_apply(p["l_linear"], sine_wavs))
    return sine_merge, uv


# ---------------------------------------------------------------------------
# HiFi-GAN generator (reference hifigan.py:272-356)
# ---------------------------------------------------------------------------


def hifigan_generator_init(key, cfg: DecoderConfig, style_dim: int = 128):
    rates = cfg.upsample_rates
    kernels = cfg.upsample_kernel_sizes
    c0 = cfg.upsample_initial_channel
    n_up = len(rates)
    keys = jax.random.split(key, 4 * n_up + len(cfg.resblock_kernel_sizes) * n_up + 4)
    ki = iter(range(len(keys)))
    p = {
        "m_source": source_module_init(keys[next(ki)]),
        "ups": {}, "noise_convs": {}, "noise_res": {}, "resblocks": {},
        "alphas": {"0": np.ones((1, c0, 1), np.float32)},
    }
    for i, (u, k) in enumerate(zip(rates, kernels)):
        c_in = c0 // (2 ** i)
        c_cur = c0 // (2 ** (i + 1))
        p["ups"][str(i)] = L.conv_transpose1d_init(
            keys[next(ki)], c_in, c_cur, k, weight_norm=True)
        if i + 1 < n_up:
            stride_f0 = int(np.prod(rates[i + 1:]))
            p["noise_convs"][str(i)] = L.conv1d_init(
                keys[next(ki)], 1, c_cur, stride_f0 * 2)
            p["noise_res"][str(i)] = B.adain_res_block1_init(
                keys[next(ki)], c_cur, 7, (1, 3, 5), style_dim)
        else:
            p["noise_convs"][str(i)] = L.conv1d_init(keys[next(ki)], 1, c_cur, 1)
            p["noise_res"][str(i)] = B.adain_res_block1_init(
                keys[next(ki)], c_cur, 11, (1, 3, 5), style_dim)
        p["alphas"][str(i + 1)] = np.ones((1, c_cur, 1), np.float32)
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            p["resblocks"][str(i * len(cfg.resblock_kernel_sizes) + j)] = (
                B.adain_res_block1_init(keys[next(ki)], c_cur, rk, tuple(rd),
                                        style_dim))
    p["conv_post"] = L.conv1d_init(keys[next(ki)], c_cur, 1, 7, weight_norm=True)
    return p


def hifigan_generator_apply(p, x: jnp.ndarray, s: jnp.ndarray,
                            f0_curve: jnp.ndarray, rng, cfg: DecoderConfig,
                            frame_mask: Optional[jnp.ndarray] = None,
                            har_source: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, T, C) decoder features at mel rate; f0_curve: (B, T) at mel
    rate; returns wav (B, T*prod(rates), 1) channels-last.

    frame_mask: (B, T) valid mask at mel rate; propagated through the
    upsampling stages so padded buckets reproduce exact-length outputs.
    har_source: optional precomputed NSF source (B, T*prod(rates), 1) —
    the sequence-parallel decode (parallel/seqpar.py) computes it from the
    full-length F0 curve (the sine phase is a global cumsum) and passes the
    local haloed window here."""
    rates = cfg.upsample_rates
    n_up = len(rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    total_up = int(np.prod(rates))

    if har_source is None:
        k_src = None if rng is None else jax.random.fold_in(rng, 0)
        f0_up = OPS.interpolate_nearest(f0_curve[:, None, :],
                                        total_up)  # (B,1,L)
        f0_up = jnp.swapaxes(f0_up, 1, 2)  # (B, L, 1)
        har_source, _ = source_module_apply(p["m_source"], f0_up, k_src,
                                            total_up)

    t0 = frame_mask.shape[1] if frame_mask is not None else 0
    n_val = (frame_mask.sum(axis=1, dtype=jnp.int32)
             if frame_mask is not None else None)
    # first valid index: 0 for the bucketed-inference prefix masks; nonzero
    # on the edge devices of a sequence-parallel decode, whose valid region
    # is an interior window of the haloed slice (parallel/seqpar.py)
    lo_val = (jnp.argmax(frame_mask, axis=1).astype(jnp.int32)
              if frame_mask is not None else None)

    def stage_mask(i):
        """Valid mask at stage i's rate, built as an iota comparison (fuses
        into consumers) rather than a materialized repeat of the bool mask.
        Exact because the valid region is a contiguous interval (a prefix
        under bucketed inference — alignment is causal — or an interior
        window under sequence-parallel decode)."""
        if frame_mask is None:
            return None
        f = int(np.prod(rates[:i])) if i > 0 else 1
        pos = jnp.arange(t0 * f, dtype=jnp.int32)[None, :]
        return ((pos >= (lo_val * f)[:, None])
                & (pos < ((lo_val + n_val) * f)[:, None]))

    def stage_count(i):
        """Valid PREFIX length at stage i's rate — consumed only by the
        fused folded/Pallas kernels, which assume lo_val == 0 (they are
        gated off under a seq-par context, the one producer of interior
        masks)."""
        if frame_mask is None:
            return None
        f = int(np.prod(rates[:i])) if i > 0 else 1
        return n_val * f

    sample_mask = stage_mask(n_up)
    if sample_mask is not None:
        har_source = jnp.where(sample_mask[..., None], har_source, 0.0)

    # stage-folded fast path (inference, prefix masks): low-channel stages
    # keep their tensors TIME-FOLDED end to end — the noise conv produces a
    # folded output directly (prefolded strided weight, wsfold), the
    # source add / resblock accumulation / conv_post all stay on (T/f,
    # 128)-lane tensors, and only ONE fold boundary per stage remains (the
    # transposed-conv output). Exactly the same taps and zero pads as the
    # unfolded path — the per-block fold/unfold boundary copies (~15 ms at
    # b=8 fb=1000) and the 4x-lane-padded sample-rate conv_post/noise
    # convs (~28 ms) are what disappear. STYLETTS2_TPU_STAGE_FOLD=0
    # disables; =1 forces (CPU parity tests).
    force_sf = os.environ.get("STYLETTS2_TPU_STAGE_FOLD")
    b_sz = x.shape[0]
    c0 = cfg.upsample_initial_channel
    stage_folded = False
    f_st = 1

    for i, (u, k) in enumerate(zip(rates, cfg.upsample_kernel_sizes)):
        m_in = stage_mask(i)
        m_out = stage_mask(i + 1)
        x = L.snake(x, B._alpha_cl(p["alphas"][str(i)], x.dtype))
        if m_in is not None:
            x = jnp.where(m_in[..., None], x, 0.0)
        rp = int(np.prod(rates[: i + 1]))
        c_cur = c0 // (2 ** (i + 1))
        f_st = 128 // c_cur if (0 < c_cur < 128 and 128 % c_cur == 0) else 1
        nc = p["noise_convs"][str(i)]
        rb0 = p["resblocks"][str(i * n_kernels)]
        on_tpu = jax.default_backend() == "tpu"
        stage_folded = (
            f_st > 1 and n_val is not None and force_sf != "0"
            and L.seqpar_ctx() is None and rp % f_st == 0
            and ((on_tpu and "wfold" in rb0["convs1"]["0"]) or force_sf == "1"))
        sfold_ok = ("wsfold" in nc and force_sf != "0"
                    and L.seqpar_ctx() is None and n_val is not None
                    and (on_tpu or force_sf == "1")
                    and har_source.shape[1] % int(nc["wsfold"].shape[1]) == 0)

        # source injection: strided conv from sample rate to this stage's
        # rate — folded form when the prefolded weight exists
        if sfold_ok:
            x_source = L.conv1d_strided_folded_apply(nc, har_source, x.dtype)
            f_out = nc["wsfold"].shape[2] // c_cur
            if f_out > 1 and not stage_folded:
                x_source = x_source.reshape(b_sz, x_source.shape[1] * f_out,
                                            c_cur)
            elif f_out == 1 and stage_folded:
                x_source = x_source.reshape(b_sz, x_source.shape[1] // f_st,
                                            f_st * c_cur)
        elif i + 1 < n_up:
            stride_f0 = int(np.prod(rates[i + 1:]))
            x_source = L.conv1d_apply(nc, har_source.astype(x.dtype),
                                      stride=stride_f0,
                                      padding=(stride_f0 + 1) // 2)
            if stage_folded:
                x_source = x_source.reshape(b_sz, x_source.shape[1] // f_st,
                                            f_st * c_cur)
        else:
            x_source = L.conv1d_apply(nc, har_source.astype(x.dtype))
            if stage_folded:
                x_source = x_source.reshape(b_sz, x_source.shape[1] // f_st,
                                            f_st * c_cur)
        nv_out = stage_count(i + 1)
        x_source = B.adain_res_block1_apply(
            p["noise_res"][str(i)], x_source, s,
            7 if i + 1 < n_up else 11, (1, 3, 5),
            None if stage_folded else m_out,
            n_valid=nv_out, rate_prod=rp,
            x_folded=f_st if stage_folded else None)
        x = L.conv_transpose1d_apply(p["ups"][str(i)], x, stride=u,
                                     padding=u // 2 + u % 2,
                                     output_padding=u % 2)
        if stage_folded:
            x = x.reshape(b_sz, x.shape[1] // f_st, f_st * c_cur)
        x = x + x_source
        xs = None
        for j in range(n_kernels):
            r = B.adain_res_block1_apply(
                p["resblocks"][str(i * n_kernels + j)], x, s,
                cfg.resblock_kernel_sizes[j],
                tuple(cfg.resblock_dilation_sizes[j]),
                None if stage_folded else m_out,
                n_valid=nv_out, rate_prod=rp,
                x_folded=f_st if stage_folded else None)
            xs = r if xs is None else xs + r
        x = xs / n_kernels
        last = i == n_up - 1
        if stage_folded and not (last and "wfold" in p["conv_post"]):
            x = x.reshape(b_sz, x.shape[1] * f_st, c_cur)
            stage_folded = False

    if stage_folded:
        # conv_post + final snake, still folded: (B, T/f, 128) ->
        # (B, T/f, f) -> (B, T, 1). Valid rows are whole (n_samp = n_val *
        # prod(rates), and prod(rates) % f == 0), so a row-level mask is
        # exact.
        f = f_st
        a_post = jnp.tile(jnp.asarray(p["alphas"][str(n_up)]).reshape(-1),
                          f).reshape(1, 1, -1).astype(x.dtype)
        x = L.snake(x, a_post)
        if n_val is not None:
            rows = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
            n_rows = (n_val * int(np.prod(rates))) // f
            x = jnp.where((rows < n_rows[:, None])[..., None], x, 0.0)
        x = L.conv1d_folded_apply(p["conv_post"], x, f)
        return jnp.tanh(x).reshape(b_sz, x.shape[1] * f, 1)

    x = L.snake(x, B._alpha_cl(p["alphas"][str(n_up)], x.dtype))
    if sample_mask is not None:
        x = jnp.where(sample_mask[..., None], x, 0.0)
    x = L.conv1d_apply(p["conv_post"], x, padding=3)
    return jnp.tanh(x)


def prefold_generator_params(p_dec, cfg: DecoderConfig):
    """Precompute time-folded conv weights for the low-channel HiFi-GAN
    stages (layers.fold_conv1d_weight_np), stored as 'wfold'/'bfold' next
    to each fused conv weight. Host-side, once, at engine init — folding
    in-graph costs more than the folded conv itself.

    No-op for istftnet/vocos (their lowest stage is C>=128) and for
    unfused (training) params."""
    if cfg.type != "hifigan" or "generator" not in p_dec:
        return p_dec
    gen = p_dec["generator"]
    rates = cfg.upsample_rates
    n_up = len(rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    c0 = cfg.upsample_initial_channel

    def prefold_block(bp, kernel_size, dilation, f):
        for di, d in enumerate(dilation):
            si = str(di)
            for convs, dd in (("convs1", d), ("convs2", 1)):
                cp = bp[convs][si]
                if "weight" not in cp:  # weight norm not fused
                    continue
                cp["wfold"] = L.fold_conv1d_weight_np(
                    np.asarray(cp["weight"]), f, dd)
                if "bias" in cp:
                    cp["bfold"] = np.tile(np.asarray(cp["bias"]), f)

    for i in range(n_up):
        c_cur = c0 // (2 ** (i + 1))
        # prefold EVERY stage's noise conv: its input is the (L, 1)
        # sample-rate harmonic source — the worst possible TPU layout (1
        # of 128 lanes) — and folding the source by stride*f_out turns
        # the strided conv into a kernel-3 full-lane conv whose output is
        # already stage-folded (layers.fold_strided_conv1d_weight_np)
        f_out = 128 // c_cur if (c_cur < 128 and 128 % c_cur == 0) else 1
        stride = int(np.prod(rates[i + 1:])) if i + 1 < n_up else 1
        pad = (stride + 1) // 2 if i + 1 < n_up else 0
        ncp = gen["noise_convs"][str(i)]
        if "weight" in ncp and np.asarray(ncp["weight"]).shape[2] <= 2 * stride:
            wsf = L.fold_strided_conv1d_weight_np(
                np.asarray(ncp["weight"]), stride, f_out, pad)
            if wsf is not None:
                ncp["wsfold"] = wsf
                ncp["bsfold"] = np.tile(np.asarray(ncp["bias"]), f_out)
        # fold every under-128-lane stage: the fused Pallas kernel (and the
        # folded XLA fallback at C<=32) run these stages on (T/f, 128)
        # tensors — full MXU lanes AND no 128-lane HBM padding (unfolded
        # (T, 32) bf16 buffers pad 4x in HBM, enough to OOM batch-8
        # long-bucket phase-2 graphs)
        if c_cur >= 128 or 128 % c_cur != 0:
            continue
        f = 128 // c_cur
        nk = 7 if i + 1 < n_up else 11
        prefold_block(gen["noise_res"][str(i)], nk, (1, 3, 5), f)
        for j in range(n_kernels):
            prefold_block(gen["resblocks"][str(i * n_kernels + j)],
                          cfg.resblock_kernel_sizes[j],
                          tuple(cfg.resblock_dilation_sizes[j]), f)
        if i == n_up - 1 and "weight" in gen["conv_post"]:
            # conv_post (C -> 1, k7) folded: (B, T/f, 128) -> (B, T/f, f)
            cp = gen["conv_post"]
            cp["wfold"] = L.fold_conv1d_weight_np(np.asarray(cp["weight"]),
                                                  f, 1)
            cp["bfold"] = np.tile(np.asarray(cp["bias"]), f)
    return p_dec


# ---------------------------------------------------------------------------
# decoder shell (reference hifigan.py:416-475 et al.)
# ---------------------------------------------------------------------------


def decoder_init(key, cfg: DecoderConfig, dim_in: int = 512,
                 style_dim: int = 128):
    keys = jax.random.split(key, 9)
    p = {
        "encode": B.adain_res_blk1d_init(keys[0], dim_in + 2, 1024, style_dim),
        "decode": {
            "0": B.adain_res_blk1d_init(keys[1], 1024 + 2 + 64, 1024, style_dim),
            "1": B.adain_res_blk1d_init(keys[2], 1024 + 2 + 64, 1024, style_dim),
            "2": B.adain_res_blk1d_init(keys[3], 1024 + 2 + 64, 1024, style_dim),
            "3": B.adain_res_blk1d_init(keys[4], 1024 + 2 + 64, 512, style_dim,
                                        upsample=True),
        },
        "F0_conv": L.conv1d_init(keys[5], 1, 1, 3, weight_norm=True),
        "N_conv": L.conv1d_init(keys[6], 1, 1, 3, weight_norm=True),
        "asr_res": {"0": L.conv1d_init(keys[7], dim_in, 64, 1,
                                       weight_norm=True)},
    }
    if cfg.type == "hifigan":
        p["generator"] = hifigan_generator_init(keys[8], cfg, style_dim)
    elif cfg.type == "istftnet":
        from styletts2_tpu.nn.istftnet import istftnet_generator_init
        p["generator"] = istftnet_generator_init(keys[8], cfg, style_dim)
    elif cfg.type == "vocos":
        from styletts2_tpu.nn.vocos import vocos_generator_init
        p["generator"] = vocos_generator_init(keys[8], cfg, style_dim)
    else:
        raise ValueError(f"unknown decoder type {cfg.type!r}")
    return p


def smooth_f0n_train(f0_curve: jnp.ndarray, n: jnp.ndarray, rng):
    """Training-time random box-filter smoothing of F0/N curves
    (reference hifigan.py:447-455): F0 width from {0,3,7}, N from {0,3,7,15}.

    Implemented branch-free: compute all widths, select by the random draw
    (XLA-friendly; one conv per width, all cheap 1-channel convs)."""
    k_f, k_n = jax.random.split(rng)

    def box(x, w):
        kern = jnp.ones((1, 1, w), x.dtype)
        y = jax.lax.conv_general_dilated(
            x[:, :, None], jnp.transpose(kern, (2, 1, 0)), (1,),
            [(w // 2, w // 2)], dimension_numbers=("NHC", "HIO", "NHC"))
        return y[:, : x.shape[1], 0] / w

    f_choices = jnp.stack([f0_curve, box(f0_curve, 3), box(f0_curve, 7)])
    f_idx = jax.random.randint(k_f, (), 0, 3)
    f0_out = f_choices[f_idx]
    n_choices = jnp.stack([n, box(n, 3), box(n, 7), box(n, 15)])
    n_idx = jax.random.randint(k_n, (), 0, 4)
    n_out = n_choices[n_idx]
    return f0_out, n_out


def decoder_apply(p, cfg: DecoderConfig, asr: jnp.ndarray,
                  f0_curve: jnp.ndarray, n: jnp.ndarray, s: jnp.ndarray,
                  rng=None, train: bool = False,
                  frame_mask: Optional[jnp.ndarray] = None,
                  har_source: Optional[jnp.ndarray] = None,
                  seq_mask: Optional[jnp.ndarray] = None,
                  seq_win: Optional[dict] = None) -> jnp.ndarray:
    """Decoder shell (reference hifigan.py:446-475).

    asr: (B, F, 512) aligned text features at the half-mel rate;
    f0_curve, n: (B, 2F) at mel rate; s: (B, style).
    frame_mask: (B, F) valid mask at the asr rate (None = all valid).
    har_source: optional precomputed NSF source (hifigan only — see
    hifigan_generator_apply; used by the sequence-parallel decode).
    seq_mask: optional (B, F) in-sequence mask at the asr rate (vocos
    only — iSTFT overlap-add grid for sequence-parallel windows).
    seq_win: optional istftnet sequence-parallel window descriptor
    (see istftnet_generator_apply).
    Returns wav (B, L, 1)."""
    if rng is None:
        k_smooth = k_gen = None
    else:
        k_smooth, k_gen = jax.random.split(rng)
    if train:
        if k_smooth is None:
            raise ValueError("decoder_apply(train=True) needs an rng")
        f0_curve, n = smooth_f0n_train(f0_curve, n, k_smooth)

    mel_mask = (jnp.repeat(frame_mask, 2, axis=1)
                if frame_mask is not None else None)
    if mel_mask is not None:
        f0_curve = jnp.where(mel_mask, f0_curve, 0.0)
        n = jnp.where(mel_mask, n, 0.0)

    f0 = L.conv1d_apply(p["F0_conv"], f0_curve[..., None], stride=2, padding=1)
    nn_ = L.conv1d_apply(p["N_conv"], n[..., None], stride=2, padding=1)

    # run the shell in asr's dtype: f0_curve/n arrive f32 (the sine source
    # needs f32 pitch), but concatenating f32 curves with a bf16 asr would
    # promote every 1024-channel shell conv to f32 — measured 10x+ slower
    # on v5e than the bf16 MXU path
    f0 = f0.astype(asr.dtype)
    nn_ = nn_.astype(asr.dtype)

    x = jnp.concatenate([asr, f0, nn_], axis=-1)
    x = B.adain_res_blk1d_apply(p["encode"], x, s, mask=frame_mask)

    asr_res = L.conv1d_apply(p["asr_res"]["0"], asr)

    res = True
    for i in range(4):
        if res:
            x = jnp.concatenate([x, asr_res, f0, nn_], axis=-1)
        upsample = (i == 3)
        x = B.adain_res_blk1d_apply(p["decode"][str(i)], x, s,
                                    upsample=upsample, mask=frame_mask,
                                    out_mask=mel_mask if upsample else None)
        if upsample:
            res = False

    if cfg.type != "hifigan" and har_source is not None:
        raise ValueError("har_source passthrough is hifigan-only")
    if cfg.type != "vocos" and seq_mask is not None:
        raise ValueError("seq_mask passthrough is vocos-only")
    if cfg.type != "istftnet" and seq_win is not None:
        raise ValueError("seq_win passthrough is istftnet-only")
    if cfg.type == "hifigan":
        return hifigan_generator_apply(p["generator"], x, s, f0_curve, k_gen,
                                       cfg, mel_mask, har_source=har_source)
    elif cfg.type == "istftnet":
        from styletts2_tpu.nn.istftnet import istftnet_generator_apply
        return istftnet_generator_apply(p["generator"], x, s, f0_curve, k_gen,
                                        cfg, mel_mask, seq_win=seq_win)
    else:
        from styletts2_tpu.nn.vocos import vocos_generator_apply
        mel_seq = (jnp.repeat(seq_mask, 2, axis=1)
                   if seq_mask is not None else None)
        return vocos_generator_apply(p["generator"], x, s, cfg, mel_mask,
                                     seq_mask=mel_seq)
