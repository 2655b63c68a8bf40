"""Sequence-parallel (frame-sharded) vocoder decode over a device mesh.

SURVEY §5 notes the vocoder frame axis is the one place sequence
parallelism is meaningful in this architecture: the reference synthesizes
long-form audio strictly chunk-by-chunk on one device (reference
inference.py:258-270, 303-319); here a single long chunk's decode — the
~95%-of-FLOPs stage — can instead shard its time axis across chips.

Design (TPU-first, exact):

* the decoder inputs (aligned text features at the asr rate, F0/energy
  curves at the mel rate) are sharded along time over a 1-D mesh;
* each device ppermute-fetches a `margin`-asr-frame halo from each
  neighbor. Everything between input and waveform is a conv / elementwise
  op with a finite receptive field, so with margin >= the decoder's total
  receptive field (~17 asr frames for the default config, see
  `decoder_receptive_field`) every core sample is computable exactly from
  the haloed window. Edge devices keep ppermute's zero fill — identical
  to the zero padding the SAME convs see at sequence ends on one device;
* AdaIN instance-norm stats are global over T: each device reduces over
  its CORE region only (halo positions are neighbors' core data — they
  must not be double counted) and the partial sums psum over the mesh
  axis (`layers.seqpar_stats` installs the context);
* the NSF harmonic source's sine phase is a cumsum over the WHOLE
  waveform (reference hifigan.py:117-157): it is computed replicated from
  the all-gathered F0 curve — tiny, 9 harmonics — so the phase is
  bitwise identical to the single-device decode, then the local haloed
  window is sliced out and passed through `decoder_apply(har_source=...)`.

Communication per decode: two ppermutes + one all-gather of the (B, 2F)
F0 curve up front, plus one (B, 1+C)-sized psum pair per AdaIN — all
riding ICI; the activations (~99.9% of the bytes) never move.

Scope: all three reference decoders.

* hifigan (the flagship): replicated NSF source + haloed windows;
* vocos: the iSTFT overlap-add gets the global frame grid via a seq_mask
  (see vocos_generator_apply);
* istftnet: the two grid-global constructs — the center=True
  replicate-padded source STFT (nn/istftnet.py:81-109) and the last
  stage's ReflectionPad1d((1, 0)) +1 frame shift (nn/istftnet.py:108-109,
  reference istftnet.py:538,559) — are handled by computing the source
  STFT replicated (like the hifigan NSF source) and running the last
  stage in reflection-PADDED grid coordinates per window (a `seq_win`
  descriptor carries the sliced source window, the global pad slot, the
  padded-coordinate validity mask, and the global-grid OLA mask; the
  stats core mask claims the one extra grid slot on the last device —
  layers._seqpar_core_mask's rem==1 rule).

F must divide by the device count; padded static buckets pass the
per-row valid prefix as `n_valid` (the frame-sharded equivalent of
`decoder_apply`'s prefix frame_mask — `infer.StyleTTS2(seq_parallel=True)`
routes its phase-2 here this way).

When to turn it on (value statement; UNMEASURED ON REAL MULTI-CHIP
HARDWARE — this environment has one chip, so only the exactness is
verified, on the 8-device virtual CPU mesh in tests/test_seqpar.py):

* It is a LATENCY tool, not a throughput tool. For aggregate
  throughput, chunk-parallel batching (generate_batch / mesh='dp'
  batch sharding) is strictly better: it has zero extra communication
  and no redundant halo compute, so N chips give ~N× throughput.
  Sequence parallelism instead divides ONE chunk's decode wall-clock by
  ~N, which only matters when a single long chunk's latency is the
  product constraint (e.g. first-audio latency on long-form reads with
  no concurrent load).
* Redundant-compute overhead: each device decodes margin extra asr
  frames per neighbor (margin = receptive field, ~17 for the default
  hifigan config). Efficiency ≈ (F/N) / (F/N + 2·margin), so the
  crossover vs running on one chip is roughly F > ~2·margin·N/(N-1)·
  (desired efficiency factor): at N=8, F=448 (the long-chunk bucket)
  each device computes 56 core + up to 34 halo frames → ~62%
  efficient, i.e. ~5× latency reduction on 8 chips. Below F ≈ 150
  frames (~4 s audio) the halo dominates and it is not worth enabling.
* Communication is negligible: two ppermutes of (B, margin-frame)
  activations + one all-gathered (B, 2F) F0 curve + one (B, 1+C) psum
  pair per AdaIN — KB-scale messages riding ICI, ~µs each, against a
  multi-ms decode. The design is compute-overhead-bound, never
  bandwidth-bound.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from styletts2_tpu.config import DecoderConfig
from styletts2_tpu.nn import decoder as DE
from styletts2_tpu.nn import layers as L
from styletts2_tpu.ops import stft as OPS

DEFAULT_MARGIN = 32  # asr frames; ~2x the default config's receptive field


def _shard_map(body, mesh, in_specs, out_specs):
    """jax.shard_map across jax versions: the top-level export with
    check_vma (>= 0.7), the top-level with check_rep, and the
    jax.experimental.shard_map fallback for older releases."""
    sm = getattr(jax, "shard_map", None)
    if sm is None:  # pre-0.8 namespace
        from jax.experimental.shard_map import shard_map as sm
    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return sm(body, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, **kw)
        except TypeError:
            continue
    raise RuntimeError("no compatible shard_map signature found")


def decoder_receptive_field(cfg: DecoderConfig) -> int:
    """Conservative one-sided receptive field of the decoder in asr
    frames — the minimum legal halo margin.

    Shell (asr rate): encode + 4 decode AdainResBlk1d's, k3 convs -> ±2
    each, ±10 total (reference hifigan.py:416-475). Generator in mel
    frames (divided by 2 for asr frames):

    * hifigan: per upsample stage the transposed-conv reach plus the
      widest dilated Snake/AdaIN stack, divided by the stage's cumulative
      upsample rate (reference hifigan.py:26-80, 272-356); the NSF source
      costs no margin (computed globally);
    * istftnet: same stage loop (2 stages), plus the iSTFT head's
      overlap-add reach and the global +1 reflection-pad grid shift
      (reference istftnet.py:494-600);
    * vocos: num_layers dwconv-k7 ConvNeXt blocks plus the iSTFT head's
      overlap-add reach (reference vocos.py:27-69, 190-232)."""
    if cfg.type == "vocos":
        rf_mel = cfg.num_layers * 3.0  # dwconv k7 -> ±3 mel per block
        rf_mel += math.ceil(cfg.gen_istft_n_fft / cfg.gen_istft_hop_size)
        return 10 + math.ceil(rf_mel / 2) + 1
    res_span = max(  # widest dilated stack, identical at every stage
        sum(d * (rk - 1) // 2 + (rk - 1) // 2 for d in rd)
        for rk, rd in zip(cfg.resblock_kernel_sizes,
                          cfg.resblock_dilation_sizes))
    rf_mel = 1.0  # F0/N stride-2 convs + nearest-neighbor F0 upsample
    prod = 1
    rates = cfg.upsample_rates
    for i, (u, k) in enumerate(zip(rates, cfg.upsample_kernel_sizes)):
        rf_mel += math.ceil(k / u) / prod  # transposed conv input reach
        prod *= u
        nk = 7 if i + 1 < len(rates) else 11  # noise_res kernel (decoder.py)
        noise_span = sum(d * (nk - 1) // 2 + (nk - 1) // 2 for d in (1, 3, 5))
        # resblocks are averaged, not chained: take the widest branch
        rf_mel += max(res_span, noise_span) / prod
    # conv_post k7 at the final frame rate (sample rate for hifigan)
    rf_mel += math.ceil(7 / 2) / prod
    if cfg.type == "istftnet":
        # iSTFT overlap-add reach + the global +1 reflection-pad shift,
        # both at the final frame rate (prod frames per mel frame)
        rf_mel += (math.ceil(cfg.gen_istft_n_fft / cfg.gen_istft_hop_size)
                   + 1) / prod
    return 10 + math.ceil(rf_mel / 2) + 1


def _halo(x: jnp.ndarray, margin: int, axis: str, n_dev: int) -> jnp.ndarray:
    """Concatenate each neighbor's `margin`-wide time edge onto x (axis 1).

    Devices with no neighbor keep ppermute's zero fill — exactly the zero
    padding a single-device SAME conv sees at the sequence ends."""
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]
    from_left = jax.lax.ppermute(x[:, -margin:], axis, fwd)
    from_right = jax.lax.ppermute(x[:, :margin], axis, bwd)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def sp_decoder_apply(mesh: Mesh, p_dec, cfg: DecoderConfig,
                     asr: jnp.ndarray, f0: jnp.ndarray, n: jnp.ndarray,
                     s: jnp.ndarray, *, margin: int = DEFAULT_MARGIN,
                     axis: Optional[str] = None,
                     n_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Frame-sharded `decoder_apply` over `mesh` — same waveform as the
    single-device call (up to f32 psum-association rounding in the norm
    stats), computed with the time axis split across devices.

    asr: (B, F, 512) at the asr rate with F % n_dev == 0; f0, n: (B, 2F)
    at the mel rate; s: (B, style). Inference-only (deterministic source,
    no dropout). n_valid: optional (B,) per-row valid asr-frame prefix for
    padded static buckets — equivalent to `decoder_apply`'s prefix
    frame_mask (samples past it come back zeroed). Returns
    wav (B, F * 2 * prod(rates), 1), sharded on time.
    """
    if cfg.type not in ("hifigan", "istftnet", "vocos"):
        raise ValueError(f"unknown decoder type {cfg.type!r}")
    axis = axis or mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    b, f_total, _ = asr.shape
    if f_total % n_dev:
        raise ValueError(f"F={f_total} not divisible by {n_dev} devices")
    core = f_total // n_dev
    need = decoder_receptive_field(cfg)
    if margin < need:
        raise ValueError(f"margin {margin} < receptive field bound {need}")
    if margin > core:
        raise ValueError(f"margin {margin} > per-device frames {core}; "
                         "use fewer devices or longer input")
    total_up = {  # samples per MEL frame
        "hifigan": int(np.prod(cfg.upsample_rates)),
        "istftnet": int(np.prod(cfg.upsample_rates)) * cfg.gen_istft_hop_size,
        "vocos": cfg.gen_istft_hop_size,
    }[cfg.type]
    spa = 2 * total_up  # samples per asr frame (mel = 2x asr rate)

    def body(p, asr_l, f0_l, n_l, s_l, nv):
        asr_w = _halo(asr_l, margin, axis, n_dev)
        f0_w = _halo(f0_l, 2 * margin, axis, n_dev)
        n_w = _halo(n_l, 2 * margin, axis, n_dev)

        limit = nv  # per-row valid asr-frame limit (== F when unpadded)
        idx = jax.lax.axis_index(axis)

        har_w = None
        har_src = None
        if cfg.type in ("hifigan", "istftnet"):
            # replicated NSF source from the full F0 curve: the sine phase
            # cumsum stays bitwise identical to the single-device decode.
            # Zero F0 past the valid prefix first — decoder_apply does the
            # same via mel_mask before its internal source computation
            f0_g = jax.lax.all_gather(f0_l, axis, axis=1,
                                      tiled=True)  # (B, 2F)
            f0_g = jnp.where(
                jnp.arange(f0_g.shape[1])[None, :] < 2 * limit[:, None],
                f0_g, 0.0)
            f0_up = OPS.interpolate_nearest(f0_g[:, None, :], total_up)
            har_src, _ = DE.source_module_apply(
                p["generator"]["m_source"], jnp.swapaxes(f0_up, 1, 2), None,
                total_up)  # (B, 2F * total_up, 1)
        if cfg.type == "hifigan":
            har_pad = jnp.pad(har_src,
                              ((0, 0), (margin * spa, margin * spa), (0, 0)))
            har_w = jax.lax.dynamic_slice_in_dim(
                har_pad, idx * (core * spa), (core + 2 * margin) * spa,
                axis=1)

        # global-validity mask over the haloed window: the zero-filled
        # outer margins of the edge devices must read as zeros at EVERY
        # conv input (the single-device SAME convs re-pad with fresh zeros
        # at each layer, but AdaIN's beta re-populates them) — the decoder
        # re-zeroes masked positions after each norm, which reproduces the
        # single-device edge behavior exactly. Interior devices of an
        # unpadded decode see an all-true mask, i.e. the unmasked math.
        gpos = idx * core - margin + jnp.arange(core + 2 * margin)
        frame_mask = (gpos[None, :] >= 0) & (gpos[None, :] < limit[:, None])

        # vocos only: the iSTFT overlap-add must see exactly the global
        # frame grid — window slots outside [0, F) contribute neither
        # audio nor envelope (invalid-but-in-sequence pad slots keep
        # contributing, matching the single-device padded-bucket math)
        seq_mask = None
        if cfg.type == "vocos":
            in_seq = (gpos >= 0) & (gpos < f_total)
            seq_mask = jnp.broadcast_to(in_seq[None, :],
                                        (asr_l.shape[0], in_seq.shape[0]))

        # istftnet only: replicated harmonic-source STFT (the sine phase
        # cumsum AND the center=True replicate-padded STFT are global
        # computations) sliced to this window, plus the window descriptor
        # for the generator's global reflection-pad grid (see
        # istftnet_generator_apply's seq_win docstring)
        seq_win = None
        if cfg.type == "istftnet":
            n_fft = cfg.gen_istft_n_fft
            hop = cfg.gen_istft_hop_size
            fr = spa // hop  # last-stage frames per asr frame
            har_sig = jax.lax.stop_gradient(har_src[..., 0])  # (B, L)
            sp_mag, sp_ph = OPS.stft_mag_phase(
                har_sig, n_fft, hop, n_fft, center=True,
                pad_mode="replicate")
            har_g = jnp.swapaxes(jnp.concatenate([sp_mag, sp_ph], axis=1),
                                 1, 2)  # (B, fr*F + 1, n_fft+2)
            har_pad = jnp.pad(har_g,
                              ((0, 0), (margin * fr, margin * fr), (0, 0)))
            har_w = jax.lax.dynamic_slice_in_dim(
                har_pad, idx * (core * fr),
                (core + 2 * margin) * fr + 1, axis=1)
            # reflection-PADDED grid coordinate of each last-stage window
            # slot: the window covers [fr*a, fr*b + 1) where [a, b) is the
            # haloed asr window
            ppos = (idx * core - margin) * fr + jnp.arange(har_w.shape[1])
            seq_win = {
                "har": har_w,
                "pad0": ppos == 0,
                "grid": (ppos >= 0) & (ppos <= fr * f_total),
                "mask_pad": jnp.where(
                    ppos[None, :] == 0, (limit > 0)[:, None],
                    (ppos[None, :] >= 1)
                    & (ppos[None, :] - 1 < fr * limit[:, None])),
            }

        ctx = L.SeqParCtx(axis=axis, t_base=core + 2 * margin,
                          lo=margin, hi=margin + core, n_dev=n_dev)
        with L.seqpar_stats(ctx):
            wav_w = DE.decoder_apply(p, cfg, asr_w, f0_w, n_w, s_l,
                                     rng=None, train=False,
                                     frame_mask=frame_mask,
                                     har_source=har_w
                                     if cfg.type == "hifigan" else None,
                                     seq_mask=seq_mask, seq_win=seq_win)
        return wav_w[:, margin * spa: (margin + core) * spa]

    nv = (jnp.full((b,), f_total, jnp.int32) if n_valid is None
          else jnp.asarray(n_valid, jnp.int32))
    fn = _shard_map(
        body, mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis), P(None, axis),
                  P(), P()),
        out_specs=P(None, axis, None))
    return fn(p_dec, asr, f0, n, s, nv)
