"""Inference engine: the user-facing StyleTTS2 API, TPU-bucketed.

API parity with the reference engine (inference.py:62-319):
  StyleTTS2(config_path, models_path)
  .get_styles(speaker, denoise, avg_style, load_styles) -> style dict
  .generate(phonem, style, stabilize, n_merge) -> np.ndarray waveform
  .save_styles / .load_styles

TPU-first redesign of the execution:
* two jitted phases per chunk — phase 1 (text encode + duration) on a
  static token bucket; phase 2 (alignment + F0/N + vocoder) on a static
  frame bucket — so arbitrary sentence lengths hit a small set of compiled
  graphs instead of recompiling (the data-dependent total-frame count from
  duration rounding lives between the two phases, on host, as a scalar);
* short single-chunk calls (stabilize=True or False) take a FUSED
  single-dispatch graph instead (durations postprocessed on device —
  incl. the stabilization blend, noise supplied by the host RNG — frame
  bucket chosen by host heuristic, 2-phase fallback on overflow) — one
  host sync per utterance instead of two (see _fused_impl);
* the hard alignment is the vectorized cumsum/position-mask build
  (ops/align.py) instead of the reference's python loop (inference.py:258-263);
* style computation batches the 3-second windows of a reference clip into
  one styleencoder call (the reference loops sequentially,
  inference.py:195-217);
* weight norm is pre-fused; the vocoder can run in bfloat16.

Behavioral deviations (documented):
* reference-audio lengths are truncated to 1 s granularity for style
  computation (static shapes); the reference uses exact lengths;
* denoise uses the in-repo spectral gate (audio.spectral_gate_denoise),
  implementing the same stationary noisereduce algorithm the reference
  blends in by default (inference.py:190-192);
* a chunk whose frames exceed the largest compiled bucket is split at a
  token boundary (no rate change) instead of synthesized in one dynamic
  graph.
"""

from __future__ import annotations

import bisect
import warnings
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu import audio as AUD
from styletts2_tpu.checkpoint import apply_checkpoint, load_checkpoint
from styletts2_tpu.config import Config, load_config
from styletts2_tpu.convert import fuse_weight_norm
from styletts2_tpu.models import INFERENCE_MODULES, build_model
from styletts2_tpu.nn import decoder as DE
from styletts2_tpu.nn import layers as L
from styletts2_tpu.nn import predictor as PR
from styletts2_tpu.nn import style_encoder as SE
from styletts2_tpu.nn import text_encoder as TE
from styletts2_tpu.ops import align as ALN
from styletts2_tpu.ops import stft as OPS
from styletts2_tpu.text import TextCleaner, build_symbol_dict, \
    split_into_chunks, tokens_for_sentence


def _bucket(buckets, n: int) -> int:
    i = bisect.bisect_left(buckets, n)
    if i == len(buckets):
        raise ValueError(f"length {n} exceeds the largest bucket {buckets[-1]}")
    return buckets[i]


def _device_postprocess_durations(duration: jnp.ndarray, mask: jnp.ndarray,
                                  speed: jnp.ndarray, fixed_flag: jnp.ndarray,
                                  fixed_value: jnp.ndarray,
                                  dur_scale: jnp.ndarray,
                                  t: jnp.ndarray,
                                  prev_mean: jnp.ndarray,
                                  noise: jnp.ndarray
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device mirror of StyleTTS2._postprocess_durations: fixed/scaled
    durations, the stochastic rate-stabilization blend (t > 0; reference
    inference.py:248-252 — the caller supplies the standard-normal draws
    in `noise` so the host RNG stream stays the single source of
    randomness), z-score outlier clamp on duration[1:-2] (reference
    inference.py:134-148, 253), speed divide, round, min-1 clamp.

    All vectorized over the padded token bucket so it lives INSIDE the
    fused synthesis graph — the host never has to see the durations.
    duration/mask/noise: (B, Tb); the scalars are traced (no recompilation
    per value). t is the blend weight (0 disables, making `noise` inert);
    prev_mean is the previous chunk's duration mean (0 = none -> blend
    toward this chunk's own mean, like the host glue).
    Returns (pred_dur int32 (B, Tb), total int32 (B,)).

    Equality with the host glue is exact on every tested input, but not
    formally guaranteed: the masked full-row reductions here (f32) and
    numpy's contiguous-slice mean/std (f64 in the blend path) can differ
    by ulps, which could flip a duration sitting exactly on the |z|=3 or
    .5-rounding boundary (the caller's overflow fallback keeps any such
    flip harmless — the audio would differ by one frame's worth at most,
    never crash)."""
    n_valid = mask.sum(axis=1)
    duration = jnp.where(fixed_flag > 0, fixed_value, duration * dur_scale)
    duration = jnp.where(mask, duration, 0.0)
    # stochastic rate stabilization (reference inference.py:248-252):
    # dur_stats ~ N(prev_mean or mean, std) = mean + std * noise, blended
    # with weight t. Host glue order: fixed/scale -> blend -> clamp -> speed
    nv = jnp.maximum(n_valid, 1)
    mean_all = duration.sum(axis=1) / nv
    var_all = jnp.where(mask, (duration - mean_all[:, None]) ** 2,
                        0.0).sum(axis=1) / nv  # ddof=0 (numpy .std())
    std_all = jnp.sqrt(var_all)
    blend_mean = jnp.where(prev_mean != 0.0, prev_mean, mean_all)
    dur_stats = blend_mean[:, None] + std_all[:, None] * noise
    duration = jnp.where(mask, duration * (1.0 - t) + dur_stats * t, 0.0)
    # inner region duration[1:-2] of the VALID prefix: indices 1..n_valid-3
    idx = jnp.arange(duration.shape[1])[None, :]
    inner = mask & (idx >= 1) & (idx <= (n_valid - 3)[:, None])
    n_in = inner.sum(axis=1)
    mean = (jnp.where(inner, duration, 0.0).sum(axis=1)
            / jnp.maximum(n_in, 1))
    var = (jnp.where(inner, (duration - mean[:, None]) ** 2, 0.0).sum(axis=1)
           / jnp.maximum(n_in - 1, 1))  # ddof=1 (torch/numpy .std())
    std = jnp.sqrt(var)
    z = (duration - mean[:, None]) / jnp.where(std > 0, std, 1.0)[:, None]
    clamp = (inner & (jnp.abs(z) > 3.0)
             & ((std > 0) & (n_in >= 2))[:, None])
    repl = (mean[:, None]
            + jnp.sign(duration - mean[:, None]) * (3.0 * std * 0.95)[:, None])
    duration = jnp.where(clamp, repl, duration)
    duration = duration / jnp.clip(speed, 1e-4, 2.0)
    pred = jnp.clip(jnp.round(duration), 1, None).astype(jnp.int32)
    pred = jnp.where(mask, pred, 0)
    return pred, pred.sum(axis=1)


def _partition_exact(idxs, sizes, pad_tail: bool = False):
    """Split a work list into groups whose lengths are exactly compiled
    batch sizes (descending greedy over `sizes`, e.g. 6 -> [4, 2]).

    Padding a group of 6 chunks up to a compiled batch of 8 wastes 33% of
    vocoder compute; one extra dispatch (~35 ms) is far cheaper than one
    wasted multi-second batch row.

    pad_tail: when the compiled sizes don't include 1 (mesh mode: every
    batch is a multiple of the device count), a remainder smaller than the
    smallest size is emitted as a final short group for the caller to pad —
    all other groups are still exact."""
    out = []
    pos = 0
    remaining = len(idxs)
    smallest = min(sizes)
    while remaining >= smallest:
        take = next(s for s in sorted(sizes, reverse=True) if s <= remaining)
        out.append(idxs[pos: pos + take])
        pos += take
        remaining -= take
    if remaining > 0:
        if not pad_tail:
            raise ValueError(
                f"cannot partition {len(idxs)} into sizes {sizes}")
        out.append(idxs[pos:])
    return out


class StyleTTS2:
    """Zero-shot TTS engine (reference inference.StyleTTS2)."""

    def __init__(self, config, models_path: Optional[str] = None, *,
                 params: Optional[Dict[str, Any]] = None, seed: int = 0,
                 decoder_dtype: Optional[str] = None, mesh=None,
                 seq_parallel: bool = False):
        """mesh: optional 1-D jax.sharding.Mesh (axis 'dp') — phase graphs
        are then batch-sharded over its devices (multi-chip serving:
        chunk batches from generate_batch/_synthesize_chunks spread over
        ICI; XLA partitions the per-row vocoder compute). mesh=None (the
        default) is the single-chip path with exact-size batch groups.

        seq_parallel (requires mesh; all three decoders): shard the
        vocoder's FRAME axis over the mesh instead of the batch axis
        (parallel/seqpar.py) — single-stream latency scaling for long
        chunks. Batching behaves like the single-chip path (inputs
        replicated); phase-2 decodes a frame bucket sequence-parallel only
        when it is BOTH divisible by the device count AND >= n_dev *
        margin, falling back to the single-device graph otherwise (a
        warning at init lists the buckets that will fall back — tune
        tpu.frame_buckets to multiples of n_dev to cover them)."""
        from styletts2_tpu.cache import enable_compilation_cache

        enable_compilation_cache()
        self.cfg: Config = (config if isinstance(config, Config)
                            else load_config(config))
        mp = self.cfg.model_params
        self.symbol_dict = build_symbol_dict(self.cfg.symbol)
        self.cleaner = TextCleaner(self.symbol_dict, debug=self.cfg.debug)
        self.sr = self.cfg.preprocess_params.sr
        self.hop = self.cfg.preprocess_params.spect_params.hop_length
        self.ref_s = None
        self._rng = np.random.default_rng(seed)
        # when set, every token gets exactly this many frames (bypasses the
        # duration predictor's output) — deterministic latency for
        # benchmarking and load testing
        self.fixed_duration: Optional[int] = None
        # observed frames/token (EMA over synthesized chunks): sizes the
        # fused path's frame bucket to the actual speaking rate instead of
        # a worst-case constant (see _generate_fused)
        self._fpt_ema: Optional[float] = None
        # global multiplier on the duration head's raw output (applied
        # before stabilization/speed). A rate trim on real weights; with
        # random weights it lets benchmarks exercise the FULL duration path
        # (phase-1 -> host glue -> phase-2) at a realistic frames/token
        self.duration_scale: Optional[float] = None
        # chunk-batching: same-bucket chunks share one phase-1/phase-2 call;
        # batch sizes are padded to these compiled sizes
        self.mesh = mesh
        self.seq_parallel = bool(seq_parallel)
        if self.seq_parallel:
            if mesh is None:
                raise ValueError("seq_parallel requires a mesh")
            from styletts2_tpu.parallel import seqpar as SP
            self._sp_margin = max(SP.DEFAULT_MARGIN,
                                  SP.decoder_receptive_field(mp.decoder))
            self._sp_ndev = int(np.prod(mesh.devices.shape))
            skipped = [fb for fb in self.cfg.tpu.frame_buckets
                       if fb % self._sp_ndev != 0
                       or fb // self._sp_ndev < self._sp_margin]
            if skipped:
                warnings.warn(
                    f"seq_parallel: frame buckets {skipped} are not "
                    f"divisible by the {self._sp_ndev}-device mesh (or are "
                    f"< n_dev * margin {self._sp_ndev * self._sp_margin}) "
                    "and will decode single-device; set tpu.frame_buckets "
                    f"to multiples of {self._sp_ndev} to cover them")
        if mesh is not None and not self.seq_parallel:
            n_dev = int(np.prod(mesh.devices.shape))
            # batch dims must divide evenly over the mesh
            self.batch_buckets = (n_dev, 2 * n_dev, 4 * n_dev)
        else:
            # single-chip batching; under seq_parallel the inputs stay
            # replicated (the decode shards TIME, not batch)
            self.batch_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16)
        self.max_batch: int = self.batch_buckets[-1]

        if params is None:
            fresh = build_model(jax.random.PRNGKey(seed), mp)
            fresh = {k: fresh[k] for k in INFERENCE_MODULES}
            if models_path:
                state = load_checkpoint(models_path)
                state["net"] = {k: v for k, v in state["net"].items()
                                if k in INFERENCE_MODULES}
                params = apply_checkpoint(fresh, state)
            else:
                params = fresh  # random weights (benching / smoke tests)
        params = {k: params[k] for k in INFERENCE_MODULES}
        params = fuse_weight_norm(params)
        # precompute time-folded conv weights for the low-channel vocoder
        # stages (free-reshape space-to-depth; see nn/blocks.py)
        params["decoder"] = DE.prefold_generator_params(
            params["decoder"], mp.decoder)
        # one bulk host->device transfer (per-tensor transfers over a
        # tunneled TPU cost minutes)
        params = jax.device_put(params)

        self.dtype = jnp.bfloat16 if (decoder_dtype or
                                      self.cfg.tpu.decoder_dtype) == "bfloat16" \
            else jnp.float32
        self.params = params

        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            # replicate params; batch inputs get device_put onto the data
            # sharding at call sites (_put_data) and GSPMD partitions the
            # phase graphs — the jitted functions are the same objects as
            # the single-chip path
            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
            if not self.seq_parallel:
                self._data_sharding = NamedSharding(mesh,
                                                    P(mesh.axis_names[0]))
        self._phase1 = jax.jit(self._phase1_impl)
        self._phase2 = jax.jit(self._phase2_impl, static_argnames=("n_frames",))
        self._fused = jax.jit(self._fused_impl, static_argnames=("n_frames",))
        self._style_fn = jax.jit(self._style_impl)
        # single-dispatch path for short single-chunk stabilize=False calls
        # (see _fused_impl); disable to force the 2-phase path everywhere
        self.fused_enabled: bool = True
        # "sync": a cold fused (token, frame)-bucket pair compiles inline on
        # the request (the default; deterministic). "async": cold pairs
        # compile on a background thread while the request is served by the
        # already-warm 2-phase graphs — no request ever blocks on an XLA
        # compile (serving mode; tools/serve_http.py enables it)
        self.fused_compile: str = "sync"
        self._fused_ready: set = set()
        self._fused_pending: set = set()
        self._fused_queue = None
        self._fused_thread = None

    def _put_data(self, x):
        """Batch-shard an input over the mesh (no-op without a mesh)."""
        x = jnp.asarray(x)
        if self._data_sharding is None:
            return x
        return jax.device_put(x, self._data_sharding)

    def _put_replicated(self, x):
        """Replicate a (1, D)-style conditioning input over the mesh
        (no-op without a mesh)."""
        x = jnp.asarray(x)
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    # ------------------------------------------------------------------
    # jitted graphs
    # ------------------------------------------------------------------

    def _style_impl(self, params, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) waveform -> (B, style_dim)."""
        mel = OPS.preprocess_wave(wav, sr=self.sr,
                                  n_fft=self.cfg.preprocess_params.spect_params.n_fft,
                                  win_length=self.cfg.preprocess_params.spect_params.win_length,
                                  hop_length=self.hop,
                                  n_mels=self.cfg.model_params.n_mels)
        return SE.apply(params["style_encoder"], mel)

    def _phase1_impl(self, params, tokens, mask, s):
        """tokens (B, Tb) -> (t_en, d, durations). reference inference.py:239-246.

        s may be (1, D): broadcast to the batch IN-GRAPH — an eager
        broadcast_to before the call is a ~28 ms blocking round trip per
        group on a tunneled chip."""
        if s.shape[0] == 1 and tokens.shape[0] != 1:
            s = jnp.broadcast_to(s, (tokens.shape[0],) + s.shape[1:])
        t_en = TE.apply(params["text_encoder"], tokens, mask)
        d = PR.encode_duration(params["predictor"], t_en, s, mask)
        dur_logits = PR.duration_head(params["predictor"], d, mask)
        duration = jax.nn.sigmoid(dur_logits).sum(axis=-1)
        duration = jnp.where(mask, duration, 0.0)
        return t_en, d, duration

    def _phase2_impl(self, params, t_en, d, s, durs, n_frames: int):
        """durations -> alignment -> F0/N -> vocoder. reference
        inference.py:258-270. s may be (1, D) — broadcast in-graph."""
        if s.shape[0] == 1 and t_en.shape[0] != 1:
            s = jnp.broadcast_to(s, (t_en.shape[0],) + s.shape[1:])
        align = ALN.build_alignment(durs, n_frames)  # (B, Tb, Fb)
        total = durs.sum(axis=1)
        frame_mask = jnp.arange(n_frames)[None, :] < total[:, None]
        mel_mask = jnp.repeat(frame_mask, 2, axis=1)

        align_t = jnp.swapaxes(align, 1, 2)  # (B, Fb, Tb)
        en = jnp.matmul(align_t, d, precision=L._prec(d))
        f0, n_en = PR.f0n_train(params["predictor"], en, s,
                                mask=frame_mask, out_mask=mel_mask)
        asr = jnp.matmul(align_t, t_en, precision=L._prec(t_en))

        dt = self.dtype
        if (self.seq_parallel and n_frames % self._sp_ndev == 0
                and n_frames // self._sp_ndev >= self._sp_margin):
            from styletts2_tpu.parallel.seqpar import sp_decoder_apply
            wav = sp_decoder_apply(self.mesh, params["decoder"],
                                   self.cfg.model_params.decoder,
                                   asr.astype(dt), f0.astype(jnp.float32),
                                   n_en.astype(jnp.float32), s.astype(dt),
                                   margin=self._sp_margin,
                                   n_valid=total)
        else:
            wav = DE.decoder_apply(params["decoder"],
                                   self.cfg.model_params.decoder,
                                   asr.astype(dt), f0.astype(jnp.float32),
                                   n_en.astype(jnp.float32), s.astype(dt),
                                   rng=None, train=False,
                                   frame_mask=frame_mask)
        # ship int16 PCM to the host: half the bytes of f32 over the
        # interconnect, and the audio is headed for 16-bit output anyway
        pcm = jnp.clip(wav[..., 0].astype(jnp.float32), -1.0, 1.0) * 32767.0
        return pcm.astype(jnp.int16)

    def _fused_impl(self, params, tokens, mask, s, scal, noise,
                    n_frames: int):
        """Single-dispatch synthesis: tokens -> (pcm, total_frames) in ONE
        graph, durations postprocessed on device — the short-utterance
        latency path. The 2-phase split exists because the total frame
        count is data-dependent; here the frame bucket is chosen by a host
        heuristic instead, and the caller falls back to the exact 2-phase
        path when total overflows it. Cuts the per-utterance host syncs
        from two (durations, audio) to one (audio+total, fetched
        concurrently) — on a remote-tunneled chip each sync is a full
        round trip, and even locally it halves dispatch overhead.
        (The reference's ONNX export is the same single-graph formulation,
        inference_onnx.py:221-262.)

        scal: (6,) f32 [speed, fixed_flag, fixed_value, dur_scale, t,
        prev_mean] — packed so the host ships ONE array instead of six
        scalar transfers (each a blocking round trip on a tunneled chip;
        the caller bulk-device_puts tokens/mask/noise/scal together)."""
        t_en, d, duration = self._phase1_impl(params, tokens, mask, s)
        pred_dur, total = _device_postprocess_durations(
            duration, mask, scal[0], scal[1], scal[2], scal[3],
            scal[4], scal[5], noise)
        pcm = self._phase2_impl(params, t_en, d, s, pred_dur, n_frames)
        return pcm, total

    # ------------------------------------------------------------------
    # style computation (reference inference.py:176-222, 274-301)
    # ------------------------------------------------------------------

    def compute_style(self, path_or_wave, denoise: float = 0.3,
                      split_dur: int = 3) -> jnp.ndarray:
        denoise = min(denoise, 1.0)
        if split_dur != 0:
            split_dur = max(int(split_dur), 1)
        sr = self.sr
        max_samples = sr * 20  # cap 20 s (inference.py:180)

        if isinstance(path_or_wave, str):
            wave, in_sr = AUD.read_wav(path_or_wave)
            wave = AUD.resample(wave, in_sr, sr)
        else:
            wave = np.asarray(path_or_wave, dtype=np.float32)
        audio, _ = AUD.trim_silence(wave, top_db=30)
        if len(audio) > max_samples:
            audio = audio[:max_samples]
        if denoise > 0.0:
            audio = AUD.maybe_denoise(audio, sr, denoise)

        if split_dur > 0 and len(audio) / sr >= 4:
            jump = sr * split_dur
            n_full = len(audio) // jump
            chunks = audio[: n_full * jump].reshape(n_full, jump)
            styles = self._style_fn(self.params, jnp.asarray(chunks))
            ref_s = styles.sum(axis=0, keepdims=True)
            count = n_full
            left = len(audio) - n_full * jump
            if left >= sr:  # leftover >= 1 s counts (inference.py:207-212)
                secs = left // sr
                tail = audio[n_full * jump: n_full * jump + secs * sr]
                ref_s = ref_s + self._style_fn(self.params,
                                               jnp.asarray(tail[None]))
                count += 1
            return ref_s / count
        secs = max(1, len(audio) // sr)
        return self._style_fn(self.params,
                              jnp.asarray(audio[: secs * sr][None]))

    def get_styles(self, speaker: Dict[str, Any], denoise: float = 0.3,
                   avg_style: bool = True, load_styles: bool = False
                   ) -> Dict[str, Any]:
        if not load_styles:
            split_dur = 3 if avg_style else 0
            self.ref_s = self.compute_style(speaker["path"], denoise,
                                            split_dur)
        elif self.ref_s is None:
            raise RuntimeError("Have to compute or load the styles first!")
        return {"style": self.ref_s, "path": speaker.get("path"),
                "speed": speaker.get("speed", 1.0)}

    def save_styles(self, save_path: str) -> None:
        if self.ref_s is None:
            raise RuntimeError("Have to compute the styles before saving.")
        np.save(save_path, np.asarray(self.ref_s))
        print("Saved styles!")

    def load_styles(self, save_path: str) -> None:
        self.ref_s = jnp.asarray(np.load(save_path))
        print("Loaded styles!")

    # ------------------------------------------------------------------
    # synthesis (reference inference.py:224-272, 303-319)
    # ------------------------------------------------------------------

    @staticmethod
    def _replace_outliers_zscore(x: np.ndarray, threshold: float = 3.0,
                                 factor: float = 0.95) -> np.ndarray:
        """reference inference.py:134-148 (torch .std() is unbiased ->
        ddof=1)."""
        if len(x) < 2:
            return x
        mean, std = x.mean(), x.std(ddof=1)
        if std == 0:
            return x
        z = (x - mean) / std
        out = np.abs(z) > threshold
        sign = np.sign(x - mean)
        repl = mean + sign * (threshold * std * factor)
        y = x.copy()
        y[out] = repl[out]
        return y

    def _postprocess_durations(self, duration: np.ndarray, speed: float,
                               prev_d_mean: float, t: float,
                               rng: Optional[np.random.Generator] = None
                               ) -> Tuple[np.ndarray, int, float]:
        """Host duration glue: stabilization blend, outlier clamp, speed,
        rounding (reference inference.py:248-263)."""
        if self.fixed_duration is not None:
            duration = np.full(len(duration), float(self.fixed_duration),
                               np.float32)
            t = 0.0
        elif self.duration_scale is not None:
            duration = duration * self.duration_scale
        if t > 0:  # stochastic rate stabilization (inference.py:248-252)
            mean = prev_d_mean if prev_d_mean != 0 else duration.mean()
            dur_stats = (rng if rng is not None else self._rng).normal(
                mean, duration.std(), size=duration.shape)
            duration = duration * (1 - t) + dur_stats * t
        duration = np.array(duration)
        duration[1:-2] = self._replace_outliers_zscore(duration[1:-2])
        duration = duration / min(max(speed, 1e-4), 2.0)
        new_d_mean = float(duration.mean())

        pred_dur = np.clip(np.round(duration), 1, None).astype(np.int32)
        max_frames = self.cfg.tpu.frame_buckets[-1]
        if pred_dur.max(initial=0) > max_frames:
            # a SINGLE token asking for more frames than the largest bucket
            # cannot be split at a token boundary — clamp it (last resort;
            # in practice only reachable with absurd speed values)
            pred_dur = np.minimum(pred_dur, max_frames)
        total = int(pred_dur.sum())
        return pred_dur, total, new_d_mean

    @staticmethod
    def _split_spans(pred_dur: np.ndarray, max_frames: int
                     ) -> List[Tuple[int, int]]:
        """Split a chunk's tokens into contiguous spans whose duration sums
        each fit the largest compiled frame bucket. Replaces the old
        proportional duration compression (which silently sped up speech);
        splitting keeps every token's duration intact — the synthesized
        length equals the unsplit durations' sum exactly. (The reference has
        no frame limit — dynamic shapes, inference.py:258-263; the only
        artifact of a split is a vocoder seam at one token boundary.)"""
        total = int(pred_dur.sum())
        if total <= max_frames:
            return [(0, len(pred_dur))]
        spans: List[Tuple[int, int]] = []
        a = 0
        acc = 0
        for i, d in enumerate(pred_dur):
            if acc + int(d) > max_frames:
                spans.append((a, i))
                a, acc = i, 0
            acc += int(d)
        spans.append((a, len(pred_dur)))
        return spans

    def _synthesize_chunk(self, sentence: str, ref_s, speed: float = 1.0,
                          prev_d_mean: float = 0.0, t: float = 0.1
                          ) -> Tuple[np.ndarray, float]:
        """Single-chunk synthesis (reference inference.py:224-272)."""
        wavs, means, _ = self._synthesize_chunks([sentence], ref_s, speed,
                                                 prev_d_mean, t)
        return wavs[0], means[-1]

    def _synthesize_chunks(self, sentences: List[str], ref_s,
                           speed: float, prev_d_mean: float, t: float,
                           chain_of: Optional[List[int]] = None,
                           base_seed: Optional[int] = None
                           ) -> Tuple[List[np.ndarray], List[float],
                                      List[int]]:
        """Pipelined multi-chunk synthesis; see _synthesize_plan."""
        wav_parts_of, means, origin = self._synthesize_plan(
            sentences, ref_s, speed, prev_d_mean, t, chain_of,
            base_seed=base_seed)
        return self._fetch_all(wav_parts_of), means, origin

    def _synthesize_plan(self, sentences: List[str], ref_s,
                         speed: float, prev_d_mean: float, t: float,
                         chain_of: Optional[List[int]] = None,
                         base_seed: Optional[int] = None):
        """Dispatch the full synthesis pipeline WITHOUT fetching audio.

        All phase-1 calls are dispatched asynchronously, durations come back
        in one host sync (the sequential rate-stabilization chain is
        host-side anyway), then all phase-2 calls are dispatched before any
        waveform is fetched — so the TPU queue never drains while the host
        does duration glue. Results are identical to the reference's
        sequential per-sentence loop (inference.py:303-319).

        chain_of: optional per-input-sentence chain id; the stochastic
        rate-stabilization mean AND its noise stream chain only WITHIN a
        chain (used by generate_batch so independent texts don't couple).
        base_seed: reuse a seed the caller already drew from the engine RNG
        (the fused path's fallback — keeps one draw per synthesis).
        Returns (wav_parts_of, means, origin): wav_parts_of[i] is chunk i's
        ordered list of (device_batch, row, n_frames) pieces (frame-bucket
        overflow splits a chunk into several phase-2 pieces); origin[i] is
        the input sentence index chunk i came from (token-bucket overflow
        splitting can grow the chunk list).

        Split into two stages so multi-batch callers (serve) can overlap
        across batches: _plan_phase1 tokenizes and dispatches the phase-1
        graphs; _plan_finish syncs durations and dispatches phase-2. The
        duration sync waits for this plan's phase-1 to clear the device
        queue — i.e. behind any previously dispatched phase-2 work — so
        dispatching batch i+1's phase-1 BEFORE finishing batch i keeps
        useful work queued while the host partitions batch i (the device
        otherwise idles for the partition + dispatch glue between
        consecutive batches)."""
        return self._plan_finish(self._plan_phase1(
            sentences, ref_s, speed, prev_d_mean, t, chain_of,
            base_seed=base_seed))

    def _plan_phase1(self, sentences: List[str], ref_s,
                     speed: float, prev_d_mean: float, t: float,
                     chain_of: Optional[List[int]] = None,
                     base_seed: Optional[int] = None) -> Dict[str, Any]:
        """Stage A of _synthesize_plan: chunk splitting, tokenization and
        the phase-1 dispatch. Returns the plan state _plan_finish needs;
        nothing here blocks on device results."""
        s = jnp.asarray(ref_s)

        # split any chunk whose token count exceeds the largest compiled
        # bucket (the reference has no limit — dynamic shapes; we split on
        # word boundaries instead, which long-form chunking makes rare)
        max_tokens = self.cfg.tpu.token_buckets[-1]
        work: List[str] = []
        origin: List[int] = []
        for src_i, sentence in enumerate(sentences):
            parts = [sentence]
            while parts:
                part = parts.pop(0)
                if len(self.cleaner(part)) + 2 <= max_tokens or \
                        len(part.split()) <= 1:
                    work.append(part)
                    origin.append(src_i)
                else:
                    words = part.split()
                    half = len(words) // 2
                    parts = [" ".join(words[:half]),
                             " ".join(words[half:])] + parts
        sentences = work

        n_chunks = len(sentences)

        # wave 1: batch chunks with the same token bucket through ONE
        # phase-1 call. Unlike phase 2 (per-row vocoder compute — exact
        # partitioning), phase 1 is dominated by the serial DurationEncoder
        # BiLSTM whose cost is per-CALL, so padding the batch dim up to one
        # compiled size is cheaper than splitting into exact groups.
        tokenized = [tokens_for_sentence(sent, self.cleaner)
                     for sent in sentences]
        tbs = [_bucket(self.cfg.tpu.token_buckets, len(tk))
               for tk in tokenized]
        by_tb: Dict[int, List[int]] = {}
        for i, tb in enumerate(tbs):
            by_tb.setdefault(tb, []).append(i)

        # style: ONE (1, D) device copy, broadcast to each batch IN-GRAPH
        # (_phase1_impl/_phase2_impl) — the former per-group eager
        # broadcast_to + device_put pair cost two blocking ~28 ms tunnel
        # round trips per group
        s_dev = self._put_replicated(s)

        t_en_of = [None] * n_chunks
        d_of = [None] * n_chunks
        dur_dev_of = [None] * n_chunks
        groups1 = []
        host1 = []
        for tb, idxs in by_tb.items():
            for part in range(0, len(idxs), self.max_batch):
                group = idxs[part: part + self.max_batch]
                bb = _bucket(self.batch_buckets, len(group))
                tokens = np.zeros((bb, tb), np.int32)
                mask = np.zeros((bb, tb), bool)
                for row, i in enumerate(group):
                    tokens[row, : len(tokenized[i])] = tokenized[i]
                    mask[row, : len(tokenized[i])] = True
                groups1.append(group)
                host1.append((tokens, mask))
        # one bulk host->device transfer for every group's inputs
        dev1 = (jax.device_put(host1, self._data_sharding)
                if self._data_sharding is not None
                else jax.device_put(host1))
        for group, (tokens_d, mask_d) in zip(groups1, dev1):
            t_en, d, dur = self._phase1(self.params, tokens_d, mask_d, s_dev)
            for row, i in enumerate(group):
                t_en_of[i] = (t_en, row)
                d_of[i] = (d, row)
                dur_dev_of[i] = (dur, row)

        if base_seed is None:
            # drawn here (not in _plan_finish) so interleaved multi-batch
            # pipelines consume the engine RNG in plan order
            base_seed = int(self._rng.integers(2 ** 63))
        return dict(sentences=sentences, origin=origin, n_chunks=n_chunks,
                    tokenized=tokenized, tbs=tbs, t_en_of=t_en_of,
                    d_of=d_of, dur_dev_of=dur_dev_of, s_dev=s_dev,
                    speed=speed, prev_d_mean=prev_d_mean, t=t,
                    chain_of=chain_of, base_seed=base_seed)

    def _plan_finish(self, st: Dict[str, Any]):
        """Stage B of _synthesize_plan: the duration host sync + chain,
        piece partitioning and the phase-2 dispatch."""
        (origin, n_chunks, tokenized, tbs, t_en_of, d_of, dur_dev_of,
         s_dev, speed, prev_d_mean, t, chain_of, base_seed) = (
            st["origin"], st["n_chunks"], st["tokenized"], st["tbs"],
            st["t_en_of"], st["d_of"], st["dur_dev_of"], st["s_dev"],
            st["speed"], st["prev_d_mean"], st["t"], st["chain_of"],
            st["base_seed"])

        # host sync: duration chain (order-dependent via prev_d_mean).
        # fetch each distinct phase-1 batch buffer ONCE, starting every
        # copy async before blocking on the first — transfers overlap
        # each other instead of serializing tunnel round trips (~10s of
        # ms each on a remote chip)
        dur_bufs: Dict[int, jnp.ndarray] = {}
        for dur_dev, _row in dur_dev_of:
            if id(dur_dev) not in dur_bufs:
                dur_bufs[id(dur_dev)] = dur_dev
                try:
                    dur_dev.copy_to_host_async()
                except AttributeError:
                    pass
        host_dur = {k: np.asarray(v) for k, v in dur_bufs.items()}
        means: List[float] = []
        chain_mean: Dict[int, float] = {}
        chain_rng: Dict[int, np.random.Generator] = {}
        pred_of = [None] * n_chunks
        for i in range(n_chunks):
            dur_dev, row = dur_dev_of[i]
            duration = host_dur[id(dur_dev)][row, : len(tokenized[i])]
            chain = chain_of[origin[i]] if chain_of is not None else 0
            prev = chain_mean.get(chain, prev_d_mean)
            if chain not in chain_rng:
                # per-chain noise stream: a text's stabilized durations
                # depend only on its own chunk sequence, not on what other
                # texts share the batch
                chain_rng[chain] = np.random.default_rng([base_seed, chain])
            pred_dur, _total, new_mean = self._postprocess_durations(
                duration, speed, prev, t, rng=chain_rng[chain])
            chain_mean[chain] = new_mean
            means.append(new_mean)
            pred_of[i] = pred_dur
        if self.fixed_duration is None and pred_of:
            # feed the fused path's frame-bucket heuristic. Use the
            # POST-round min-1-clamped durations (same units as the fused
            # graph's returned total): the raw mean can sit far below the
            # synthesized rate when many durations round up to 1
            self._observe_rate(float(np.mean(
                [p.mean() for p in pred_of])))

        # pieces: each chunk becomes >= 1 contiguous token spans whose frame
        # totals fit the largest compiled bucket (frame-bucket overflow is
        # handled by SPLITTING, never by changing the speaking rate)
        max_frames = self.cfg.tpu.frame_buckets[-1]
        piece_chunk: List[int] = []     # piece -> source chunk
        piece_span: List[Tuple[int, int]] = []
        piece_total: List[int] = []
        pieces_of: List[List[int]] = [[] for _ in range(n_chunks)]
        for i in range(n_chunks):
            for (a, b) in self._split_spans(pred_of[i], max_frames):
                pieces_of[i].append(len(piece_chunk))
                piece_chunk.append(i)
                piece_span.append((a, b))
                piece_total.append(int(pred_of[i][a:b].sum()))

        # wave 2: batch pieces with the same FRAME bucket through ONE
        # phase-2 call — the token dim is padded to the group max (a
        # zero-duration token contributes nothing to the alignment matmuls,
        # so mixing token buckets in one call is exact) to keep batches
        # large: phase-2 carries a serial BiLSTM scan whose cost is
        # per-call, not per-row
        by_f: Dict[int, List[int]] = {}
        for p in range(len(piece_chunk)):
            by_f.setdefault(_bucket(self.cfg.tpu.frame_buckets,
                                    piece_total[p]), []).append(p)

        # merge under-filled frame buckets upward when the per-CALL fixed
        # cost outweighs the padded-row compute. A frame bucket is pure
        # padding (the alignment zero-pads and the audio is trimmed to
        # piece_total), so merging is EXACT — it only trades wasted vocoder
        # rows for fewer phase-2 dispatches. Real-duration serving scatters
        # chunks over neighboring buckets (the stabilization noise nudges
        # totals across boundaries), which otherwise multiplies the
        # dispatch constant. Cost model re-measured round 5 on v5e
        # (hifigan, bf16, b=8 profile): per-call fixed cost ~32 ms
        # (dispatch round trip + the f0n/align per-call terms — the scans
        # amortize; phase-2 device time scales ~linearly with frames), row
        # ~0.028 ms/frame.
        _CALL_MS, _ROW_MS_PER_FRAME = 32.0, 0.028
        fbs_sorted = sorted(by_f)
        for a, b_next in zip(fbs_sorted, fbs_sorted[1:]):
            na, nb = len(by_f[a]), len(by_f[b_next])
            calls = lambda n: -(-n // self.max_batch)
            before = (calls(na) + calls(nb)) * _CALL_MS
            after = (calls(na + nb) * _CALL_MS
                     + na * (b_next - a) * _ROW_MS_PER_FRAME)
            if after < before:
                by_f[b_next] = by_f[b_next] + by_f.pop(a)

        wav_dev_of_piece = [None] * len(piece_chunk)
        groups2 = []
        host2 = []
        for fb, idxs in by_f.items():
            if self.mesh is None:
                groups = _partition_exact(idxs, self.batch_buckets)
            else:
                # mesh mode: batch dims must be compiled multiples of the
                # device count — cut exact bucket-size groups and pad only
                # the final remainder (duplicated rows) up to the smallest
                # bucket that fits. Naive max_batch chunking padded EVERY
                # trailing group to the next bucket: 17 pieces with buckets
                # (8, 16, 32) became one batch of 32 (15 dead vocoder
                # rows); exact-then-pad runs 16 + pad(1->8) (7 dead rows,
                # the minimum the compiled sizes allow).
                groups = _partition_exact(idxs, self.batch_buckets,
                                          pad_tail=True)
            for group in groups:
                bb = (len(group) if self.mesh is None
                      else _bucket(self.batch_buckets, len(group)))
                rows = list(group) + [group[-1]] * (bb - len(group))
                tb = max(tbs[piece_chunk[p]] for p in group)
                full = [piece_span[p] == (0, len(pred_of[piece_chunk[p]]))
                        for p in rows]
                srcs = [t_en_of[piece_chunk[p]] for p in rows]
                if (all(full) and srcs[0][0].shape[0] == bb
                        and all(x[0] is srcs[0][0] for x in srcs)
                        and [x[1] for x in srcs] == list(range(bb))):
                    # the group is exactly one phase-1 batch, in order —
                    # reuse its outputs without device gather/stack ops
                    t_en = srcs[0][0]
                    d = d_of[piece_chunk[group[0]]][0]
                else:
                    def _row(of, p):
                        i = piece_chunk[p]
                        a, b = piece_span[p]
                        arr = of[i][0][of[i][1]][a:b]  # (span, C)
                        if arr.shape[0] < tb:
                            arr = jnp.pad(
                                arr, ((0, tb - arr.shape[0]), (0, 0)))
                        return arr
                    t_en = self._put_data(
                        jnp.stack([_row(t_en_of, p) for p in rows]))
                    d = self._put_data(
                        jnp.stack([_row(d_of, p) for p in rows]))
                durs = np.zeros((bb, tb), np.int32)
                for row, p in enumerate(rows):
                    a, b = piece_span[p]
                    durs[row, : b - a] = pred_of[piece_chunk[p]][a:b]
                groups2.append((fb, group, t_en, d))
                host2.append(durs)
        # one bulk host->device transfer of every group's durations, then
        # dispatch all phase-2 calls back to back (per-group device_puts
        # each paid a blocking tunnel round trip between dispatches)
        dev2 = (jax.device_put(host2, self._data_sharding)
                if self._data_sharding is not None
                else jax.device_put(host2))
        for (fb, group, t_en, d), durs_d in zip(groups2, dev2):
            wav = self._phase2(self.params, t_en, d, s_dev, durs_d,
                               n_frames=fb)
            for row, p in enumerate(group):
                wav_dev_of_piece[p] = (wav, row)

        # chunk i's audio = its pieces' audio, in token order
        wav_parts_of = [[wav_dev_of_piece[p] + (piece_total[p],)
                         for p in pieces_of[i]] for i in range(n_chunks)]
        return wav_parts_of, means, origin

    def _fetch_chunk(self, host_wav: Dict[int, np.ndarray], wav_parts_of,
                     i: int) -> np.ndarray:
        """Fetch chunk i's waveform (concatenating its pieces), caching each
        distinct phase-2 batch buffer (every device->host copy is a full
        tunnel round trip)."""
        segs = []
        for wav_dev, row, total in wav_parts_of[i]:
            if id(wav_dev) not in host_wav:
                host_wav[id(wav_dev)] = np.asarray(wav_dev)
            segs.append(host_wav[id(wav_dev)][row, : total * 2 * self.hop])
        return np.concatenate(segs).astype(np.float32) / 32767.0

    def _fetch_all(self, wav_parts_of) -> List[np.ndarray]:
        # start every distinct buffer's device->host copy before blocking on
        # the first: transfers overlap each other (and any still-running
        # phase-2 compute) instead of serializing round trips
        started = set()
        for parts in wav_parts_of:
            for wav_dev, _row, _total in parts:
                if id(wav_dev) not in started:
                    started.add(id(wav_dev))
                    wav_dev.copy_to_host_async()
        host_wav: Dict[int, np.ndarray] = {}
        return [self._fetch_chunk(host_wav, wav_parts_of, i)
                for i in range(len(wav_parts_of))]

    def generate(self, phonem: str, style: Dict[str, Any],
                 stabilize: bool = True, n_merge: int = 16) -> np.ndarray:
        """Long-form synthesis with sentence chunking + rate stabilization
        (reference inference.py:303-319)."""
        smooth = 0.2 if stabilize else 0.0
        chunks = split_into_chunks(phonem, n_merge=n_merge)
        if not chunks:
            return np.zeros(8000, np.float32)
        base_seed = None
        if len(chunks) == 1 and self.mesh is None and self.fused_enabled:
            # one base-seed draw per synthesis regardless of path: the
            # fused attempt and its 2-phase fallback share the seed, so
            # toggling fused_enabled never shifts the engine RNG stream
            base_seed = int(self._rng.integers(2 ** 63))
            wav = self._generate_fused(chunks[0], style, t=smooth,
                                       base_seed=base_seed)
            if wav is not None:
                return np.concatenate([np.zeros(4000, np.float32),
                                       wav[4000:-4000],
                                       np.zeros(4000, np.float32)])
        wavs, _, _ = self._synthesize_chunks(chunks, style["style"],
                                             style.get("speed", 1.0), 0.0,
                                             smooth, base_seed=base_seed)
        out = np.concatenate([w[4000:-4000] for w in wavs])
        return np.concatenate([np.zeros(4000, np.float32), out,
                               np.zeros(4000, np.float32)])

    def _generate_fused(self, sentence: str, style: Dict[str, Any],
                        t: float = 0.0, base_seed: Optional[int] = None
                        ) -> Optional[np.ndarray]:
        """One-dispatch single-chunk synthesis (see _fused_impl). Returns
        None when the utterance doesn't fit the fused path (token bucket
        overflow, or predicted frames overflow the chosen frame bucket) —
        the caller falls back to the exact 2-phase path.

        t > 0 (stabilize=True, the production default): the stabilization
        noise is drawn host-side from the SAME chain stream the 2-phase
        plan would use (default_rng([base_seed, 0]); N(mean, std, n) ==
        mean + std * N(0, 1, n) draw-for-draw under numpy's Generator) and
        blended on device — so the fused path and its fallback produce the
        same audio for the same base_seed, to f32-vs-f64 rounding of the
        blend (a flip at an exact .5 duration boundary shifts the audio by
        one frame; see _device_postprocess_durations)."""
        tk = tokens_for_sentence(sentence, self.cleaner)
        fbs = self.cfg.tpu.frame_buckets
        try:
            tb = _bucket(self.cfg.tpu.token_buckets, len(tk))
        except ValueError:
            return None
        if self.fixed_duration is not None:
            need = int(self.fixed_duration) * len(tk)  # exact, no headroom
        elif self._fpt_ema is not None:
            # observed speaking rate + 35% headroom; a wrong guess costs
            # only the fallback (underfill is masked vocoder compute,
            # overflow re-runs 2-phase)
            need = int(np.ceil(len(tk) * self._fpt_ema * 1.35))
        else:
            need = 8 * len(tk)  # first call: worst-case-ish prior
        if need > fbs[-1]:
            return None
        fb = _bucket(fbs, max(need, 1))
        if (self.fused_compile == "async"
                and (tb, fb) not in self._fused_ready):
            # serve this request on the warm 2-phase graphs; compile the
            # fused (tb, fb) graph in the background for the next one
            self._enqueue_fused_compile(tb, fb)
            return None
        tokens = np.zeros((1, tb), np.int32)
        tokens[0, : len(tk)] = tk
        mask = np.zeros((1, tb), bool)
        mask[0, : len(tk)] = True
        fixed = self.fixed_duration
        scale = self.duration_scale
        t_eff = 0.0 if fixed is not None else t  # host glue zeroes t on fixed
        noise = np.zeros((1, tb), np.float32)
        if t_eff > 0:
            # the exact draws the 2-phase plan's chain 0 would make
            chain_rng = np.random.default_rng([base_seed, 0])
            noise[0, : len(tk)] = chain_rng.normal(0.0, 1.0, size=len(tk))
        scal = np.array([style.get("speed", 1.0),
                         0.0 if fixed is None else 1.0,
                         0.0 if fixed is None else fixed,
                         1.0 if scale is None else scale,
                         t_eff, 0.0], np.float32)
        # ONE bulk host->device transfer for all four inputs (style is
        # already a device array): separate jnp.asarray/scalar transfers
        # each cost a blocking tunnel round trip before the dispatch
        tokens_d, mask_d, noise_d, scal_d = jax.device_put(
            (tokens, mask, noise, scal))
        pcm, total = self._fused(
            self.params, tokens_d, mask_d, jnp.asarray(style["style"]),
            scal_d, noise_d, n_frames=fb)
        self._fused_ready.add((tb, fb))
        # start both device->host copies before blocking on either
        pcm.copy_to_host_async()
        total.copy_to_host_async()
        n = int(np.asarray(total)[0])
        if self.fixed_duration is None:
            # the graph's total is the true frame count even on overflow —
            # learn the rate either way so the next bucket choice is right
            self._observe_rate(n / max(len(tk), 1))
        if n > fb:
            return None  # frame-bucket overflow: 2-phase path splits it
        return (np.asarray(pcm)[0, : n * 2 * self.hop].astype(np.float32)
                / 32767.0)

    def _observe_rate(self, frames_per_token: float) -> None:
        """Update the speaking-rate estimate that sizes the fused path's
        frame bucket. EMA for small drift, SNAP when the observation is far
        off (>25%): a stale estimate otherwise decays by only 0.8x per call,
        walking the bucket choice through every intermediate frame bucket —
        each one a cold XLA compile (~1 min on a tunneled chip). A rate
        step (new voice, speed change, rate-calibrated bench) must converge
        in one observation, not seventeen."""
        if (self._fpt_ema is None or frames_per_token > 1.25 * self._fpt_ema
                or frames_per_token < 0.8 * self._fpt_ema):
            self._fpt_ema = frames_per_token
        else:
            self._fpt_ema = 0.8 * self._fpt_ema + 0.2 * frames_per_token

    def _enqueue_fused_compile(self, tb: int, fb: int) -> None:
        """Queue a fused (token, frame)-bucket graph for background
        compilation (fused_compile == "async"). JAX jit caches are
        thread-safe: the daemon thread calling self._fused with dummy
        inputs populates the same cache the request path dispatches from.
        XLA compilation releases the GIL, so the serving thread keeps
        running the 2-phase path meanwhile."""
        import queue
        import threading

        key = (tb, fb)
        if key in self._fused_pending or key in self._fused_ready:
            return
        self._fused_pending.add(key)
        if self._fused_thread is None:
            self._fused_queue = queue.Queue()

            def _worker():
                while True:
                    k = self._fused_queue.get()
                    if k is None:
                        return
                    wtb, wfb = k
                    try:
                        self._fused(
                            self.params,
                            jnp.zeros((1, wtb), jnp.int32),
                            jnp.ones((1, wtb), bool),
                            jnp.zeros((1, self.cfg.model_params.style_dim),
                                      jnp.float32),
                            jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0, 0.0],
                                        jnp.float32),
                            jnp.zeros((1, wtb), jnp.float32),
                            n_frames=wfb)
                        self._fused_ready.add(k)
                    except Exception as e:  # keep serving on compile failure
                        warnings.warn(
                            f"background fused compile {k} failed: {e!r}")
                    finally:
                        self._fused_pending.discard(k)
                        self._fused_queue.task_done()

            self._fused_thread = threading.Thread(
                target=_worker, name="fused-compiler", daemon=True)
            self._fused_thread.start()
        self._fused_queue.put(key)

    def wait_fused_compiles(self) -> None:
        """Block until every queued background fused compile has finished
        (tests / explicit pre-warming; the serving path never calls it)."""
        if self._fused_queue is not None:
            self._fused_queue.join()

    def generate_stream(self, phonem: str, style: Dict[str, Any],
                        stabilize: bool = True, n_merge: int = 16):
        """Streaming synthesis: yields waveform segments in order as each
        chunk's audio becomes available, so playback can start after the
        FIRST chunk (~the p50 utterance latency) instead of after the whole
        text. `np.concatenate(list(generate_stream(...)))` equals a
        `generate(...)` call made from the same engine state exactly (the
        single-chunk fused path sizes its frame bucket from the adaptive
        speaking-rate estimate, so calls from a different state can land
        on a different bucket and differ by at most one int16 PCM step).
        No reference equivalent (its loop builds the full list before
        returning, inference.py:303-319)."""
        smooth = 0.2 if stabilize else 0.0
        chunks = split_into_chunks(phonem, n_merge=n_merge)
        if not chunks:
            yield np.zeros(8000, np.float32)
            return
        base_seed = None
        if len(chunks) == 1 and self.mesh is None and self.fused_enabled:
            # single chunk: same fused single-dispatch path as generate()
            # (keeps concatenate(stream) == generate exact)
            base_seed = int(self._rng.integers(2 ** 63))
            wav = self._generate_fused(chunks[0], style, t=smooth,
                                       base_seed=base_seed)
            if wav is not None:
                yield np.concatenate([np.zeros(4000, np.float32),
                                      wav[4000:-4000],
                                      np.zeros(4000, np.float32)])
                return
        wav_parts_of, _, _ = self._synthesize_plan(
            chunks, style["style"], style.get("speed", 1.0), 0.0, smooth,
            base_seed=base_seed)
        host_wav: Dict[int, np.ndarray] = {}
        n = len(wav_parts_of)
        for i in range(n):
            w = self._fetch_chunk(host_wav, wav_parts_of, i)
            seg = w[4000:-4000]
            if i == 0:
                seg = np.concatenate([np.zeros(4000, np.float32), seg])
            if i == n - 1:
                seg = np.concatenate([seg, np.zeros(4000, np.float32)])
            yield seg

    def generate_batch(self, phonems: List[str], style: Dict[str, Any],
                       stabilize: bool = True, n_merge: int = 16
                       ) -> List[np.ndarray]:
        """Synthesize several texts in one batched pass (shared style).

        Chunk-level batching spans texts, so the compiled batch sizes that
        single-text synthesis leaves partially idle are filled — higher
        chip utilization than calling generate() per text. Each text gets
        its own rate-stabilization chain AND its own stabilization noise
        stream, so a text's audio does not depend on what other texts share
        the batch (with stabilize=True the noise seed still advances the
        engine RNG once per call). No reference equivalent."""
        return self._batch_assemble(
            self._batch_plan(phonems, style, stabilize, n_merge))

    def _batch_plan(self, phonems: List[str], style: Dict[str, Any],
                    stabilize: bool, n_merge: int):
        """Dispatch a generate_batch workload without fetching audio.
        Returns an opaque planned-batch for _batch_assemble."""
        return self._batch_plan_finish(
            self._batch_plan_phase1(phonems, style, stabilize, n_merge))

    def _batch_plan_phase1(self, phonems: List[str], style: Dict[str, Any],
                           stabilize: bool, n_merge: int):
        """Stage A of _batch_plan: chunking + the phase-1 dispatch (see
        _plan_phase1). Multi-batch pipelines (serve) call this for batch
        i+1 BEFORE _batch_plan_finish on batch i, so the device has batch
        i+1's phase-1 queued while the host partitions batch i."""
        smooth = 0.2 if stabilize else 0.0
        per_text = [split_into_chunks(t, n_merge=n_merge) for t in phonems]
        flat: List[str] = []
        chain_of: List[int] = []
        for ti, chunks in enumerate(per_text):
            flat.extend(chunks)
            chain_of.extend([ti] * len(chunks))
        if not flat:
            return (None, chain_of, len(phonems))
        st = self._plan_phase1(flat, style["style"],
                               style.get("speed", 1.0), 0.0, smooth,
                               chain_of)
        return (st, chain_of, len(phonems))

    def _batch_plan_finish(self, pre):
        """Stage B of _batch_plan: duration sync + phase-2 dispatch.
        Returns the opaque planned-batch for _batch_assemble."""
        st, chain_of, n_texts = pre
        if st is None:
            return (None, chain_of, [], n_texts)
        wav_parts_of, _, origin = self._plan_finish(st)
        return (wav_parts_of, chain_of, origin, n_texts)

    def _batch_assemble(self, planned) -> List[np.ndarray]:
        """Fetch + assemble a _batch_plan result into per-text waveforms."""
        wav_parts_of, chain_of, origin, n_texts = planned
        if wav_parts_of is None:
            return [np.zeros(8000, np.float32) for _ in range(n_texts)]
        wavs = self._fetch_all(wav_parts_of)
        outs: List[np.ndarray] = []
        for ti in range(n_texts):
            ws = [wavs[i] for i in range(len(wavs))
                  if chain_of[origin[i]] == ti]
            if not ws:
                outs.append(np.zeros(8000, np.float32))
                continue
            mid = np.concatenate([w[4000:-4000] for w in ws])
            outs.append(np.concatenate([np.zeros(4000, np.float32), mid,
                                        np.zeros(4000, np.float32)]))
        return outs

    def serve(self, batches, style: Dict[str, Any], stabilize: bool = True,
              n_merge: int = 16):
        """Sustained pipelined serving: iterate over LISTS of texts, yield
        the corresponding lists of waveforms (generate_batch semantics per
        batch).

        Triple-stage pipelined: batch i+1's PHASE-1 is dispatched before
        batch i's phase-2 is planned (so the device runs batch i+1's text
        encoding during the host's duration-partitioning glue for batch i,
        instead of idling), and batch i's phase-2 is dispatched before
        batch i-1's audio is fetched (so the device->host copy of one
        batch overlaps the vocoder compute of the next). Use for
        throughput (request queues); use generate_batch for one-shot
        latency. No reference equivalent (the reference synthesizes
        chunk-by-chunk in-line, inference.py:303-319)."""
        pre = None       # phase-1 dispatched, durations not yet synced
        pending = None   # fully planned (phase-2 dispatched), not fetched
        for texts in batches:
            nxt = self._batch_plan_phase1(texts, style, stabilize, n_merge)
            if pre is not None:
                planned = self._batch_plan_finish(pre)
                if pending is not None:
                    yield self._batch_assemble(pending)
                pending = planned
            pre = nxt
        if pre is not None:
            planned = self._batch_plan_finish(pre)
            if pending is not None:
                yield self._batch_assemble(pending)
            pending = planned
        if pending is not None:
            yield self._batch_assemble(pending)

    # ------------------------------------------------------------------

    def warmup(self, token_buckets=None, frame_buckets=None,
               style_seconds=(1, 3), batch_sizes=None) -> None:
        """Precompile the jitted graphs for the given buckets.

        Inputs are routed through _put_data and batch sizes default to the
        engine's compiled batch buckets, so the warmed signatures (batch,
        token/frame bucket, sharding) are exactly the ones the runtime
        dispatches — in mesh mode the minimum runtime batch is the device
        count, never 1."""
        s = jnp.zeros((1, self.cfg.model_params.style_dim), jnp.float32)
        for sec in style_seconds:
            self._style_fn(self.params, jnp.zeros((1, sec * self.sr)))
        # the runtime passes style as a REPLICATED (1, D) row (broadcast
        # in-graph) — warm exactly that signature
        sb = self._put_replicated(s)
        sizes = tuple(batch_sizes) if batch_sizes else self.batch_buckets[:1]
        for bb in sizes:
            for tb in token_buckets or self.cfg.tpu.token_buckets[:2]:
                tokens = self._put_data(np.zeros((bb, tb), np.int32))
                mask = self._put_data(np.ones((bb, tb), bool))
                t_en, d, _dur = self._phase1(self.params, tokens, mask, sb)
                for fbk in frame_buckets or self.cfg.tpu.frame_buckets[:2]:
                    durs = self._put_data(np.ones((bb, tb), np.int32))
                    self._phase2(self.params, t_en, d, sb, durs,
                                 n_frames=fbk)
                if bb == 1 and self.mesh is None and self.fused_enabled:
                    # fused single-dispatch graphs for this token bucket at
                    # the frame buckets its heuristic picks for a typical
                    # (4 f/t) and the first-call prior (8 f/t) speaking
                    # rate. The runtime bucket is data-dependent (observed
                    # rate x actual token count), so a first fused call can
                    # still compile cold when the utterance lands between
                    # warmed buckets
                    fbs = self.cfg.tpu.frame_buckets
                    warmed = set()
                    for rate in (4, 8):
                        need = rate * tb
                        if need <= fbs[-1]:
                            fbk = _bucket(fbs, need)
                            if fbk not in warmed:
                                warmed.add(fbk)
                                self._fused(self.params, tokens, mask, sb,
                                            jnp.asarray(
                                                [1.0, 0.0, 0.0, 1.0,
                                                 0.0, 0.0], jnp.float32),
                                            jnp.zeros((1, tb), jnp.float32),
                                            n_frames=fbk)
                                self._fused_ready.add((tb, fbk))
