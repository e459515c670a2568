"""Unbounded-duration generation: windowed denoise with flow-match inpainting stitching.

The reference caps generation at 60 s (``nodes.py:219`` duration max; a single quadratic
attention window), and 60 s XXL bf16 only fits a 16 GiB chip here via chunked decode. This
module removes the duration cap: audio is generated in fixed-size overlapping windows
(every window one already-compiled shape bucket), where each window after the first CLAMPS
its first ``overlap`` latent frames to the previous window's tail at every solver step —
flow-match inpainting on the training interpolant ``(1-sigma)*known + sigma*noise``
(``sampling/denoise.py::denoise_latents(known_frames=...)``). The free region denoises
conditioned on the clamped prefix through the MMDiT's full attention, so content continues
across the seam; at sigma=0 the prefix equals the previous window's latents EXACTLY, so
stitching is a pure concatenation in latent space (no audio-domain crossfade). Decode runs
per finalized segment with a halo of true context (``_stream_segments``) — which bounds
decode memory by the window, equals the one-shot full decode within fp-fusion noise, and
makes the streaming API (``generate_audio_long_stream``) bitwise-identical to the batch
path (``generate_audio_long``).

Memory is bounded by the window length regardless of total duration; per-window compute
reuses at most three compiled programs (first / interior / final window, which differ only
in the static ``known_frames``). An optional streaming latency ramp (``first_window_s``)
prepends a smaller preamble window whose audio is emitted as soon as it is denoised, then
runs the normal plan with the preamble clamped as known prefix — time-to-first-audio
drops to ~``first/window`` of a full window's cost for one extra small denoise
(+1 compiled variant).

V2A windows slice the FULL video's conditioning features: SigLIP2 clip features are
per-frame (8 fps) and Synchformer sync features are per-segment with NO cross-segment
mixing (``models/synchformer.py::apply`` folds the segment dim into the batch — each
16-frame/stride-8 segment is encoded independently), so slicing the full-duration feature
tensors at a window is EXACTLY what encoding that window's slice of the full video's
resampled frame stream would produce — provided the window start lands where all three
conditioning grids align. (Exactness holds at the feature-encoder level; the frame
resampler itself uses the reference's ``torch.linspace(0, T-1, n)`` endpoint semantics, so
a window re-encoded from its own raw video in isolation would pick marginally different
source frames than the full-video resample this pipeline slices.) ``t0*8 ∈ Z``
(clip frames) together with ``t0*25 ≡ 0 (mod 8)`` (segment starts sit on the global
stride-8 grid) forces ``t0 ∈ 8Z`` seconds (25m = 64k has smallest solution m=64), which
also sits on the 50 fps latent grid; window STARTS must therefore be multiples of 8 s
(``V2A_GRID_S``), arranged by snapping the window stride down to that grid.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Iterator, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.pipeline.features import pick_text_bucket, prepare_cfg_features, t2a_features
from foley_tpu.pipeline.generate import (
    _DECODE_CHUNK_FRAMES,
    GenerationResult,
    ModelBundle,
)
from foley_tpu.sampling.denoise import denoise_latents, prepare_latents
from foley_tpu.utils.logging import get_logger

logger = get_logger()


def window_schedule(
    total_frames: int, win_frames: int, ov_frames: int, initial_covered: int = 0
) -> List[Tuple[int, int]]:
    """[(start_frame, known_frames), ...] covering [0, total_frames) with ``win_frames``
    windows overlapping by >= ``ov_frames``.

    Interior windows advance by ``win - ov``; the final window is right-aligned to end
    exactly at ``total_frames`` (its overlap with already-generated content grows as
    needed), so only <= 3 distinct ``known_frames`` values (= compiled variants) occur.

    ``initial_covered`` > 0 marks frames [0, initial_covered) as already known before the
    first window (audio continuation: the encoded context) — window 0 clamps them exactly
    like an interior window clamps the previous window's tail. Must be < win_frames."""
    if ov_frames >= win_frames:
        raise ValueError(f"overlap ({ov_frames}) must be smaller than window ({win_frames})")
    if not 0 <= initial_covered < win_frames:
        raise ValueError(
            f"initial_covered ({initial_covered}) must be < window ({win_frames})")
    if win_frames >= total_frames:
        return [(0, initial_covered)]
    step = win_frames - ov_frames
    starts = list(range(0, total_frames - win_frames, step))
    starts.append(total_frames - win_frames)
    sched: List[Tuple[int, int]] = []
    prev_end = initial_covered
    for s in starts:
        if s + win_frames <= prev_end:
            continue  # right-aligned final window already covered by the previous one
        sched.append((s, prev_end - s if prev_end else 0))
        prev_end = s + win_frames
    return sched


#: Window starts in V2A long-form must be multiples of this (seconds): the smallest t0
#: with t0*8 integer (clip grid) and t0*25 ≡ 0 mod 8 (sync segment grid). See module doc.
V2A_GRID_S = 8


def emitted_samples(duration_s: float, sr: int) -> int:
    """``int(duration * sr)`` with a float-noise guard (same rationale as
    ``configs._frames``): non-dyadic durations — including the SYNTHETIC
    ``total_frames / rate`` round-trips the continuation path produces — can land one
    ulp below the exact product (3.54 * 48000 = 169919.99999999997) and plain ``int()``
    would silently drop the last sample. The serving stream header uses this for
    long-form/in-bucket streams so X-Total-Samples matches what the stream emits;
    continuation headers instead use the latent-grid total (latent_length * hop),
    because continuation emits whole latent frames only."""
    return int(duration_s * sr + 1e-6)


def default_window_s(cfg) -> float:
    """The long-form window the node layer uses: 30 s (fits a 16 GiB chip in bf16 with
    chunked decode, ROADMAP long-form table), capped at the config's single-window max.
    ONE definition on purpose — the V2A encode path (``plan_v2a_long``) and the generation
    path (``generate_audio_long``) must agree on the window or the encoded feature
    duration silently desyncs from the window schedule and fails mid-run."""
    return min(30.0, cfg.max_duration_s)


def plan_v2a_long(
    cfg, duration_s: float, window_s: float = 30.0, overlap_s: Optional[float] = None
) -> Tuple[float, float, float]:
    """(feature_duration_s, window_s, overlap_s) for a V2A long-form run.

    The window stride is snapped DOWN to the ``V2A_GRID_S`` grid (more overlap than
    requested, never less) and the total is snapped UP to the stride grid, so every
    window start is a multiple of 8 s and every window clamps the same overlap — the
    caller must encode the video at ``feature_duration_s`` (``resample_frames`` pads past
    the video's end by repeating the last frame, the reference's own short-video
    semantics, ``nodes.py:294-317``) and pass the resulting full feature tensors to
    ``generate_audio_long``. Returns the (possibly adjusted) window/overlap to pass too."""
    if overlap_s is None:
        overlap_s = min(5.0, window_s / 4.0)
    rate = cfg.model.audio_frame_rate
    grid = V2A_GRID_S * rate
    win_frames = cfg.latent_length(window_s)
    total_frames = cfg.latent_length(duration_s)
    if total_frames <= win_frames:
        return duration_s, window_s, overlap_s
    step = (win_frames - cfg.latent_length(overlap_s)) // grid * grid
    if step < grid:
        raise ValueError(
            f"V2A long-form needs window - overlap >= {V2A_GRID_S}s "
            f"(got window {window_s}s, overlap {overlap_s}s)"
        )
    total_frames = win_frames + -(-(total_frames - win_frames) // step) * step
    return total_frames / rate, window_s, (win_frames - step) / rate


def _slice_v2a_window(cfg, clip_full, sync_full, start_frames: int, win_frames: int):
    """Window slices of full-duration V2A features; exact (segment-local encoders) when
    ``start_frames`` is a multiple of the 8 s grid (asserted by the caller's schedule)."""
    rate = cfg.model.audio_frame_rate
    t0_s = start_frames // rate
    clip_len, sync_len = cfg.t2a_lengths(win_frames / rate)
    c0 = t0_s * cfg.siglip2_fps
    # sync token index == 25 fps frame index: segment seg0 = t0*25/8 starts the window and
    # each segment contributes 8 tokens, so the token offset is seg0*8 = t0*25.
    s0 = t0_s * cfg.synchformer_fps
    if clip_full.shape[1] < c0 + clip_len or sync_full.shape[1] < s0 + sync_len:
        raise ValueError(
            f"V2A features too short for window at {t0_s}s: need clip>={c0 + clip_len} "
            f"(got {clip_full.shape[1]}), sync>={s0 + sync_len} (got {sync_full.shape[1]}); "
            "encode the video at plan_v2a_long()'s feature_duration_s"
        )
    return clip_full[:, c0 : c0 + clip_len], sync_full[:, s0 : s0 + sync_len]


def generate_audio_long(
    bundle: ModelBundle,
    text_feat: jnp.ndarray,
    uncond_text_feat: jnp.ndarray,
    duration_s: float,
    *,
    clip_feat: Optional[jnp.ndarray] = None,
    sync_feat: Optional[jnp.ndarray] = None,
    window_s: float = 30.0,
    overlap_s: Optional[float] = None,
    guidance_scale: float = 4.5,
    num_inference_steps: int = 50,
    sampler: str = "euler",
    batch_size: int = 1,
    seed: int = 0,
    attn_impl: str = "auto",
    text_bucket: Optional[int] = None,
    return_latents: bool = False,
    fetch_pcm16: bool = True,
    snap_to_window_grid: bool = False,
    first_window_s: Optional[float] = None,
) -> GenerationResult:
    """Generate ``duration_s`` seconds of audio (any length) in ``window_s`` windows.

    Determinism: the noise for the FULL stitched latent sequence is drawn once from
    ``seed``; every window uses its slice, so overlap regions see consistent noise and the
    result is a pure function of (seed, conditioning, schedule). All four reference
    solvers work: the prefix clamp is stage-aware and the final prefix is hard-set to the
    known latents (``sampling/denoise.py`` known_frames), so windows stay final-on-write
    under any solver. Euler remains the default and the reference's own recommendation
    (``nodes.py:227``).

    V2A: pass ``clip_feat``/``sync_feat`` encoded from the FULL video at
    ``plan_v2a_long()``'s feature_duration_s (and its adjusted window/overlap); each
    window consumes its exact slice (see module doc for why slicing is exact)."""
    cfg = bundle.pipeline_cfg
    t0 = time.perf_counter()
    prep = _prepare_long(
        bundle, text_feat, uncond_text_feat, duration_s,
        clip_feat=clip_feat, sync_feat=sync_feat, window_s=window_s,
        overlap_s=overlap_s, batch_size=batch_size, seed=seed, attn_impl=attn_impl,
        text_bucket=text_bucket, snap_to_window_grid=snap_to_window_grid,
        use_cfg=guidance_scale > 1.0, first_window_s=first_window_s,
    )
    t1 = time.perf_counter()
    # Decode through the SAME per-segment schedule as the streaming path, so streamed
    # chunks concatenate to this function's output BITWISE (identical decode calls on
    # identical inputs). Per-segment decode is also what bounds decode memory by the
    # window rather than the total duration; within fp-fusion noise it equals the
    # one-shot full decode (halo argument on _STREAM_HALO).
    parts = [
        ch.pcm16 if fetch_pcm16 else ch.audio[:, 0]
        for ch in _stream_segments(
            bundle, prep, duration_s=duration_s, guidance_scale=guidance_scale,
            num_inference_steps=num_inference_steps, fetch_pcm16=fetch_pcm16,
            sampler=sampler,
        )
    ]
    t2 = time.perf_counter()

    audio_np = np.concatenate(parts, axis=-1)
    if fetch_pcm16:
        audio_np = audio_np.astype(np.float32) / 32767.0
    audio_np = audio_np[:, None, :]
    requested_frames = cfg.latent_length(duration_s)  # grid snapping may have padded
    return GenerationResult(
        audio_first=audio_np[:1],
        audio_batch=audio_np,
        sample_rate=cfg.dac.sample_rate,
        latents=(np.asarray(prep.stitched[:, :requested_frames])
                 if return_latents else None),
        timings={"prepare_s": t1 - t0, "denoise_decode_s": t2 - t1,
                 "windows": float(len(prep.sched))},
    )


class _LongPrep(NamedTuple):
    """Window plan + shared per-run state for the long-form denoise loop."""

    total_frames: int
    win_frames: int  # the MAIN window size; sizes[i] may differ (ramp/final clamp)
    sched: List[Tuple[int, int]]
    sizes: List[int]  # per-window latent frames, aligned with sched
    noise: jnp.ndarray
    stitched: np.ndarray  # mutated in place by _run_windows
    window_features: object  # callable: (start_frame, win_frames) -> CFG feature pack
    attn_impl: str
    use_cfg: bool
    v2a: bool


def _prepare_long(
    bundle,
    text_feat,
    uncond_text_feat,
    duration_s: float,
    *,
    clip_feat,
    sync_feat,
    window_s: float,
    overlap_s: Optional[float],
    batch_size: int,
    seed: int,
    attn_impl: str,
    text_bucket: Optional[int],
    snap_to_window_grid: bool,
    use_cfg: bool,
    known_prefix: Optional[np.ndarray] = None,
    first_window_s: Optional[float] = None,
) -> _LongPrep:
    """The window plan, conditioning closures, and buffers shared by the batch
    (``generate_audio_long``) and streaming (``generate_audio_long_stream``) paths.

    ``known_prefix`` ([B, ctx_frames, latent_dim], standardized space): frames already
    known before generation starts (audio continuation) — seeded into the stitch buffer
    and clamped by window 0 exactly like an interior window clamps its overlap.

    ``first_window_s``: streaming latency ramp — prepend a SMALLER preamble window over
    [0, first_window_s) to the schedule, then run the normal window plan with the
    preamble marked as its known prefix (the exact ``initial_covered`` mechanism the
    continuation path uses). Window 1 re-denoises [0, window_s) with the preamble
    clamped — at sigma=0 the clamp reproduces the preamble's latents EXACTLY, so the
    stitched result stays a pure function of (seed, conditioning, schedule) and the
    stream==batch bitwise property is preserved. Time-to-first-audio drops from one
    full window's denoise to the preamble's (~first/window of the cost); the price is
    one extra small denoise (+1 compiled variant) per generation."""
    cfg = bundle.pipeline_cfg
    v2a = clip_feat is not None or sync_feat is not None
    if v2a and (clip_feat is None or sync_feat is None):
        raise ValueError("V2A long-form needs both clip_feat and sync_feat")
    if overlap_s is None:
        overlap_s = min(5.0, window_s / 4.0)  # small windows keep a proportional overlap

    total_frames = cfg.latent_length(duration_s)
    win_frames = cfg.latent_length(window_s)
    if v2a and total_frames > win_frames:
        # window starts must land on the 8 s conditioning grid (module doc): the plan
        # snaps the stride DOWN to it and the total UP to the stride grid (trimmed to the
        # requested duration below, exactly like snap_to_window_grid)
        feat_dur_s, _, overlap_s = plan_v2a_long(cfg, duration_s, window_s, overlap_s)
        total_frames = cfg.latent_length(feat_dur_s)
    ov_frames = cfg.latent_length(overlap_s)
    if snap_to_window_grid and not v2a and total_frames > win_frames:
        # Production-serving mode: generate on the window-stride grid (slightly more than
        # requested, trimmed to duration below) so every window clamps exactly ov_frames
        # and the decode length quantizes — arbitrary durations reuse a BOUNDED set of
        # compiled programs instead of compiling a fresh final-window/decode shape each.
        step = win_frames - ov_frames
        total_frames = win_frames + -(-(total_frames - win_frames) // step) * step
    ctx_frames = 0 if known_prefix is None else int(known_prefix.shape[1])
    first_frames = 0
    if first_window_s is not None and total_frames > cfg.latent_length(first_window_s):
        first_frames = cfg.latent_length(first_window_s)
        if first_frames >= win_frames:
            raise ValueError(
                f"first_window_s ({first_window_s}) must be smaller than window_s — it "
                "is a streaming latency ramp, not the window itself")
        if ctx_frames >= first_frames:
            raise ValueError(
                f"continuation context ({ctx_frames} latent frames) must fit inside the "
                f"ramp window ({first_frames}); raise first_window_s or lower context_s")
        # preamble over [0, first_frames), then the normal plan treating it as known —
        # identical window starts/knowns to the no-ramp schedule except window 1 clamps
        # the preamble instead of starting free
        sched = [(0, ctx_frames)] + window_schedule(
            total_frames, win_frames, ov_frames, initial_covered=first_frames)
    else:
        sched = window_schedule(
            total_frames, win_frames, ov_frames, initial_covered=ctx_frames)
    # every window is the main size except a ramp preamble, clamped to the sequence end
    # (the no-ramp single-window case: exactly generate_audio's geometry)
    sizes = [
        min(first_frames if (first_frames and i == 0) else win_frames,
            total_frames - start)
        for i, (start, _) in enumerate(sched)
    ]
    if v2a and len(sched) > 1:
        # Validate the LAST window's slice bounds up front: undersized features (sized for
        # the requested rather than the plan's snapped duration) must fail NOW, not after
        # every earlier window has already been denoised (minutes of wasted XXL TPU time).
        _slice_v2a_window(cfg, clip_feat, sync_feat, sched[-1][0], sizes[-1])
    win_frames = max(sizes)
    bucket = text_bucket or pick_text_bucket(int(text_feat.shape[1]))
    t2a_cache = {}

    def window_features(start: int, win: int):
        """Conditioning for the window at latent frame ``start`` spanning ``win`` frames
        (shape-stable across same-size windows, so they share compiled denoise
        variants; T2A conditioning is start-invariant and cached per window size)."""
        if v2a:
            clip_w, sync_w = _slice_v2a_window(cfg, clip_feat, sync_feat, start, win)
        elif win in t2a_cache:
            return t2a_cache[win]
        else:
            # T2A: the learned empty sequences at the WINDOW duration — start-invariant
            clip_w, sync_w = t2a_features(
                bundle.mmdit_params, cfg, win / cfg.model.audio_frame_rate, batch_size=1)
        feats = prepare_cfg_features(
            bundle.mmdit_params, text_feat, uncond_text_feat, clip_w, sync_w,
            batch_size=batch_size, use_cfg=use_cfg, text_bucket=bucket,
        )
        if not v2a:
            t2a_cache[win] = feats
        return feats

    from foley_tpu.ops.attention import resolve_attn_impl

    attn_impl = resolve_attn_impl(attn_impl, win_frames)
    noise = prepare_latents(
        jax.random.PRNGKey(seed), batch_size, total_frames,
        cfg.model.audio_vae_latent_dim,
    )

    stitched = np.zeros((batch_size, total_frames,
                         cfg.model.audio_vae_latent_dim), np.float32)
    if ctx_frames:
        prefix = np.asarray(known_prefix, np.float32)
        if prefix.shape[0] == 1 and batch_size > 1:
            prefix = np.repeat(prefix, batch_size, axis=0)
        stitched[:, :ctx_frames] = prefix
    return _LongPrep(
        total_frames=total_frames, win_frames=win_frames, sched=sched, sizes=sizes,
        noise=noise, stitched=stitched, window_features=window_features,
        attn_impl=attn_impl, use_cfg=use_cfg, v2a=v2a,
    )


def _run_windows(
    bundle, prep: _LongPrep, *, guidance_scale: float, num_inference_steps: int,
    sampler: str = "euler",
) -> Iterator[Tuple[int, int, int]]:
    """Denoise the window schedule in order, writing each window into ``prep.stitched``;
    yields ``(window_index, start_frame, win_frames)`` after each window's latents are
    FINAL (every later window clamps its overlap to these exact values, so they never
    change)."""
    cfg = bundle.pipeline_cfg
    for w_i, ((start, known), win) in enumerate(zip(prep.sched, prep.sizes)):
        win_noise = prep.noise[:, start : start + win]
        if known:
            known_lat = jnp.asarray(prep.stitched[:, start : start + known])
        else:
            known_lat = None
        logger.info(
            f"long-form window {w_i + 1}/{len(prep.sched)}: "
            f"frames [{start}, {start + win})"
            + (f", {known} clamped" if known else "")
        )
        win_out = denoise_latents(
            bundle.mmdit_params, win_noise,
            prep.window_features(start, win),
            jnp.float32(guidance_scale),
            known_lat,
            cfg=cfg.model, diffusion=cfg.diffusion, num_steps=num_inference_steps,
            solver=sampler, use_cfg=prep.use_cfg, attn_impl=prep.attn_impl,
            compute_dtype=bundle.compute_dtype,
            offload_fetch=bundle.offload_fetch, offload_prefetch=bundle.offload_prefetch,
            progress=bundle.progress,
            # under CFG the T2A halves share visual rows; V2A halves differ (empty vs real)
            visual_rows_shared=prep.use_cfg and not prep.v2a,
            known_frames=known,
        )
        # the clamped prefix equals the previous tail exactly; copying the whole window is
        # therefore seamless (asserted in tests at fp32 equality)
        prep.stitched[:, start : start + win] = np.asarray(win_out)
        yield w_i, start, win


class StreamChunk(NamedTuple):
    """One finalized segment of a streaming long-form generation (contiguous samples;
    concatenating all chunks equals ``generate_audio_long``'s output — tested)."""

    start_sample: int  # global sample offset of this chunk
    audio: np.ndarray  # [B, 1, S] float32 in [-1, 1]
    pcm16: Optional[np.ndarray]  # [B, S] int16 (present when fetch_pcm16; audio = pcm/32767)
    sample_rate: int
    window_index: int
    n_windows: int
    final: bool


#: Latent-frame halo on each side of a streamed decode segment — same margin as the
#: chunked decoder's overlap (``dac_vae._DECODE_OVERLAP`` = 32 >> the DAC decoder's
#: ~12-frame receptive field), so every emitted sample sees full true context and the
#: streamed audio matches the one-shot decode (test_pipeline::test_long_stream_*).
_STREAM_HALO = 32


def generate_audio_long_stream(
    bundle: ModelBundle,
    text_feat: jnp.ndarray,
    uncond_text_feat: jnp.ndarray,
    duration_s: float,
    *,
    clip_feat: Optional[jnp.ndarray] = None,
    sync_feat: Optional[jnp.ndarray] = None,
    window_s: float = 30.0,
    overlap_s: Optional[float] = None,
    guidance_scale: float = 4.5,
    num_inference_steps: int = 50,
    sampler: str = "euler",
    batch_size: int = 1,
    seed: int = 0,
    attn_impl: str = "auto",
    text_bucket: Optional[int] = None,
    fetch_pcm16: bool = True,
    snap_to_window_grid: bool = False,
    first_window_s: Optional[float] = None,
) -> Iterator[StreamChunk]:
    """``generate_audio_long`` as a stream: yield each window's finalized audio as soon
    as it is denoised, instead of decoding once at the end.

    Time-to-first-audio for an N-window request drops from the full wall to ~one window
    (the reference has no analog — its 60 s cap makes everything single-shot,
    ``nodes.py:219``). Works because a window's latents are FINAL the moment it is
    denoised: the next window's inpainting clamp reproduces the overlap exactly
    (hard-set at the end of the window's denoise — any solver), so nothing emitted is
    ever revised. Each chunk decodes its
    segment with a ``_STREAM_HALO``-frame halo of true context on both interior sides
    (the same exactness argument as ``dac_vae.decode_chunked``); the held-back halo
    samples are emitted with the NEXT chunk once their right context exists. Chunk
    boundaries are sample-contiguous; the concatenation equals the batch path's output.
    Denoising stops early once the requested duration is fully emitted (grid snapping
    may schedule padding windows past it that nobody would hear)."""
    prep = _prepare_long(
        bundle, text_feat, uncond_text_feat, duration_s,
        clip_feat=clip_feat, sync_feat=sync_feat, window_s=window_s,
        overlap_s=overlap_s, batch_size=batch_size, seed=seed, attn_impl=attn_impl,
        text_bucket=text_bucket, snap_to_window_grid=snap_to_window_grid,
        use_cfg=guidance_scale > 1.0, first_window_s=first_window_s,
    )
    yield from _stream_segments(
        bundle, prep, duration_s=duration_s, guidance_scale=guidance_scale,
        num_inference_steps=num_inference_steps, fetch_pcm16=fetch_pcm16,
        sampler=sampler,
    )


def continue_audio(
    bundle: ModelBundle,
    audio: np.ndarray,
    text_feat: jnp.ndarray,
    uncond_text_feat: jnp.ndarray,
    extra_duration_s: float,
    *,
    context_s: float = 4.0,
    window_s: float = 30.0,
    overlap_s: Optional[float] = None,
    guidance_scale: float = 4.5,
    num_inference_steps: int = 50,
    sampler: str = "euler",
    batch_size: int = 1,
    seed: int = 0,
    attn_impl: str = "auto",
    text_bucket: Optional[int] = None,
    return_latents: bool = False,
    fetch_pcm16: bool = True,
    first_window_s: Optional[float] = None,
) -> GenerationResult:
    """Generate ``extra_duration_s`` seconds CONTINUING an existing waveform.

    The last ``context_s`` seconds of ``audio`` ([T] or [B, T] float at the DAC sample
    rate) are encoded to latents (posterior mode — deterministic; reference encoder
    ``dac.py:236-278``) and clamped as window 0's known prefix — the same flow-match
    inpainting mechanism long-form windows use on each other's tails, so the new audio
    attends to the real context and continues it. The returned audio is the NEW part
    only (``extra_duration_s`` long); its first samples decode with the context latents
    as left halo, so the waveform is continuous with the context's DAC *reconstruction*
    (a VAE re-encode — splice vs the original source at the seam is within the codec's
    reconstruction error, not bit-exact). T2A conditioning only (the learned empty
    visual sequences); composes with SDEdit (``pipeline/edit.py``) which re-prompts
    EXISTING audio instead of extending it. Beyond-reference capability: the reference
    has no continuation path at all."""
    cfg = bundle.pipeline_cfg
    sr = cfg.dac.sample_rate
    t0 = time.perf_counter()
    prep, ctx_frames, total_duration_s = _continuation_prep(
        bundle, audio, text_feat, uncond_text_feat, extra_duration_s,
        context_s=context_s, window_s=window_s, overlap_s=overlap_s,
        batch_size=batch_size, seed=seed, attn_impl=attn_impl,
        text_bucket=text_bucket, use_cfg=guidance_scale > 1.0,
        first_window_s=first_window_s,
    )
    t1 = time.perf_counter()
    parts = [
        ch.pcm16 if fetch_pcm16 else ch.audio[:, 0]
        for ch in _stream_segments(
            bundle, prep, duration_s=total_duration_s, guidance_scale=guidance_scale,
            num_inference_steps=num_inference_steps, fetch_pcm16=fetch_pcm16,
            emit_from_frame=ctx_frames, sampler=sampler,
        )
    ]
    t2 = time.perf_counter()

    audio_np = np.concatenate(parts, axis=-1)[:, : emitted_samples(extra_duration_s, sr)]
    if fetch_pcm16:
        audio_np = audio_np.astype(np.float32) / 32767.0
    audio_np = audio_np[:, None, :]
    extra_frames = cfg.latent_length(extra_duration_s)
    return GenerationResult(
        audio_first=audio_np[:1],
        audio_batch=audio_np,
        sample_rate=sr,
        latents=(np.asarray(prep.stitched[:, ctx_frames : ctx_frames + extra_frames])
                 if return_latents else None),
        timings={"prepare_s": t1 - t0, "denoise_decode_s": t2 - t1,
                 "windows": float(len(prep.sched)),
                 "context_frames": float(ctx_frames)},
    )


def continue_audio_stream(
    bundle: ModelBundle,
    audio: np.ndarray,
    text_feat: jnp.ndarray,
    uncond_text_feat: jnp.ndarray,
    extra_duration_s: float,
    *,
    context_s: float = 4.0,
    window_s: float = 30.0,
    overlap_s: Optional[float] = None,
    guidance_scale: float = 4.5,
    num_inference_steps: int = 50,
    sampler: str = "euler",
    batch_size: int = 1,
    seed: int = 0,
    attn_impl: str = "auto",
    text_bucket: Optional[int] = None,
    fetch_pcm16: bool = True,
    first_window_s: Optional[float] = None,
) -> Iterator[StreamChunk]:
    """``continue_audio`` as a stream (chunks are bitwise-identical to the batch path;
    ``start_sample`` is relative to the NEW audio, i.e. chunk 0 starts at 0)."""
    cfg = bundle.pipeline_cfg
    prep, ctx_frames, total_duration_s = _continuation_prep(
        bundle, audio, text_feat, uncond_text_feat, extra_duration_s,
        context_s=context_s, window_s=window_s, overlap_s=overlap_s,
        batch_size=batch_size, seed=seed, attn_impl=attn_impl,
        text_bucket=text_bucket, use_cfg=guidance_scale > 1.0,
        first_window_s=first_window_s,
    )
    base = ctx_frames * cfg.dac.hop_length
    for ch in _stream_segments(
        bundle, prep, duration_s=total_duration_s, guidance_scale=guidance_scale,
        num_inference_steps=num_inference_steps, fetch_pcm16=fetch_pcm16,
        emit_from_frame=ctx_frames, sampler=sampler,
    ):
        yield ch._replace(start_sample=ch.start_sample - base)


def _continuation_prep(
    bundle, audio, text_feat, uncond_text_feat, extra_duration_s, *,
    context_s, window_s, overlap_s, batch_size, seed, attn_impl, text_bucket, use_cfg,
    first_window_s=None,
) -> Tuple[_LongPrep, int, float]:
    """Encode the context tail and build the window plan shared by ``continue_audio``
    and ``continue_audio_stream`` -> (prep, ctx_frames, total_duration_s)."""
    cfg = bundle.pipeline_cfg
    sr, hop = cfg.dac.sample_rate, cfg.dac.hop_length
    rate = cfg.model.audio_frame_rate

    wav = np.asarray(audio, np.float32)
    if wav.ndim == 1:
        wav = wav[None]
    if wav.ndim == 3:  # [B, C, T] AUDIO-dict style: mono expected
        wav = wav[:, 0]
    ctx_samples = (min(wav.shape[1], int(context_s * sr)) // hop) * hop
    if ctx_samples < hop:
        raise ValueError(
            f"context audio must cover at least one latent frame ({hop} samples at "
            f"{sr} Hz); got {wav.shape[1]} samples with context_s={context_s}")
    tail = wav[:, wav.shape[1] - ctx_samples:]
    ctx_frames = ctx_samples // hop
    win_frames = cfg.latent_length(window_s)
    if ctx_frames >= win_frames:
        raise ValueError(
            f"context ({ctx_frames} latent frames) must be shorter than the window "
            f"({win_frames}); lower context_s or raise window_s")

    from foley_tpu.pipeline.edit import _encode_jit  # shared cached jit wrapper

    posterior = _encode_jit(bundle.dac_params, jnp.asarray(tail)[..., None], cfg.dac)
    z = posterior.mode().astype(jnp.float32)
    if bundle.latent_stats is not None:  # from-scratch models denoise standardized
        mean, std = bundle.latent_stats
        z = (z - mean) / std

    total_frames = ctx_frames + cfg.latent_length(extra_duration_s)
    total_duration_s = total_frames / rate
    prep = _prepare_long(
        bundle, text_feat, uncond_text_feat, total_duration_s,
        clip_feat=None, sync_feat=None, window_s=window_s, overlap_s=overlap_s,
        batch_size=batch_size, seed=seed, attn_impl=attn_impl,
        text_bucket=text_bucket, snap_to_window_grid=False,
        use_cfg=use_cfg, known_prefix=np.asarray(z), first_window_s=first_window_s,
    )
    return prep, ctx_frames, total_duration_s


def _stream_segments(
    bundle, prep: _LongPrep, *, duration_s: float, guidance_scale: float,
    num_inference_steps: int, fetch_pcm16: bool, emit_from_frame: int = 0,
    sampler: str = "euler",
) -> Iterator[StreamChunk]:
    """Denoise the window schedule and decode/emit finalized segments as they appear —
    the ONE segmentation both ``generate_audio_long`` (concatenates) and
    ``generate_audio_long_stream`` (yields) consume, which is what makes the two paths
    bitwise-identical: same decode programs on same inputs. (A naive "stream decodes
    per window, batch decodes once at the end" split is NOT bitwise stable: XLA picks
    different conv algorithms at different input lengths, and the ~1e-5 prefix
    differences amplify through the decoder stack — catastrophically so under the
    random-init test decoders.)"""
    cfg = bundle.pipeline_cfg
    hop = cfg.dac.hop_length
    sr = cfg.dac.sample_rate
    n_total = emitted_samples(duration_s, sr)
    n_windows = len(prep.sched)
    prev_cut = emit_from_frame  # continuation: the known context is not re-emitted
    for w_i, start, win in _run_windows(bundle, prep, guidance_scale=guidance_scale,
                                        num_inference_steps=num_inference_steps,
                                        sampler=sampler):
        avail = start + win  # latent frames finalized so far
        last = w_i == n_windows - 1
        # hold back a halo before the emit cut so the next chunk can decode it with
        # true right context; the final window emits through the true sequence edge
        # (max: degenerate sub-halo windows emit an empty chunk rather than go backwards)
        cut = prep.total_frames if last else max(avail - _STREAM_HALO, prev_cut)
        seg_lo = max(0, prev_cut - _STREAM_HALO)
        latents_seg = jnp.asarray(prep.stitched[:, seg_lo:avail])
        audio_seg = _decode_long(
            bundle.dac_params, latents_seg, cfg.dac, bundle.latent_stats,
            fetch_pcm16=fetch_pcm16,
        )
        o = (prev_cut - seg_lo) * hop
        n_keep = min(cut * hop, n_total) - prev_cut * hop
        raw = np.asarray(audio_seg)[:, o : o + n_keep, 0]
        if fetch_pcm16:
            pcm16 = raw
            audio = (raw.astype(np.float32) / 32767.0)[:, None, :]
        else:
            pcm16 = None
            audio = raw[:, None, :]
        # With snap_to_window_grid=False and an off-latent-grid duration,
        # total_frames*hop < n_total, so the sample-count test alone would end the
        # iterator without ever yielding final=True — the last scheduled window is
        # final by construction regardless.
        final = last or cut * hop >= n_total
        yield StreamChunk(
            start_sample=prev_cut * hop, audio=audio, pcm16=pcm16, sample_rate=sr,
            window_index=w_i, n_windows=n_windows, final=final,
        )
        if final:
            return  # remaining schedule (grid-snap padding) is past the requested length
        prev_cut = cut


@partial(jax.jit, static_argnames=("dac_cfg", "chunk_frames", "output_pcm16"))
def _decode_long_jit(dac_params, latents, latent_stats, *, dac_cfg, chunk_frames,
                     output_pcm16):
    from foley_tpu.models import dac_vae

    raw = latents
    if latent_stats is not None:
        mean, std = latent_stats
        raw = latents * std + mean
    if chunk_frames:
        audio = dac_vae.decode_chunked(dac_params, raw, dac_cfg, chunk_frames)
    else:
        audio = dac_vae.decode(dac_params, raw, dac_cfg)
    if output_pcm16:
        audio = jnp.round(jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    return audio


#: Long-form segment decodes chunk ABOVE this (vs the fused single-program path's 1536):
#: they dispatch standalone next to the resident XXL weights, so a 30 s window's plain
#: fp32 decode temps (~2.7 GiB, 4 tile-padded [1, T*960, 64] intermediates) are worth
#: trading for decode_chunked's one-window-at-a-time footprint (~0.9 GiB at chunk 512).
_LONG_DECODE_CHUNK_THRESHOLD = 1024


def _decode_long(dac_params, latents, dac_cfg, latent_stats, *, fetch_pcm16):
    chunk = (_DECODE_CHUNK_FRAMES
             if latents.shape[1] > _LONG_DECODE_CHUNK_THRESHOLD else None)
    return _decode_long_jit(
        dac_params, latents, latent_stats, dac_cfg=dac_cfg, chunk_frames=chunk,
        output_pcm16=fetch_pcm16,
    )
