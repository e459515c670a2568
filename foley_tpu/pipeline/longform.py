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
stitching is a pure concatenation in latent space (no audio-domain crossfade) followed by
one chunked DAC decode over the full sequence.

Memory is bounded by the window length regardless of total duration; per-window compute
reuses at most three compiled programs (first / interior / final window, which differ only
in the static ``known_frames``).

T2A only: the learned empty visual sequences tile to any window length. V2A conditioning
would need time-sliced clip/sync features per window (the sync segment grid is not
linear in time) — raise rather than approximate.
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.pipeline.features import pick_text_bucket, prepare_cfg_features, t2a_features
from foley_tpu.pipeline.generate import (
    _DECODE_CHUNK_FRAMES,
    _DECODE_CHUNK_THRESHOLD,
    GenerationResult,
    ModelBundle,
)
from foley_tpu.sampling.denoise import denoise_latents, prepare_latents
from foley_tpu.utils.logging import get_logger

logger = get_logger()


def window_schedule(
    total_frames: int, win_frames: int, ov_frames: int
) -> List[Tuple[int, int]]:
    """[(start_frame, known_frames), ...] covering [0, total_frames) with ``win_frames``
    windows overlapping by >= ``ov_frames``.

    Interior windows advance by ``win - ov``; the final window is right-aligned to end
    exactly at ``total_frames`` (its overlap with already-generated content grows as
    needed), so only <= 3 distinct ``known_frames`` values (= compiled variants) occur."""
    if ov_frames >= win_frames:
        raise ValueError(f"overlap ({ov_frames}) must be smaller than window ({win_frames})")
    if win_frames >= total_frames:
        return [(0, 0)]
    step = win_frames - ov_frames
    starts = list(range(0, total_frames - win_frames, step))
    starts.append(total_frames - win_frames)
    sched: List[Tuple[int, int]] = []
    prev_end = 0
    for s in starts:
        if s + win_frames <= prev_end:
            continue  # right-aligned final window already covered by the previous one
        sched.append((s, prev_end - s if prev_end else 0))
        prev_end = s + win_frames
    return sched


def generate_audio_long(
    bundle: ModelBundle,
    text_feat: jnp.ndarray,
    uncond_text_feat: jnp.ndarray,
    duration_s: float,
    *,
    window_s: float = 30.0,
    overlap_s: Optional[float] = None,
    guidance_scale: float = 4.5,
    num_inference_steps: int = 50,
    batch_size: int = 1,
    seed: int = 0,
    attn_impl: str = "auto",
    text_bucket: Optional[int] = None,
    return_latents: bool = False,
    fetch_pcm16: bool = True,
    snap_to_window_grid: bool = False,
) -> GenerationResult:
    """Generate ``duration_s`` seconds of audio (any length) in ``window_s`` windows.

    Determinism: the noise for the FULL stitched latent sequence is drawn once from
    ``seed``; every window uses its slice, so overlap regions see consistent noise and the
    result is a pure function of (seed, conditioning, schedule). Euler solver (the clamp's
    requirement — and the reference's own recommendation, ``nodes.py:227``)."""
    cfg = bundle.pipeline_cfg
    t0 = time.perf_counter()
    if overlap_s is None:
        overlap_s = min(5.0, window_s / 4.0)  # small windows keep a proportional overlap

    total_frames = cfg.latent_length(duration_s)
    win_frames = cfg.latent_length(window_s)
    ov_frames = cfg.latent_length(overlap_s)
    if snap_to_window_grid and total_frames > win_frames:
        # Production-serving mode: generate on the window-stride grid (slightly more than
        # requested, trimmed to duration below) so every window clamps exactly ov_frames
        # and the decode length quantizes — arbitrary durations reuse a BOUNDED set of
        # compiled programs instead of compiling a fresh final-window/decode shape each.
        step = win_frames - ov_frames
        total_frames = win_frames + -(-(total_frames - win_frames) // step) * step
    sched = window_schedule(total_frames, win_frames, ov_frames)
    if len(sched) == 1:
        win_frames = total_frames  # single window: exactly generate_audio's geometry
    win_duration = win_frames / cfg.model.audio_frame_rate

    # T2A conditioning at the WINDOW duration — identical for every window
    clip_feat, sync_feat = t2a_features(bundle.mmdit_params, cfg, win_duration, batch_size=1)
    use_cfg = guidance_scale > 1.0
    features = prepare_cfg_features(
        bundle.mmdit_params, text_feat, uncond_text_feat, clip_feat, sync_feat,
        batch_size=batch_size, use_cfg=use_cfg,
        text_bucket=text_bucket or pick_text_bucket(int(text_feat.shape[1])),
    )

    from foley_tpu.ops.attention import resolve_attn_impl

    attn_impl = resolve_attn_impl(attn_impl, win_frames)
    noise = prepare_latents(
        jax.random.PRNGKey(seed), batch_size, max(total_frames, win_frames),
        cfg.model.audio_vae_latent_dim,
    )

    stitched = np.zeros((batch_size, max(total_frames, win_frames),
                         cfg.model.audio_vae_latent_dim), np.float32)
    t1 = time.perf_counter()
    for w_i, (start, known) in enumerate(sched):
        win_noise = noise[:, start : start + win_frames]
        if known:
            known_lat = jnp.asarray(stitched[:, start : start + known])
        else:
            known_lat = None
        logger.info(
            f"long-form window {w_i + 1}/{len(sched)}: frames [{start}, {start + win_frames})"
            + (f", {known} clamped" if known else "")
        )
        win_out = denoise_latents(
            bundle.mmdit_params, win_noise, features, jnp.float32(guidance_scale),
            known_lat,
            cfg=cfg.model, diffusion=cfg.diffusion, num_steps=num_inference_steps,
            solver="euler", use_cfg=use_cfg, attn_impl=attn_impl,
            compute_dtype=bundle.compute_dtype,
            offload_fetch=bundle.offload_fetch, offload_prefetch=bundle.offload_prefetch,
            progress=bundle.progress,
            visual_rows_shared=use_cfg,  # T2A by construction
            known_frames=known,
        )
        # the clamped prefix equals the previous tail exactly; copying the whole window is
        # therefore seamless (asserted in tests at fp32 equality)
        stitched[:, start : start + win_frames] = np.asarray(win_out)

    final_latents = jnp.asarray(stitched[:, :total_frames])
    audio = _decode_long(
        bundle.dac_params, final_latents, cfg.dac, bundle.latent_stats,
        fetch_pcm16=fetch_pcm16,
    )
    audio = jax.block_until_ready(audio)
    t2 = time.perf_counter()

    n_samples = int(duration_s * cfg.dac.sample_rate)
    audio_np = np.asarray(audio)[:, :n_samples, 0]
    if fetch_pcm16:
        audio_np = audio_np.astype(np.float32) / 32767.0
    audio_np = audio_np[:, None, :]
    requested_frames = cfg.latent_length(duration_s)  # grid snapping may have padded
    return GenerationResult(
        audio_first=audio_np[:1],
        audio_batch=audio_np,
        sample_rate=cfg.dac.sample_rate,
        latents=np.asarray(final_latents)[:, :requested_frames] if return_latents else None,
        timings={"prepare_s": t1 - t0, "denoise_decode_s": t2 - t1,
                 "windows": float(len(sched))},
    )


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


def _decode_long(dac_params, latents, dac_cfg, latent_stats, *, fetch_pcm16):
    chunk = _DECODE_CHUNK_FRAMES if latents.shape[1] > _DECODE_CHUNK_THRESHOLD else None
    return _decode_long_jit(
        dac_params, latents, latent_stats, dac_cfg=dac_cfg, chunk_frames=chunk,
        output_pcm16=fetch_pcm16,
    )
