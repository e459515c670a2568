"""Two-phase generation orchestration — the Sampler-node equivalent.

Mirrors ``HunyuanFoleySampler.generate_audio`` (reference ``nodes.py:211-427``):
phase 1 extracts conditioning features (SigLIP2/Synchformer/CLAP or T2A empty sequences),
phase 2 runs the CFG denoise loop and DAC decode, returning two AUDIO outputs
(first-of-batch and full batch) at 48 kHz.

TPU-first: the reference's ping-pong GPU residency dance (encoders on, denoiser off, swap)
is replaced by XLA memory management plus optional host offload of encoder params between
phases (``foley_tpu/parallel/offload.py``); phase 2 is a single jitted program per
(duration, batch, text-bucket) shape bucket.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.configs import PipelineConfig
from foley_tpu.models import dac_vae
from foley_tpu.pipeline.features import (
    pick_text_bucket,
    prepare_cfg_features,
    t2a_features,
)
from foley_tpu.sampling.denoise import DenoiseFeatures, denoise_latents, prepare_latents
from foley_tpu.utils.logging import get_logger

logger = get_logger()


class ModelBundle(NamedTuple):
    """All loaded model state for generation."""

    mmdit_params: Dict
    dac_params: Dict
    pipeline_cfg: PipelineConfig
    encoders: Optional[Dict] = None  # {"clap": ..., "siglip2": ..., "synchformer": ...}
    compute_dtype: jnp.dtype = jnp.bfloat16
    offload_fetch: bool = False  # block stacks live in pinned host memory (block-swap analog)
    offload_prefetch: int = 1  # HBM fetch window for split stacks (1 = gated serial fetch)
    latent_stats: Optional[tuple] = None  # (mean[C], std[C]) for from-scratch-trained models
    progress: bool = False  # per-step host progress ticks (reference ProgressBar UX)


@dataclasses.dataclass
class GenerationResult:
    """Mirror of the sampler node's two AUDIO outputs (``nodes.py:417-427``)."""

    audio_first: np.ndarray   # [1, C, T]
    audio_batch: np.ndarray   # [B, C, T]
    sample_rate: int
    latents: Optional[np.ndarray] = None
    timings: Optional[Dict[str, float]] = None


_decode_jit = jax.jit(dac_vae.decode, static_argnames=("cfg",))

# Above this latent length the fused program decodes in chunks (dac_vae.decode_chunked):
# exact output, ~1/5 the fp32 decode temps. 1536 frames ~= 30 s; the 16 GiB-chip killer is
# 60 s XXL bf16 (four 1.37 GiB decode intermediates, ROADMAP long-form entry). Shorter runs
# keep the single full-length decode XLA already fuses well.
_DECODE_CHUNK_THRESHOLD = 1536
_DECODE_CHUNK_FRAMES = 512


def generate_audio(
    bundle: ModelBundle,
    text_feat: jnp.ndarray,
    uncond_text_feat: jnp.ndarray,
    duration_s: float,
    *,
    clip_feat: Optional[jnp.ndarray] = None,
    sync_feat: Optional[jnp.ndarray] = None,
    guidance_scale: float = 4.5,
    num_inference_steps: int = 50,
    sampler: str = "euler",
    batch_size: int = 1,
    seed: int = 0,
    attn_impl: str = "auto",
    text_bucket: Optional[int] = None,
    return_latents: bool = False,
    fetch_pcm16: bool = True,
) -> GenerationResult:
    """Generate Foley audio from prepared text features (+ optional visual features).

    T2A (no video): ``clip_feat``/``sync_feat`` default to the model's learned empty
    sequences with duration-derived lengths (``nodes.py:322-338``).

    ``fetch_pcm16`` (default): the fused program emits 16-bit PCM and the host dequantizes
    (``pcm/32767``) — the written WAV bytes are identical to the float path's (write_wav is
    16-bit PCM either way) at half the device->host transfer. ``False`` restores the full
    fp32 waveform fetch for bit-level float comparisons.
    """
    cfg = bundle.pipeline_cfg
    t0 = time.perf_counter()

    t2a = clip_feat is None or sync_feat is None
    if t2a:
        clip_feat, sync_feat = t2a_features(bundle.mmdit_params, cfg, duration_s, batch_size=1)

    use_cfg = guidance_scale > 1.0
    features = prepare_cfg_features(
        bundle.mmdit_params,
        text_feat,
        uncond_text_feat,
        clip_feat,
        sync_feat,
        batch_size=batch_size,
        use_cfg=use_cfg,
        text_bucket=text_bucket or pick_text_bucket(int(text_feat.shape[1])),
    )

    latent_len = cfg.latent_length(duration_s)
    from foley_tpu.ops.attention import resolve_attn_impl

    attn_impl = resolve_attn_impl(attn_impl, latent_len)
    key = jax.random.PRNGKey(seed)
    latents = prepare_latents(key, batch_size, latent_len, cfg.model.audio_vae_latent_dim)

    t1 = time.perf_counter()
    from foley_tpu.sampling.denoise import denoise_and_decode

    final_latents, audio = denoise_and_decode(
        bundle.mmdit_params,
        bundle.dac_params,
        latents,
        features,
        jnp.float32(guidance_scale),
        bundle.latent_stats,
        cfg=cfg.model,
        diffusion=cfg.diffusion,
        dac_cfg=cfg.dac,
        num_steps=num_inference_steps,
        solver=sampler,
        use_cfg=use_cfg,
        attn_impl=attn_impl,
        compute_dtype=bundle.compute_dtype,
        offload_fetch=bundle.offload_fetch,
        offload_prefetch=bundle.offload_prefetch,
        progress=bundle.progress,
        decode_chunk_frames=_DECODE_CHUNK_FRAMES if latent_len > _DECODE_CHUNK_THRESHOLD else None,
        output_pcm16=fetch_pcm16,
        # T2A: the cond visuals ARE the learned empty sequences the uncond half uses, so
        # the CFG halves are identical — the forward halves the visual-derived GEMMs.
        visual_rows_shared=t2a and use_cfg,
    )
    audio = jax.block_until_ready(audio)  # [B, samples, 1] fp32 (or int16 PCM)
    t2 = time.perf_counter()

    # Trim by *samples* (the reference's channel-dim slice at utils.py:257 is a no-op bug;
    # see SURVEY.md Appendix B).
    n_samples = int(duration_s * cfg.dac.sample_rate)
    audio_np = np.asarray(audio)[:, :n_samples, 0]  # [B, T]
    if fetch_pcm16:
        audio_np = audio_np.astype(np.float32) / 32767.0
    audio_np = audio_np[:, None, :]  # [B, C=1, T] AUDIO layout

    return GenerationResult(
        audio_first=audio_np[:1],
        audio_batch=audio_np,
        sample_rate=cfg.dac.sample_rate,
        latents=np.asarray(final_latents) if return_latents else None,
        timings={"prepare_s": t1 - t0, "denoise_decode_s": t2 - t1},
    )


def generate_audio_multi(
    bundle: ModelBundle,
    text_feats: jnp.ndarray,          # [N, L, D] one row per request
    uncond_text_feats: jnp.ndarray,   # [N, L, D]
    duration_s: float,
    seeds,                            # sequence of N seeds
    *,
    guidance_scale: float = 4.5,
    num_inference_steps: int = 50,
    sampler: str = "euler",
    attn_impl: str = "auto",
    text_bucket: Optional[int] = None,
    return_latents: bool = False,
) -> GenerationResult:
    """Batched generation with *distinct per-row prompts and seeds* (serving micro-batching).

    Unlike ``generate_audio`` (one prompt repeated ``batch_size`` times, the reference's
    batch semantics), every row here is an independent request sharing one TPU program.
    T2A only (empty visual sequences)."""
    from foley_tpu.pipeline.features import pad_or_trim_time

    cfg = bundle.pipeline_cfg
    n = text_feats.shape[0]
    bucket = text_bucket or pick_text_bucket(int(text_feats.shape[1]))
    text = pad_or_trim_time(jnp.asarray(text_feats), bucket)
    uncond = pad_or_trim_time(jnp.asarray(uncond_text_feats), bucket)

    clip_len, sync_len = cfg.t2a_lengths(duration_s)
    from foley_tpu.models import mmdit as mmdit_mod

    clip = mmdit_mod.get_empty_clip_sequence(bundle.mmdit_params, n, clip_len)
    sync = mmdit_mod.get_empty_sync_sequence(bundle.mmdit_params, n, sync_len)

    use_cfg = guidance_scale > 1.0
    if use_cfg:
        features = DenoiseFeatures(
            cond=jnp.concatenate([uncond, text], axis=0),
            clip_feat=jnp.concatenate([clip, clip], axis=0),
            sync_feat=jnp.concatenate([sync, sync], axis=0),
        )
    else:
        features = DenoiseFeatures(cond=text, clip_feat=clip, sync_feat=sync)

    latent_len = cfg.latent_length(duration_s)
    from foley_tpu.ops.attention import resolve_attn_impl

    attn_impl = resolve_attn_impl(attn_impl, latent_len)
    rows = [
        prepare_latents(jax.random.PRNGKey(int(s)), 1, latent_len, cfg.model.audio_vae_latent_dim)
        for s in seeds
    ]
    latents = jnp.concatenate(rows, axis=0)

    from foley_tpu.sampling.denoise import denoise_and_decode

    # One fused program (single dispatch) + int16 PCM fetch, same as generate_audio.
    final_latents, audio = denoise_and_decode(
        bundle.mmdit_params, bundle.dac_params, latents, features,
        jnp.float32(guidance_scale), bundle.latent_stats,
        cfg=cfg.model, diffusion=cfg.diffusion, dac_cfg=cfg.dac,
        num_steps=num_inference_steps,
        solver=sampler, use_cfg=use_cfg, attn_impl=attn_impl,
        compute_dtype=bundle.compute_dtype, offload_fetch=bundle.offload_fetch,
        offload_prefetch=bundle.offload_prefetch, progress=bundle.progress,
        decode_chunk_frames=_DECODE_CHUNK_FRAMES if latent_len > _DECODE_CHUNK_THRESHOLD else None,
        output_pcm16=True,
        visual_rows_shared=use_cfg,  # T2A-only entry point: [clip; clip] halves by construction
    )
    audio = jax.block_until_ready(audio)
    n_samples = int(duration_s * cfg.dac.sample_rate)
    audio_np = np.asarray(audio)[:, :n_samples, 0].astype(np.float32) / 32767.0
    audio_np = audio_np[:, None, :]
    return GenerationResult(
        audio_first=audio_np[:1], audio_batch=audio_np, sample_rate=cfg.dac.sample_rate,
        latents=np.asarray(final_latents) if return_latents else None,
    )


def select_audio_from_batch(audio_batch: np.ndarray, index: int) -> np.ndarray:
    """Pick one waveform from an AUDIO batch, clamping OOB (reference ``nodes.py:636-663``)."""
    index = max(0, min(index, audio_batch.shape[0] - 1))
    return audio_batch[index : index + 1]
