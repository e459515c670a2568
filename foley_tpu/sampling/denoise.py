"""End-to-end jitted denoise loop: CFG-batched MMDiT evals under one ``lax.scan``.

Reference behavior (``utils.py:125-258`` ``denoise_process_with_generator``):
- initial latents [B, T=duration*50, 128] from the seeded generator;
- CFG pairs built once outside the loop: ``cat([uncond, cond])`` (uncond is row 0);
- per step: ``latent_input = cat([latents]*2)``, model eval in the compute dtype,
  ``v = u + s*(c - u)``, scheduler step in fp32;
- after the loop: DAC decode in fp32, trim to ``duration * sample_rate`` samples.

TPU-first: the whole loop is one ``jax.lax.scan`` inside one ``jit`` — no host round-trips
between steps, solver state carried explicitly, timestep broadcast traced. Shapes are static
per (duration, batch, text-bucket), matching the reference's compile-signature bucketing
(``nodes.py:497-568``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from foley_tpu.configs import DiffusionConfig, MMDiTConfig
from foley_tpu.models import mmdit
from foley_tpu.sampling.flow_match import (
    get_sigmas,
    get_timesteps,
    interpolant_sigma,
    solver_init,
    solver_step,
)


def _progress_tick(step_i, n_steps, t) -> None:
    """Host-side per-step progress line (reference ProgressBar.update, utils.py:201,247)."""
    from foley_tpu.utils.logging import get_logger

    get_logger().info(f"denoise step {int(step_i) + 1}/{n_steps} (t={float(t):.1f})")


class DenoiseFeatures(NamedTuple):
    """Condition tensors, already CFG-stacked to leading dim 2B (or B when guidance<=1)."""

    cond: jnp.ndarray       # [2B, L_text, D_text]
    clip_feat: jnp.ndarray  # [2B, L_clip, D_clip]
    sync_feat: jnp.ndarray  # [2B, S*8, D_sync]


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "diffusion", "num_steps", "solver", "use_cfg", "attn_impl", "compute_dtype",
        "begin_index", "offload_fetch", "offload_prefetch", "progress",
        "visual_rows_shared", "known_frames",
    ),
)
def denoise_latents(
    params: Dict,
    latents: jnp.ndarray,
    features: DenoiseFeatures,
    guidance_scale: jnp.ndarray,
    known_latents: Optional[jnp.ndarray] = None,
    *,
    cfg: MMDiTConfig,
    diffusion: DiffusionConfig,
    num_steps: int,
    solver: str = "euler",
    use_cfg: bool = True,
    attn_impl: str = "xla",
    compute_dtype=jnp.bfloat16,
    begin_index: int = 0,
    offload_fetch: bool = False,
    offload_prefetch: int = 1,
    progress: bool = False,
    visual_rows_shared: bool = False,
    known_frames: int = 0,
) -> jnp.ndarray:
    """Run the full flow-matching ODE. latents: [B, T, C] (any float dtype) -> fp32 [B, T, C].

    ``guidance_scale`` is traced (no recompile when the user moves the CFG slider);
    ``use_cfg`` (guidance_scale > 1, controls the batching structure) is static.
    ``begin_index`` starts mid-schedule (the reference's ``set_begin_index`` /
    ``index_for_timestep`` img2img capability, ``scheduling_flow_match_discrete.py:106-192``):
    pass latents already noised to ``sigmas[begin_index]`` for audio-to-audio editing.
    ``visual_rows_shared`` (static): promise that the CFG halves of the visual features are
    identical (T2A — cond visuals ARE the learned empty sequences); the forward then halves
    the visual-derived GEMMs (``mmdit.apply``). Only meaningful with ``use_cfg``.

    ``known_frames``/``known_latents`` (flow-match inpainting, the windowed long-form
    mechanism — ``pipeline/longform.py``): the first ``known_frames`` latent frames are
    CLAMPED after every solver step to the training interpolant
    ``(1-sigma)*known + sigma*noise0`` (``training/train.py:9-11`` convention; ``noise0`` is
    this call's own initial noise for those frames) at the sigma the sample NOMINALLY sits
    at (``flow_match.interpolant_sigma``: interval boundary for euler / completed stages,
    the stage's intermediate position mid-interval for multi-stage solvers), so the free
    suffix always denoises conditioned on a correctly-noised prefix through attention.
    After the scan the prefix is hard-set to ``known_latents`` — exactness does NOT depend
    on the trajectory reaching sigma=0 (multi-stage solvers only complete
    ``num_steps/stages`` intervals in the reference's fixed step budget, flow_match.py:9-14,
    so their final clamp sigma is interior; euler's is exactly 0 and the hard set is a
    no-op there). The prefix is known by definition — re-emitting it exactly is the
    windowed-path contract (every later window clamps to it), not a regeneration.
    """
    sigmas = get_sigmas(
        num_steps,
        shift=diffusion.sample_flow_shift,
        reverse=diffusion.flow_reverse,
        use_flux_shift=diffusion.use_flux_shift,
        flux_base_shift=diffusion.flux_base_shift,
        flux_max_shift=diffusion.flux_max_shift,
        n_tokens=latents.shape[1] if diffusion.use_flux_shift else None,
    )
    timesteps = get_timesteps(sigmas, diffusion.num_train_timesteps)
    if begin_index:
        timesteps = timesteps[begin_index:]

    cond = features.cond.astype(compute_dtype)
    clip_feat = features.clip_feat.astype(compute_dtype)
    sync_feat = features.sync_feat.astype(compute_dtype)
    g = guidance_scale.astype(jnp.float32)

    # Hoist the timestep-invariant text cross-attention K/V out of the step scan: computed
    # once per generation here instead of 18x per step inside it (mmdit.precompute_text_kv;
    # None when the triple stack is host-offloaded — streamed blocks compute in-block).
    text_kv = mmdit.precompute_text_kv(params, cond, cfg)
    # Hoist the triple blocks' adaLN vectors for the WHOLE (static) timestep schedule:
    # removes the [H, 9H] audio_mod/v_cond_mod weight reads (16% of XXL weight bytes) from
    # every step (mmdit.precompute_triple_mods; None when offloaded or per-token-modulated).
    triple_mods = mmdit.precompute_triple_mods(params, timesteps, cfg, compute_dtype)

    n_steps = int(timesteps.shape[0])
    known_noise = latents[:, :known_frames].astype(jnp.float32) if known_frames else None

    def step_fn(carry, xs):
        t, step_i = xs[0], xs[1]
        step_mods = (xs[2], xs[3]) if triple_mods is not None else None
        lat, state = carry  # lat: fp32
        if progress:
            # per-step tick, the reference's ProgressBar UX (utils.py:201,247). A host
            # callback inside the jitted scan: OFF by default (bench stays callback-free);
            # measured overhead is <1% at 50 steps (test_pipeline::test_progress_ticks).
            jax.debug.callback(_progress_tick, step_i, n_steps, t, ordered=False)
        latent_input = jnp.concatenate([lat, lat], axis=0) if use_cfg else lat
        latent_input = latent_input.astype(compute_dtype)
        t_expand = jnp.broadcast_to(t, (latent_input.shape[0],))
        v = mmdit.apply(
            params, latent_input, t_expand, cond, clip_feat, sync_feat, cfg,
            attn_impl=attn_impl, offload_fetch=offload_fetch, offload_prefetch=offload_prefetch,
            text_kv=text_kv, triple_mods=step_mods,
            visual_rows_shared=visual_rows_shared and use_cfg,
        ).astype(jnp.float32)
        if use_cfg:
            v_uncond, v_cond = jnp.split(v, 2, axis=0)
            v = v_uncond + g * (v_cond - v_uncond)
        lat, state = solver_step(solver, state, v, lat, sigmas)
        if known_frames:
            # re-project the known prefix onto its interpolant at the sigma the sample now
            # sits at (stage-aware for multi-stage solvers: heun-2's predictor is at the
            # interval end, midpoint-2's at the midpoint, ...)
            sig = interpolant_sigma(solver, state, sigmas)
            clamp = (1.0 - sig) * known_latents.astype(jnp.float32) + sig * known_noise
            lat = jnp.concatenate([clamp, lat[:, known_frames:]], axis=1)
        return (lat, state), None

    state0 = solver_init(solver, latents.shape)
    if begin_index:
        state0 = state0._replace(step_index=jnp.int32(begin_index))
    init = (latents.astype(jnp.float32), state0)
    xs = (timesteps, jnp.arange(n_steps, dtype=jnp.int32))
    if triple_mods is not None:
        xs = xs + triple_mods  # [S, N, 1, 9H] each: per-step slices feed the block scan
    (final_latents, _), _ = jax.lax.scan(step_fn, init, xs)
    if known_frames:
        # hard-set the prefix: exact regardless of the final trajectory sigma (see docstring)
        final_latents = jnp.concatenate(
            [known_latents.astype(jnp.float32), final_latents[:, known_frames:]], axis=1)
    return final_latents


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "diffusion", "dac_cfg", "num_steps", "solver", "use_cfg", "attn_impl",
        "compute_dtype", "begin_index", "offload_fetch", "offload_prefetch", "progress",
        "decode_chunk_frames", "output_pcm16", "visual_rows_shared",
    ),
)
def denoise_and_decode(
    params: Dict,
    dac_params: Dict,
    latents: jnp.ndarray,
    features: DenoiseFeatures,
    guidance_scale: jnp.ndarray,
    latent_stats=None,
    *,
    cfg: MMDiTConfig,
    diffusion: DiffusionConfig,
    dac_cfg,
    num_steps: int,
    solver: str = "euler",
    use_cfg: bool = True,
    attn_impl: str = "xla",
    compute_dtype=jnp.bfloat16,
    begin_index: int = 0,
    offload_fetch: bool = False,
    offload_prefetch: int = 1,
    progress: bool = False,
    decode_chunk_frames: Optional[int] = None,
    output_pcm16: bool = False,
    visual_rows_shared: bool = False,
):
    """Denoise + DAC decode as ONE program: a single host->device dispatch per generation
    (each dispatch costs tens of ms of round-trip latency on tunneled TPU runtimes).
    Returns (final_latents fp32 in MODEL latent space, audio fp32 [B, T*hop, 1]).

    ``latent_stats=(mean[C], std[C])``: models trained from scratch with standardized
    latents (``training/data.py::latent_stats_from_shards``) denoise in the standardized
    space; the inverse ``z*std + mean`` is applied before DAC decode. ``None`` (pretrained /
    reference models) decodes the model output directly."""
    from foley_tpu.models import dac_vae

    final_latents = denoise_latents(
        params, latents, features, guidance_scale,
        cfg=cfg, diffusion=diffusion, num_steps=num_steps, solver=solver, use_cfg=use_cfg,
        attn_impl=attn_impl, compute_dtype=compute_dtype, begin_index=begin_index,
        offload_fetch=offload_fetch, offload_prefetch=offload_prefetch, progress=progress,
        visual_rows_shared=visual_rows_shared,
    )
    raw = final_latents
    if latent_stats is not None:
        mean, std = latent_stats
        raw = final_latents * std + mean
    if decode_chunk_frames:
        # Long-form memory valve: chunked decode trims the fp32 decode temps to ~one
        # window's worth (exact — see dac_vae.decode_chunked). 60 s XXL bf16 OOMs without it.
        audio = dac_vae.decode_chunked(dac_params, raw, dac_cfg, decode_chunk_frames)
    else:
        audio = dac_vae.decode(dac_params, raw, dac_cfg)
    if output_pcm16:
        # Device-side 16-bit PCM with write_wav's exact rounding (clip -> *32767 ->
        # round-half-even, io/native.py:87): the WAV bytes are identical to the float path's,
        # at half the device->host bytes. On tunneled runtimes the [B, 240k] fp32 fetch is a
        # measured ~80 ms of a 5 s generation (ROADMAP host-prep entry).
        audio = jnp.round(jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    return final_latents, audio


def prepare_latents(
    key: jax.Array,
    batch_size: int,
    latent_length: int,
    latent_dim: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Seeded standard-normal initial latents [B, T, C].

    Equivalent role to the reference's ``randn_tensor(generator)`` (``utils.py:114-121``);
    noise bits necessarily differ from torch's Philox stream — parity is validated at the
    spectral-correlation level (BASELINE.json), not bitwise.
    """
    return jax.random.normal(key, (batch_size, latent_length, latent_dim), dtype)
