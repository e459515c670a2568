"""Audio-to-audio editing: re-prompt an existing sound (SDEdit-style partial denoise).

Composes capabilities that exist separately in the reference but were never wired together
(DAC encode ``dac.py:236-278`` + the scheduler's mid-schedule entry ``set_begin_index`` /
``index_for_timestep``): encode the source waveform to latents, renoise them to
``sigmas[begin_index]`` on the linear flow path, then resume the CFG denoise from there with
the new prompt. ``strength`` in (0, 1] picks how much of the schedule to re-run (1.0 = full
regeneration, small = light touch-up).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.models import dac_vae
from foley_tpu.pipeline.features import pick_text_bucket, prepare_cfg_features, t2a_features
from foley_tpu.pipeline.generate import GenerationResult, ModelBundle, _decode_jit
from foley_tpu.sampling.denoise import denoise_latents
from foley_tpu.sampling.flow_match import get_sigmas

_encode_jit = jax.jit(dac_vae.encode, static_argnames=("cfg",))


def edit_audio(
    bundle: ModelBundle,
    audio: np.ndarray,                 # [T] or [B, T] float waveform at cfg.dac.sample_rate
    text_feat: jnp.ndarray,
    uncond_text_feat: jnp.ndarray,
    *,
    strength: float = 0.6,
    guidance_scale: float = 4.5,
    num_inference_steps: int = 50,
    sampler: str = "euler",
    seed: int = 0,
    clip_feat: Optional[jnp.ndarray] = None,
    sync_feat: Optional[jnp.ndarray] = None,
    text_bucket: Optional[int] = None,
) -> GenerationResult:
    """Edit ``audio`` toward the new prompt. Returns the standard GenerationResult."""
    assert 0.0 < strength <= 1.0, strength
    cfg = bundle.pipeline_cfg
    wav = np.asarray(audio, np.float32)
    if wav.ndim == 1:
        wav = wav[None]
    b, t = wav.shape
    hop = cfg.dac.hop_length
    t_pad = ((t + hop - 1) // hop) * hop
    if t_pad != t:
        wav = np.pad(wav, ((0, 0), (0, t_pad - t)))
    duration_s = t_pad / cfg.dac.sample_rate

    # 1. encode to latents (posterior mode — deterministic)
    posterior = _encode_jit(bundle.dac_params, jnp.asarray(wav)[..., None], cfg.dac)
    z1 = posterior.mode().astype(jnp.float32)  # [B, T_lat, D] "data" end of the flow
    if bundle.latent_stats is not None:
        # from-scratch-trained models denoise in the standardized latent space
        mean, std = bundle.latent_stats
        z1 = (z1 - mean) / std

    # 2. renoise to sigmas[begin_index] on the linear path: x_sigma = (1-s) x1 + s x0
    begin_index = int(round((1.0 - strength) * num_inference_steps))
    begin_index = min(max(begin_index, 0), num_inference_steps - 1)
    sigmas = get_sigmas(
        num_inference_steps,
        shift=cfg.diffusion.sample_flow_shift,
        reverse=cfg.diffusion.flow_reverse,
    )
    sigma = sigmas[begin_index]
    noise = jax.random.normal(jax.random.PRNGKey(seed), z1.shape, jnp.float32)
    latents = (1.0 - sigma) * z1 + sigma * noise

    # 3. conditioning (empty visual sequences for pure text-driven edits)
    if clip_feat is None or sync_feat is None:
        clip_feat, sync_feat = t2a_features(bundle.mmdit_params, cfg, duration_s, batch_size=1)
    use_cfg = guidance_scale > 1.0
    features = prepare_cfg_features(
        bundle.mmdit_params, text_feat, uncond_text_feat, clip_feat, sync_feat,
        batch_size=b, use_cfg=use_cfg,
        text_bucket=text_bucket or pick_text_bucket(int(text_feat.shape[1])),
    )

    # 4. resume the ODE from begin_index
    final_latents = denoise_latents(
        bundle.mmdit_params, latents, features, jnp.float32(guidance_scale),
        cfg=cfg.model, diffusion=cfg.diffusion, num_steps=num_inference_steps,
        solver=sampler, use_cfg=use_cfg, compute_dtype=bundle.compute_dtype,
        begin_index=begin_index, offload_fetch=bundle.offload_fetch,
    )
    if bundle.latent_stats is not None:
        mean, std = bundle.latent_stats
        final_latents = final_latents * std + mean
    out = _decode_jit(bundle.dac_params, final_latents, cfg.dac)
    out_np = np.asarray(out)[:, :t, 0][:, None, :]
    return GenerationResult(
        audio_first=out_np[:1], audio_batch=out_np, sample_rate=cfg.dac.sample_rate,
        timings=None,
    )
