"""Standalone library surface — the reference's ``hunyuanvideo_foley`` package API.

Re-exported equivalents of ``load_model`` / ``denoise_process`` / ``feature_process``
(reference ``model_utils.py:17-487``, ``feature_utils.py:20-164``, re-exports
``hunyuanvideo_foley/__init__.py:15-18``), built on the lazy ``OffloadModelManager``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.configs import DACConfig, PipelineConfig, get_config
from foley_tpu.pipeline.generate import ModelBundle, generate_audio
from foley_tpu.pipeline.manager import OffloadModelManager
from foley_tpu.utils.logging import get_logger

logger = get_logger()

_CKPT_FILES = {
    "foley": ("hunyuanvideo_foley.safetensors", "hunyuanvideo_foley.pth"),
    "dac": ("vae_128d_48k.safetensors", "vae_128d_48k.pth"),
    "synchformer": ("synchformer_state_dict.safetensors", "synchformer_state_dict.pth"),
}


def _find(model_path: str, names) -> str:
    for n in names:
        p = os.path.join(model_path, n)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"None of {names} under {model_path}")


def load_model(
    model_path: str,
    config: str = "xxl",
    precision: str = "auto",
    quantization: str = "none",
    enable_offload: bool = True,
    lora_path: str = "",
    lora_scale: float = 1.0,
) -> OffloadModelManager:
    """Build the lazily-loaded five-model dict (reference ``model_utils.load_model``)."""
    cfg = get_config(config)
    manager = OffloadModelManager(policy="host" if enable_offload else "drop")
    manager.pipeline_cfg = cfg  # type: ignore[attr-defined]

    def load_foley():
        from foley_tpu.api.nodes import HunyuanModelLoader

        (fm,) = HunyuanModelLoader().load_model(
            _find(model_path, _CKPT_FILES["foley"]), precision, quantization, config,
            lora_path=lora_path, lora_scale=lora_scale,
        )
        return fm

    def load_dac():
        from foley_tpu.io.convert import convert_dac_state_dict, load_torch_state_dict

        sd = load_torch_state_dict(_find(model_path, _CKPT_FILES["dac"]))
        return {"params": convert_dac_state_dict(sd, cfg.dac, consume=True), "cfg": cfg.dac}

    def load_synchformer():
        from foley_tpu.models import synchformer

        return synchformer.load(_find(model_path, _CKPT_FILES["synchformer"]))

    def load_clap():
        from foley_tpu.models import clap

        return clap.load(os.path.join(model_path, "clap"))

    def load_siglip2():
        from foley_tpu.models import siglip2

        return siglip2.load(os.path.join(model_path, "siglip2"))

    manager.register("foley", load_foley)
    manager.register("dac", load_dac)
    manager.register("synchformer", load_synchformer)
    manager.register("clap", load_clap)
    manager.register("siglip2", load_siglip2)
    return manager


def feature_process(
    video_path: Optional[str],
    prompt: str,
    model_dict: OffloadModelManager,
    neg_prompt: str = "noisy, harsh",
    duration_s: Optional[float] = None,
) -> Tuple[Dict, Dict, float]:
    """Extract conditioning features (reference ``feature_utils.feature_process``).

    Returns (visual_feats, text_feats, audio_len_in_s). With ``video_path=None`` this is the
    T2A path: empty learned sequences are substituted at denoise time.
    """
    cfg: PipelineConfig = model_dict.pipeline_cfg  # type: ignore[attr-defined]
    visual_feats: Dict = {}
    if video_path is not None:
        from foley_tpu.pipeline.features import resample_frames, sync_segments
        from foley_tpu.pipeline.video import read_video_frames

        frames, fps = read_video_frames(video_path)
        audio_len = duration_s or frames.shape[0] / fps
        f8 = resample_frames(frames, fps, audio_len, cfg.siglip2_fps)
        f25 = resample_frames(frames, fps, audio_len, cfg.synchformer_fps)
        from foley_tpu.models import siglip2 as siglip_mod, synchformer as sync_mod

        visual_feats["siglip2_feat"] = siglip_mod.encode_frames(model_dict.siglip2, f8)
        visual_feats["syncformer_feat"] = sync_mod.encode_segments(
            model_dict.synchformer, sync_segments(f25)
        )
        # audio length from the 25 fps stream (reference utils.py:281)
        audio_len = f25.shape[0] / cfg.synchformer_fps
    else:
        audio_len = duration_s or 5.0

    from foley_tpu.models import clap as clap_mod

    text = clap_mod.encode_text(model_dict.clap, [neg_prompt, prompt])
    text_feats = {"text_feat": text[1:2], "uncond_text_feat": text[0:1]}
    return visual_feats, text_feats, audio_len


def denoise_process(
    visual_feats: Dict,
    text_feats: Dict,
    audio_len_in_s: float,
    model_dict: OffloadModelManager,
    guidance_scale: float = 4.5,
    num_inference_steps: int = 50,
    batch_size: int = 1,
    sampler: str = "euler",
    seed: int = 0,
) -> Tuple[np.ndarray, int]:
    """CFG denoise + decode (reference ``denoise_process``). Returns (audio [B, C, T], sr)."""
    foley = model_dict.foley
    dac = model_dict.dac
    cfg: PipelineConfig = model_dict.pipeline_cfg  # type: ignore[attr-defined]
    bundle = ModelBundle(
        mmdit_params=foley["params"],
        dac_params=dac["params"],
        pipeline_cfg=cfg,
        compute_dtype=foley.get("dtype", jnp.bfloat16),
    )
    result = generate_audio(
        bundle,
        text_feats["text_feat"],
        text_feats["uncond_text_feat"],
        audio_len_in_s,
        clip_feat=visual_feats.get("siglip2_feat"),
        sync_feat=visual_feats.get("syncformer_feat"),
        guidance_scale=guidance_scale,
        num_inference_steps=num_inference_steps,
        sampler=sampler,
        batch_size=batch_size,
        seed=seed,
    )
    return result.audio_batch, result.sample_rate
