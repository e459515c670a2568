"""ComfyUI adapter for foley-tpu — drop-in replacement for the reference node pack.

Symlink (or copy) this directory into ``ComfyUI/custom_nodes/`` with ``foley_tpu`` on the
PYTHONPATH. It exposes the same node class names as the reference
(``nodes.py:668-683`` NODE_CLASS_MAPPINGS), so existing workflow JSONs load unchanged; the
adapter converts ComfyUI's torch tensors at the boundary (IMAGE [B, H, W, C] float in [0, 1]
-> numpy frames; AUDIO waveform -> torch) and resolves checkpoint names through ComfyUI's
``folder_paths`` (including the ``models/foley/`` registration the reference adds at
``nodes.py:25-27``) when available.
"""

from __future__ import annotations

import os

from foley_tpu.api import nodes as _nodes


def _resolve_model_path(name: str) -> str:
    """Resolve a checkpoint name via ComfyUI folder_paths if present, else as given."""
    try:
        import folder_paths  # ComfyUI runtime

        foley_dir = os.path.join(folder_paths.models_dir, "foley")
        if "foley" not in folder_paths.folder_names_and_paths:
            folder_paths.folder_names_and_paths["foley"] = (
                [foley_dir], folder_paths.supported_pt_extensions
            )
        full = folder_paths.get_full_path("foley", name)
        if full:
            return full
    except ImportError:
        pass
    return name


def _image_to_numpy(image):
    """ComfyUI IMAGE (torch [B, H, W, C] float 0..1) -> numpy [T, H, W, C]."""
    if image is None:
        return None
    try:
        import torch

        if isinstance(image, torch.Tensor):
            return image.detach().cpu().float().numpy()
    except ImportError:
        pass
    import numpy as np

    return np.asarray(image, np.float32)


def _audio_to_torch(audio: dict) -> dict:
    """foley-tpu AUDIO (numpy waveform [B, C, T]) -> ComfyUI AUDIO (torch waveform)."""
    try:
        import torch

        return {"waveform": torch.from_numpy(audio["waveform"].copy()),
                "sample_rate": audio["sample_rate"]}
    except ImportError:
        return audio


class HunyuanModelLoader(_nodes.HunyuanModelLoader):
    def load_model(self, model_name, precision="auto", quantization="none", config="xxl"):
        return super().load_model(_resolve_model_path(model_name), precision, quantization, config)


class HunyuanDependenciesLoader(_nodes.HunyuanDependenciesLoader):
    def load_dependencies(self, vae_model, synchformer_model=None, precision="fp16",
                          siglip2_model="", clap_model="", clap_tokenizer=""):
        return super().load_dependencies(
            _resolve_model_path(vae_model),
            _resolve_model_path(synchformer_model) if synchformer_model else None,
            precision,
            siglip2_model=_resolve_model_path(siglip2_model) if siglip2_model else "",
            clap_model=_resolve_model_path(clap_model) if clap_model else "",
            clap_tokenizer=_resolve_model_path(clap_tokenizer) if clap_tokenizer else "",
        )


class HunyuanFoleySampler(_nodes.HunyuanFoleySampler):
    def generate_audio(self, *args, image=None, **kwargs):
        first, batch = super().generate_audio(*args, image=_image_to_numpy(image), **kwargs)
        return _audio_to_torch(first), _audio_to_torch(batch)


class HunyuanFoleyContinuation(_nodes.HunyuanFoleyContinuation):
    def continue_audio(self, foley_model, dependencies, audio, **kwargs):
        wf = audio["waveform"]
        try:
            import torch

            if isinstance(wf, torch.Tensor):
                audio = {"waveform": wf.detach().cpu().float().numpy(),
                         "sample_rate": audio["sample_rate"]}
        except ImportError:
            pass
        first, batch = super().continue_audio(foley_model, dependencies, audio, **kwargs)
        return _audio_to_torch(first), _audio_to_torch(batch)


class SelectAudioFromBatch(_nodes.SelectAudioFromBatch):
    def select_audio(self, audio_batch, index=0):
        wf = audio_batch["waveform"]
        try:
            import torch

            if isinstance(wf, torch.Tensor):
                audio_batch = {"waveform": wf.detach().cpu().numpy(),
                               "sample_rate": audio_batch["sample_rate"]}
        except ImportError:
            pass
        (out,) = super().select_audio(audio_batch, index)
        return (_audio_to_torch(out),)


NODE_CLASS_MAPPINGS = {
    "HunyuanModelLoader": HunyuanModelLoader,
    "HunyuanDependenciesLoader": HunyuanDependenciesLoader,
    "HunyuanFoleySampler": HunyuanFoleySampler,
    "HunyuanFoleyTorchCompile": _nodes.HunyuanCompileConfig,
    "HunyuanBlockSwap": _nodes.HunyuanBlockSwap,
    "HunyuanFoleyContinuation": HunyuanFoleyContinuation,
    "SelectAudioFromBatch": SelectAudioFromBatch,
}

NODE_DISPLAY_NAME_MAPPINGS = dict(_nodes.NODE_DISPLAY_NAME_MAPPINGS)

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
