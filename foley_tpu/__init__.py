"""foley-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of the
HunyuanVideo-Foley ComfyUI package (reference: phazei/ComfyUI-HunyuanVideo-Foley).

Built from scratch, TPU-first: jitted ``lax.scan`` denoise loops, scanned transformer block
stacks, Pallas fused attention, fp8 parameter storage with upcast-on-use, and device-mesh
sharding via ``jax.sharding`` in place of the reference's CUDA-stream block swapping.

Public surface mirrors the reference's re-exports (``hunyuanvideo_foley/__init__.py:15-18``):
``load_model`` / ``denoise_process`` / ``feature_process`` / ``merge_audio_video`` /
``AttributeDict``, plus ``NODE_CLASS_MAPPINGS`` for graph-runtime hosts.
"""

from foley_tpu.version import __version__


def __getattr__(name):
    # Lazy exports: keep `import foley_tpu` light (no jax/transformers import cost).
    if name in ("load_model", "denoise_process", "feature_process"):
        from foley_tpu.pipeline import standalone

        return getattr(standalone, name)
    if name == "merge_audio_video":
        from foley_tpu.io.audio import merge_audio_video

        return merge_audio_video
    if name == "AttributeDict":
        from foley_tpu.utils.config_utils import AttributeDict

        return AttributeDict
    if name in ("NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"):
        from foley_tpu.api import nodes

        return getattr(nodes, name)
    raise AttributeError(f"module 'foley_tpu' has no attribute {name!r}")


__all__ = [
    "__version__",
    "load_model",
    "denoise_process",
    "feature_process",
    "merge_audio_video",
    "AttributeDict",
    "NODE_CLASS_MAPPINGS",
    "NODE_DISPLAY_NAME_MAPPINGS",
]
