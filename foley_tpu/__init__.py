"""foley-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of the
HunyuanVideo-Foley ComfyUI package (reference: phazei/ComfyUI-HunyuanVideo-Foley).

Built from scratch, TPU-first: jitted ``lax.scan`` denoise loops, scanned transformer block
stacks, Pallas fused attention, fp8 parameter storage with upcast-on-use, and device-mesh
sharding via ``jax.sharding`` in place of the reference's CUDA-stream block swapping.

Public surface (mirrors the reference's re-exports, reference
``hunyuanvideo_foley/__init__.py:15-18``):
"""

from foley_tpu.version import __version__

__all__ = ["__version__"]
