from foley_tpu.api.nodes import (
    NODE_CLASS_MAPPINGS,
    NODE_DISPLAY_NAME_MAPPINGS,
    HunyuanBlockSwap,
    HunyuanCompileConfig,
    HunyuanDependenciesLoader,
    HunyuanFoleySampler,
    HunyuanModelLoader,
    SelectAudioFromBatch,
)

__all__ = [
    "NODE_CLASS_MAPPINGS",
    "NODE_DISPLAY_NAME_MAPPINGS",
    "HunyuanBlockSwap",
    "HunyuanCompileConfig",
    "HunyuanDependenciesLoader",
    "HunyuanFoleySampler",
    "HunyuanModelLoader",
    "SelectAudioFromBatch",
]
