from foley_tpu.configs.model_configs import (
    DiffusionConfig,
    DACConfig,
    MMDiTConfig,
    PipelineConfig,
    SynchformerConfig,
    config_from_yaml,
    get_config,
    TINY,
    XL,
    XXL,
)

__all__ = [
    "DiffusionConfig",
    "DACConfig",
    "MMDiTConfig",
    "PipelineConfig",
    "SynchformerConfig",
    "config_from_yaml",
    "get_config",
    "TINY",
    "XL",
    "XXL",
]
