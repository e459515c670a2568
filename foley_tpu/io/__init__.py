from foley_tpu.io.audio import write_wav
from foley_tpu.io.convert import (
    convert_dac_state_dict,
    convert_mmdit_state_dict,
    detect_ckpt_fp8,
    detect_ckpt_major_precision,
    load_torch_state_dict,
)
from foley_tpu.io.quantize import FP8_DENY_SUBSTRINGS, quantize_fp8

__all__ = [
    "write_wav",
    "convert_dac_state_dict",
    "convert_mmdit_state_dict",
    "detect_ckpt_fp8",
    "detect_ckpt_major_precision",
    "load_torch_state_dict",
    "FP8_DENY_SUBSTRINGS",
    "quantize_fp8",
]
