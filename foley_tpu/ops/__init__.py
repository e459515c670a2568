from foley_tpu.ops.activations import gelu_tanh, silu, snake, swiglu
from foley_tpu.ops.attention import sdpa
from foley_tpu.ops.interp import nearest_exact_resize
from foley_tpu.ops.modulate import apply_gate, modulate
from foley_tpu.ops.norms import layer_norm, rms_norm
from foley_tpu.ops.rope import (
    apply_rotary_emb,
    decouple_interleaved,
    interleave_sequences,
    rope_table,
)

__all__ = [
    "gelu_tanh",
    "silu",
    "snake",
    "swiglu",
    "sdpa",
    "nearest_exact_resize",
    "apply_gate",
    "modulate",
    "layer_norm",
    "rms_norm",
    "apply_rotary_emb",
    "decouple_interleaved",
    "interleave_sequences",
    "rope_table",
]
