"""Dtype policy: storage vs compute precision, fp8 upcast-on-use.

Mirrors the reference's mixed-precision behavior (SURVEY.md §2.9): params stored in
bf16/fp16/fp32 (or fp8 weight-only, reference ``utils.py:296-485``), compute in the storage
precision with fp32 islands (norms, RoPE, scheduler math, DAC decode). On TPU, bf16 is the
native fast path for the MXU; fp8 (e4m3/e5m2) is storage-only and upcast at use, exactly like
the reference's ``FP8WeightWrapper.forward`` (``utils.py:359-362``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_DTYPE_MAP = {
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "fp16": jnp.float16,
    "float16": jnp.float16,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "fp8_e4m3fn": jnp.float8_e4m3fn,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
}

FP8_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2)


def resolve_dtype(name):
    """str | dtype -> jnp dtype."""
    if isinstance(name, str):
        try:
            return _DTYPE_MAP[name.lower()]
        except KeyError:
            raise ValueError(f"Unknown dtype {name!r}; known: {sorted(_DTYPE_MAP)}") from None
    return name


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Precision policy threaded through model apply functions.

    ``compute``: matmul/accumulation dtype for the transformer blocks (bf16 on TPU).
    ``norm``: normalization compute dtype — fp32 island (reference ``norm_layers.py:49``).
    ``rope``: RoPE application dtype — fp32 island (reference ``attn_layers.py:147-148``).
    ``decode``: DAC decode dtype — fp32 (reference ``nodes.py:398``).
    """

    compute: jnp.dtype = jnp.bfloat16
    norm: jnp.dtype = jnp.float32
    rope: jnp.dtype = jnp.float32
    decode: jnp.dtype = jnp.float32

    @classmethod
    def for_precision(cls, precision: str) -> "DTypePolicy":
        return cls(compute=resolve_dtype(precision))


def upcast_weight(w, compute_dtype):
    """Upcast a (possibly fp8-stored) weight to the compute dtype at use time."""
    if w.dtype != compute_dtype:
        return w.astype(compute_dtype)
    return w
