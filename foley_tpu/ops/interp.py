"""Nearest-exact 1-D resampling (torch ``F.interpolate(mode="nearest-exact")`` semantics).

Used to align sync features and interleaved-RoPE streams to the audio token length
(reference ``hifi_foley.py:35-60, 751-762``). Index rule: out[i] = in[floor((i+0.5)*Lin/Lout)].
"""

from __future__ import annotations

import jax.numpy as jnp


def nearest_exact_indices(in_len: int, out_len: int) -> jnp.ndarray:
    idx = jnp.floor((jnp.arange(out_len, dtype=jnp.float32) + 0.5) * (in_len / out_len))
    return jnp.clip(idx.astype(jnp.int32), 0, in_len - 1)


def nearest_exact_resize(x: jnp.ndarray, out_len: int, axis: int) -> jnp.ndarray:
    """Resize ``x`` along ``axis`` to ``out_len`` with nearest-exact gathering."""
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    return jnp.take(x, nearest_exact_indices(in_len, out_len), axis=axis)


def linspace_resample_indices(in_len: int, out_len: int) -> jnp.ndarray:
    """Frame-resampling indices, torch.linspace + round semantics.

    Mirrors the reference's fps resampling of video frames
    (``nodes.py:294-317``: ``torch.linspace(0, T-1, n).long()`` + ``index_select``).
    ``Tensor.long()`` truncates, so we floor.
    """
    if out_len == 1:
        return jnp.zeros((1,), dtype=jnp.int32)
    idx = jnp.linspace(0.0, in_len - 1, out_len)
    return jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, in_len - 1)
