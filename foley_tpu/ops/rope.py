"""Rotary position embeddings: precomputed tables + pair-adjacent rotation.

Behavioral contract (reference ``posemb_layers.py:117-172``, ``attn_layers.py:112-159``):
- frequencies: ``theta**(-2i/d)`` for i in [0, d/2); optional ``freq_scaling`` multiplier
  (mmaudio-style visual-stream rescale, reference ``hifi_foley.py:666``);
- real cos/sin tables with ``repeat_interleave(2)`` so feature pairs (2j, 2j+1) share an angle;
- rotation: ``x*cos + rotate_half(x)*sin`` computed in fp32 then cast back, where
  ``rotate_half`` maps pairs (re, im) -> (-im, re).

TPU-first difference: the reference rebuilds tables inside every cross-attention forward
(``hifi_foley.py:295-308``); here tables are pure functions of static lengths, precomputed at
trace time and constant-folded into the jitted graph. (An ``optimization_barrier`` on the
position vector was tried to stop XLA padding the folded [2T, D] fp32 literals 16x at 60 s —
it made every XXL execution stall multi-minute on the axon runtime and was reverted; the
long-form memory fix is chunked DAC decode, ``dac_vae.decode_chunked``.)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rope_table(
    length: int,
    dim: int,
    theta: float = 10000.0,
    freq_scaling: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape [length, dim] (fp32)."""
    pos = jnp.arange(length, dtype=jnp.float32)
    idx = jnp.arange(0, dim, 2, dtype=jnp.float32)[: dim // 2]
    freqs = jnp.power(jnp.float32(theta), -(idx / dim)) * freq_scaling
    angles = jnp.outer(pos, freqs)  # [L, D/2]
    cos = jnp.repeat(jnp.cos(angles), 2, axis=1)  # [L, D]
    sin = jnp.repeat(jnp.sin(angles), 2, axis=1)
    return cos, sin


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(re, im) pairs -> (-im, re), pair-adjacent layout (reference attn_layers.py:112-114)."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    re, im = x2[..., 0], x2[..., 1]
    return jnp.stack([-im, re], axis=-1).reshape(x.shape)


def apply_rotary_emb(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    head_first: bool = False,
) -> jnp.ndarray:
    """Rotate ``x`` by the table. fp32 compute, cast back to x.dtype.

    x: [B, L, H, D] if not head_first else [B, H, L, D]; cos/sin: [L, D].
    """
    if head_first:
        bcast = (1, 1) + cos.shape  # [1, 1, L, D]
    else:
        bcast = (1,) + (cos.shape[0], 1, cos.shape[1])  # [1, L, 1, D]
    cos = cos.reshape(bcast)
    sin = sin.reshape(bcast)
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)


def interleave_sequences(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Interleave two [B, N, H, C] sequences token-wise -> [B, 2*N1, H, C].

    If lengths differ, ``x2`` is resized to ``N1`` with nearest-exact interpolation
    (reference ``hifi_foley.py:35-47``).
    """
    from foley_tpu.ops.interp import nearest_exact_resize

    n1 = x1.shape[1]
    if x2.shape[1] != n1:
        x2 = nearest_exact_resize(x2, n1, axis=1)
    x = jnp.stack([x1, x2], axis=2)  # [B, N1, 2, H, C]
    return x.reshape(x1.shape[0], n1 * 2, *x1.shape[2:])


def decouple_interleaved(
    x: jnp.ndarray, len1: int, len2: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of ``interleave_sequences`` (reference ``hifi_foley.py:49-60``)."""
    from foley_tpu.ops.interp import nearest_exact_resize

    b, n = x.shape[:2]
    assert n % 2 == 0 and n // 2 == len1, (n, len1)
    x = x.reshape(b, n // 2, 2, *x.shape[2:])
    x1, x2 = x[:, :, 0], x[:, :, 1]
    if x2.shape[1] != len2:
        x2 = nearest_exact_resize(x2, len2, axis=1)
    return x1, x2
