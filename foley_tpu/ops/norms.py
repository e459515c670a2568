"""Normalization ops — fp32 compute islands.

RMSNorm mirrors the reference exactly (``norm_layers.py:4-52``): normalize in fp32, cast back
to the input dtype, then multiply by the (storage-dtype) weight. LayerNorm (no affine,
eps 1e-6) mirrors the reference's ``nn.LayerNorm(elementwise_affine=False)`` usage inside
blocks (``hifi_foley.py:93`` etc.), computed in fp32 as torch.autocast does.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def rms_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    normed = xf * jax_rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    out = normed.astype(x.dtype)
    if weight is not None:
        out = out * weight
    return out


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax_rsqrt(var + eps)
    out = out.astype(x.dtype)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax

    return jax.lax.rsqrt(x)
