"""Pallas fused attention kernel for the MMDiT joint/cross attention.

The reference funnels all attention through torch SDPA (``attn_layers.py:419-422``). Foley
sequence lengths are short (audio 50-3000 tokens, visual <=480, text <=128 — SURVEY.md §5.7),
so the kernel keeps the *entire* K/V for one (batch, head) resident in VMEM and processes
query tiles against it: one fused pass (qk matmul -> stable softmax -> pv matmul) with no HBM
round-trip for the score matrix. At L=3000, K+V in bf16 is ~1.5 MB and a fp32 [BQ=256, L]
logits tile is ~3 MB — comfortably under the ~16 MB VMEM budget, so a full flash-style online
softmax (k-tiling) is unnecessary; skipping it removes the rescaling traffic entirely.

Grid: (B*H, ceil(Lq / BLOCK_Q)). Padding rows/cols are masked with -inf before the softmax.
Used for self/cross attention via ``foley_tpu.ops.attention.sdpa(..., impl="pallas")``.

Measured on v5e (XXL denoise step, CFG batch 2, T=250): XLA 46.7 ms vs this kernel 49.8 ms —
at foley lengths attention is ~10% of step FLOPs and the [B, L, H, D] <-> [B*H, L, D]
transposes around the kernel outweigh the fusion win, so ``impl="xla"`` stays the default.
Revisit when fusing qk-RMSNorm + RoPE into the kernel with a head-first block layout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
_NEG_INF = float("-inf")


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, lk_valid: int):
    q = q_ref[0]                     # [BQ, D] (leading block dim of 1)
    k = k_ref[0]                     # [LK_pad, D]
    v = v_ref[0]                     # [LK_pad, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                # [BQ, LK_pad] fp32
    logits = logits * scale
    lk_pad = k.shape[0]
    if lk_valid < lk_pad:            # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < lk_valid, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_attention_bhld(q, k, v, interpret: bool = False):
    """q: [BH, Lq, D], k/v: [BH, Lk, D] -> [BH, Lq, D]."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / (d ** 0.5)

    lq_pad = _round_up(lq, BLOCK_Q)
    # key-length padding to the fp32 lane tile (128)
    lk_pad = _round_up(lk, 128)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_pad - lk), (0, 0)))

    grid = (bh, lq_pad // BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, lk_valid=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq_pad * lk_pad * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * lq_pad * lk_pad,
        ),
    )(q, k, v)
    return out[:, :lq]


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention over seq-first [B, L, H, D] tensors (reference SDPA semantics).

    ``mask`` is not supported in the kernel (the XXL/XL configs never enable attention
    masks, ``use_attention_mask: False``); masked calls fall back to the XLA path.
    """
    if mask is not None:
        from foley_tpu.ops.attention import _sdpa_xla

        return _sdpa_xla(q, k, v, mask)
    b, lq, h, d = q.shape
    lk = k.shape[1]
    qb = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, lq, d)
    kb = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, lk, d)
    vb = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, lk, d)
    ob = _flash_attention_bhld(qb, kb, vb, interpret=interpret)
    return jnp.transpose(ob.reshape(b, h, lq, d), (0, 2, 1, 3))
