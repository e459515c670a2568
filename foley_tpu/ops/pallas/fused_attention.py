"""Fused qk-RMSNorm + RoPE + attention Pallas kernel.

The MMDiT attention path applies, per block and per step: qk RMSNorm (fp32), RoPE rotation
(fp32), then SDPA — each materializing [B, L, H, D] intermediates between kernels. This
kernel fuses all of it: raw q/k tiles are normalized, rotated, and attended entirely in VMEM.

To serve the *joint* two-stream attention (where the [v_cond; audio] concat mixes two
different norm weights and two different RoPE tables), the norm weights and cos/sin tables
are passed as **per-position** [L, D] arrays — built once per block by broadcasting/
concatenating the per-stream vectors (cheap, fused by XLA).

rotate_half inside the kernel avoids sub-lane reshapes by using circular rolls:
for pair-adjacent layout, rotate_half(x)[2i] = -x[2i+1] and [2i+1] = x[2i], i.e.
where(col even, -roll(x, -1), roll(x, +1)) along the lane axis.

Numerics match the composed path: norm+rope in fp32, cast to the input dtype before the
q@k^T contraction (bf16 MXU), fp32 softmax, output in the input dtype.

Measured on v5e (XXL denoise step, T=250): 35.75 ms vs XLA 35.59 ms — a statistical tie;
XLA already fuses the norm/rope elementwise chains into the surrounding kernels at these
sizes, so ``attn_impl="xla"`` remains the default. The kernel stays as a validated option
for longer-sequence regimes where the score matrix stops fitting XLA's fusion heuristics.
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


def _rot_half_lanes(x):
    """rotate_half for pair-adjacent pairs via lane rolls (no (..., D/2, 2) reshape).

    pltpu.roll requires non-negative shifts; roll by D-1 is the circular left-shift by 1."""
    d = x.shape[1]
    left = pltpu.roll(x, d - 1, axis=1)  # x[:, j+1] at even j (circular shift left by 1)
    right = pltpu.roll(x, 1, axis=1)     # x[:, j-1] at odd j
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col % 2 == 0, -left, right)


def _norm_rope(x, w, cos, sin, eps, out_dtype):
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps) * w
    xf = xf * cos + _rot_half_lanes(xf) * sin
    return xf.astype(out_dtype)


def _kernel(q_ref, k_ref, v_ref, wq_ref, wk_ref, cq_ref, sq_ref, ck_ref, sk_ref, o_ref,
            *, scale: float, lk_valid: int, eps: float):
    q = _norm_rope(q_ref[0], wq_ref[:], cq_ref[:], sq_ref[:], eps, q_ref.dtype)
    k = _norm_rope(k_ref[0], wk_ref[:], ck_ref[:], sk_ref[:], eps, k_ref.dtype)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    lk_pad = k.shape[0]
    if lk_valid < lk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < lk_valid, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("lk_valid", "eps", "interpret"))
def fused_qk_attention_headfirst(
    qb: jnp.ndarray,          # [BH, Lq_pad, D] raw (pre-norm, pre-rope), head-first
    kb: jnp.ndarray,          # [BH, Lk_pad, D]
    vb: jnp.ndarray,          # [BH, Lk_pad, D]
    wq: jnp.ndarray,          # [Lq_pad, D] per-position q-norm weights (fp32)
    wk: jnp.ndarray,          # [Lk_pad, D]
    cos_q: jnp.ndarray,       # [Lq_pad, D]
    sin_q: jnp.ndarray,
    cos_k: jnp.ndarray,       # [Lk_pad, D]
    sin_k: jnp.ndarray,
    lk_valid: int,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """Kernel entry on already head-first [B*H, L, D] operands (padded to tile multiples).

    ``fused_qk_attention`` is the [B, L, H, D] convenience wrapper; this entry exists for
    callers that keep the head-first layout across the whole attention (avoiding the
    transpose+pad round trip per call) and for transpose-cost A/B profiling
    (tools/profile_r3.py). Returns [BH, Lq_pad, D]."""
    bh, lq_pad, d = qb.shape
    lk_pad = kb.shape[1]
    assert lq_pad % BLOCK_Q == 0 and lk_pad % 128 == 0, (lq_pad, lk_pad)
    scale = 1.0 / (d ** 0.5)
    grid = (bh, lq_pad // BLOCK_Q)
    qspec = pl.BlockSpec((1, BLOCK_Q, d), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, lk_pad, d), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM)
    qtab = pl.BlockSpec((BLOCK_Q, d), lambda bh, i: (i, 0), memory_space=pltpu.VMEM)
    ktab = pl.BlockSpec((lk_pad, d), lambda bh, i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, lk_valid=lk_valid, eps=eps),
        grid=grid,
        in_specs=[qspec, kspec, kspec, qtab, ktab, qtab, qtab, ktab, ktab],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), qb.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq_pad * lk_pad * d,
            bytes_accessed=(qb.size + kb.size + vb.size) * qb.dtype.itemsize,
            transcendentals=bh * lq_pad * lk_pad,
        ),
    )(qb, kb, vb, wq, wk, cos_q, sin_q, cos_k, sin_k)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_qk_attention(
    q: jnp.ndarray,           # [B, Lq, H, D] raw (pre-norm, pre-rope)
    k: jnp.ndarray,           # [B, Lk, H, D]
    v: jnp.ndarray,           # [B, Lk, H, D]
    wq: jnp.ndarray,          # [Lq, D] per-position q-norm weights
    wk: jnp.ndarray,          # [Lk, D]
    cos_q: jnp.ndarray,       # [Lq, D]
    sin_q: jnp.ndarray,
    cos_k: jnp.ndarray,       # [Lk, D]
    sin_k: jnp.ndarray,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    b, lq, h, d = q.shape
    lk = k.shape[1]
    lq_pad = _round_up(lq, BLOCK_Q)
    lk_pad = _round_up(lk, 128)

    def bhld(x, l, l_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, l, d)
        if l_pad != l:
            x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        return x

    qb, kb, vb = bhld(q, lq, lq_pad), bhld(k, lk, lk_pad), bhld(v, lk, lk_pad)

    def pad_tab(t, l, l_pad):
        t = t.astype(jnp.float32)
        return jnp.pad(t, ((0, l_pad - l), (0, 0))) if l_pad != l else t

    wq_p, cq_p, sq_p = (pad_tab(t, lq, lq_pad) for t in (wq, cos_q, sin_q))
    wk_p, ck_p, sk_p = (pad_tab(t, lk, lk_pad) for t in (wk, cos_k, sin_k))

    out = fused_qk_attention_headfirst(
        qb, kb, vb, wq_p, wk_p, cq_p, sq_p, ck_p, sk_p, lk_valid=lk, eps=eps,
        interpret=interpret,
    )
    return jnp.transpose(out[:, :lq].reshape(b, h, lq, d), (0, 2, 1, 3))
