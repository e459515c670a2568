"""Attention dispatch: XLA reference path and Pallas flash kernel.

The reference routes everything through torch SDPA (``attn_layers.py:323-456``, mode="torch"
is the only accepted mode, ``hifi_foley.py:168-171``). Here:

- ``impl="xla"``: einsum attention with fp32 softmax. At foley sequence lengths
  (<= ~1500 tokens) the score matrix fits easily in VMEM and XLA fuses the chain; this is
  also the numerically-reference path used by tests.
- ``impl="pallas"``: fused flash-attention kernel (``foley_tpu/ops/pallas/flash_attention.py``)
  for larger sequence lengths / fused qk-norm+RoPE epilogues.

Layout: q, k, v are seq-first [B, L, H, D] (the reference's ``head_first=False`` layout).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

# Auto-dispatch threshold, measured on v5e (tools/profile_r2.py, XXL denoise ms/step, CFG
# batch 2): audio tokens 250 -> xla 39.26 / pallas_fused 39.06 (tie); 750 -> 99.42 / 98.95
# (tie); 1500 -> 249.97 / 190.39 (fused 1.31x); 3000 -> 767.60 / 424.37 (fused 1.81x).
# XLA's unfused attention materializes the [B, H, L, L] fp32 score tensor through HBM, which
# starts dominating past ~1k tokens; the fused VMEM-resident kernel never loses, so auto
# switches where the win is unambiguous and keeps the numerically-reference xla path at the
# short (5-15 s) shipping lengths.
PALLAS_FUSED_MIN_TOKENS = 1000


def resolve_attn_impl(impl: str, audio_tokens: int) -> str:
    """Resolve impl="auto" by audio sequence length (host-side; impl is a static jit arg)."""
    if impl != "auto":
        return impl
    import jax

    if jax.devices()[0].platform != "tpu":
        return "xla"  # pallas kernels are TPU-only (tests run on the CPU backend)
    return "pallas_fused" if audio_tokens >= PALLAS_FUSED_MIN_TOKENS else "xla"


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, Lq, H, D] / [B, Lk, H, D] -> [B, Lq, H, D].

    ``mask``: optional boolean [B, 1, Lq, Lk] (True = attend), matching the reference's
    additive-bool SDPA mask semantics (``hifi_foley.py:774-793``).
    """
    if impl == "pallas":
        from foley_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask)
    return _sdpa_xla(q, k, v, mask)


def _sdpa_xla(q, k, v, mask):
    import jax

    # fp32 inputs get true-fp32 contractions (see foley_tpu.ops.nn._precision).
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    scale = 1.0 / (q.shape[-1] ** 0.5)
    # [B, H, Lq, Lk] logits in fp32 for a stable softmax (torch SDPA accumulates fp32).
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32, precision=prec
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=v.dtype, precision=prec,
    )
    return out
