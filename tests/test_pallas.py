"""Pallas fused attention: correctness vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foley_tpu.ops.attention import _sdpa_xla
from foley_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("b,lq,lk,h,d", [
    (1, 50, 50, 2, 64),      # tiny audio self-attn shape
    (2, 290, 290, 2, 128),   # joint [visual; audio] 5 s shape
    (1, 250, 77, 2, 128),    # cross-attn vs text
    (1, 300, 300, 1, 128),   # non-multiple of BLOCK_Q with padding
])
def test_flash_attention_matches_xla(b, lq, lk, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, lq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, lk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, lk, h, d)).astype(np.float32))
    ref = _sdpa_xla(q, k, v, None)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_attention_mask_fallback():
    rng = np.random.default_rng(1)
    b, l, h, d = 1, 16, 1, 32
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    mask = jnp.ones((b, 1, l, l), bool).at[..., 8:].set(False)
    ref = _sdpa_xla(q, q, q, mask)
    got = flash_attention(q, q, q, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
