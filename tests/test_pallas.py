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


def test_fused_qk_attention_matches_composed():
    """Fused norm+rope+attention kernel == composed rms_norm/rope/sdpa path."""
    from foley_tpu.ops.norms import rms_norm
    from foley_tpu.ops.pallas.fused_attention import fused_qk_attention
    from foley_tpu.ops.rope import apply_rotary_emb, rope_table

    rng = np.random.default_rng(0)
    b, lq, lk, h, d = 2, 37, 53, 2, 128
    q = jnp.asarray(rng.normal(size=(b, lq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, lk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, lk, h, d)).astype(np.float32))
    wq = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
    wk = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
    cq, sq = rope_table(lq, d)
    ck, sk = rope_table(lk, d)
    ref = _sdpa_xla(
        apply_rotary_emb(rms_norm(q, wq), cq, sq),
        apply_rotary_emb(rms_norm(k, wk), ck, sk),
        v, None,
    )
    got = fused_qk_attention(
        q, k, v, jnp.broadcast_to(wq, (lq, d)), jnp.broadcast_to(wk, (lk, d)),
        cq, sq, ck, sk, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_full_forward_pallas_fused_matches_xla(monkeypatch):
    """attn_impl='pallas_fused' through the whole MMDiT forward == xla path."""
    import functools

    import foley_tpu.ops.pallas.fused_attention as FA
    from foley_tpu.configs import TINY
    from foley_tpu.models import mmdit

    monkeypatch.setattr(FA, "fused_qk_attention",
                        functools.partial(FA.fused_qk_attention, interpret=True))
    cfg = TINY.model
    params = mmdit.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)

    def rnd(tree):
        return jax.tree.map(
            lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32) * 0.05), tree
        )

    params["final_layer"] = rnd(params["final_layer"])
    params["triple_blocks"]["audio_mod"] = rnd(params["triple_blocks"]["audio_mod"])
    params["triple_blocks"]["v_cond_mod"] = rnd(params["triple_blocks"]["v_cond_mod"])
    params["single_blocks"]["modulation"] = rnd(params["single_blocks"]["modulation"])

    b, t = 2, 20
    args = (
        jnp.asarray(rng.normal(size=(b, t, cfg.audio_vae_latent_dim)).astype(np.float32)),
        jnp.asarray([500.0, 100.0], jnp.float32),
        jnp.asarray(rng.normal(size=(b, 8, cfg.condition_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, 4, cfg.clip_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, 8, cfg.sync_feat_dim)).astype(np.float32)),
    )
    a = mmdit.apply(params, *args, cfg, attn_impl="xla")
    bb = mmdit.apply(params, *args, cfg, attn_impl="pallas_fused")
    assert float(jnp.std(a)) > 0.1  # signal actually flows
    np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=1e-5, rtol=1e-4)


def test_siglip2_pallas_attention_matches_xla(monkeypatch):
    """SigLIP2 encoder attn_impl='pallas' (the >=1k-token real-geometry dispatch) == xla."""
    import functools

    import foley_tpu.ops.pallas.flash_attention as FL
    from foley_tpu.models import siglip2

    monkeypatch.setattr(
        siglip2, "_mha",
        functools.partial(_siglip_mha_interpret, orig=siglip2._mha), raising=True)
    cfg = siglip2.SiglipVisionConfig(
        hidden_size=128, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8)
    params = siglip2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32))
    ref = siglip2.apply(params, images, cfg, pooled=True, attn_impl="xla")
    got = siglip2.apply(params, images, cfg, pooled=True, attn_impl="pallas")
    assert float(jnp.std(ref)) > 1e-3
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_siglip2_auto_resolves_xla_off_tpu():
    """attn_impl='auto' must fall back to xla on CPU even at the real 1024-token geometry
    (pallas kernels are TPU-only; the threshold dispatch is platform-gated)."""
    from foley_tpu.models import siglip2

    enc = siglip2.Siglip2Encoder({}, siglip2.SiglipVisionConfig(), attn_impl="auto")
    assert enc.attn_impl == "xla"


def _siglip_mha_interpret(q, k, v, nh, impl="xla", orig=None):
    if impl != "pallas":
        return orig(q, k, v, nh, impl=impl)
    from foley_tpu.ops.pallas.flash_attention import flash_attention

    b, lq, h = q.shape
    hd = h // nh
    out = flash_attention(q.reshape(b, lq, nh, hd), k.reshape(b, k.shape[1], nh, hd),
                          v.reshape(b, v.shape[1], nh, hd), interpret=True)
    return out.reshape(b, lq, h)
