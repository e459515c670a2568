"""MMDiT structural tests: shape contracts, jit/scan compilation, CFG batching,
zero-init behavior, and block-level invariants (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foley_tpu.configs import TINY, MMDiTConfig
from foley_tpu.core.params import param_count
from foley_tpu.models import mmdit

CFG = TINY.model
B, DUR = 2, 1.0
T = int(DUR * CFG.audio_frame_rate)  # 50 latent frames
L_CLIP = 8
L_SYNC = 16  # 2 segments * 8
L_TXT = 12


@pytest.fixture(scope="module")
def params():
    return mmdit.init(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    return dict(
        x=jnp.asarray(rng.normal(size=(B, T, CFG.audio_vae_latent_dim)).astype(np.float32)),
        t=jnp.asarray([500.0, 250.0], jnp.float32),
        cond=jnp.asarray(rng.normal(size=(B, L_TXT, CFG.condition_dim)).astype(np.float32)),
        clip_feat=jnp.asarray(rng.normal(size=(B, L_CLIP, CFG.clip_dim)).astype(np.float32)),
        sync_feat=jnp.asarray(rng.normal(size=(B, L_SYNC, CFG.sync_feat_dim)).astype(np.float32)),
    )


def test_forward_shape(params, inputs):
    out = mmdit.apply(params, cfg=CFG, **inputs)
    assert out.shape == (B, T, CFG.audio_vae_latent_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_forward_jits_and_is_deterministic(params, inputs):
    f = jax.jit(lambda p, **kw: mmdit.apply(p, cfg=CFG, **kw))
    o1 = f(params, **inputs)
    o2 = f(params, **inputs)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_zero_init_gives_zero_velocity_at_init(params, inputs):
    """final_layer.linear is zero-init (reference mlp_layers.py:86-87), so the initial model
    must output exactly zero velocity."""
    out = mmdit.apply(params, cfg=CFG, **inputs)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_batch_consistency(params, inputs):
    """Row i of a batched forward == forward of row i alone (no cross-batch leakage)."""
    full = mmdit.apply(params, cfg=CFG, **inputs)
    single = mmdit.apply(
        params,
        x=inputs["x"][:1],
        t=inputs["t"][:1],
        cond=inputs["cond"][:1],
        clip_feat=inputs["clip_feat"][:1],
        sync_feat=inputs["sync_feat"][:1],
        cfg=CFG,
    )
    np.testing.assert_allclose(np.asarray(full[:1]), np.asarray(single), atol=1e-5, rtol=1e-5)


def test_empty_sequences(params):
    clip = mmdit.get_empty_clip_sequence(params, bs=3, length=L_CLIP)
    sync = mmdit.get_empty_sync_sequence(params, bs=3, length=L_SYNC)
    assert clip.shape == (3, L_CLIP, CFG.clip_dim)
    assert sync.shape == (3, L_SYNC, CFG.sync_feat_dim)
    np.testing.assert_array_equal(np.asarray(clip), 0.0)  # zero-init learned params


def test_visual_len_differs_from_audio_len(params, inputs):
    """Interleaved RoPE path with mismatched audio/visual lengths (nearest-exact resize)."""
    out = mmdit.apply(
        params,
        x=inputs["x"],
        t=inputs["t"],
        cond=inputs["cond"],
        clip_feat=inputs["clip_feat"][:, :5],  # visual_len != audio_len
        sync_feat=inputs["sync_feat"],
        cfg=CFG,
    )
    assert out.shape == (B, T, CFG.audio_vae_latent_dim)


def test_triple_block_residual_identity_at_zero_mod(params, inputs):
    """With zero-init modulations, every gate is zero, so each block is the identity at init."""
    blocks0 = jax.tree.map(lambda x: x[0], params["triple_blocks"])
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.normal(size=(B, T, CFG.hidden_size)).astype(np.float32))
    v_cond = jnp.asarray(rng.normal(size=(B, L_CLIP, CFG.hidden_size)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(B, L_TXT, CFG.hidden_size)).astype(np.float32))
    vec = jnp.asarray(rng.normal(size=(B, CFG.hidden_size)).astype(np.float32))
    ropes = mmdit.build_rope_tables(CFG, T, L_CLIP, L_TXT)
    a_out, v_out = mmdit.triple_block_apply(blocks0, audio, cond, v_cond, vec, ropes, CFG)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(audio), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(v_cond), atol=1e-6)


def test_single_block_residual_identity_at_zero_mod(params):
    blocks0 = jax.tree.map(lambda x: x[0], params["single_blocks"])
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, CFG.hidden_size)).astype(np.float32))
    vec = jnp.asarray(rng.normal(size=(B, T, CFG.hidden_size)).astype(np.float32))
    ropes = mmdit.build_rope_tables(CFG, T, L_CLIP, L_TXT)
    out = mmdit.single_block_apply(blocks0, x, vec, ropes, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_param_count_scales_with_config():
    """XXL param count must land at ~5.1B (reference fp16 ckpt is 10.3 GB, README.md:41)."""
    from foley_tpu.configs import XXL

    # count analytically via shape-only init (abstract eval, no memory)
    shapes = jax.eval_shape(lambda k: mmdit.init(k, XXL.model), jax.random.PRNGKey(0))
    total = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 4.8e9 < total < 5.6e9, f"XXL param count {total:,} out of expected range"


def test_timestep_embedding_matches_reference_math():
    import math
    import torch

    t = torch.tensor([0.0, 500.0, 999.0])
    half = 128
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None] * freqs[None]
    expected = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    got = mmdit.timestep_embedding(jnp.asarray(t.numpy()), 256)
    # fp32 sin/cos of large args (t~1000): a few e-5 ULP noise is expected
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-4, rtol=0)


def test_decomposed_interleaved_rope_equals_fallback(params, inputs):
    """The decomposed per-stream interleaved-RoPE path must match the exact
    interleave->rotate->decouple path bit-for-bit at trace-level tolerance."""
    import dataclasses

    ropes = mmdit.build_rope_tables(CFG, T, L_CLIP, L_TXT)
    assert ropes.audio_joint is not None  # identity condition holds for these lengths
    # force the fallback by clearing the decomposed tables
    ropes_fb = ropes._replace(audio_joint=None, visual_joint=None)
    blocks0 = jax.tree.map(lambda x: x[0], params["triple_blocks"])
    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.normal(size=(B, T, CFG.hidden_size)).astype(np.float32))
    v_cond = jnp.asarray(rng.normal(size=(B, L_CLIP, CFG.hidden_size)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(B, L_TXT, CFG.hidden_size)).astype(np.float32))
    vec = jnp.asarray(rng.normal(size=(B, CFG.hidden_size)).astype(np.float32))
    a1, v1 = mmdit.triple_block_apply(blocks0, audio, cond, v_cond, vec, ropes, CFG)
    a2, v2 = mmdit.triple_block_apply(blocks0, audio, cond, v_cond, vec, ropes_fb, CFG)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5, rtol=1e-5)


def test_non_interleaved_rope_variant():
    """interleaved_audio_visual_rope=False: audio uses its own table; visual uses a
    frequency-rescaled table (mmaudio-style, reference hifi_foley.py:654-668)."""
    import dataclasses

    from foley_tpu.ops.rope import apply_rotary_emb, rope_table

    cfg_ni = dataclasses.replace(CFG, interleaved_audio_visual_rope=False)
    ropes = mmdit.build_rope_tables(cfg_ni, T, L_CLIP, L_TXT)
    assert ropes.audio_joint is None  # decomposition only applies to the interleaved variant
    # visual table is rescaled by audio_len/visual_len
    expected_v = rope_table(L_CLIP, CFG.head_dim, CFG.rope_theta, freq_scaling=T / L_CLIP)
    np.testing.assert_allclose(np.asarray(ropes.v_joint[0]), np.asarray(expected_v[0]), atol=1e-6)

    # block forward runs and differs from the interleaved variant
    params = mmdit.init(jax.random.PRNGKey(3), cfg_ni)
    rng = np.random.default_rng(5)
    blocks0 = jax.tree.map(lambda x: x[0], params["triple_blocks"])
    audio = jnp.asarray(rng.normal(size=(B, T, CFG.hidden_size)).astype(np.float32))
    v_cond = jnp.asarray(rng.normal(size=(B, L_CLIP, CFG.hidden_size)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(B, L_TXT, CFG.hidden_size)).astype(np.float32))
    vec = jnp.asarray(rng.normal(size=(B, CFG.hidden_size)).astype(np.float32))
    # make the block non-trivial
    blocks0 = dict(blocks0)
    blocks0["audio_mod"] = {"w": jnp.asarray(rng.normal(size=blocks0["audio_mod"]["w"].shape).astype(np.float32) * 0.05),
                            "b": jnp.zeros_like(blocks0["audio_mod"]["b"])}
    a_ni, _ = mmdit.triple_block_apply(blocks0, audio, cond, v_cond, vec, ropes, cfg_ni)
    ropes_i = mmdit.build_rope_tables(CFG, T, L_CLIP, L_TXT)
    a_i, _ = mmdit.triple_block_apply(blocks0, audio, cond, v_cond, vec, ropes_i, CFG)
    assert np.all(np.isfinite(np.asarray(a_ni)))
    assert np.abs(np.asarray(a_ni) - np.asarray(a_i)).max() > 0


def test_text_kv_hoist_matches_in_block_compute():
    """apply(text_kv=precompute_text_kv(...)) == apply() exactly: the hoist moves the same
    projection/norm/RoPE ops out of the step scan without changing any math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from foley_tpu.configs import TINY
    from foley_tpu.models import mmdit

    cfg = TINY.model
    params = mmdit.init(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    args = (
        jnp.asarray(rng.normal(size=(2, 20, cfg.audio_vae_latent_dim)).astype(np.float32)),
        jnp.asarray([500.0, 250.0], jnp.float32),
        jnp.asarray(rng.normal(size=(2, 8, cfg.condition_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 4, cfg.clip_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 8, cfg.sync_feat_dim)).astype(np.float32)),
    )
    ref = np.asarray(mmdit.apply(params, *args, cfg))
    tkv = mmdit.precompute_text_kv(params, args[2], cfg)
    assert tkv is not None and tkv[0].shape[0] == cfg.depth_triple_blocks
    got = np.asarray(mmdit.apply(params, *args, cfg, text_kv=tkv))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # host-offloaded (split) stacks decline the hoist and compute in-block
    from foley_tpu.parallel.offload import host_memory_available, offload_block_suffix

    if host_memory_available():
        split = offload_block_suffix(params, cfg.depth_single_blocks + 1)
        assert mmdit.precompute_text_kv(split, args[2], cfg) is None
        got_split = np.asarray(mmdit.apply(split, *args, cfg))
        np.testing.assert_allclose(got_split, ref, atol=1e-5, rtol=1e-5)


def test_triple_mods_hoist_matches_in_block_compute():
    """apply(triple_mods=precompute_triple_mods(...)) == apply(): the adaLN hoist moves the
    same silu+dense math out of the step scan (batch-free — rows share the timestep)."""
    cfg = TINY.model
    params = mmdit.init(jax.random.PRNGKey(11), cfg)
    # zero-init leaves (mod MLPs, final layer) would make the comparison vacuous: randomize
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(12), len(leaves))
    leaves = [
        jax.random.normal(k, l.shape, l.dtype) * 0.02 if not np.any(np.asarray(l)) else l
        for k, l in zip(keys, leaves)
    ]
    params = jax.tree.unflatten(treedef, leaves)

    rng = np.random.default_rng(11)
    t_shared = 500.0
    args = (
        jnp.asarray(rng.normal(size=(2, 20, cfg.audio_vae_latent_dim)).astype(np.float32)),
        jnp.asarray([t_shared, t_shared], jnp.float32),
        jnp.asarray(rng.normal(size=(2, 8, cfg.condition_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 4, cfg.clip_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 8, cfg.sync_feat_dim)).astype(np.float32)),
    )
    ref = np.asarray(mmdit.apply(params, *args, cfg))
    assert np.any(ref)  # randomized final layer: non-zero output, comparison is meaningful

    mods = mmdit.precompute_triple_mods(params, jnp.asarray([t_shared], jnp.float32), cfg,
                                        jnp.float32)
    assert mods is not None
    a_mods, v_mods = mods
    assert a_mods.shape == (1, cfg.depth_triple_blocks, 1, 9 * cfg.hidden_size)
    got = np.asarray(mmdit.apply(params, *args, cfg, triple_mods=(a_mods[0], v_mods[0])))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # both hoists together (the denoise_latents configuration)
    tkv = mmdit.precompute_text_kv(params, args[2], cfg)
    got_both = np.asarray(
        mmdit.apply(params, *args, cfg, text_kv=tkv, triple_mods=(a_mods[0], v_mods[0])))
    np.testing.assert_allclose(got_both, ref, atol=1e-5, rtol=1e-5)

    # host-offloaded (split) stacks decline the hoist
    from foley_tpu.parallel.offload import host_memory_available, offload_block_suffix

    if host_memory_available():
        split = offload_block_suffix(params, cfg.depth_single_blocks + 1)
        assert mmdit.precompute_triple_mods(
            split, jnp.asarray([t_shared], jnp.float32), cfg, jnp.float32) is None


def test_visual_rows_shared_matches_full_compute():
    """apply(visual_rows_shared=True) == apply() when the CFG halves of clip/sync (and the
    timestep) are identical — the T2A structure. The flag halves the visual-derived GEMMs
    (sync_in chain, visual_proj, per-token single-block modulation) and tiles."""
    cfg = TINY.model
    params = mmdit.init(jax.random.PRNGKey(21), cfg)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(22), len(leaves))
    leaves = [
        jax.random.normal(k, l.shape, l.dtype) * 0.02 if not np.any(np.asarray(l)) else l
        for k, l in zip(keys, leaves)
    ]
    params = jax.tree.unflatten(treedef, leaves)

    rng = np.random.default_rng(21)
    half = lambda *shape: jnp.asarray(rng.normal(size=shape).astype(np.float32))
    dup = lambda a: jnp.concatenate([a, a], axis=0)
    x = dup(half(1, 20, cfg.audio_vae_latent_dim))      # CFG: latents duplicated
    t = jnp.asarray([500.0, 500.0], jnp.float32)        # one timestep per step
    cond = half(2, 8, cfg.condition_dim)                # text DIFFERS between halves
    clip = dup(half(1, 4, cfg.clip_dim))
    sync = dup(half(1, 8, cfg.sync_feat_dim))

    ref = np.asarray(mmdit.apply(params, x, t, cond, clip, sync, cfg))
    assert np.any(ref)
    got = np.asarray(mmdit.apply(params, x, t, cond, clip, sync, cfg,
                                 visual_rows_shared=True))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
    # and composed with both hoists (the denoise_latents T2A configuration)
    tkv = mmdit.precompute_text_kv(params, cond, cfg)
    mods = mmdit.precompute_triple_mods(params, jnp.asarray([500.0], jnp.float32), cfg,
                                        jnp.float32)
    got2 = np.asarray(mmdit.apply(params, x, t, cond, clip, sync, cfg,
                                  visual_rows_shared=True, text_kv=tkv,
                                  triple_mods=(mods[0][0], mods[1][0])))
    np.testing.assert_allclose(got2, ref, atol=1e-5, rtol=1e-5)
