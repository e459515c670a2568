"""Attention-mask branch (use_attention_mask=True configs) and drop_visual parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.configs import TINY
from foley_tpu.models import mmdit
from foley_tpu.pipeline.features import apply_drop_visual

CFG_MASKED = dataclasses.replace(TINY.model, use_attention_mask=True)
B, T, L_CLIP, L_SYNC, L_TXT = 2, 20, 4, 8, 10


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        x=jnp.asarray(rng.normal(size=(B, T, CFG_MASKED.audio_vae_latent_dim)).astype(np.float32)),
        t=jnp.asarray([500.0, 100.0], jnp.float32),
        cond=jnp.asarray(rng.normal(size=(B, L_TXT, CFG_MASKED.condition_dim)).astype(np.float32)),
        clip_feat=jnp.asarray(rng.normal(size=(B, L_CLIP, CFG_MASKED.clip_dim)).astype(np.float32)),
        sync_feat=jnp.asarray(rng.normal(size=(B, L_SYNC, CFG_MASKED.sync_feat_dim)).astype(np.float32)),
    )


def test_attention_mask_branch_runs_and_matches_full_mask():
    """With an all-ones cond_mask the masked forward must equal the unmasked one."""
    params = mmdit.init(jax.random.PRNGKey(0), CFG_MASKED)
    inputs = _inputs()
    full_mask = jnp.ones((B, L_TXT), bool)
    masked = mmdit.apply(params, cfg=CFG_MASKED, cond_mask=full_mask, **inputs)
    unmasked = mmdit.apply(params, cfg=TINY.model, **inputs)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(unmasked), atol=1e-5)


def test_drop_visual_matches_explicit_empty():
    params = mmdit.init(jax.random.PRNGKey(1), TINY.model)
    inputs = _inputs(1)
    drop = jnp.asarray([True, False])
    clip_d, sync_d = apply_drop_visual(params, inputs["clip_feat"], inputs["sync_feat"], drop)
    # row 0 replaced by the learned empty sequences (zeros at init), row 1 untouched
    np.testing.assert_array_equal(np.asarray(clip_d[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(clip_d[1]), np.asarray(inputs["clip_feat"][1]))
    np.testing.assert_array_equal(np.asarray(sync_d[0]), 0.0)


def test_compilation_cache_enable(tmp_path):
    """First caller wins for the process (the jax cache config is global); every call
    returns the ACTIVE dir, which always exists — even when an earlier test already
    enabled the cache at a different path."""
    from foley_tpu.core.cache import enable_compilation_cache

    d = enable_compilation_cache(str(tmp_path / "xla"))
    import os

    assert os.path.isdir(d)
    assert enable_compilation_cache(str(tmp_path / "other")) == d
