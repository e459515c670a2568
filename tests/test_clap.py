"""CLAP text tower golden test: JAX port vs a randomly-initialized HF ClapTextModel."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from foley_tpu.models import clap


@pytest.fixture(scope="module")
def hf_and_jax():
    from transformers import ClapTextConfig as HFCfg, ClapTextModel

    cfg = clap.ClapTextConfig.tiny()
    hf_cfg = HFCfg(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        pad_token_id=cfg.pad_token_id,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = ClapTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = clap.convert_hf_state_dict(sd, cfg)
    return model, params, cfg


def test_matches_hf_with_padding(hf_and_jax):
    model, params, cfg = hf_and_jax
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    ids[1, 6:] = cfg.pad_token_id
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    got = clap.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-3)


def test_batch_padding_invariance(hf_and_jax):
    """A padded row must encode identically to the same tokens unpadded (valid positions)."""
    _, params, cfg = hf_and_jax
    rng = np.random.default_rng(1)
    ids = rng.integers(2, cfg.vocab_size, size=(1, 6)).astype(np.int32)
    solo = clap.apply(params, jnp.asarray(ids), jnp.ones((1, 6), jnp.int32), cfg)
    padded_ids = np.concatenate([ids, np.full((1, 4), cfg.pad_token_id, np.int32)], axis=1)
    mask = np.concatenate([np.ones((1, 6), np.int32), np.zeros((1, 4), np.int32)], axis=1)
    padded = clap.apply(params, jnp.asarray(padded_ids), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(padded[:, :6]), np.asarray(solo), atol=1e-4, rtol=1e-3)


def test_with_projection_last_hidden_state_is_identical(hf_and_jax):
    """The reference loads ClapTextModelWithProjection but consumes only last_hidden_state
    (``feature_utils.py:134-138``); that surface is identical to ClapTextModel's, so the
    golden above covers the exact class the reference uses."""
    from transformers import ClapTextModelWithProjection

    model, params, cfg = hf_and_jax
    proj = ClapTextModelWithProjection(model.config).eval()
    proj.text_model.load_state_dict(model.state_dict())
    rng = np.random.default_rng(2)
    ids = rng.integers(2, cfg.vocab_size, size=(2, 7)).astype(np.int64)
    mask = np.ones((2, 7), np.int64)
    with torch.no_grad():
        a = model(input_ids=torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
        b = proj(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    np.testing.assert_array_equal(a, b)
    got = clap.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(got), b, atol=2e-4, rtol=1e-3)
