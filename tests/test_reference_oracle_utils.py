"""Golden tests: small helpers in the reference's LITERAL utils.py vs our counterparts.

Covers the fixed DAC architecture constants (``_DAC_KWARGS``), the text pad/trim helper
(``_pad_or_trim_time``), and the caps + two-bucket + sticky-max text-length policy
(``_caps`` / the T_fixed logic inside ``denoise_process_with_generator``,
``/root/reference/utils.py:32-44,104-111,98-183``). The bucket policy is exercised through
the real denoise loop in test_reference_oracle_denoise; here the policy function itself is
swept across the bucket boundaries.
"""

import types

import numpy as np
import torch

import jax.numpy as jnp

from foley_tpu.configs import DACConfig
from foley_tpu.pipeline.features import pad_or_trim_time, pick_text_bucket
from tests.reference_oracle import _AttrDict, import_reference

utils_ref = import_reference("utils")


def test_dac_default_kwargs_match_literal_reference():
    """Our DACConfig defaults == the reference's extracted-from-checkpoint _DAC_KWARGS."""
    ref = utils_ref._DAC_KWARGS
    cfg = DACConfig()
    assert cfg.encoder_dim == ref["encoder_dim"]
    assert list(cfg.encoder_rates) == ref["encoder_rates"]
    assert cfg.latent_dim == ref["latent_dim"]
    assert cfg.decoder_dim == ref["decoder_dim"]
    assert list(cfg.decoder_rates) == ref["decoder_rates"]
    assert cfg.sample_rate == ref["sample_rate"]
    assert ref["continuous"] is True


def test_pad_or_trim_matches_literal_reference():
    rng = np.random.default_rng(0)
    for t_cur, t_fixed in [(5, 5), (5, 9), (9, 5), (1, 77)]:
        x = rng.normal(size=(2, t_cur, 3)).astype(np.float32)
        ref = utils_ref._pad_or_trim_time(torch.from_numpy(x), t_fixed).numpy()
        got = np.asarray(pad_or_trim_time(jnp.asarray(x), t_fixed))
        np.testing.assert_array_equal(got, ref)


def _t_fixed_reference(token_len: int, cap: int, sticky=None) -> int:
    """The reference's two-bucket + caps + sticky-max policy, executed via its own _caps
    and the literal bucket arithmetic (utils.py:164-183 uses min/max over _caps)."""
    model_dict = types.SimpleNamespace(foley_model=types.SimpleNamespace())
    cfg = types.SimpleNamespace(
        model_config=types.SimpleNamespace(model_kwargs=_AttrDict(text_length=cap))
    )
    cap_val = utils_ref._caps(model_dict, cfg)
    t_fixed = min(77, cap_val) if token_len <= 77 else min(128, cap_val)
    if sticky is not None:
        t_fixed = max(sticky, t_fixed)
    return t_fixed


def test_text_bucket_policy_matches_literal_reference():
    for cap in (16, 77, 100, 128, 512):
        for token_len in (1, 10, 76, 77, 78, 100, 127, 128, 130):
            assert pick_text_bucket(token_len, cap=cap) == _t_fixed_reference(token_len, cap), (
                token_len, cap
            )
    # sticky-max upgrade: once the big bucket triggers, later short prompts stay big
    assert pick_text_bucket(10, cap=512, sticky=128) == _t_fixed_reference(10, 512, sticky=128)


def test_caps_uses_clap_limits_literal_reference():
    """_caps folds tokenizer/model position caps when present (utils.py:98-101)."""
    model_dict = types.SimpleNamespace(
        clap_tokenizer=types.SimpleNamespace(model_max_length=64),
        clap_model=types.SimpleNamespace(config=types.SimpleNamespace(max_position_embeddings=50)),
    )
    cfg = types.SimpleNamespace(
        model_config=types.SimpleNamespace(model_kwargs=_AttrDict(text_length=128))
    )
    assert utils_ref._caps(model_dict, cfg) == 50
    assert pick_text_bucket(100, cap=50) == min(128, 50)
