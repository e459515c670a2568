"""Golden test: our DAC-VAE vs the reference's LITERAL dac.py.

test_dac pins a DecoderBlock against a transcription; this instantiates the reference's
actual continuous ``DAC`` (imported from /root/reference via tests/reference_oracle, which
lets dac.py use its own ``_audiotools_stubs``), converts the real ``state_dict()`` through
``convert_dac_state_dict`` (weight-norm folding included), and asserts full decode / encode
agree. Reference: ``hunyuanvideo_foley/models/dac_vae/model/dac.py:26-305``.
"""

import numpy as np
import torch

import jax.numpy as jnp

from foley_tpu.configs import DACConfig
from foley_tpu.io.convert import convert_dac_state_dict
from foley_tpu.models import dac_vae
from tests.reference_oracle import import_reference

dac_mod = import_reference("hunyuanvideo_foley.models.dac_vae.model.dac")

CFG = DACConfig(
    encoder_dim=8, encoder_rates=(2, 3), latent_dim=6,
    decoder_dim=16, decoder_rates=(3, 2), sample_rate=48,
)


def _build_reference_model():
    torch.manual_seed(5)
    model = dac_mod.DAC(
        encoder_dim=CFG.encoder_dim,
        encoder_rates=list(CFG.encoder_rates),
        latent_dim=CFG.latent_dim,
        decoder_dim=CFG.decoder_dim,
        decoder_rates=list(CFG.decoder_rates),
        sample_rate=CFG.sample_rate,
        continuous=True,
    )
    model.eval()
    return model


def test_decode_matches_literal_reference():
    model = _build_reference_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_dac_state_dict(sd, CFG, strict=True)

    rng = np.random.default_rng(0)
    T = 11
    z = rng.normal(size=(2, T, CFG.latent_dim)).astype(np.float32)
    with torch.no_grad():
        ref = model.decode(torch.from_numpy(z).transpose(1, 2)).transpose(1, 2).numpy()
    got = np.asarray(dac_vae.decode(params, jnp.asarray(z), CFG))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_encode_matches_literal_reference():
    model = _build_reference_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_dac_state_dict(sd, CFG, strict=True)

    rng = np.random.default_rng(1)
    T = 4 * CFG.hop_length
    audio = (rng.normal(size=(1, T, 1)) * 0.1).astype(np.float32)
    with torch.no_grad():
        posterior, *_ = model.encode(torch.from_numpy(audio).transpose(1, 2))
        ref_mean = posterior.mean.transpose(1, 2).numpy()
        ref_std = posterior.std.transpose(1, 2).numpy()
    post = dac_vae.encode(params, jnp.asarray(audio), CFG)
    np.testing.assert_allclose(np.asarray(post.mean), ref_mean, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.exp(0.5 * np.asarray(post.logvar)), ref_std, atol=2e-5, rtol=1e-4
    )


def test_dac_converter_consumes_every_literal_key():
    model = _build_reference_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    convert_dac_state_dict(sd, CFG, strict=True, consume=True)
    assert sd == {}, f"unconverted literal keys: {sorted(sd)[:10]}"
