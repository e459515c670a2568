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
from foley_tpu.io.convert import convert_dac_state_dict, convert_rvq_state_dict
from foley_tpu.models import dac_vae, quantize
from foley_tpu.models.quantize import RVQConfig
from tests.reference_oracle import import_reference

dac_mod = import_reference("hunyuanvideo_foley.models.dac_vae.model.dac")
rvq_mod = import_reference("hunyuanvideo_foley.models.dac_vae.nn.quantize")

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


# ---------------------------------------------------------------------------------
# RVQ — the discrete codec branch (reference dac_vae/nn/quantize.py:13-255)
# ---------------------------------------------------------------------------------

RVQ_CFG = RVQConfig(input_dim=16, n_codebooks=3, codebook_size=32, codebook_dim=4)


def _build_reference_rvq():
    torch.manual_seed(7)
    ref = rvq_mod.ResidualVectorQuantize(
        input_dim=RVQ_CFG.input_dim,
        n_codebooks=RVQ_CFG.n_codebooks,
        codebook_size=RVQ_CFG.codebook_size,
        codebook_dim=RVQ_CFG.codebook_dim,
    ).eval()
    params = convert_rvq_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, RVQ_CFG, strict=True
    )
    return ref, params


def test_rvq_forward_matches_literal_reference():
    ref, params = _build_reference_rvq()
    z = torch.randn(2, RVQ_CFG.input_dim, 9, generator=torch.Generator().manual_seed(11))
    with torch.no_grad():
        z_q, codes, latents, commit, codeb = ref(z)
    out = quantize.apply(params, jnp.asarray(z.permute(0, 2, 1).numpy()), RVQ_CFG)
    np.testing.assert_array_equal(np.asarray(out.codes), codes.numpy())
    np.testing.assert_allclose(
        np.asarray(out.z_q), z_q.permute(0, 2, 1).numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.latents), latents.permute(0, 2, 1).numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(float(out.commitment_loss), float(commit), rtol=1e-5)
    np.testing.assert_allclose(float(out.codebook_loss), float(codeb), rtol=1e-5)


def test_rvq_partial_n_quantizers_matches_literal_reference():
    ref, params = _build_reference_rvq()
    z = torch.randn(1, RVQ_CFG.input_dim, 7, generator=torch.Generator().manual_seed(12))
    with torch.no_grad():
        z_q, codes, *_ = ref(z, n_quantizers=2)
    out = quantize.apply(params, jnp.asarray(z.permute(0, 2, 1).numpy()), RVQ_CFG, n_quantizers=2)
    assert out.codes.shape[1] == 2
    np.testing.assert_array_equal(np.asarray(out.codes), codes.numpy())
    np.testing.assert_allclose(
        np.asarray(out.z_q), z_q.permute(0, 2, 1).numpy(), atol=1e-5, rtol=1e-5
    )


def test_rvq_from_codes_and_latents_match_literal_reference():
    ref, params = _build_reference_rvq()
    z = torch.randn(2, RVQ_CFG.input_dim, 5, generator=torch.Generator().manual_seed(13))
    with torch.no_grad():
        _, codes, latents, *_ = ref(z)
        ref_zq_codes, _, _ = ref.from_codes(codes)
        ref_zq_lat, _, ref_codes_lat = ref.from_latents(latents)
    got_codes = quantize.from_codes(params, jnp.asarray(codes.numpy()))
    np.testing.assert_allclose(
        np.asarray(got_codes), ref_zq_codes.permute(0, 2, 1).numpy(), atol=1e-5, rtol=1e-5
    )
    got_zq, got_codes2 = quantize.from_latents(
        params, jnp.asarray(latents.permute(0, 2, 1).numpy()), RVQ_CFG
    )
    np.testing.assert_allclose(
        np.asarray(got_zq), ref_zq_lat.permute(0, 2, 1).numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got_codes2), ref_codes_lat.numpy())
