"""Golden test: the reference's LITERAL denoise_process_with_generator vs our pipeline.

The component oracles (test_reference_oracle_{mmdit,scheduler,dac}) pin each stage; this
runs the reference's actual end-to-end sampling function (``/root/reference/utils.py:125-260``
— CFG batching with learned-empty uncond visuals, text two-bucket padding, per-step
scheduler stepping, final DAC decode) against our ``prepare_cfg_features`` +
``denoise_latents`` + ``dac_vae.decode`` chain, from identical seeded initial noise.
Any divergence in orchestration — CFG combine order, uncond construction, timestep
handling, latent layout, decode hand-off — shows up here.
"""

import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from foley_tpu.configs import DACConfig, DiffusionConfig
from foley_tpu.io.convert import convert_dac_state_dict, convert_mmdit_state_dict
from foley_tpu.models import dac_vae
from foley_tpu.pipeline.features import prepare_cfg_features
from foley_tpu.sampling.denoise import denoise_latents
from tests.reference_oracle import _AttrDict, import_reference
from tests.test_reference_oracle_mmdit import CFG, _build_reference_model

utils_ref = import_reference("utils")

DAC_CFG = DACConfig(
    encoder_dim=8, encoder_rates=(2, 3), latent_dim=CFG.audio_vae_latent_dim,
    decoder_dim=16, decoder_rates=(3, 2), sample_rate=48,
)
AUDIO_FRAME_RATE = 12   # latent frames per second (tiny stand-in for the real 50)
AUDIO_LEN_S = 1.0
GUIDANCE = 3.0
SEED = 123


def _build_reference_dac():
    dac_mod = import_reference("hunyuanvideo_foley.models.dac_vae.model.dac")
    torch.manual_seed(9)
    model = dac_mod.DAC(
        encoder_dim=DAC_CFG.encoder_dim, encoder_rates=list(DAC_CFG.encoder_rates),
        latent_dim=DAC_CFG.latent_dim, decoder_dim=DAC_CFG.decoder_dim,
        decoder_rates=list(DAC_CFG.decoder_rates), sample_rate=DAC_CFG.sample_rate,
        continuous=True,
    )
    return model.eval()


@pytest.mark.parametrize("solver,guidance,batch_size", [
    ("euler", GUIDANCE, 1),
    ("heun-2", GUIDANCE, 1),
    ("euler", 1.0, 2),   # no-CFG branch (guidance <= 1 skips the uncond half) at batch 2
])
def test_denoise_process_matches_literal_reference(solver, guidance, batch_size):
    foley = _build_reference_model()
    dac = _build_reference_dac()

    rng = np.random.default_rng(21)
    text = rng.normal(size=(1, 6, CFG.condition_dim)).astype(np.float32)
    uncond_text = rng.normal(size=(1, 5, CFG.condition_dim)).astype(np.float32)
    clip = rng.normal(size=(1, 4, CFG.clip_dim)).astype(np.float32)
    sync = rng.normal(size=(1, 16, CFG.sync_feat_dim)).astype(np.float32)

    model_dict = types.SimpleNamespace(
        foley_model=foley, dac_model=dac, device=torch.device("cpu")
    )
    ref_cfg = types.SimpleNamespace(
        model_config=types.SimpleNamespace(model_kwargs=_AttrDict(
            audio_vae_latent_dim=CFG.audio_vae_latent_dim,
            audio_frame_rate=AUDIO_FRAME_RATE,
            text_length=CFG.text_length,
        )),
        diffusion_config=types.SimpleNamespace(sample_flow_shift=1.0),
    )
    visual_feats = {
        "siglip2_feat": torch.from_numpy(clip),
        "syncformer_feat": torch.from_numpy(sync),
    }
    text_feats = {
        "text_feat": torch.from_numpy(text),
        "uncond_text_feat": torch.from_numpy(uncond_text),
    }
    ref_audio, ref_sr = utils_ref.denoise_process_with_generator(
        visual_feats, text_feats, AUDIO_LEN_S, model_dict, ref_cfg,
        guidance_scale=guidance, num_inference_steps=4, batch_size=batch_size,
        sampler=solver, generator=torch.Generator().manual_seed(SEED),
    )
    assert ref_sr == DAC_CFG.sample_rate
    ref_audio = ref_audio.reshape(1, -1).numpy()

    # identical initial noise through the reference's own latent helper + a same-seed generator
    sched_mod = import_reference(
        "hunyuanvideo_foley.utils.schedulers.scheduling_flow_match_discrete"
    )
    lat0 = utils_ref.prepare_latents_with_generator(
        sched_mod.FlowMatchDiscreteScheduler(shift=1.0, solver=solver),
        batch_size=batch_size, num_channels_latents=CFG.audio_vae_latent_dim,
        length=AUDIO_LEN_S * AUDIO_FRAME_RATE, dtype=torch.float32,
        device=torch.device("cpu"), generator=torch.Generator().manual_seed(SEED),
    )

    params = convert_mmdit_state_dict(
        {k: v.numpy() for k, v in foley.state_dict().items()}, CFG
    )
    dac_params = convert_dac_state_dict(
        {k: v.numpy() for k, v in dac.state_dict().items()}, DAC_CFG
    )
    feats = prepare_cfg_features(
        params, jnp.asarray(text), jnp.asarray(uncond_text), jnp.asarray(clip),
        jnp.asarray(sync), batch_size=batch_size, use_cfg=guidance > 1.0,
        text_bucket=CFG.text_length,
    )
    final = denoise_latents(
        params, jnp.asarray(lat0.numpy()).swapaxes(1, 2), feats, jnp.float32(guidance),
        cfg=CFG, diffusion=DiffusionConfig(), num_steps=4, solver=solver,
        use_cfg=guidance > 1.0, compute_dtype=jnp.float32,
    )
    audio = np.asarray(dac_vae.decode(dac_params, final, DAC_CFG)).reshape(1, -1)

    assert audio.shape == ref_audio.shape
    np.testing.assert_allclose(audio, ref_audio, atol=5e-3, rtol=1e-2)
