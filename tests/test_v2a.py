"""Video-to-audio end-to-end through the public sampler-node API with dimension-matched
tiny encoders (same code paths as the real XXL + base encoders)."""

import jax
import numpy as np
import pytest
import torch

from foley_tpu.api.nodes import HunyuanFoleySampler, HunyuanModelLoader
from foley_tpu.configs import TINY, SynchformerConfig
from foley_tpu.models import dac_vae, siglip2, synchformer


@pytest.fixture(scope="module")
def tiny_stack():
    foley_model = HunyuanModelLoader.init_random("tiny", "fp32", 0)
    # SigLIP tiny matched to TINY.model.clip_dim=16
    sig_cfg = siglip2.SiglipVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=8,
    )
    from transformers import SiglipVisionConfig as HFC, SiglipVisionModel

    torch.manual_seed(0)
    hf = SiglipVisionModel(HFC(
        hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=8,
    ))
    sig_params = siglip2.convert_hf_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, sig_cfg
    )
    sync_cfg = SynchformerConfig(
        img_size=32, patch_size=8, temporal_patch_size=2, num_frames=16,
        embed_dim=16, depth=1, num_heads=2,
    )
    deps = {
        "dac_params": dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        "dac_cfg": TINY.dac,
        "siglip2": siglip2.Siglip2Encoder(sig_params, sig_cfg),
        "synchformer": synchformer.SynchformerEncoder(
            synchformer.init(jax.random.PRNGKey(2), sync_cfg), sync_cfg
        ),
    }
    return foley_model, deps


def test_v2a_end_to_end(tiny_stack):
    foley_model, deps = tiny_stack
    frames = np.random.default_rng(0).random((16, 40, 40, 3)).astype(np.float32)
    audio_first, audio_batch = HunyuanFoleySampler().generate_audio(
        foley_model, deps, frame_rate=16, duration=1.0,
        prompt="clink", negative_prompt="noisy", cfg_scale=4.5, steps=2,
        sampler="euler", batch_size=2, seed=0, image=frames, allow_unconditioned=True,
    )
    wf = np.asarray(audio_batch["waveform"])
    assert wf.shape == (2, 1, 48000)
    assert audio_first["waveform"].shape == (1, 1, 48000)
    assert np.all(np.isfinite(wf)) and np.abs(wf).max() > 0


def test_v2a_differs_from_t2a(tiny_stack):
    """Visual conditioning must change the output vs the T2A (empty-feature) path.

    At random init the zero-init final layer makes velocity identically zero (conditioning
    cannot reach the output — that's the DiT init contract), so the final projection is
    re-initialized nonzero for this test to let the sync/clip signal flow."""
    import jax.numpy as jnp

    foley_model, deps = tiny_stack
    params = dict(foley_model["params"])
    fl = dict(params["final_layer"])
    lin = dict(fl["linear"])
    rng = np.random.default_rng(9)
    lin["w"] = jnp.asarray(rng.normal(size=lin["w"].shape).astype(np.float32) * 0.05)
    fl["linear"] = lin
    params["final_layer"] = fl
    foley_model = dict(foley_model, params=params)

    frames = np.random.default_rng(1).random((16, 40, 40, 3)).astype(np.float32)
    kwargs = dict(frame_rate=16, duration=1.0, prompt="clink", negative_prompt="noisy",
                  cfg_scale=4.5, steps=2, sampler="euler", batch_size=1, seed=0,
                  allow_unconditioned=True)
    v2a, _ = HunyuanFoleySampler().generate_audio(foley_model, deps, image=frames, **kwargs)
    t2a, _ = HunyuanFoleySampler().generate_audio(foley_model, deps, image=None, **kwargs)
    assert np.abs(np.asarray(v2a["waveform"]) - np.asarray(t2a["waveform"])).max() > 0
