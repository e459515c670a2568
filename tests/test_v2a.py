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


def test_box_downsample_u8_semantics():
    """box_downsample_u8: exact k x k rounded mean, k chosen as floor(short/target),
    k=1 passthrough (identity object), non-divisible edges cropped."""
    from foley_tpu.io.images import box_downsample_u8

    rng = np.random.default_rng(0)
    f = rng.integers(0, 256, size=(2, 9, 13, 3), dtype=np.uint8)
    # k=1: target >= short side -> unchanged
    assert box_downsample_u8(f, 9) is f
    # k=2 at target 4 (9//4=2): crops to 8x12 then exact rounded means
    out = box_downsample_u8(f, 4)
    assert out.shape == (2, 4, 6, 3)
    blocks = f[:, :8, :12].astype(np.int32).reshape(2, 4, 2, 6, 2, 3).sum(axis=(2, 4))
    np.testing.assert_array_equal(out, ((blocks + 2) // 4).astype(np.uint8))
    # constant image stays constant at any k
    const = np.full((1, 64, 96, 3), 177, np.uint8)
    np.testing.assert_array_equal(box_downsample_u8(const, 8).ravel()[0], 177)


def test_box_downsample_then_device_resize_matches_direct():
    """Shipping box-downsampled frames is faithful: box (k=2/k=4) + device bicubic stays
    within a few LSB of the direct device resize on smooth content (the k x k mean is the
    antialias prefilter the downscaling bicubic applies anyway), at k^2 fewer h2d bytes."""
    import jax.numpy as jnp

    from foley_tpu.io.images import box_downsample_u8
    from foley_tpu.models.synchformer import preprocess_frames_device

    # smooth low-frequency synthetic frames at 4x the encoder resolution
    size = 32  # tiny-config encoder geometry (img_size=32)
    h, w = 4 * size, 6 * size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 0.5 + 0.3 * np.sin(2 * np.pi * yy / h)[..., None] * np.cos(
        2 * np.pi * xx / w)[..., None]
    frames = np.repeat(np.clip(img, 0, 1)[None], 2, axis=0).astype(np.float32)
    frames = np.repeat(frames, 3, axis=-1)[..., :3]
    u8 = (frames * 255).astype(np.uint8)

    direct = np.asarray(preprocess_frames_device(jnp.asarray(u8), size))
    small = box_downsample_u8(u8, size)
    assert small.shape[1] == size and small.nbytes * 16 == u8.nbytes
    via_box = np.asarray(preprocess_frames_device(jnp.asarray(small), size))
    # normalized pixels in [-1, 1]: 4/255 ~= 0.016 tolerance
    assert np.abs(via_box - direct).max() < 0.02
