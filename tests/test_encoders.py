"""Golden tests for the SigLIP2 and Synchformer encoder ports.

SigLIP2 is checked against a randomly-initialized HF SiglipVisionModel (conv-patch flavor,
pooled get_image_features semantics). Synchformer components are checked against torch
primitives (Conv3d patchify, nn.TransformerEncoderLayer spatial agg) and a compact torch
transcription of divided attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from foley_tpu.configs import SynchformerConfig
from foley_tpu.models import siglip2, synchformer


# ---------------------------------------------------------------------------------
# SigLIP2
# ---------------------------------------------------------------------------------

@pytest.fixture(scope="module")
def siglip_pair():
    from transformers import SiglipVisionConfig as HFCfg, SiglipVisionModel

    cfg = siglip2.SiglipVisionConfig.tiny()
    hf_cfg = HFCfg(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers, num_attention_heads=cfg.num_attention_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size, layer_norm_eps=cfg.layer_norm_eps,
        hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = siglip2.convert_hf_state_dict(sd, cfg, prefix="vision_model.")
    return model, params, cfg


def test_siglip_tokens_match_hf(siglip_pair):
    model, params, cfg = siglip_pair
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(imgs))
    got_tokens = siglip2.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg, pooled=False)
    np.testing.assert_allclose(np.asarray(got_tokens), out.last_hidden_state.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_siglip_pooled_match_hf(siglip_pair):
    model, params, cfg = siglip_pair
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(3, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(imgs)).pooler_output.numpy()
    got = siglip2.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg, pooled=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=1e-3)


def test_siglip_preprocess_range():
    frames = np.random.default_rng(0).random((3, 60, 80, 3)).astype(np.float32)
    out = siglip2.preprocess_frames(frames, size=32)
    assert out.shape == (3, 32, 32, 3)
    assert -1.0 <= out.min() and out.max() <= 1.0


# ---------------------------------------------------------------------------------
# Synchformer components
# ---------------------------------------------------------------------------------

TINY_SYNC = SynchformerConfig(
    img_size=32, patch_size=8, temporal_patch_size=2, num_frames=4,
    embed_dim=24, depth=2, num_heads=2, mlp_ratio=2.0,
)


def test_patchify_3d_matches_torch_conv3d():
    torch.manual_seed(0)
    conv = torch.nn.Conv3d(3, 24, kernel_size=(2, 8, 8), stride=(2, 8, 8))
    x = torch.randn(2, 3, 4, 32, 32)  # [B, C, T, H, W]
    with torch.no_grad():
        ref = conv(x).flatten(2).transpose(1, 2)  # [B, N, D]
    w = jnp.asarray(conv.weight.detach().numpy().reshape(24, -1).T)
    b = jnp.asarray(conv.bias.detach().numpy())
    x_cl = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())  # [B, T, H, W, C]
    patches = synchformer._patchify_3d(x_cl, 2, 8)
    got = patches @ w + b
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_spatial_agg_matches_torch_encoder_layer():
    torch.manual_seed(0)
    d, nh = 24, 2
    layer = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=nh, activation=torch.nn.GELU(), batch_first=True,
        dim_feedforward=48, dropout=0.0, layer_norm_eps=1e-6, norm_first=True,
    ).eval()
    cls = torch.randn(1, 1, d) * 0.02
    x = torch.randn(3, 9, d)
    with torch.no_grad():
        inp = torch.cat([cls.expand(3, -1, -1), x], dim=1)
        ref = layer(inp)[:, 0].numpy()
    sd = {k: v.numpy() for k, v in layer.state_dict().items()}
    p = {
        "cls_token": jnp.asarray(cls.numpy()),
        "q": {"w": jnp.asarray(sd["self_attn.in_proj_weight"][:d].T.copy()),
              "b": jnp.asarray(sd["self_attn.in_proj_bias"][:d])},
        "k": {"w": jnp.asarray(sd["self_attn.in_proj_weight"][d:2 * d].T.copy()),
              "b": jnp.asarray(sd["self_attn.in_proj_bias"][d:2 * d])},
        "v": {"w": jnp.asarray(sd["self_attn.in_proj_weight"][2 * d:].T.copy()),
              "b": jnp.asarray(sd["self_attn.in_proj_bias"][2 * d:])},
        "out": {"w": jnp.asarray(sd["self_attn.out_proj.weight"].T.copy()),
                "b": jnp.asarray(sd["self_attn.out_proj.bias"])},
        "linear1": {"w": jnp.asarray(sd["linear1.weight"].T.copy()), "b": jnp.asarray(sd["linear1.bias"])},
        "linear2": {"w": jnp.asarray(sd["linear2.weight"].T.copy()), "b": jnp.asarray(sd["linear2.bias"])},
        "norm1": {"weight": jnp.asarray(sd["norm1.weight"]), "bias": jnp.asarray(sd["norm1.bias"])},
        "norm2": {"weight": jnp.asarray(sd["norm2.weight"]), "bias": jnp.asarray(sd["norm2.bias"])},
    }
    got = synchformer._spatial_agg(p, jnp.asarray(x.numpy()), nh)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-3)


def _torch_divided_attention(qkv_w, qkv_b, proj_w, proj_b, x, group, f, n, nh):
    """Transcription of reference DividedAttention.forward (vit_helper.py:56-114)."""
    import einops

    b = x.shape[0]
    d = x.shape[-1]
    qkv = F.linear(x, qkv_w, qkv_b)
    q, k, v = qkv.chunk(3, dim=-1)
    q, k, v = (einops.rearrange(t, "b n (h e) -> (b h) n e", h=nh) for t in (q, k, v))
    q = q * (d // nh) ** -0.5

    def attn(q_, k_, v_):
        sim = torch.einsum("bie,bje->bij", q_, k_)
        return torch.einsum("bij,bje->bie", sim.softmax(-1), v_)

    (cls_q, q_), (cls_k, k_), (cls_v, v_) = ((t[:, :1], t[:, 1:]) for t in (q, k, v))
    cls_out = attn(cls_q, k, v)
    pattern = "b (f n) d -> (b n) f d" if group == "time" else "b (f n) d -> (b f) n d"
    q_, k_, v_ = (einops.rearrange(t, pattern, f=f, n=n) for t in (q_, k_, v_))
    r = q_.shape[0] // cls_k.shape[0]
    cls_k = einops.repeat(cls_k, "b () d -> (b r) () d", r=r)
    cls_v = einops.repeat(cls_v, "b () d -> (b r) () d", r=r)
    out = attn(q_, torch.cat([cls_k, k_], 1), torch.cat([cls_v, v_], 1))
    inv = "(b n) f d -> b (f n) d" if group == "time" else "(b f) n d -> b (f n) d"
    out = einops.rearrange(out, inv, f=f, n=n)
    out = torch.cat([cls_out, out], dim=1)
    out = einops.rearrange(out, "(b h) n e -> b n (h e)", h=nh)
    return F.linear(out, proj_w, proj_b)


@pytest.mark.parametrize("group", ["time", "space"])
def test_divided_attention_matches_transcription(group):
    torch.manual_seed(0)
    d, nh, f, n = 24, 2, 2, 4
    b = 2
    x = torch.randn(b, 1 + f * n, d)
    qkv_w, qkv_b = torch.randn(3 * d, d) * 0.1, torch.randn(3 * d) * 0.1
    proj_w, proj_b = torch.randn(d, d) * 0.1, torch.randn(d) * 0.1
    with torch.no_grad():
        ref = _torch_divided_attention(qkv_w, qkv_b, proj_w, proj_b, x, group, f, n, nh)
    p_qkv = {"w": jnp.asarray(qkv_w.numpy().T.copy()), "b": jnp.asarray(qkv_b.numpy())}
    p_proj = {"w": jnp.asarray(proj_w.numpy().T.copy()), "b": jnp.asarray(proj_b.numpy())}
    got = synchformer._divided_attention(p_qkv, p_proj, jnp.asarray(x.numpy()), group, f, n, nh)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4, rtol=1e-3)


def test_synchformer_forward_shapes():
    params = synchformer.init(jax.random.PRNGKey(0), TINY_SYNC)
    segs = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 3, TINY_SYNC.num_frames, TINY_SYNC.img_size, TINY_SYNC.img_size, 3)
    ).astype(np.float32))
    out = synchformer.apply(params, segs, TINY_SYNC)
    assert out.shape == (1, 3, TINY_SYNC.temporal_resolution, TINY_SYNC.embed_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_synchformer_preprocess_center_crop():
    frames = np.random.default_rng(0).random((2, 50, 100, 3)).astype(np.float32)
    out = synchformer.preprocess_frames(frames, size=32)
    assert out.shape == (2, 32, 32, 3)


def test_siglip2_naflex_matches_hf():
    """Linear-patch (naflex) converter branch vs HF Siglip2VisionModel, incl. the
    (ph, pw, c) -> (c, ph, pw) feature permute and square-grid pos embeddings."""
    from transformers import Siglip2VisionConfig as HFC2, Siglip2VisionModel
    from transformers.models.siglip2.image_processing_siglip2 import convert_image_to_patches

    p, grid = 4, 4
    cfg = siglip2.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=grid * p, patch_size=p,
    )
    hf_cfg = HFC2(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=2, num_channels=3, patch_size=p,
                  num_patches=grid * grid)
    torch.manual_seed(0)
    model = Siglip2VisionModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = siglip2.convert_hf_state_dict(sd, cfg, prefix="vision_model.")

    rng = np.random.default_rng(0)
    img_hwc = rng.normal(size=(grid * p, grid * p, 3)).astype(np.float32)
    patches = convert_image_to_patches(img_hwc, p)  # [grid*grid, p*p*3], (ph, pw, c) order
    with torch.no_grad():
        out = model(
            pixel_values=torch.from_numpy(patches)[None],
            pixel_attention_mask=torch.ones(1, grid * grid, dtype=torch.long),
            spatial_shapes=torch.tensor([[grid, grid]]),
        )
    got = siglip2.apply(params, jnp.asarray(img_hwc)[None], cfg, pooled=False)
    np.testing.assert_allclose(np.asarray(got), out.last_hidden_state.numpy(),
                               atol=5e-4, rtol=1e-3)
    pooled = siglip2.apply(params, jnp.asarray(img_hwc)[None], cfg, pooled=True)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_siglip_pos_embed_resize(siglip_pair):
    """Inputs at a different resolution use bilinearly resized positional embeddings."""
    _, params, cfg = siglip_pair
    import dataclasses

    big = dataclasses.replace(cfg, image_size=cfg.image_size * 2)
    imgs = np.random.default_rng(0).normal(
        size=(1, big.image_size, big.image_size, 3)).astype(np.float32)
    out = siglip2.apply(params, jnp.asarray(imgs), big, pooled=True)
    assert out.shape == (1, cfg.hidden_size)
    assert np.all(np.isfinite(np.asarray(out)))


def test_preprocess_resize_close_to_torch_antialiased_bicubic():
    """Quantifies the preprocessing-parity tolerance (SURVEY hard-part #4): our PIL bicubic
    resize vs torch's antialiased bicubic (what torchvision v2 Resize uses for tensors).
    Known-close but not bit-exact; the bound here is the budgeted tolerance."""
    rng = np.random.default_rng(0)
    frame = rng.random((96, 128, 3)).astype(np.float32)
    ours = siglip2.preprocess_frames(frame[None], size=64)[0]  # normalized (x-0.5)/0.5
    t = torch.from_numpy(frame).permute(2, 0, 1)[None]
    ref = F.interpolate(t, size=(64, 64), mode="bicubic", antialias=True)
    ref = (ref.clamp(0, 1)[0].permute(1, 2, 0).numpy() - 0.5) / 0.5
    diff = np.abs(ours - ref)
    # PIL quantizes through uint8 (1/255 ~ 0.004 in [0,1] = 0.008 in [-1,1]) + filter-tap
    # differences; measured max ~0.03 on random noise (worst case for resampling).
    assert diff.max() < 0.06, diff.max()
    assert diff.mean() < 0.01, diff.mean()


def test_sync_preprocess_center_crop_geometry():
    """Short-side resize + center crop picks the same region torch CenterCrop would."""
    frame = np.zeros((100, 200, 3), np.float32)
    frame[:, 88:112] = 1.0  # vertical stripe at the horizontal center
    out = synchformer.preprocess_frames(frame[None], size=32)[0]
    # stripe must remain centered after resize+crop (normalized: background -1, stripe 1)
    center_col = out[:, 16, 0]
    edge_col = out[:, 2, 0]
    assert center_col.mean() > 0.5
    assert edge_col.mean() < -0.5


def test_device_preprocess_matches_pil_siglip2():
    """TPU-side preprocessing (jax.image antialiased bicubic, one XLA program) vs the
    reference-parity PIL path — same geometry, bounded numeric drift (no uint8 quantization
    and a Keys-cubic antialias kernel vs PIL's)."""
    rng = np.random.default_rng(1)
    frames = rng.random((3, 96, 128, 3)).astype(np.float32)
    pil = siglip2.preprocess_frames(frames, size=32)
    dev = np.asarray(siglip2.preprocess_frames_device(jnp.asarray(frames), size=32))
    assert dev.shape == pil.shape == (3, 32, 32, 3)
    assert -1.0 <= dev.min() and dev.max() <= 1.0
    diff = np.abs(dev - pil)
    assert diff.mean() < 0.02, diff.mean()
    assert diff.max() < 0.12, diff.max()


def test_device_preprocess_matches_pil_synchformer():
    """Short-side resize + center crop on device: same crop geometry and bounded drift."""
    rng = np.random.default_rng(2)
    frames = rng.random((2, 100, 200, 3)).astype(np.float32)
    pil = synchformer.preprocess_frames(frames, size=32)
    dev = np.asarray(synchformer.preprocess_frames_device(jnp.asarray(frames), size=32))
    assert dev.shape == pil.shape == (2, 32, 32, 3)
    diff = np.abs(dev - pil)
    assert diff.mean() < 0.03, diff.mean()
    # crop geometry: a centered stripe stays centered through the device path too
    frame = np.zeros((100, 200, 3), np.float32)
    frame[:, 88:112] = 1.0
    out = np.asarray(synchformer.preprocess_frames_device(jnp.asarray(frame[None]), size=32))[0]
    assert out[:, 16, 0].mean() > 0.5 and out[:, 2, 0].mean() < -0.5


def test_encoder_device_preprocess_mode_end_to_end():
    """The encoders' preprocess='device' mode produces features close to the PIL mode."""
    sig = siglip2.init_random(0, 16)
    rng = np.random.default_rng(3)
    frames = rng.random((2, 48, 64, 3)).astype(np.float32)
    f_pil = np.asarray(sig.encode(frames))
    sig.preprocess = "device"
    f_dev = np.asarray(sig.encode(frames))
    assert f_dev.shape == f_pil.shape
    # tiny random ViT amplifies input differences; just require strong agreement
    corr = np.corrcoef(f_dev.ravel(), f_pil.ravel())[0, 1]
    assert corr > 0.99, corr

    sync = synchformer.init_random(1, 16)
    segs = rng.random((1, 16, 48, 64, 3)).astype(np.float32)
    s_pil = np.asarray(synchformer.encode_segments(sync, segs))
    sync.preprocess = "device"
    s_dev = np.asarray(synchformer.encode_segments(sync, segs))
    assert s_dev.shape == s_pil.shape
    corr = np.corrcoef(s_dev.ravel(), s_pil.ravel())[0, 1]
    assert corr > 0.99, corr


def test_encode_frames_device_matches_segment_path():
    """The unique-frame + on-device-gather pipeline equals the per-segment device path
    (same resize math, ~8x fewer host->device bytes)."""
    from foley_tpu.pipeline.features import sync_segments

    sync = synchformer.init_random(1, 16)
    sync.preprocess = "device"
    rng = np.random.default_rng(4)
    frames = rng.random((24, 48, 64, 3)).astype(np.float32)
    a = np.asarray(synchformer.encode_segments(sync, sync_segments(frames)))
    b = np.asarray(synchformer.encode_frames_device(sync, frames))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
    # short input: last-frame padding semantics match sync_segments
    short = frames[:10]
    a = np.asarray(synchformer.encode_segments(sync, sync_segments(short)))
    b = np.asarray(synchformer.encode_frames_device(sync, short))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
