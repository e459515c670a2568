"""AST port golden test vs HF ASTModel; mel-spectrogram DSP vs direct numpy DFT;
sync-scorer shape/behavior tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from foley_tpu.models import ast as ast_mod
from foley_tpu.models import sync_scorer
from foley_tpu.ops.audio_dsp import (
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    segment_audio,
    stft_power,
    sync_audio_spectrogram,
)


# ---------------------------------------------------------------------------------
# AST vs HF
# ---------------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ast_pair():
    from transformers import ASTConfig as HFCfg, ASTModel

    cfg = ast_mod.ASTConfig.tiny()
    hf_cfg = HFCfg(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads, intermediate_size=cfg.intermediate_size,
        patch_size=cfg.patch_size, frequency_stride=cfg.frequency_stride,
        time_stride=cfg.time_stride, num_mel_bins=cfg.num_mel_bins, max_length=cfg.max_length,
        layer_norm_eps=cfg.layer_norm_eps, hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = ASTModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = ast_mod.convert_hf_state_dict(sd, cfg)
    return model, params, cfg


def test_ast_matches_hf(ast_pair):
    model, params, cfg = ast_pair
    rng = np.random.default_rng(0)
    spec = rng.normal(size=(2, cfg.max_length, cfg.num_mel_bins)).astype(np.float32)
    with torch.no_grad():
        ref = model(input_values=torch.from_numpy(spec)).last_hidden_state.numpy()
    got = ast_mod.apply(params, jnp.asarray(spec), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=1e-3)


def test_ast_position_emb_truncation(ast_pair):
    _, params, cfg = ast_pair
    n_tok = cfg.freq_patches * cfg.time_patches + 2
    assert params["position_embeddings"].shape == (1, n_tok, cfg.hidden_size)


def test_ast_extract_features_shapes(ast_pair):
    _, params, cfg = ast_pair
    # freq-agg layer with random weights (torch encoder-layer golden test covers the math)
    from foley_tpu.configs import SynchformerConfig
    from foley_tpu.models import synchformer

    agg = synchformer.init(
        jax.random.PRNGKey(0),
        SynchformerConfig(embed_dim=cfg.hidden_size, depth=1, num_heads=cfg.num_attention_heads,
                          mlp_ratio=2.0, img_size=32, patch_size=8),
    )["spatial_agg"]
    spec = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))
    feats = ast_mod.extract_features(params, agg, spec, cfg)
    assert feats.shape == (3, cfg.time_patches, cfg.hidden_size)


# ---------------------------------------------------------------------------------
# DSP
# ---------------------------------------------------------------------------------

def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        np.asarray(hann_window(400)), torch.hann_window(400).numpy(), atol=1e-6
    )


def test_stft_power_matches_numpy_dft():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3200)).astype(np.float32)
    n_fft, hop, win = 1024, 160, 400
    got = np.asarray(stft_power(jnp.asarray(x), n_fft, hop, win))
    # direct numpy reference
    w = 0.5 * (1 - np.cos(2 * np.pi * np.arange(win) / win))
    pad_l = (n_fft - win) // 2
    w = np.pad(w, (pad_l, n_fft - win - pad_l))
    xp = np.pad(x[0], (n_fft // 2, n_fft // 2), mode="reflect")
    frames = 1 + (len(xp) - n_fft) // hop
    ref = np.empty((n_fft // 2 + 1, frames))
    for t in range(frames):
        seg = xp[t * hop : t * hop + n_fft] * w
        ref[:, t] = np.abs(np.fft.rfft(seg)) ** 2
    np.testing.assert_allclose(got[0], ref, atol=1e-2, rtol=1e-3)
    assert frames == 1 + x.shape[-1] // hop  # torchaudio frame count


def test_mel_filterbank_htk_properties():
    fb = np.asarray(mel_filterbank(513, 128, 16000))
    assert fb.shape == (513, 128)
    assert fb.min() >= 0
    # triangles peak at 1 (no normalization) except possibly edge bins
    assert 0.9 < fb.max() <= 1.0 + 1e-6
    # each filter has nonzero support
    assert (fb.sum(axis=0) > 0).all()


def test_sync_audio_spectrogram_shape():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10240)).astype(np.float32) * 0.1)
    spec = sync_audio_spectrogram(x)
    assert spec.shape == (2, 128, 66)
    assert np.all(np.isfinite(np.asarray(spec)))


def test_segment_audio_windows():
    x = jnp.arange(16000 * 2, dtype=jnp.float32)[None]
    segs = segment_audio(x)
    expected = (32000 - 10240) // 5120 + 1
    assert segs.shape == (1, expected, 10240)
    np.testing.assert_allclose(np.asarray(segs[0, 1, 0]), 5120)


# ---------------------------------------------------------------------------------
# Sync scorer
# ---------------------------------------------------------------------------------

def test_sync_scorer_logits_and_grid():
    cfg = sync_scorer.SyncScorerConfig.tiny()
    params = sync_scorer.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(2, 2, 3, cfg.n_embd)).astype(np.float32))
    aud = jnp.asarray(rng.normal(size=(2, 2, 4, cfg.n_embd)).astype(np.float32))
    logits = sync_scorer.compare_v_a(params, vis, aud, cfg)
    assert logits.shape == (2, cfg.n_offset_classes)
    grid = sync_scorer.make_class_grid(-2, 2, 21)
    assert grid.shape == (21,) and grid[0] == -2.0 and grid[-1] == 2.0 and grid[10] == 0.0
    offs = sync_scorer.predicted_offset_seconds(logits, grid[: cfg.n_offset_classes])
    assert offs.shape == (2,)


def test_sync_scorer_gpt_block_matches_torch():
    """One GPT block vs a torch transcription of reference Block (synchformer.py:238-256)."""
    d, nh = 16, 2
    torch.manual_seed(0)
    ln1 = torch.nn.LayerNorm(d)
    ln2 = torch.nn.LayerNorm(d)
    qw, kw, vw, pw = (torch.nn.Linear(d, d) for _ in range(4))
    fc1, fc2 = torch.nn.Linear(d, 4 * d), torch.nn.Linear(4 * d, d)
    x = torch.randn(2, 5, d)
    with torch.no_grad():
        xn = ln1(x)
        q = qw(xn).view(2, 5, nh, d // nh).transpose(1, 2)
        k = kw(xn).view(2, 5, nh, d // nh).transpose(1, 2)
        v = vw(xn).view(2, 5, nh, d // nh).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / math.sqrt(d // nh)
        y = (att.softmax(-1) @ v).transpose(1, 2).reshape(2, 5, d)
        x1 = x + pw(y)
        ref = x1 + fc2(torch.nn.functional.gelu(fc1(ln2(x1))))

    def jl(m):
        return {"w": jnp.asarray(m.weight.detach().numpy().T.copy()),
                "b": jnp.asarray(m.bias.detach().numpy())}

    p = {"ln1": {"weight": jnp.asarray(ln1.weight.detach().numpy()),
                 "bias": jnp.asarray(ln1.bias.detach().numpy())},
         "ln2": {"weight": jnp.asarray(ln2.weight.detach().numpy()),
                 "bias": jnp.asarray(ln2.bias.detach().numpy())},
         "q": jl(qw), "k": jl(kw), "v": jl(vw), "proj": jl(pw), "fc1": jl(fc1), "fc2": jl(fc2)}
    got = sync_scorer._block(p, jnp.asarray(x.numpy()), nh)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4, rtol=1e-3)


def test_ast_token_mask(ast_pair):
    """cont_mask -> token-mask capability (reference modeling_ast.py:525-544)."""
    _, params, cfg = ast_pair
    rng = np.random.default_rng(5)
    spec = jnp.asarray(rng.normal(size=(1, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))
    tm = ast_mod.token_mask_from_cont_mask(
        jnp.ones((1, cfg.max_length, cfg.num_mel_bins)), cfg
    )
    assert tm.shape == (1, cfg.freq_patches * cfg.time_patches + 2)
    full = ast_mod.apply(params, spec, cfg)
    np.testing.assert_allclose(
        np.asarray(ast_mod.apply(params, spec, cfg, token_mask=tm)),
        np.asarray(full), atol=1e-5,
    )
    partial = ast_mod.apply(params, spec, cfg, token_mask=tm.at[:, 5:].set(False))
    assert np.abs(np.asarray(partial) - np.asarray(full)).max() > 1e-4


def test_ast_for_loop_mode_equals_batched(ast_pair):
    """Memory-lean per-segment mode == batched mode (reference ast_model for_loop branch)."""
    from foley_tpu.configs import SynchformerConfig
    from foley_tpu.models import synchformer

    _, params, cfg = ast_pair
    agg = synchformer.init(
        jax.random.PRNGKey(0),
        SynchformerConfig(embed_dim=cfg.hidden_size, depth=1, num_heads=cfg.num_attention_heads,
                          mlp_ratio=2.0, img_size=32, patch_size=8),
    )["spatial_agg"]
    specs = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, 3, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))
    batched = ast_mod.extract_features_segments(params, agg, specs, cfg, for_loop=False)
    looped = ast_mod.extract_features_segments(params, agg, specs, cfg, for_loop=True)
    assert batched.shape == (2, 3, cfg.time_patches, cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(looped), np.asarray(batched), atol=1e-5)
