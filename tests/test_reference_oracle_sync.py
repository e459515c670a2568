"""Golden tests: V2A encoder stack vs the reference's LITERAL Synchformer code.

The synchformer/AST/sync-scorer tests elsewhere pin primitives against torch modules and
hand transcriptions; these instantiate the reference's actual ``MotionFormer``, ``AST`` and
``GlobalTransformer`` (imported from /root/reference via tests/reference_oracle, with
omegaconf/timm/torchaudio dependency shims) at tiny configs, convert their real
``state_dict()`` through our converters, and assert the full forwards agree.

Tiny-fication notes (architecture knobs only; every executed line is reference code):
- MotionFormer reads its hyperparameters from ``divided_224_16x4.yaml`` via OmegaConf.load
  (``motionformer.py:101``); the test wraps the loader to shrink EMBED_DIM/DEPTH/HEADS and
  enlarge PATCH_SIZE (224 stays fixed: ``video_model_builder.py:50`` hardcodes the 224
  PatchEmbed that sizes pos_embed, so spatial shrink must come from the patch size).
- AST builds its config via the module-level ``ASTConfig`` factory (``ast_model.py:55``);
  the test monkeypatches that name to a tiny HF ASTConfig.
- GlobalTransformer takes explicit n_layer/n_head/n_embd kwargs (``synchformer.py:115``).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from foley_tpu.configs import SynchformerConfig
from foley_tpu.models import ast as ast_mod
from foley_tpu.models import sync_scorer, synchformer
from tests.reference_oracle import _OmegaConf, import_reference

mf_ref = import_reference("hunyuanvideo_foley.models.synchformer.motionformer")
ast_ref = import_reference("hunyuanvideo_foley.models.synchformer.ast_model")
sync_ref = import_reference("hunyuanvideo_foley.models.synchformer.synchformer")

TINY = SynchformerConfig(
    img_size=224, patch_size=56, temporal_patch_size=2, num_frames=4,
    embed_dim=32, depth=2, num_heads=2, mlp_ratio=4.0,
)


def _np_sd(model: torch.nn.Module):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_motionformer_oracle(monkeypatch):
    """Full MotionFormer forward (divided space-time blocks + spatial agg) vs our apply."""
    orig_load = _OmegaConf.load

    def tiny_load(path):
        cfg = orig_load(path)
        cfg.VIT.EMBED_DIM = TINY.embed_dim
        cfg.VIT.DEPTH = TINY.depth
        cfg.VIT.NUM_HEADS = TINY.num_heads
        cfg.VIT.PATCH_SIZE = TINY.patch_size
        cfg.VIT.TEMPORAL_RESOLUTION = TINY.temporal_resolution
        cfg.VIT.DROP_PATH = 0.0
        return cfg

    monkeypatch.setattr(_OmegaConf, "load", staticmethod(tiny_load))
    torch.manual_seed(0)
    model = mf_ref.MotionFormer(
        extract_features=True,
        factorize_space_time=True,
        agg_space_module="TransformerEncoderLayer",
        agg_time_module="torch.nn.Identity",
        add_global_repr=False,
    ).eval()
    # video_model_builder.py:63 zeroes the 3D patch embedding at init (ckpts overwrite it);
    # re-randomize so the oracle actually exercises the input path.
    with torch.no_grad():
        torch.nn.init.normal_(model.patch_embed_3d.proj.weight, std=0.02)

    b, s = 1, 2
    rng = np.random.default_rng(0)
    x_cl = rng.normal(size=(b, s, TINY.num_frames, TINY.img_size, TINY.img_size, 3)).astype(np.float32)
    x_torch = torch.from_numpy(x_cl).permute(0, 1, 5, 2, 3, 4)  # (B, S, C, T, H, W)
    with torch.no_grad():
        ref = model(x_torch)  # (B, S, t, D)
    assert ref.shape == (b, s, TINY.temporal_resolution, TINY.embed_dim)

    params = synchformer.convert_state_dict(_np_sd(model), TINY, prefix="")
    got = synchformer.apply(params, jnp.asarray(x_cl), TINY)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3)


def test_ast_oracle(monkeypatch):
    """Reference AST wrapper (HF-style encoder + frequency agg, factorized freq/time) vs
    our extract_features_segments."""
    tiny = ast_mod.ASTConfig.tiny()
    RealASTConfig = ast_ref.ASTConfig  # capture before the monkeypatch rebinds the name

    def tiny_hf_config():
        return RealASTConfig(
            hidden_size=tiny.hidden_size,
            num_hidden_layers=tiny.num_hidden_layers,
            num_attention_heads=tiny.num_attention_heads,
            intermediate_size=tiny.intermediate_size,
            patch_size=tiny.patch_size,
            frequency_stride=tiny.frequency_stride,
            time_stride=tiny.time_stride,
            num_mel_bins=tiny.num_mel_bins,
        )

    monkeypatch.setattr(ast_ref, "ASTConfig", tiny_hf_config)
    torch.manual_seed(1)
    model = ast_ref.AST(
        extract_features=True,
        max_spec_t=tiny.max_length,
        factorize_freq_time=True,
        agg_freq_module="TransformerEncoderLayer",
        agg_time_module="torch.nn.Identity",
        add_global_repr=False,
    ).eval()

    b, s = 1, 2
    rng = np.random.default_rng(1)
    spec = rng.normal(size=(b, s, tiny.max_length, tiny.num_mel_bins)).astype(np.float32)
    with torch.no_grad():
        ref, _ = model(torch.from_numpy(spec))  # (B, S, t, D); global repr is None
    assert ref.shape == (b, s, tiny.time_patches, tiny.hidden_size)

    sd = _np_sd(model)
    params = ast_mod.convert_hf_state_dict(sd, tiny, prefix="ast.")
    freq_agg = synchformer.convert_torch_encoder_layer(sd, "freq_attn_agg.", tiny.hidden_size)
    got = ast_mod.extract_features_segments(params, freq_agg, jnp.asarray(spec), tiny)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("for_loop", [True])
def test_ast_oracle_for_loop_branch(monkeypatch, for_loop):
    """The reference's memory-lean per-segment loop (ast_model.forward for_loop=True)
    equals our for_loop mode — both must match the batched path exactly."""
    tiny = ast_mod.ASTConfig.tiny()
    RealASTConfig = ast_ref.ASTConfig
    monkeypatch.setattr(
        ast_ref, "ASTConfig",
        lambda: RealASTConfig(
            hidden_size=tiny.hidden_size, num_hidden_layers=tiny.num_hidden_layers,
            num_attention_heads=tiny.num_attention_heads, intermediate_size=tiny.intermediate_size,
            patch_size=tiny.patch_size, frequency_stride=tiny.frequency_stride,
            time_stride=tiny.time_stride, num_mel_bins=tiny.num_mel_bins,
        ),
    )
    torch.manual_seed(2)
    model = ast_ref.AST(
        extract_features=True, max_spec_t=tiny.max_length, factorize_freq_time=True,
        agg_freq_module="TransformerEncoderLayer", agg_time_module="torch.nn.Identity",
        add_global_repr=False,
    ).eval()
    rng = np.random.default_rng(2)
    spec = rng.normal(size=(1, 3, tiny.max_length, tiny.num_mel_bins)).astype(np.float32)
    with torch.no_grad():
        ref, _ = model(torch.from_numpy(spec), for_loop=for_loop)
    sd = _np_sd(model)
    params = ast_mod.convert_hf_state_dict(sd, tiny, prefix="ast.")
    freq_agg = synchformer.convert_torch_encoder_layer(sd, "freq_attn_agg.", tiny.hidden_size)
    got = ast_mod.extract_features_segments(params, freq_agg, jnp.asarray(spec), tiny,
                                            for_loop=for_loop)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3)


def test_ast_cont_mask_oracle(monkeypatch):
    """The reference's spectrogram-mask path (inf/nan patch trick -> key-masked encoder
    attention -> key-masked frequency agg, ``modeling_ast.py:525-544`` +
    ``ast_model.py:196-206``) vs our cont_mask plumbing.

    The mask is a rectangular hole misaligned with the stride grid so overlapping patches
    are partially covered — the case where keep-iff-ALL-cells and keep-iff-ANY-cell
    derivations differ."""
    tiny = ast_mod.ASTConfig.tiny()
    RealASTConfig = ast_ref.ASTConfig
    monkeypatch.setattr(
        ast_ref, "ASTConfig",
        lambda: RealASTConfig(
            hidden_size=tiny.hidden_size, num_hidden_layers=tiny.num_hidden_layers,
            num_attention_heads=tiny.num_attention_heads, intermediate_size=tiny.intermediate_size,
            patch_size=tiny.patch_size, frequency_stride=tiny.frequency_stride,
            time_stride=tiny.time_stride, num_mel_bins=tiny.num_mel_bins,
        ),
    )
    torch.manual_seed(4)
    model = ast_ref.AST(
        extract_features=True, max_spec_t=tiny.max_length, factorize_freq_time=True,
        agg_freq_module="TransformerEncoderLayer", agg_time_module="torch.nn.Identity",
        add_global_repr=False,
    ).eval()

    b, s = 1, 2
    rng = np.random.default_rng(4)
    spec = rng.normal(size=(b, s, tiny.max_length, tiny.num_mel_bins)).astype(np.float32)
    cont_mask = np.ones((b, s, tiny.max_length, tiny.num_mel_bins), dtype=bool)
    cont_mask[:, 0, 3:15, 5:21] = False   # straddles both patch rows and the overlap band
    cont_mask[:, 1, :, :11] = False       # full-frequency strip in segment 2

    with torch.no_grad():
        ref, _ = model(torch.from_numpy(spec), cont_mask=torch.from_numpy(cont_mask))

    sd = _np_sd(model)
    params = ast_mod.convert_hf_state_dict(sd, tiny, prefix="ast.")
    freq_agg = synchformer.convert_torch_encoder_layer(sd, "freq_attn_agg.", tiny.hidden_size)
    got = ast_mod.extract_features_segments(
        params, freq_agg, jnp.asarray(spec), tiny, cont_mask=jnp.asarray(cont_mask)
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3)


def test_global_transformer_oracle():
    """Sync scorer (vproj/aproj + GlobalTransformer OFF-token head) vs our compare_v_a,
    replicating Synchformer.compare_v_a's two projection lines (synchformer.py:54-68)."""
    cfg = sync_scorer.SyncScorerConfig.tiny()
    torch.manual_seed(3)
    gt = sync_ref.GlobalTransformer(
        tok_pdrop=0.0, embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=0.1,
        n_layer=cfg.n_layer, n_head=cfg.n_head, n_embd=cfg.n_embd,
        pos_emb_block_shape=[cfg.pos_max_len], n_off_head_out=cfg.n_offset_classes,
    ).eval()
    vproj = torch.nn.Linear(cfg.n_embd, cfg.n_embd)
    aproj = torch.nn.Linear(cfg.n_embd, cfg.n_embd)

    b, s, tv, ta = 1, 2, 4, 5
    assert 2 + s * tv + s * ta == cfg.pos_max_len  # reference pos emb requires exact length
    rng = np.random.default_rng(3)
    vis = rng.normal(size=(b, s, tv, cfg.n_embd)).astype(np.float32)
    aud = rng.normal(size=(b, s, ta, cfg.n_embd)).astype(np.float32)
    with torch.no_grad():
        v = vproj(torch.from_numpy(vis)).view(b, s * tv, cfg.n_embd)
        a = aproj(torch.from_numpy(aud)).view(b, s * ta, cfg.n_embd)
        ref = gt(v, a)  # (B, n_offset_classes)

    sd = {**{"vproj." + k: v_ for k, v_ in _np_sd(vproj).items()},
          **{"aproj." + k: v_ for k, v_ in _np_sd(aproj).items()},
          **{"transformer." + k: v_ for k, v_ in _np_sd(gt).items()}}
    params = sync_scorer.convert_state_dict(sd, cfg)
    got = sync_scorer.compare_v_a(params, jnp.asarray(vis), jnp.asarray(aud), cfg)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3)
