"""IO tests: checkpoint conversion (torch layouts -> pytree), the single-block qkv
(H D K) permutation, fp8 quantization policy, WAV writing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from foley_tpu.configs import TINY
from foley_tpu.core.params import flatten_params
from foley_tpu.io.audio import write_wav
from foley_tpu.io.convert import (
    _hdk_to_khd,
    convert_dac_state_dict,
    convert_mmdit_state_dict,
    detect_ckpt_fp8,
    detect_ckpt_major_precision,
)
from foley_tpu.io.quantize import quantize_fp8
from foley_tpu.models import dac_vae, mmdit
from foley_tpu.ops.nn import dense

CFG = TINY.model


def test_hdk_to_khd_permutation_semantics():
    """Converted fused-qkv weights must reproduce torch's (H D K) split semantics
    (reference hifi_foley.py:362: rearrange 'B L (H D K) -> B H L D K')."""
    torch.manual_seed(0)
    H, D = CFG.num_heads, CFG.head_dim
    h = H * D
    W = torch.randn(3 * h, h)  # torch Linear weight [out, in]
    b = torch.randn(3 * h)
    x = torch.randn(2, 5, h)
    qkv = torch.nn.functional.linear(x, W, b)  # [2, 5, 3h]
    # torch semantics: out dim is (H, D, K)-interleaved
    ref = qkv.reshape(2, 5, H, D, 3)
    q_t, k_t, v_t = ref[..., 0], ref[..., 1], ref[..., 2]  # [2, 5, H, D]

    w_j = jnp.asarray(_hdk_to_khd(np.ascontiguousarray(W.numpy().T), H, D))
    b_j = jnp.asarray(_hdk_to_khd(b.numpy(), H, D))
    out = dense(jnp.asarray(x.numpy()), w_j, b_j)
    q_j, k_j, v_j = (u.reshape(2, 5, H, D) for u in jnp.split(out, 3, axis=-1))
    np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_j), k_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=1e-5)


def _synthetic_mmdit_sd(cfg):
    """Build a reference-keyed state dict for the tiny config (names from
    hifi_foley.py:392-527 module attributes)."""
    g = torch.Generator().manual_seed(0)
    h, hd, nh = cfg.hidden_size, cfg.head_dim, cfg.num_heads
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * 0.02
        if bias:
            sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.02

    def conv(name, i, o, k, bias=True):
        sd[f"{name}.weight"] = torch.randn(o, i, k, generator=g) * 0.02
        if bias:
            sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.02

    conv("audio_embedder.proj", cfg.audio_vae_latent_dim, h, cfg.patch_size)
    lin("visual_proj.w1", cfg.clip_dim, h, bias=False)
    lin("visual_proj.w2", h, h, bias=False)
    lin("visual_proj.w3", cfg.clip_dim, h, bias=False)
    lin("cond_in.linear_1", cfg.condition_dim, h)
    lin("cond_in.linear_2", h, h)
    lin("time_in.mlp.0", 256, h)
    lin("time_in.mlp.2", h, h)
    lin("final_layer.linear", h, cfg.patch_size * cfg.audio_vae_latent_dim)
    lin("final_layer.adaLN_modulation.1", h, 2 * h)
    sd["empty_clip_feat"] = torch.zeros(1, cfg.clip_dim)
    sd["empty_sync_feat"] = torch.zeros(1, cfg.sync_feat_dim)
    lin("sync_in.0", cfg.sync_feat_dim, h)
    sync_hidden = mmdit._conv_mlp_hidden(h * 4, cfg.conv_mlp_multiple_of)
    conv("sync_in.2.w1", h, sync_hidden, cfg.sync_in_ksz, bias=False)
    conv("sync_in.2.w2", sync_hidden, h, cfg.sync_in_ksz, bias=False)
    conv("sync_in.2.w3", h, sync_hidden, cfg.sync_in_ksz, bias=False)
    sd["sync_pos_emb"] = torch.randn(1, 1, 8, cfg.sync_feat_dim, generator=g) * 0.02

    for i in range(cfg.depth_triple_blocks):
        p = f"triple_blocks.{i}"
        lin(f"{p}.audio_mod.linear", h, 9 * h)
        lin(f"{p}.v_cond_mod.linear", h, 9 * h)
        lin(f"{p}.audio_self_attn_qkv", h, 3 * h)
        lin(f"{p}.audio_self_proj", h, h)
        lin(f"{p}.v_cond_attn_qkv", h, 3 * h)
        lin(f"{p}.v_cond_self_proj", h, h)
        lin(f"{p}.audio_cross_q", h, h)
        lin(f"{p}.v_cond_cross_q", h, h)
        lin(f"{p}.text_cross_kv", h, 2 * h)
        lin(f"{p}.audio_cross_proj", h, h)
        lin(f"{p}.v_cond_cross_proj", h, h)
        for n in ("audio_self_q_norm", "audio_self_k_norm", "v_cond_attn_q_norm",
                  "v_cond_attn_k_norm", "audio_cross_q_norm", "v_cond_cross_q_norm",
                  "text_cross_k_norm"):
            sd[f"{p}.{n}.weight"] = torch.ones(hd)
        lin(f"{p}.audio_mlp.fc1", h, cfg.mlp_hidden_dim)
        lin(f"{p}.audio_mlp.fc2", cfg.mlp_hidden_dim, h)
        lin(f"{p}.v_cond_mlp.fc1", h, cfg.mlp_hidden_dim)
        lin(f"{p}.v_cond_mlp.fc2", cfg.mlp_hidden_dim, h)

    for i in range(cfg.depth_single_blocks):
        p = f"single_blocks.{i}"
        lin(f"{p}.modulation.linear", h, 6 * h)
        lin(f"{p}.linear_qkv", h, 3 * h)
        sd[f"{p}.q_norm.weight"] = torch.ones(hd)
        sd[f"{p}.k_norm.weight"] = torch.ones(hd)
        conv(f"{p}.linear1", h, h, 3)
        conv(f"{p}.linear2.w1", h, cfg.conv_mlp_hidden_dim, 3, bias=False)
        conv(f"{p}.linear2.w2", cfg.conv_mlp_hidden_dim, h, 3, bias=False)
        conv(f"{p}.linear2.w3", h, cfg.conv_mlp_hidden_dim, 3, bias=False)
    return {k: v.numpy() for k, v in sd.items()}


def test_convert_mmdit_and_forward():
    sd = _synthetic_mmdit_sd(CFG)
    params = convert_mmdit_state_dict(sd, CFG, strict=True)
    # structure matches random init
    ref = mmdit.init(jax.random.PRNGKey(0), CFG)
    flat_c, flat_r = flatten_params(params), flatten_params(ref)
    assert set(flat_c) == set(flat_r)
    for k in flat_r:
        assert flat_c[k].shape == flat_r[k].shape, k
    # and the converted model runs
    rng = np.random.default_rng(0)
    out = mmdit.apply(
        params,
        jnp.asarray(rng.normal(size=(1, 50, CFG.audio_vae_latent_dim)).astype(np.float32)),
        jnp.asarray([500.0], jnp.float32),
        jnp.asarray(rng.normal(size=(1, 12, CFG.condition_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 8, CFG.clip_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 16, CFG.sync_feat_dim)).astype(np.float32)),
        CFG,
    )
    assert out.shape == (1, 50, CFG.audio_vae_latent_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_convert_dac_decoder_matches_plain_weights():
    """Converting a weight-normed tiny DAC checkpoint (reference key layout, built by
    tests/helpers.make_dac_state_dict) must produce folded weights equal to the torch
    effective weights, and decode must run."""
    from helpers import make_dac_state_dict

    cfg = TINY.dac
    sd, eff = make_dac_state_dict(cfg)
    params = convert_dac_state_dict(sd, cfg, strict=True)
    # conv_in folded weight equals torch effective weight (transposed layout)
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["conv_in"]["w"]),
        np.transpose(eff, (2, 1, 0)), atol=1e-5,
    )
    z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, cfg.latent_dim)).astype(np.float32))
    audio = dac_vae.decode(params, z, cfg)
    assert audio.shape == (1, 3 * cfg.hop_length, 1)


def test_fp8_quantize_policy():
    params = mmdit.init(jax.random.PRNGKey(0), CFG)
    q, counts, saved = quantize_fp8(params, "fp8_e4m3fn")
    flat = flatten_params(q)
    # quantized: big matmul weights
    assert flat["triple_blocks.audio_self_attn_qkv.w"].dtype == jnp.float8_e4m3fn
    assert flat["single_blocks.linear_qkv.w"].dtype == jnp.float8_e4m3fn
    # deny-list: final layer, cross q/proj, norms, biases, empties
    assert flat["final_layer.linear.w"].dtype == jnp.float32
    assert flat["triple_blocks.audio_cross_q.w"].dtype == jnp.float32
    assert flat["triple_blocks.audio_cross_proj.w"].dtype == jnp.float32
    assert flat["visual_proj.w1.w"].dtype == jnp.float32
    assert flat["single_blocks.q_norm.weight"].dtype == jnp.float32
    assert flat["triple_blocks.audio_self_attn_qkv.b"].dtype == jnp.float32
    assert flat["empty_clip_feat"].dtype == jnp.float32
    assert saved > 0 and counts["quantized"] > 0
    # quantized model still runs (upcast-on-use)
    rng = np.random.default_rng(0)
    out = mmdit.apply(
        q,
        jnp.asarray(rng.normal(size=(1, 20, CFG.audio_vae_latent_dim)).astype(np.float32)),
        jnp.asarray([100.0], jnp.float32),
        jnp.asarray(rng.normal(size=(1, 8, CFG.condition_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 4, CFG.clip_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 8, CFG.sync_feat_dim)).astype(np.float32)),
        CFG,
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_detect_dtypes():
    sd = {"a": np.zeros(10, np.float16), "b": np.zeros(100, np.float16), "c": np.zeros(5, np.float32)}
    assert detect_ckpt_major_precision(sd) == "fp16"
    assert detect_ckpt_fp8(sd) is None
    import ml_dtypes

    sd["q"] = np.zeros(4, ml_dtypes.float8_e4m3fn)
    assert detect_ckpt_fp8(sd) == "fp8_e4m3fn"


def test_write_wav_roundtrip(tmp_path):
    import wave

    path = str(tmp_path / "t.wav")
    wf = np.sin(np.linspace(0, 100, 4800, dtype=np.float32))[None] * 0.5
    write_wav(path, wf, 48000)
    with wave.open(path) as f:
        assert f.getframerate() == 48000
        assert f.getnchannels() == 1
        assert f.getnframes() == 4800


def test_load_bf16_safetensors_roundtrip(tmp_path):
    """bf16 safetensors go through the torch-flavored fallback loader (numpy lacks bf16)."""
    from safetensors.torch import save_file

    from foley_tpu.io.convert import load_torch_state_dict

    t = torch.arange(6, dtype=torch.bfloat16).reshape(2, 3)
    path = str(tmp_path / "bf16.safetensors")
    save_file({"w": t}, path)
    sd = load_torch_state_dict(path)
    import ml_dtypes

    assert sd["w"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(sd["w"].astype(np.float32), t.float().numpy())


def test_load_pth_payload_shapes(tmp_path):
    """torch.load payloads: flat dict and {'state_dict': ...} wrapper (reference
    _extract_state semantics)."""
    from foley_tpu.io.convert import load_torch_state_dict

    flat = {"a": torch.ones(2), "meta": "ignored"}
    p1 = str(tmp_path / "flat.pth")
    torch.save(flat, p1)
    sd = load_torch_state_dict(p1)
    assert set(sd) == {"a"}

    wrapped = {"state_dict": {"b": torch.zeros(3)}, "epoch": 7}
    p2 = str(tmp_path / "wrapped.pth")
    torch.save(wrapped, p2)
    sd2 = load_torch_state_dict(p2)
    assert set(sd2) == {"b"}


def test_validate_parity_tool(tmp_path):
    import subprocess
    import sys as _sys

    from foley_tpu.io.audio import write_wav

    sr = 48000
    t = np.linspace(0, 1, sr)
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    a, b = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(a, x[None], sr)
    write_wav(b, (x + 0.001 * np.random.default_rng(0).normal(size=x.shape).astype(np.float32))[None], sr)
    r = subprocess.run([_sys.executable, "tools/validate_parity.py", a, b],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS" in r.stdout


def test_int8_quantize_policy_and_fidelity():
    from foley_tpu.io.quantize import quantize_int8
    from foley_tpu.ops.nn import dense

    params = mmdit.init(jax.random.PRNGKey(0), CFG)
    q, counts, saved = quantize_int8(params)
    assert counts["quantized"] > 0 and saved > 0
    flat_q = q["triple_blocks"]["audio_self_attn_qkv"]["w"]
    assert isinstance(flat_q, dict) and flat_q["int8"].dtype == jnp.int8
    # per-depth, per-out-channel scales for stacked leaves
    d, i, o = params["triple_blocks"]["audio_self_attn_qkv"]["w"].shape
    assert flat_q["scale"].shape == (d, 1, o)
    # deny-list honored
    assert not isinstance(q["final_layer"]["linear"]["w"], dict)
    assert not isinstance(q["triple_blocks"]["audio_cross_q"]["w"], dict)
    # dequantized matmul close to the fp32 matmul (per-channel int8: <1% rel error)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, i)).astype(np.float32))
    w = params["triple_blocks"]["audio_self_attn_qkv"]["w"][0]
    ref = dense(x, w)
    got = dense(x, {"int8": flat_q["int8"][0], "scale": flat_q["scale"][0]})
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / (np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 0.01, rel


def test_int8_on_host_consume_equivalence():
    """on_host (numpy math) + consume (source tree cleared) produce bit-identical quantized
    trees to the device path — the HBM-bounded loading recipe for the 10 GiB XXL."""
    from foley_tpu.core.params import flatten_params as flat
    from foley_tpu.io.quantize import quantize_int8

    ref_params = mmdit.init(jax.random.PRNGKey(0), CFG)
    q_dev, c_dev, s_dev = quantize_int8(ref_params)
    victim = mmdit.init(jax.random.PRNGKey(0), CFG)
    q_host, c_host, s_host = quantize_int8(victim, on_host=True, consume=True)
    assert victim == {}  # consumed
    assert (c_dev, s_dev) == (c_host, s_host)
    fd, fh = flat(q_dev), flat(q_host)
    assert set(fd) == set(fh)
    for k in fd:
        np.testing.assert_array_equal(np.asarray(fd[k]), np.asarray(fh[k]), err_msg=k)


def test_int8_dynamic_matmul_path():
    """int8xint8 (dynamic activation quant) dense: int32 accumulation + fused dequant stays
    within ~2% of the fp32 matmul, and a marked tiny-model forward runs finite end-to-end."""
    from foley_tpu.io.quantize import quantize_int8
    from foley_tpu.ops.nn import dense

    rng = np.random.default_rng(1)
    w32 = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32) * 0.2)
    x = jnp.asarray(rng.normal(size=(6, 64)).astype(np.float32))
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    ref = dense(x, w32)
    got = dense(x, {"int8_dyn": q, "scale": scale})
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.02, rel

    params, counts, _ = quantize_int8(mmdit.init(jax.random.PRNGKey(0), CFG), dynamic=True)
    assert counts["quantized"] > 0
    assert "int8_dyn" in params["triple_blocks"]["audio_self_attn_qkv"]["w"]
    rng = np.random.default_rng(2)
    out = mmdit.apply(
        params,
        jnp.asarray(rng.normal(size=(1, 20, CFG.audio_vae_latent_dim)).astype(np.float32)),
        jnp.asarray([400.0], jnp.float32),
        jnp.asarray(rng.normal(size=(1, 8, CFG.condition_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 4, CFG.clip_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 8, CFG.sync_feat_dim)).astype(np.float32)),
        CFG,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_int8_end_to_end_generation():
    from foley_tpu.io.quantize import quantize_int8
    from foley_tpu.models import dac_vae
    from foley_tpu.pipeline.generate import ModelBundle, generate_audio

    params, _, _ = quantize_int8(mmdit.init(jax.random.PRNGKey(0), CFG))
    bundle = ModelBundle(
        mmdit_params=params,
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    text = jnp.zeros((1, 16, CFG.condition_dim), jnp.float32)
    res = generate_audio(bundle, text, text, 1.0, num_inference_steps=2, batch_size=1, seed=0)
    assert res.audio_batch.shape == (1, 1, 48000)
    assert np.isfinite(res.audio_batch).all()


def test_int4_quantize_policy_and_fidelity():
    """int4 group-wise quantization: nibble-packed uint8 storage (never the jnp.int4 dtype
    — it crashes the axon dispatch layer, see quantize_int4), group-structured scales,
    deny-list honored, dequant-at-use matmul error bounded, and a quantized tiny forward
    runs finite end-to-end."""
    from foley_tpu.io.quantize import quantize_int4
    from foley_tpu.ops.nn import dense

    params = mmdit.init(jax.random.PRNGKey(0), CFG)
    q, counts, saved = quantize_int4(params, group_size=16)
    assert counts["quantized"] > 0 and saved > 0
    leaf = q["triple_blocks"]["audio_self_attn_qkv"]["w"]
    d, i, o = params["triple_blocks"]["audio_self_attn_qkv"]["w"].shape
    assert isinstance(leaf, dict) and leaf["int4"].dtype == jnp.uint8
    assert leaf["int4"].shape == (d, i // 2, o)
    groups = i // 16 if i % 16 == 0 else 1
    assert leaf["scale"].shape == (d, groups, 1, o)
    assert not isinstance(q["final_layer"]["linear"]["w"], dict)  # deny-list

    # dequant matmul error: group-wise int4 stays within a few percent
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, i)).astype(np.float32))
    w = params["triple_blocks"]["audio_self_attn_qkv"]["w"][0]
    ref = dense(x, w)
    got = dense(x, {"int4": leaf["int4"][0], "scale": leaf["scale"][0]})
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / (np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 0.08, rel
    # and it is strictly the round-to-scale dequant (exact vs a numpy nibble-unpack dequant;
    # split-half layout: low nibble = rows [0, i/2), high = rows [i/2, i))
    p = np.asarray(leaf["int4"][0])
    qvals = np.concatenate([(p & 0xF).astype(np.int8) - 8, (p >> 4).astype(np.int8) - 8],
                           axis=0)
    deq = (qvals.astype(np.float32)
           .reshape(groups, i // groups, o) * np.asarray(leaf["scale"][0])).reshape(i, o)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense(x, jnp.asarray(deq))),
                               rtol=1e-5, atol=1e-5)

    # consume clears the source tree; counts identical
    victim = mmdit.init(jax.random.PRNGKey(0), CFG)
    q2, counts2, saved2 = quantize_int4(victim, group_size=16, consume=True)
    assert victim == {} and (counts2, saved2) == (counts, saved)

    rng = np.random.default_rng(2)
    out = mmdit.apply(
        q,
        jnp.asarray(rng.normal(size=(1, 20, CFG.audio_vae_latent_dim)).astype(np.float32)),
        jnp.asarray([400.0], jnp.float32),
        jnp.asarray(rng.normal(size=(1, 8, CFG.condition_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 4, CFG.clip_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 8, CFG.sync_feat_dim)).astype(np.float32)),
        CFG,
    )
    assert np.all(np.isfinite(np.asarray(out)))
