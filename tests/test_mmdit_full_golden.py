"""Full MMDiT forward golden test vs an independent torch transcription.

Block math is pinned by test_mmdit_golden; this pins the *wiring* of the whole forward
(reference ``hifi_foley.py:707-924``): timestep embedding -> sync path (pos emb, Linear+SiLU+
ConvMLP, nearest-exact to latent length, additive injection before triple block 0) ->
cond/audio/visual embeddings -> triple scan -> per-token vec for single blocks ->
final adaLN layer. Uses one triple + one single block with converted weights.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from foley_tpu.configs import MMDiTConfig
from foley_tpu.io.convert import convert_mmdit_state_dict
from foley_tpu.models import mmdit
from tests.test_io import _synthetic_mmdit_sd

CFG = MMDiTConfig(
    depth_triple_blocks=1, depth_single_blocks=1, hidden_size=32, num_heads=2,
    condition_dim=12, clip_dim=12, sync_feat_dim=12, audio_vae_latent_dim=8,
    conv_mlp_multiple_of=8, mlp_ratio=2.0, text_length=16,
)
H, NH, HD = CFG.hidden_size, CFG.num_heads, CFG.head_dim


# --- torch reference pieces (transcribed math; weights come from the shared synthetic sd) ---

def t_rope(length, dim):
    pos = torch.arange(length).float()
    idx = torch.arange(0, dim, 2).float()[: dim // 2]
    freqs = torch.outer(pos, torch.pow(torch.tensor(10000.0), -(idx / dim)))
    return freqs.cos().repeat_interleave(2, 1), freqs.sin().repeat_interleave(2, 1)


def t_rot_half(x):
    re, im = x.float().reshape(*x.shape[:-1], -1, 2).unbind(-1)
    return torch.stack([-im, re], -1).flatten(3)


def t_apply_rope(x, cos, sin):
    cos = cos.view(1, -1, 1, cos.shape[-1])
    sin = sin.view(1, -1, 1, sin.shape[-1])
    return (x.float() * cos + t_rot_half(x.float()) * sin).type_as(x)


def t_rms(x, w, eps=1e-6):
    n = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps)
    return n.type_as(x) * w


def t_sdpa(q, k, v):
    return F.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
    ).transpose(1, 2)


def t_interleave(x1, x2):
    b, n1, h, c = x1.shape
    if x2.shape[1] != n1:
        x2 = F.interpolate(x2.reshape(b, x2.shape[1], -1).transpose(1, 2), size=n1,
                           mode="nearest-exact").transpose(1, 2).reshape(b, n1, h, c)
    return torch.stack((x1, x2), 2).reshape(b, 2 * n1, h, c)


def t_decouple(x, len1, len2):
    b, n, h, c = x.shape
    x = x.reshape(b, -1, 2, h, c)
    x1, x2 = x[:, :, 0], x[:, :, 1]
    if x2.shape[1] != len2:
        x2 = F.interpolate(x2.reshape(b, len1, -1).transpose(1, 2), size=len2,
                           mode="nearest-exact").transpose(1, 2).reshape(b, len2, h, c)
    return x1, x2


def torch_forward(sd, x, t, cond_in, clip_feat, sync_feat):
    """Transcription of HunyuanVideoFoley.forward for the 1+1-block tiny config.
    All tensors channel-last like the JAX build; conv weights get permuted locally."""
    T = lambda k: torch.from_numpy(np.asarray(sd[k]))
    lin = lambda name, x_: F.linear(x_, T(name + ".weight"), T(name + ".bias"))
    lin_nb = lambda name, x_: F.linear(x_, T(name + ".weight"))
    ln = lambda x_: F.layer_norm(x_, (H,), eps=1e-6)
    B = x.shape[0]
    tl = x.shape[1]

    # time embedding (256-d sinusoid, glide-style cos-first)
    half = 128
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    args = t[:, None].float() * freqs[None]
    t_emb = torch.cat([torch.cos(args), torch.sin(args)], -1)
    vec = lin("time_in.mlp.2", F.silu(lin("time_in.mlp.0", t_emb)))

    # sync path
    s = sync_feat.shape[1] // 8
    sf = sync_feat.reshape(B, s, 8, CFG.sync_feat_dim) + T("sync_pos_emb")
    sf = sf.reshape(B, s * 8, CFG.sync_feat_dim)
    sf = F.silu(lin("sync_in.0", sf))
    # ConvMLP k=1: w2(silu(w1 x) * w3 x), channel-last
    def conv1(name, x_):
        w = T(name + ".weight")  # [out, in, 1]
        return F.conv1d(x_.transpose(1, 2), w).transpose(1, 2)
    sf = conv1("sync_in.2.w2", F.silu(conv1("sync_in.2.w1", sf)) * conv1("sync_in.2.w3", sf))
    sync_add = F.interpolate(sf.transpose(1, 2), size=tl, mode="nearest-exact").transpose(1, 2)

    # embeddings
    cond = lin("cond_in.linear_2", F.silu(lin("cond_in.linear_1", cond_in)))
    audio = F.conv1d(x.transpose(1, 2), T("audio_embedder.proj.weight"),
                     T("audio_embedder.proj.bias")).transpose(1, 2)
    v_cond = lin_nb("visual_proj.w2",
                    F.silu(lin_nb("visual_proj.w1", clip_feat)) * lin_nb("visual_proj.w3", clip_feat))

    La, Lv, Lt = audio.shape[1], v_cond.shape[1], cond.shape[1]
    audio = audio + sync_add  # injection before triple block 0

    # ---- triple block 0 ----
    p = "triple_blocks.0."
    a_mod = lin(p + "audio_mod.linear", F.silu(vec)).chunk(9, -1)
    v_mod = lin(p + "v_cond_mod.linear", F.silu(vec)).chunk(9, -1)
    am = [m.unsqueeze(1) for m in a_mod]
    vm = [m.unsqueeze(1) for m in v_mod]
    a_in = ln(audio) * (1 + am[1]) + am[0]
    aq, ak, av = lin(p + "audio_self_attn_qkv", a_in).reshape(B, La, 3, NH, HD).unbind(2)
    aq = t_rms(aq, T(p + "audio_self_q_norm.weight"))
    ak = t_rms(ak, T(p + "audio_self_k_norm.weight"))
    v_in = ln(v_cond) * (1 + vm[1]) + vm[0]
    vq, vk, vv = lin(p + "v_cond_attn_qkv", v_in).reshape(B, Lv, 3, NH, HD).unbind(2)
    vq = t_rms(vq, T(p + "v_cond_attn_q_norm.weight"))
    vk = t_rms(vk, T(p + "v_cond_attn_k_norm.weight"))
    cos2, sin2 = t_rope(2 * La, HD)
    qi = t_apply_rope(t_interleave(aq, vq), cos2, sin2)
    ki = t_apply_rope(t_interleave(ak, vk), cos2, sin2)
    aq, vq = t_decouple(qi, La, Lv)
    ak, vk = t_decouple(ki, La, Lv)
    attn = t_sdpa(torch.cat([vq, aq], 1), torch.cat([vk, ak], 1),
                  torch.cat([vv, av], 1)).reshape(B, Lv + La, H)
    audio = audio + lin(p + "audio_self_proj", attn[:, Lv:]) * am[2]
    v_cond = v_cond + lin(p + "v_cond_self_proj", attn[:, :Lv]) * vm[2]

    a_in = ln(audio) * (1 + am[4]) + am[3]
    v_in = ln(v_cond) * (1 + vm[4]) + vm[3]
    aq = t_rms(lin(p + "audio_cross_q", a_in).reshape(B, La, NH, HD), T(p + "audio_cross_q_norm.weight"))
    vq = t_rms(lin(p + "v_cond_cross_q", v_in).reshape(B, Lv, NH, HD), T(p + "v_cond_cross_q_norm.weight"))
    tk, tv = lin(p + "text_cross_kv", cond).reshape(B, Lt, 2, NH, HD).unbind(2)
    tk = t_rms(tk, T(p + "text_cross_k_norm.weight"))
    aq = t_apply_rope(aq, *t_rope(La, HD))
    vq = t_apply_rope(vq, *t_rope(Lv, HD))
    tk = t_apply_rope(tk, *t_rope(Lt, HD))
    cross = t_sdpa(torch.cat([vq, aq], 1), tk, tv).reshape(B, Lv + La, H)
    audio = audio + lin(p + "audio_cross_proj", cross[:, Lv:]) * am[5]
    v_cond = v_cond + lin(p + "v_cond_cross_proj", cross[:, :Lv]) * vm[5]

    audio = audio + lin(p + "audio_mlp.fc2", F.gelu(lin(p + "audio_mlp.fc1",
            ln(audio) * (1 + am[7]) + am[6]), approximate="tanh")) * am[8]
    v_cond = v_cond + lin(p + "v_cond_mlp.fc2", F.gelu(lin(p + "v_cond_mlp.fc1",
             ln(v_cond) * (1 + vm[7]) + vm[6]), approximate="tanh")) * vm[8]

    # ---- per-token vec + single block 0 ----
    vec_tok = sync_add + vec.unsqueeze(1)
    p = "single_blocks.0."
    mod = lin(p + "modulation.linear", F.silu(vec_tok))
    s_msa, c_msa, g_msa, s_mlp, c_mlp, g_mlp = mod.chunk(6, -1)
    xn = ln(audio) * (1 + c_msa) + s_msa
    qkv = lin(p + "linear_qkv", xn).reshape(B, La, NH, HD, 3)  # (H D K) layout
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
    q = t_rms(q, T(p + "q_norm.weight"))
    k = t_rms(k, T(p + "k_norm.weight"))
    cos, sin = t_rope(La, HD)
    q, k = t_apply_rope(q, cos, sin), t_apply_rope(k, cos, sin)
    out = t_sdpa(q, k, v).reshape(B, La, H)
    conv_out = F.conv1d(out.transpose(1, 2), T(p + "linear1.weight"),
                        T(p + "linear1.bias"), padding=1).transpose(1, 2)
    xx = audio + conv_out * g_msa
    xn = ln(xx) * (1 + c_mlp) + s_mlp

    def conv3(name, x_):
        return F.conv1d(x_.transpose(1, 2), T(name + ".weight"), padding=1).transpose(1, 2)

    mlp = conv3(p + "linear2.w2", F.silu(conv3(p + "linear2.w1", xn)) * conv3(p + "linear2.w3", xn))
    xx = xx + mlp * g_mlp

    # ---- final layer (add_sync_feat_to_audio path) ----
    # The reference's modulate() DROPS per-token (3-D) shift/scale (modulate_layers.py:20-22),
    # and vec_tok is per-token here, so the final adaLN modulation is a no-op: norm -> linear.
    # Verified against the literal reference code by test_reference_oracle_mmdit.
    out = F.layer_norm(xx, (H,), eps=1e-6)
    return lin("final_layer.linear", out)


def test_full_forward_matches_transcription():
    sd = _synthetic_mmdit_sd(CFG)
    params = convert_mmdit_state_dict(sd, CFG, strict=True)
    rng = np.random.default_rng(0)
    B, tl = 2, 10
    x = rng.normal(size=(B, tl, CFG.audio_vae_latent_dim)).astype(np.float32)
    t = np.asarray([500.0, 123.0], np.float32)
    cond = rng.normal(size=(B, 6, CFG.condition_dim)).astype(np.float32)
    clip = rng.normal(size=(B, 4, CFG.clip_dim)).astype(np.float32)
    sync = rng.normal(size=(B, 16, CFG.sync_feat_dim)).astype(np.float32)

    with torch.no_grad():
        ref = torch_forward(
            sd, torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond),
            torch.from_numpy(clip), torch.from_numpy(sync),
        ).numpy()
    got = mmdit.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cond),
        jnp.asarray(clip), jnp.asarray(sync), CFG,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=1e-3)
