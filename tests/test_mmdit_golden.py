"""Golden tests of the MMDiT blocks against independent torch transcriptions.

These transcriptions implement the reference block math (``hifi_foley.py:179-390``) directly
in torch from the spec — 9-way adaLN chunk order, LayerNorm placement, joint [v_cond; audio]
self-attention with interleaved RoPE, per-length cross-attention RoPE, (H D K) fused qkv —
and pin the JAX implementation (and therefore the checkpoint converter's layout) to them.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from foley_tpu.configs import MMDiTConfig
from foley_tpu.models import mmdit

CFG = MMDiTConfig(
    depth_triple_blocks=1, depth_single_blocks=1, hidden_size=32, num_heads=2,
    condition_dim=12, clip_dim=12, sync_feat_dim=12, audio_vae_latent_dim=8,
    conv_mlp_multiple_of=8, mlp_ratio=2.0,
)
H, NH, HD = CFG.hidden_size, CFG.num_heads, CFG.head_dim


def j(t):
    return jnp.asarray(t.detach().numpy())


def jlin(lin):
    p = {"w": j(lin.weight).T}
    if lin.bias is not None:
        p["b"] = j(lin.bias)
    return p


# ---------------------------------------------------------------------------------
# torch helpers (transcribed reference math)
# ---------------------------------------------------------------------------------

def t_rope_table(length, dim):
    pos = torch.arange(length).float()
    idx = torch.arange(0, dim, 2).float()[: dim // 2]
    freqs = torch.outer(pos, torch.pow(torch.tensor(10000.0), -(idx / dim)))
    return freqs.cos().repeat_interleave(2, 1), freqs.sin().repeat_interleave(2, 1)


def t_rotate_half(x):
    re, im = x.float().reshape(*x.shape[:-1], -1, 2).unbind(-1)
    return torch.stack([-im, re], -1).flatten(3)


def t_apply_rope(x, cos, sin):
    # x: [B, L, H, D], tables [L, D]
    cos = cos.view(1, -1, 1, cos.shape[-1])
    sin = sin.view(1, -1, 1, sin.shape[-1])
    return (x.float() * cos + t_rotate_half(x.float()) * sin).type_as(x)


def t_rms(x, w, eps=1e-6):
    n = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps)
    return n.type_as(x) * w


def t_sdpa(q, k, v):
    # seq-first [B, L, H, D]
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


class TorchTripleBlock(torch.nn.Module):
    """Transcription of TwoStreamCABlock (hifi_foley.py:62-333), interleaved RoPE variant."""

    def __init__(self):
        super().__init__()
        L = torch.nn.Linear
        self.audio_mod = L(H, 9 * H)
        self.v_cond_mod = L(H, 9 * H)
        self.audio_qkv = L(H, 3 * H)
        self.audio_q_norm = torch.nn.Parameter(torch.rand(HD) + 0.5)
        self.audio_k_norm = torch.nn.Parameter(torch.rand(HD) + 0.5)
        self.audio_proj = L(H, H)
        self.v_qkv = L(H, 3 * H)
        self.v_q_norm = torch.nn.Parameter(torch.rand(HD) + 0.5)
        self.v_k_norm = torch.nn.Parameter(torch.rand(HD) + 0.5)
        self.v_proj = L(H, H)
        self.audio_cross_q = L(H, H)
        self.v_cross_q = L(H, H)
        self.text_kv = L(H, 2 * H)
        self.audio_cq_norm = torch.nn.Parameter(torch.rand(HD) + 0.5)
        self.v_cq_norm = torch.nn.Parameter(torch.rand(HD) + 0.5)
        self.text_k_norm = torch.nn.Parameter(torch.rand(HD) + 0.5)
        self.audio_cross_proj = L(H, H)
        self.v_cross_proj = L(H, H)
        mlp_h = int(H * CFG.mlp_ratio)
        self.a_fc1, self.a_fc2 = L(H, mlp_h), L(mlp_h, H)
        self.v_fc1, self.v_fc2 = L(H, mlp_h), L(mlp_h, H)

    def forward(self, audio, cond, v_cond, vec):
        ln = lambda x: F.layer_norm(x, (H,), eps=1e-6)
        a_mod = self.audio_mod(F.silu(vec)).chunk(9, -1)
        v_mod = self.v_cond_mod(F.silu(vec)).chunk(9, -1)
        (a1s, a1c, a1g, a2s, a2c, a2g, a3s, a3c, a3g) = [m.unsqueeze(1) for m in a_mod]
        (v1s, v1c, v1g, v2s, v2c, v2g, v3s, v3c, v3g) = [m.unsqueeze(1) for m in v_mod]
        La, Lv = audio.shape[1], v_cond.shape[1]

        # 1. joint self attention
        a_in = ln(audio) * (1 + a1c) + a1s
        aq, ak, av = self.audio_qkv(a_in).reshape(-1, La, 3, NH, HD).unbind(2)
        aq, ak = t_rms(aq, self.audio_q_norm), t_rms(ak, self.audio_k_norm)
        v_in = ln(v_cond) * (1 + v1c) + v1s
        vq, vk, vv = self.v_qkv(v_in).reshape(-1, Lv, 3, NH, HD).unbind(2)
        vq, vk = t_rms(vq, self.v_q_norm), t_rms(vk, self.v_k_norm)
        cos, sin = t_rope_table(2 * La, HD)
        qi = t_apply_rope(t_interleave(aq, vq), cos, sin)
        ki = t_apply_rope(t_interleave(ak, vk), cos, sin)
        aq, vq = t_decouple(qi, La, Lv)
        ak, vk = t_decouple(ki, La, Lv)
        q = torch.cat([vq, aq], 1)
        k = torch.cat([vk, ak], 1)
        v = torch.cat([vv, av], 1)
        attn = t_sdpa(q, k, v).reshape(-1, Lv + La, H)
        v_attn, a_attn = attn[:, :Lv], attn[:, Lv:]
        audio = audio + self.audio_proj(a_attn) * a1g
        v_cond = v_cond + self.v_proj(v_attn) * v1g

        # 2. cross attention vs text
        a_in = ln(audio) * (1 + a2c) + a2s
        v_in = ln(v_cond) * (1 + v2c) + v2s
        aq = t_rms(self.audio_cross_q(a_in).reshape(-1, La, NH, HD), self.audio_cq_norm)
        vq = t_rms(self.v_cross_q(v_in).reshape(-1, Lv, NH, HD), self.v_cq_norm)
        Lt = cond.shape[1]
        tk, tv = self.text_kv(cond).reshape(-1, Lt, 2, NH, HD).unbind(2)
        tk = t_rms(tk, self.text_k_norm)
        aq = t_apply_rope(aq, *t_rope_table(La, HD))
        vq = t_apply_rope(vq, *t_rope_table(Lv, HD))
        tk = t_apply_rope(tk, *t_rope_table(Lt, HD))
        q = torch.cat([vq, aq], 1)
        cross = t_sdpa(q, tk, tv).reshape(-1, Lv + La, H)
        audio = audio + self.audio_cross_proj(cross[:, Lv:]) * a2g
        v_cond = v_cond + self.v_cross_proj(cross[:, :Lv]) * v2g

        # 3. MLPs (gelu_tanh)
        audio = audio + self.a_fc2(F.gelu(self.a_fc1(ln(audio) * (1 + a3c) + a3s), approximate="tanh")) * a3g
        v_cond = v_cond + self.v_fc2(F.gelu(self.v_fc1(ln(v_cond) * (1 + v3c) + v3s), approximate="tanh")) * v3g
        return audio, v_cond


def test_triple_block_matches_torch_transcription():
    torch.manual_seed(0)
    tb = TorchTripleBlock().eval()
    B, La, Lv, Lt = 2, 10, 4, 6
    audio = torch.randn(B, La, H)
    cond = torch.randn(B, Lt, H)
    v_cond = torch.randn(B, Lv, H)
    vec = torch.randn(B, H)
    with torch.no_grad():
        ref_a, ref_v = tb(audio, cond, v_cond, vec)

    params = {
        "audio_mod": jlin(tb.audio_mod), "v_cond_mod": jlin(tb.v_cond_mod),
        "audio_self_attn_qkv": jlin(tb.audio_qkv),
        "audio_self_q_norm": {"weight": j(tb.audio_q_norm)},
        "audio_self_k_norm": {"weight": j(tb.audio_k_norm)},
        "audio_self_proj": jlin(tb.audio_proj),
        "v_cond_attn_qkv": jlin(tb.v_qkv),
        "v_cond_attn_q_norm": {"weight": j(tb.v_q_norm)},
        "v_cond_attn_k_norm": {"weight": j(tb.v_k_norm)},
        "v_cond_self_proj": jlin(tb.v_proj),
        "audio_cross_q": jlin(tb.audio_cross_q),
        "v_cond_cross_q": jlin(tb.v_cross_q),
        "text_cross_kv": jlin(tb.text_kv),
        "audio_cross_q_norm": {"weight": j(tb.audio_cq_norm)},
        "v_cond_cross_q_norm": {"weight": j(tb.v_cq_norm)},
        "text_cross_k_norm": {"weight": j(tb.text_k_norm)},
        "audio_cross_proj": jlin(tb.audio_cross_proj),
        "v_cond_cross_proj": jlin(tb.v_cross_proj),
        "audio_mlp": {"fc1": jlin(tb.a_fc1), "fc2": jlin(tb.a_fc2)},
        "v_cond_mlp": {"fc1": jlin(tb.v_fc1), "fc2": jlin(tb.v_fc2)},
    }
    ropes = mmdit.build_rope_tables(CFG, La, Lv, Lt)
    got_a, got_v = mmdit.triple_block_apply(
        params, j(audio), j(cond), j(v_cond), j(vec), ropes, CFG
    )
    np.testing.assert_allclose(np.asarray(got_a), ref_a.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_v), ref_v.numpy(), atol=2e-4, rtol=1e-3)


class TorchSingleBlock(torch.nn.Module):
    """Transcription of SingleStreamBlock (hifi_foley.py:335-390): (H D K) fused qkv,
    per-token 6-way modulation, conv projections."""

    def __init__(self):
        super().__init__()
        self.modulation = torch.nn.Linear(H, 6 * H)
        self.linear_qkv = torch.nn.Linear(H, 3 * H)
        self.q_norm = torch.nn.Parameter(torch.rand(HD) + 0.5)
        self.k_norm = torch.nn.Parameter(torch.rand(HD) + 0.5)
        self.conv1 = torch.nn.Conv1d(H, H, 3, padding=1)
        ch = CFG.conv_mlp_hidden_dim
        self.w1 = torch.nn.Conv1d(H, ch, 3, padding=1, bias=False)
        self.w2 = torch.nn.Conv1d(ch, H, 3, padding=1, bias=False)
        self.w3 = torch.nn.Conv1d(H, ch, 3, padding=1, bias=False)

    def forward(self, x, vec, cos, sin):
        ln = lambda t: F.layer_norm(t, (H,), eps=1e-6)
        mod = self.modulation(F.silu(vec))
        s_msa, c_msa, g_msa, s_mlp, c_mlp, g_mlp = mod.chunk(6, -1)
        xn = ln(x) * (1 + c_msa) + s_msa
        B, L = x.shape[:2]
        # (H D K) interleaved out-features (reference rearrange "B L (H D K)")
        qkv = self.linear_qkv(xn).reshape(B, L, NH, HD, 3)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q, k = t_rms(q, self.q_norm), t_rms(k, self.k_norm)
        q, k = t_apply_rope(q, cos, sin), t_apply_rope(k, cos, sin)
        out = t_sdpa(q, k, v).reshape(B, L, H)
        x = x + self.conv1(out.transpose(1, 2)).transpose(1, 2) * g_msa
        xn = ln(x) * (1 + c_mlp) + s_mlp
        xt = xn.transpose(1, 2)
        mlp = self.w2(F.silu(self.w1(xt)) * self.w3(xt)).transpose(1, 2)
        return x + mlp * g_mlp


def test_single_block_matches_torch_transcription():
    from foley_tpu.io.convert import _hdk_to_khd

    torch.manual_seed(1)
    sb = TorchSingleBlock().eval()
    B, L = 2, 10
    x = torch.randn(B, L, H)
    vec = torch.randn(B, L, H)  # per-token modulation
    cos, sin = t_rope_table(L, HD)
    with torch.no_grad():
        ref = sb(x, vec, cos, sin)

    params = {
        "modulation": jlin(sb.modulation),
        "linear_qkv": {
            "w": jnp.asarray(_hdk_to_khd(np.ascontiguousarray(sb.linear_qkv.weight.detach().numpy().T), NH, HD)),
            "b": jnp.asarray(_hdk_to_khd(sb.linear_qkv.bias.detach().numpy(), NH, HD)),
        },
        "q_norm": {"weight": j(sb.q_norm)},
        "k_norm": {"weight": j(sb.k_norm)},
        "linear1": {"w": j(sb.conv1.weight.permute(2, 1, 0)), "b": j(sb.conv1.bias)},
        "linear2": {
            "w1": {"w": j(sb.w1.weight.permute(2, 1, 0))},
            "w2": {"w": j(sb.w2.weight.permute(2, 1, 0))},
            "w3": {"w": j(sb.w3.weight.permute(2, 1, 0))},
        },
    }
    ropes = mmdit.build_rope_tables(CFG, L, 4, 6)
    got = mmdit.single_block_apply(params, j(x), j(vec), ropes, CFG)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3)
