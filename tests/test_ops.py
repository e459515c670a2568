"""Unit tests for foley_tpu.ops — numerics pinned against torch where torch defines the
reference semantics (conv/conv-transpose/interp/norm), and against closed forms elsewhere."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from foley_tpu.ops import (
    apply_gate,
    layer_norm,
    modulate,
    nearest_exact_resize,
    rms_norm,
    sdpa,
    snake,
)
from foley_tpu.ops.activations import gelu_tanh
from foley_tpu.ops.interp import linspace_resample_indices
from foley_tpu.ops.nn import conv1d, conv_transpose1d, dense, fold_weight_norm
from foley_tpu.ops.rope import (
    apply_rotary_emb,
    decouple_interleaved,
    interleave_sequences,
    rope_table,
)


def t2j(x):
    return jnp.asarray(x.detach().numpy())


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------------

def torch_rope_table(length, dim, theta=10000.0, freq_scaling=1.0):
    """Transcription of reference get_1d_rotary_pos_embed (posemb_layers.py:117-172)."""
    pos = torch.arange(length).float()
    idx = torch.arange(0, dim, 2).float()[: dim // 2]
    freqs = torch.pow(torch.tensor(theta), -(idx / dim)) * freq_scaling
    freqs = torch.outer(pos, freqs)
    return freqs.cos().repeat_interleave(2, dim=1), freqs.sin().repeat_interleave(2, dim=1)


def torch_rotate_half(x):
    x_real, x_imag = x.float().reshape(*x.shape[:-1], -1, 2).unbind(-1)
    return torch.stack([-x_imag, x_real], dim=-1).flatten(3)


def test_rope_table_matches_reference_math():
    for L, D, fs in [(16, 8, 1.0), (100, 128, 1.0), (24, 64, 5.5)]:
        cos_j, sin_j = rope_table(L, D, freq_scaling=fs)
        cos_t, sin_t = torch_rope_table(L, D, freq_scaling=fs)
        # fp32 ULP differences in pow/outer amplify with position; bound absolutely.
        assert_close(cos_j, t2j(cos_t), atol=1e-3, rtol=0)
        assert_close(sin_j, t2j(sin_t), atol=1e-3, rtol=0)


def test_apply_rotary_matches_reference_rotation():
    B, L, H, D = 2, 10, 3, 16
    x = torch.randn(B, L, H, D)
    cos_t, sin_t = torch_rope_table(L, D)
    # reference: x*cos + rotate_half(x)*sin, freqs broadcast at dims (1, -1)
    expected = x.float() * cos_t.view(1, L, 1, D) + torch_rotate_half(x.float()) * sin_t.view(1, L, 1, D)
    got = apply_rotary_emb(t2j(x), *rope_table(L, D))
    assert_close(got, t2j(expected), atol=1e-4, rtol=0)


def test_rope_preserves_norm():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 7, 2, 32)).astype(np.float32))
    y = apply_rotary_emb(x, *rope_table(7, 32))
    assert_close(jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1), atol=1e-4)


def test_interleave_decouple_roundtrip_same_len():
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.normal(size=(2, 6, 2, 4)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, 6, 2, 4)).astype(np.float32))
    inter = interleave_sequences(x1, x2)
    assert inter.shape == (2, 12, 2, 4)
    # interleaving order: x1[0], x2[0], x1[1], x2[1], ...
    assert_close(inter[:, 0::2], x1)
    assert_close(inter[:, 1::2], x2)
    y1, y2 = decouple_interleaved(inter, 6, 6)
    assert_close(y1, x1)
    assert_close(y2, x2)


def test_interleave_mismatched_matches_torch_nearest_exact():
    rng = np.random.default_rng(2)
    x1 = rng.normal(size=(1, 10, 2, 4)).astype(np.float32)
    x2 = rng.normal(size=(1, 4, 2, 4)).astype(np.float32)
    # torch reference path (hifi_foley.py:41-44)
    x2_t = torch.from_numpy(x2).reshape(1, 4, -1).transpose(1, 2)
    x2_t = F.interpolate(x2_t, size=10, mode="nearest-exact").transpose(1, 2).reshape(1, 10, 2, 4)
    inter = interleave_sequences(jnp.asarray(x1), jnp.asarray(x2))
    assert_close(inter[:, 1::2], t2j(x2_t))


def test_nearest_exact_matches_torch():
    rng = np.random.default_rng(3)
    for in_len, out_len in [(5, 12), (12, 5), (8, 8), (192, 250), (250, 192)]:
        x = rng.normal(size=(2, in_len, 3)).astype(np.float32)
        xt = torch.from_numpy(x).transpose(1, 2)  # [B, C, T]
        expected = F.interpolate(xt, size=out_len, mode="nearest-exact").transpose(1, 2)
        got = nearest_exact_resize(jnp.asarray(x), out_len, axis=1)
        assert_close(got, t2j(expected))


def test_linspace_resample_matches_torch():
    for in_len, out_len in [(120, 40), (121, 125), (16, 16)]:
        idx_t = torch.linspace(0, in_len - 1, out_len).long().numpy()
        idx_j = np.asarray(linspace_resample_indices(in_len, out_len))
        np.testing.assert_array_equal(idx_j, idx_t)


# ---------------------------------------------------------------------------------
# Norms / modulation / activations
# ---------------------------------------------------------------------------------

def test_rms_norm_matches_reference():
    x = torch.randn(2, 5, 16)
    w = torch.randn(16).abs() + 0.5
    expected = (x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + 1e-6)).type_as(x) * w
    got = rms_norm(t2j(x), t2j(w), eps=1e-6)
    assert_close(got, t2j(expected), atol=1e-5)


def test_layer_norm_matches_torch():
    x = torch.randn(2, 5, 32)
    expected = F.layer_norm(x, (32,), eps=1e-6)
    assert_close(layer_norm(t2j(x), eps=1e-6), t2j(expected), atol=1e-5)


def test_modulate_and_gate_broadcast():
    x = jnp.ones((2, 4, 8))
    shift = jnp.full((2, 8), 3.0)
    scale = jnp.full((2, 8), 1.0)
    out = modulate(x, shift, scale)
    assert_close(out, jnp.full((2, 4, 8), 1 * 2 + 3))
    # per-token 3-D modulation applies directly
    out3 = modulate(x, jnp.zeros((2, 4, 8)), jnp.full((2, 4, 8), 2.0))
    assert_close(out3, jnp.full((2, 4, 8), 3.0))
    assert_close(apply_gate(x, jnp.full((2, 8), 0.5)), jnp.full((2, 4, 8), 0.5))


def test_snake_matches_reference():
    x = torch.randn(2, 7, 4)  # channel-last
    alpha = torch.rand(4) + 0.5
    expected = x + (alpha + 1e-9).reciprocal() * torch.sin(alpha * x).pow(2)
    assert_close(snake(t2j(x), t2j(alpha)), t2j(expected), atol=1e-5)


def test_gelu_tanh_matches_torch():
    x = torch.randn(64)
    expected = F.gelu(x, approximate="tanh")
    assert_close(gelu_tanh(t2j(x)), t2j(expected), atol=1e-4, rtol=0)


# ---------------------------------------------------------------------------------
# Dense / conv / conv-transpose vs torch
# ---------------------------------------------------------------------------------

def test_dense_matches_torch_linear():
    x = torch.randn(2, 5, 12)
    w = torch.randn(7, 12)  # torch [out, in]
    b = torch.randn(7)
    expected = F.linear(x, w, b)
    got = dense(t2j(x), t2j(w.t()), t2j(b))
    assert_close(got, t2j(expected), atol=1e-5)


@pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 3, 1), (1, 9, 3), (5, 3, 1)])
def test_conv1d_matches_torch(stride, padding, dilation):
    x = torch.randn(2, 6, 37)  # [B, C, T]
    w = torch.randn(8, 6, 7)   # [out, in, K]
    b = torch.randn(8)
    expected = F.conv1d(x, w, b, stride=stride, padding=padding, dilation=dilation)
    got = conv1d(
        t2j(x.transpose(1, 2)), t2j(w.permute(2, 1, 0)), t2j(b),
        stride=stride, padding=padding, dilation=dilation,
    )
    assert_close(got, t2j(expected.transpose(1, 2)), atol=1e-4)


@pytest.mark.parametrize("stride", [8, 5, 4, 3, 2])
def test_conv_transpose1d_matches_torch_dac_geometry(stride):
    """The exact DAC decoder upsampling geometry: k=2s, pad=ceil(s/2), out_pad=s%2
    (reference dac.py:103-110)."""
    import math

    k = 2 * stride
    pad = math.ceil(stride / 2)
    out_pad = stride % 2
    x = torch.randn(2, 6, 25)
    w = torch.randn(6, 4, k)  # torch convT weight [in, out, K]
    b = torch.randn(4)
    expected = F.conv_transpose1d(x, w, b, stride=stride, padding=pad, output_padding=out_pad)
    got = conv_transpose1d(
        t2j(x.transpose(1, 2)), t2j(w.permute(2, 0, 1)), t2j(b),
        stride=stride, padding=pad, output_padding=out_pad,
    )
    assert got.shape[1] == expected.shape[2]
    assert_close(got, t2j(expected.transpose(1, 2)), atol=1e-4)


def test_fold_weight_norm_matches_torch():
    conv = torch.nn.Conv1d(6, 8, 7)
    wn = torch.nn.utils.parametrizations.weight_norm(conv)
    g = wn.parametrizations.weight.original0
    v = wn.parametrizations.weight.original1
    folded = fold_weight_norm(t2j(g), t2j(v), dim=0)
    assert_close(folded, t2j(wn.weight), atol=1e-5)


def test_fold_weight_norm_conv_transpose():
    convt = torch.nn.ConvTranspose1d(6, 8, 10, stride=5)
    wn = torch.nn.utils.parametrizations.weight_norm(convt)
    g = wn.parametrizations.weight.original0
    v = wn.parametrizations.weight.original1
    folded = fold_weight_norm(t2j(g), t2j(v), dim=0)
    assert_close(folded, t2j(wn.weight), atol=1e-5)


# ---------------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------------

def test_sdpa_matches_torch():
    B, Lq, Lk, H, D = 2, 9, 13, 3, 16
    q = torch.randn(B, Lq, H, D)
    k = torch.randn(B, Lk, H, D)
    v = torch.randn(B, Lk, H, D)
    expected = F.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
    ).transpose(1, 2)
    got = sdpa(t2j(q), t2j(k), t2j(v))
    assert_close(got, t2j(expected), atol=1e-5)


def test_sdpa_mask():
    B, L, H, D = 1, 6, 2, 8
    q = torch.randn(B, L, H, D)
    k = torch.randn(B, L, H, D)
    v = torch.randn(B, L, H, D)
    mask = torch.zeros(B, 1, L, L, dtype=torch.bool)
    mask[..., :3] = True
    expected = F.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2), attn_mask=mask
    ).transpose(1, 2)
    got = sdpa(t2j(q), t2j(k), t2j(v), mask=jnp.asarray(mask.numpy()))
    assert_close(got, t2j(expected), atol=1e-5)


def test_conv_transpose1d_polyphase_matches_torch_all_geometries():
    """Polyphase fast path (and the dilated fallback) vs torch ConvTranspose1d across every
    DAC upsample geometry (k=2s, p=ceil(s/2), op=s%2) plus odd k/p combinations."""
    import torch

    from foley_tpu.ops.nn import conv_transpose1d

    rng = np.random.default_rng(0)
    cases = [(8, 16, 4, 1), (5, 10, 3, 1), (4, 8, 2, 0), (3, 6, 2, 1), (2, 4, 1, 0),
             (8, 16, 4, 0), (3, 7, 2, 1), (5, 9, 1, 0), (2, 5, 2, 1), (1, 3, 1, 0)]
    for s, k, p, op in cases:
        t_in, cin, cout, b = 13, 5, 7, 2
        x = rng.normal(size=(b, t_in, cin)).astype(np.float32)
        w = rng.normal(size=(k, cin, cout)).astype(np.float32)
        bias = rng.normal(size=(cout,)).astype(np.float32)
        conv = torch.nn.ConvTranspose1d(cin, cout, k, stride=s, padding=p, output_padding=op)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.transpose(w, (1, 2, 0))))
            conv.bias.copy_(torch.from_numpy(bias))
            ref = conv(torch.from_numpy(np.transpose(x, (0, 2, 1)))).numpy().transpose(0, 2, 1)
        got = np.asarray(conv_transpose1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
            stride=s, padding=p, output_padding=op,
        ))
        assert got.shape == ref.shape, (s, k, p, op)
        np.testing.assert_allclose(got, ref, atol=3e-6, err_msg=f"s={s} k={k} p={p} op={op}")


def test_resolve_attn_impl_auto():
    """auto -> xla at short lengths / on CPU; explicit impls pass through unchanged."""
    from foley_tpu.ops.attention import PALLAS_FUSED_MIN_TOKENS, resolve_attn_impl

    assert resolve_attn_impl("xla", 5000) == "xla"
    assert resolve_attn_impl("pallas_fused", 10) == "pallas_fused"
    # CPU backend (tests): auto always resolves to xla regardless of length
    assert resolve_attn_impl("auto", 250) == "xla"
    assert resolve_attn_impl("auto", PALLAS_FUSED_MIN_TOKENS + 1) == "xla"
