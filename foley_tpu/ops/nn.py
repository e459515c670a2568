"""Dense / conv primitives with fp8 upcast-on-use, plus initializers.

Weight layout conventions (chosen TPU-first; the checkpoint converter in
``foley_tpu/io/convert.py`` permutes from torch layouts):
- dense:            [in, out]            (torch nn.Linear stores [out, in])
- conv1d:           [K, in, out]         (torch nn.Conv1d stores [out, in, K])
- conv_transpose1d: [K, in, out]         (torch stores [in, out, K])

All sequence convs run channel-last ([B, T, C], dimension_numbers NWC/WIO/NWC) — the natural
layout for the TPU vector unit and for fusing with the surrounding matmuls. The reference's
``ChannelLastConv1d`` permutes to channels-first for cuDNN and back (``mlp_layers.py:104-110``);
here channel-last IS the native layout and no transposes exist.

fp8: weights may be stored as ``float8_e4m3fn``/``float8_e5m2`` leaves (weight-only
quantization, reference ``utils.py:296-485``); every op upcasts to the activation dtype at use.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _match(w, x: jnp.ndarray) -> jnp.ndarray:
    """Upcast weight storage dtype (possibly fp8/fp32) to the activation dtype.

    int8 weight-only quantization stores a weight as ``{"int8": q, "scale": s}``
    (``foley_tpu/io/quantize.py::quantize_int8``); the per-channel dequant multiply here is
    fused by XLA into the consuming matmul's operand read.
    """
    if isinstance(w, dict) and ("int8" in w or "int8_dyn" in w):
        q = w.get("int8", w.get("int8_dyn"))
        return q.astype(x.dtype) * w["scale"].astype(x.dtype)
    if isinstance(w, dict) and "int4" in w:
        # nibble-packed int4 (quantize_int4, SPLIT-HALF layout): p uint8 [..., in/2, out]
        # holds row i in the low nibble and row i+in/2 in the high (+8 bias), scale
        # [..., n_groups, 1, out]. The dequant is a CONCAT — measured 1.06x bf16 step time
        # vs 2.35x for the old stack-interleave layout (tools/profile_int4_matmul.py).
        # The jnp.int4 dtype is deliberately never used — it crashes the axon dispatch
        # layer (see quantize_int4).
        p, scale = w["int4"], w["scale"]
        lo = (p & 0xF).astype(jnp.int8) - 8   # rows [0, in/2)
        hi = (p >> 4).astype(jnp.int8) - 8    # rows [in/2, in)
        q = jnp.concatenate([lo, hi], axis=-2)  # [..., in, out]
        cin = 2 * p.shape[-2]
        grouped = p.shape[:-2] + (scale.shape[-3], cin // scale.shape[-3], p.shape[-1])
        deq = q.astype(x.dtype).reshape(grouped) * scale.astype(x.dtype)
        return deq.reshape(p.shape[:-2] + (cin, p.shape[-1]))
    return w if w.dtype == x.dtype else w.astype(x.dtype)


def _precision(x: jnp.ndarray):
    """fp32 inputs get true-fp32 contractions (Precision.HIGHEST — 3-pass bf16 on the MXU);
    bf16/fp16 inputs use the native fast path. Without this, XLA's default precision does
    single-pass bf16 even for fp32 operands, breaking the fp32 parity islands."""
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def _quantize_act(x: jnp.ndarray):
    """Per-token symmetric int8 quantization: returns (q int8 [..., in], scale fp32 [..., 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x [..., in] @ w [in, out] (+ b [out]).

    A weight stored as ``{"int8_dyn", "scale"}`` (``quantize_int8(dynamic=True)``) takes the
    int8xint8 MXU path: per-token activation quantization, int32 accumulation on the native
    int8 systolic array, and a fused (token-scale x channel-scale) dequant epilogue."""
    if isinstance(w, dict) and "int8_dyn" in w:
        xq, sx = _quantize_act(x)
        acc = jnp.einsum("...i,io->...o", xq, w["int8_dyn"], preferred_element_type=jnp.int32)
        out = (acc.astype(jnp.float32) * sx * w["scale"].astype(jnp.float32)).astype(x.dtype)
        if b is not None:
            out = out + _match(b, x)
        return out
    out = jnp.einsum(
        "...i,io->...o", x, _match(w, x),
        preferred_element_type=x.dtype, precision=_precision(x),
    )
    if b is not None:
        out = out + _match(b, x)
    return out


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Channel-last 1-D convolution. x [B, T, Cin], w [K, Cin/groups, Cout] -> [B, T', Cout].

    Matches torch ``F.conv1d`` (cross-correlation) numerics with symmetric integer padding.

    Measured-and-closed (v5e): lowering small-K stride-1 convs as K shifted matmuls is
    SLOWER than XLA's convolution fusion (bench 2.41 vs 2.80 audio-sec/sec at XXL-5s) — the
    conv fusion reuses input tiles across taps; K separate dots re-stream the activations.
    Keep the native conv op.
    """
    out = lax.conv_general_dilated(
        x,
        _match(w, x),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=_precision(x),
    )
    if b is not None:
        out = out + _match(b, x)
    return out


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    dilation: Tuple[int, int] = (1, 1),
    groups: int = 1,
) -> jnp.ndarray:
    """Channel-last 2-D convolution. x [B, H, W, Cin], w [Kh, Kw, Cin/groups, Cout].

    Matches torch ``F.conv2d`` numerics (used by the DAC discriminators' 2-D stacks)."""
    out = lax.conv_general_dilated(
        x,
        _match(w, x),
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=_precision(x),
    )
    if b is not None:
        out = out + _match(b, x)
    return out


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    dilation: int = 1,
) -> jnp.ndarray:
    """Channel-last transposed 1-D convolution with exact torch semantics.

    x [B, T, Cin], w [K, Cin, Cout] -> [B, (T-1)*stride - 2*padding + dilation*(K-1)
    + output_padding + 1, Cout].

    Fast path (dilation == 1, stride > 1 — every DAC upsampling stage): **polyphase
    decomposition**. Zero-stuffing the input (the textbook conv-transpose lowering) makes the
    upsample conv spend stride× more MACs multiplying structural zeros; instead, each output
    phase ``r = t mod stride`` only touches the ``ceil(K/stride)`` kernel taps congruent to it,
    so the op becomes ``stride`` small shifted matmuls interleaved on the time axis — the
    polyphase optimum (T_out*K/s*Cin*Cout MACs) and pure MXU-tileable dot products. Exact
    same sums of products as the reference's ConvTranspose1d (``dac.py:98-117``: k=2s,
    padding=ceil(s/2), output_padding=s%2).

    Fallback (dilated/unit-stride): ``conv_transpose(x, w) = conv(dilate(x, s), flip(w))``
    with explicit ``lax.pad`` zero-stuffing. Explicit padding is used instead of the conv's
    ``lhs_dilation`` because XLA miscompiles lhs_dilation for some (stride, pad) combinations
    (observed at stride=3/pad=2/output_padding=1 — the DAC decoder's 4th stage — on the axon
    TPU backend: output shifted by one from index 1).
    """
    if dilation == 1 and stride > 1:
        return _conv_transpose1d_polyphase(x, w, b, stride, padding, output_padding)
    k = w.shape[0]
    pad = dilation * (k - 1) - padding
    if pad < 0:
        raise ValueError(f"Unsupported negative effective pad: k={k}, padding={padding}")
    x_dil = lax.pad(
        x,
        jnp.zeros((), x.dtype),
        [(0, 0, 0), (pad, pad + output_padding, stride - 1), (0, 0, 0)],
    )
    out = lax.conv_general_dilated(
        x_dil,
        _match(w[::-1], x),
        window_strides=(1,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=_precision(x),
    )
    if b is not None:
        out = out + _match(b, x)
    return out


def _conv_transpose1d_polyphase(
    x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray], stride: int,
    padding: int, output_padding: int,
) -> jnp.ndarray:
    """Polyphase transposed conv: y[s*q + r] = sum_m x[q + o_r + m] @ w[K-1 - (j0_r + m*s)].

    Derivation: with pad0 = K-1-padding, the zero-stuffed-conv form gives
    y[t] = sum_j [ (t + j - pad0) % s == 0 ] * x[(t + j - pad0) / s] @ w[K-1-j]; writing
    t = s*q + r, the surviving j are j0_r + m*s with j0_r = (pad0 - r) % s, and the input
    index becomes q + o_r + m with o_r = (r + j0_r - pad0) / s (an exact integer).
    """
    B, T, _ = x.shape
    K, _, Cout = w.shape
    s = stride
    t_out = (T - 1) * s - 2 * padding + K + output_padding
    pad0 = K - 1 - padding
    if pad0 < 0:
        raise ValueError(f"Unsupported negative effective pad: k={K}, padding={padding}")
    q_n = -(-t_out // s)  # output groups per phase (ceil)

    phases = []  # (o_r, [kernel tap indices K-1-j])
    for r in range(s):
        j0 = (pad0 - r) % s
        o_r = (r + j0 - pad0) // s
        phases.append((o_r, [K - 1 - j for j in range(j0, K, s)]))

    left = max(0, -min(o for o, _ in phases))
    right_need = max(o + len(t) - 1 for o, t in phases) + q_n - 1 - (T - 1)
    xp = jnp.pad(x, ((0, 0), (left, max(0, right_need + left)), (0, 0)))

    prec = _precision(x)
    wx = _match(w, x)
    outs = []
    for o_r, taps in phases:
        acc = None
        for m, kidx in enumerate(taps):
            seg = lax.slice_in_dim(xp, left + o_r + m, left + o_r + m + q_n, axis=1)
            term = jnp.einsum("btc,cd->btd", seg, wx[kidx], precision=prec)
            acc = term if acc is None else acc + term
        outs.append(acc)
    y = jnp.stack(outs, axis=2).reshape(B, q_n * s, Cout)[:, :t_out]
    if b is not None:
        y = y + _match(b, x)
    return y


# ---------------------------------------------------------------------------------
# Weight-norm folding
# ---------------------------------------------------------------------------------

def fold_weight_norm(g: jnp.ndarray, v: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
    """Fold torch ``weight_norm`` parametrization into a plain weight: w = g * v / ||v||.

    The norm is computed over all axes except ``dim`` (torch default dim=0), matching
    ``torch.nn.utils.parametrizations.weight_norm`` as used by the DAC codec's WNConv layers
    (reference ``dac_vae/nn/layers.py:9-15``). Folding happens once at load time so the hot
    decode path runs plain convs.
    """
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32)), axis=axes, keepdims=True))
    return (g.astype(jnp.float32) * v.astype(jnp.float32) / norm).astype(v.dtype)


# ---------------------------------------------------------------------------------
# Initializers (mirroring the reference where initialization is load-bearing)
# ---------------------------------------------------------------------------------

def init_dense(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32,
               scheme: str = "torch") -> dict:
    """Dense params. ``torch`` scheme = Kaiming-uniform fan_in (nn.Linear default);
    ``zeros`` = zero-init (adaLN modulations / final layers); ``xavier_uniform`` for
    patch embedding (reference ``embed_layers.py:37``); ``normal02`` for timestep MLP."""
    wkey, bkey = jax.random.split(key)
    if scheme == "zeros":
        w = jnp.zeros((in_dim, out_dim), dtype)
    elif scheme == "xavier_uniform":
        limit = math.sqrt(6.0 / (in_dim + out_dim))
        w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -limit, limit)
    elif scheme == "normal02":
        w = 0.02 * jax.random.normal(wkey, (in_dim, out_dim), dtype)
    else:  # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        limit = 1.0 / math.sqrt(in_dim)
        w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -limit, limit)
    params = {"w": w}
    if bias:
        if scheme in ("zeros", "xavier_uniform"):
            b = jnp.zeros((out_dim,), dtype)
        else:
            limit = 1.0 / math.sqrt(in_dim)
            b = jax.random.uniform(bkey, (out_dim,), dtype, -limit, limit)
        params["b"] = b
    return params


def init_conv1d(key, in_dim: int, out_dim: int, kernel_size: int, bias: bool = True,
                dtype=jnp.float32, groups: int = 1) -> dict:
    """Conv1d params [K, in/groups, out]; torch default Kaiming-uniform fan_in."""
    wkey, bkey = jax.random.split(key)
    fan_in = (in_dim // groups) * kernel_size
    limit = 1.0 / math.sqrt(fan_in)
    params = {"w": jax.random.uniform(wkey, (kernel_size, in_dim // groups, out_dim), dtype, -limit, limit)}
    if bias:
        params["b"] = jax.random.uniform(bkey, (out_dim,), dtype, -limit, limit)
    return params


def apply_dense(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return dense(x, params["w"], params.get("b"))


def apply_conv1d(params: dict, x: jnp.ndarray, **kw) -> jnp.ndarray:
    return conv1d(x, params["w"], params.get("b"), **kw)
