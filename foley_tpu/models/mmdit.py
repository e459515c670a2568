"""HunyuanVideoFoley MMDiT denoiser — TPU-native functional implementation.

Architecture parity with the reference (``models/hifi_foley.py``): N triple-stream
``TwoStreamCABlock``s (audio + visual streams with joint self-attention, text cross-attention,
9-way adaLN each, :62-333) followed by M ``SingleStreamBlock``s (6-way per-token modulation,
fused qkv, conv output projections, :335-390), with learned empty clip/sync features for
CFG/T2A (:524-527), interleaved audio-visual RoPE (:670-687), and additive Synchformer
conditioning injected before triple block 0 (:755-762, 838-839).

TPU-first re-design (not a port):
- Functional: ``init(key, cfg) -> params`` pytree; ``apply(params, ...) -> velocity``. No
  module objects, no mutable state.
- The two block stacks run as ``jax.lax.scan`` over depth-stacked params: the compiled HLO is
  O(1) in depth and the 18+36 blocks compile once (the reference eagerly dispatches 54
  nn.Modules per step, ``hifi_foley.py:818-910``).
- All sequences are channel-last; the audio latent enters as [B, T, C_latent] (the reference
  uses [B, C, T] channels-first for cuDNN, ``hifi_foley.py:735``).
- RoPE tables (including the per-length cross-attention tables the reference rebuilds inside
  every block forward, ``hifi_foley.py:295-308``) are precomputed once at trace time and
  constant-folded by XLA.
- fp32 islands mirror the reference: qk RMSNorm and LayerNorm (``norm_layers.py:49``), RoPE
  rotation (``attn_layers.py:147-148``), timestep sinusoids (``embed_layers.py:90-102``).

Weight layout conventions are documented in ``foley_tpu/ops/nn.py``; the torch-checkpoint
converter (``foley_tpu/io/convert.py``) maps the reference's state-dict onto this pytree,
including the single-block fused-qkv ``(H D K)`` interleaving (``hifi_foley.py:362``).
"""

from __future__ import annotations

import math
import os
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from foley_tpu.configs import MMDiTConfig
from foley_tpu.core.dtypes import DTypePolicy
from foley_tpu.ops.activations import get_activation, swiglu
from foley_tpu.ops.attention import sdpa
from foley_tpu.ops.interp import nearest_exact_resize
from foley_tpu.ops.modulate import apply_gate, modulate, modulate_ref
from foley_tpu.ops.nn import (
    apply_conv1d,
    apply_dense,
    init_conv1d,
    init_dense,
)
from foley_tpu.ops.norms import layer_norm, rms_norm
from foley_tpu.ops.rope import (
    apply_rotary_emb,
    decouple_interleaved,
    interleave_sequences,
    rope_table,
)


# ---------------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------------

def _init_conv_mlp(key, dim: int, hidden: int, kernel_size: int, dtype) -> Dict:
    """ConvMLP (reference ``mlp_layers.py:113-149``): w2(silu(w1 x) * w3 x), bias-free convs."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": init_conv1d(k1, dim, hidden, kernel_size, bias=False, dtype=dtype),
        "w2": init_conv1d(k2, hidden, dim, kernel_size, bias=False, dtype=dtype),
        "w3": init_conv1d(k3, dim, hidden, kernel_size, bias=False, dtype=dtype),
    }


def _init_triple_block(key, cfg: MMDiTConfig, dtype) -> Dict:
    h, hd = cfg.hidden_size, cfg.head_dim
    keys = iter(jax.random.split(key, 24))
    qkv_bias = cfg.qkv_bias

    def qknorm():
        return {"weight": jnp.ones((hd,), dtype)} if cfg.qk_norm else {}

    return {
        # 9-way adaLN modulations (zero-init, reference modulate_layers.py:11-13)
        "audio_mod": init_dense(next(keys), h, 9 * h, dtype=dtype, scheme="zeros"),
        "v_cond_mod": init_dense(next(keys), h, 9 * h, dtype=dtype, scheme="zeros"),
        # joint self-attention
        "audio_self_attn_qkv": init_dense(next(keys), h, 3 * h, bias=qkv_bias, dtype=dtype),
        "audio_self_q_norm": qknorm(),
        "audio_self_k_norm": qknorm(),
        "audio_self_proj": init_dense(next(keys), h, h, bias=qkv_bias, dtype=dtype),
        "v_cond_attn_qkv": init_dense(next(keys), h, 3 * h, bias=qkv_bias, dtype=dtype),
        "v_cond_attn_q_norm": qknorm(),
        "v_cond_attn_k_norm": qknorm(),
        "v_cond_self_proj": init_dense(next(keys), h, h, bias=qkv_bias, dtype=dtype),
        # text cross-attention
        "audio_cross_q": init_dense(next(keys), h, h, bias=qkv_bias, dtype=dtype),
        "v_cond_cross_q": init_dense(next(keys), h, h, bias=qkv_bias, dtype=dtype),
        "text_cross_kv": init_dense(next(keys), h, 2 * h, bias=qkv_bias, dtype=dtype),
        "audio_cross_q_norm": qknorm(),
        "v_cond_cross_q_norm": qknorm(),
        "text_cross_k_norm": qknorm(),
        "audio_cross_proj": init_dense(next(keys), h, h, bias=qkv_bias, dtype=dtype),
        "v_cond_cross_proj": init_dense(next(keys), h, h, bias=qkv_bias, dtype=dtype),
        # MLPs (timm-style, bias=True, reference mlp_layers.py:13-51)
        "audio_mlp": {
            "fc1": init_dense(next(keys), h, cfg.mlp_hidden_dim, dtype=dtype),
            "fc2": init_dense(next(keys), cfg.mlp_hidden_dim, h, dtype=dtype),
        },
        "v_cond_mlp": {
            "fc1": init_dense(next(keys), h, cfg.mlp_hidden_dim, dtype=dtype),
            "fc2": init_dense(next(keys), cfg.mlp_hidden_dim, h, dtype=dtype),
        },
    }


def _init_single_block(key, cfg: MMDiTConfig, dtype) -> Dict:
    h, hd = cfg.hidden_size, cfg.head_dim
    keys = iter(jax.random.split(key, 8))
    return {
        "modulation": init_dense(next(keys), h, 6 * h, dtype=dtype, scheme="zeros"),
        # fused qkv stored in standard (K-major) layout; torch ckpts use (H D K) interleaving
        # and are permuted by the converter.
        "linear_qkv": init_dense(next(keys), h, 3 * h, bias=True, dtype=dtype),
        "q_norm": {"weight": jnp.ones((hd,), dtype)},
        "k_norm": {"weight": jnp.ones((hd,), dtype)},
        # output projection: ChannelLastConv1d k=3 (reference hifi_foley.py:356)
        "linear1": init_conv1d(next(keys), h, h, 3, bias=True, dtype=dtype),
        "linear2": _init_conv_mlp(next(keys), h, cfg.conv_mlp_hidden_dim, 3, dtype),
    }


def init(key, cfg: MMDiTConfig, dtype=jnp.float32) -> Dict:
    """Initialize the full parameter pytree (shapes mirror reference ``hifi_foley.py:392-527``)."""
    h = cfg.hidden_size
    keys = iter(jax.random.split(key, 16))

    params: Dict = {
        # PatchEmbed1D: conv k=s=patch_size, xavier-uniform (reference embed_layers.py:34-39)
        "audio_embedder": init_conv1d(
            next(keys), cfg.audio_vae_latent_dim, h, cfg.patch_size, dtype=dtype
        ),
        # SwiGLU visual projection (reference hifi_foley.py:458)
        "visual_proj": {
            "w1": init_dense(next(keys), cfg.clip_dim, h, bias=False, dtype=dtype),
            "w2": init_dense(next(keys), h, h, bias=False, dtype=dtype),
            "w3": init_dense(next(keys), cfg.clip_dim, h, bias=False, dtype=dtype),
        },
        # ConditionProjection (reference embed_layers.py:55-73)
        "cond_in": {
            "linear_1": init_dense(next(keys), cfg.condition_dim, h, dtype=dtype),
            "linear_2": init_dense(next(keys), h, h, dtype=dtype),
        },
        # TimestepEmbedder (reference embed_layers.py:105-136): normal(0.02) weights
        "time_in": {
            "mlp_0": init_dense(next(keys), 256, h, dtype=dtype, scheme="normal02"),
            "mlp_2": init_dense(next(keys), h, h, dtype=dtype, scheme="normal02"),
        },
        "final_layer": {
            "linear": init_dense(
                next(keys), h, cfg.patch_size * cfg.audio_vae_latent_dim, dtype=dtype, scheme="zeros"
            ),
            "adaLN": init_dense(next(keys), h, 2 * h, dtype=dtype, scheme="zeros"),
        },
        "empty_clip_feat": jnp.zeros((1, cfg.clip_dim), dtype),
        "empty_sync_feat": jnp.zeros((1, cfg.sync_feat_dim), dtype),
    }

    if cfg.sync_modulation or cfg.add_sync_feat_to_audio:
        sync_hidden = _conv_mlp_hidden(h * 4, cfg.conv_mlp_multiple_of)
        params["sync_in"] = {
            "linear": init_dense(next(keys), cfg.sync_feat_dim, h, dtype=dtype),
            "conv_mlp": _init_conv_mlp(next(keys), h, sync_hidden, cfg.sync_in_ksz, dtype),
        }
        params["sync_pos_emb"] = jnp.zeros((1, 1, 8, cfg.sync_feat_dim), dtype)

    tkeys = jax.random.split(next(keys), cfg.depth_triple_blocks)
    params["triple_blocks"] = jax.vmap(lambda k: _init_triple_block(k, cfg, dtype))(tkeys)
    skeys = jax.random.split(next(keys), cfg.depth_single_blocks)
    params["single_blocks"] = jax.vmap(lambda k: _init_single_block(k, cfg, dtype))(skeys)
    return params


def _conv_mlp_hidden(hidden_dim: int, multiple_of: int) -> int:
    hidden = int(2 * hidden_dim / 3)
    return multiple_of * ((hidden + multiple_of - 1) // multiple_of)


# ---------------------------------------------------------------------------------
# Sub-module applies
# ---------------------------------------------------------------------------------

def timestep_embedding(t: jnp.ndarray, dim: int = 256, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, fp32 (reference ``embed_layers.py:76-102``). t: [B] in [0, 1000)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def apply_time_in(params: Dict, t: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    emb = timestep_embedding(t).astype(compute_dtype)
    x = apply_dense(params["mlp_0"], emb)
    x = jax.nn.silu(x)
    return apply_dense(params["mlp_2"], x)


def apply_conv_mlp(params: Dict, x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    pad = (kernel_size - 1) // 2
    gate = apply_conv1d(params["w1"], x, padding=pad)
    lin = apply_conv1d(params["w3"], x, padding=pad)
    return apply_conv1d(params["w2"], swiglu(gate, lin), padding=pad)


def apply_mlp(params: Dict, x: jnp.ndarray, act: str = "gelu_tanh") -> jnp.ndarray:
    x = apply_dense(params["fc1"], x)
    x = get_activation(act)(x)
    return apply_dense(params["fc2"], x)


def _qk_norm(params: Dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    if not params:
        return x
    return rms_norm(x, params["weight"], eps=eps)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, l, h, d = x.shape
    return x.reshape(b, l, h * d)


class RopeTables(NamedTuple):
    """All RoPE tables used by one forward pass, precomputed from static lengths."""

    joint: tuple          # interleaved table [2*T_audio, D] (fallback path)
    v_joint: Optional[tuple]  # visual-stream table when not interleaved
    audio: tuple          # plain audio table [T_audio, D] (single blocks + cross-attn q)
    visual_cross: tuple   # [L_visual, D] cross-attn q table
    text: tuple           # [L_text, D] cross-attn k table
    # Decomposed interleaved tables (see build_rope_tables): rotation applied per stream
    # without materializing the interleaved sequence. None when not applicable.
    audio_joint: Optional[tuple] = None   # even rows of the interleaved table
    visual_joint: Optional[tuple] = None  # odd rows gathered at the decouple positions


def build_rope_tables(
    cfg: MMDiTConfig, audio_len: int, visual_len: int, text_len: int
) -> RopeTables:
    """Precompute every table (reference builds these per forward, ``hifi_foley.py:634-687``).

    Interleaved-RoPE decomposition: the reference interleaves [audio; visual-resized] tokens,
    rotates with a 2T table, then decouples with a second nearest-exact resize
    (``hifi_foley.py:236-251``). Because rotation is positionwise, the round trip equals
    rotating each stream directly — audio with the even rows, visual with the odd rows
    gathered at the decouple positions — whenever up-then-down nearest-exact resampling is
    the identity (always true here: visual_len <= audio_len, so every visual index is hit).
    The identity is checked statically at trace time; if it ever fails the exact
    interleave/decouple path runs instead. This removes two resizes + the stack/reshape per
    q and k per triple block.

    The visual stream's non-interleaved table is frequency-rescaled by audio_len/visual_len
    (mmaudio-style, reference ``hifi_foley.py:666``).
    """
    import numpy as np

    def np_nearest_idx(in_len: int, out_len: int) -> np.ndarray:
        # numpy twin of ops.interp.nearest_exact_indices — must stay host-side so these
        # static gather indices never become tracers under jit.
        idx = np.floor((np.arange(out_len, dtype=np.float32) + 0.5) * (in_len / out_len))
        return np.clip(idx.astype(np.int32), 0, in_len - 1)

    d = cfg.head_dim
    theta = cfg.rope_theta
    audio = rope_table(audio_len, d, theta)
    audio_joint = visual_joint = None
    if cfg.interleaved_audio_visual_rope:
        joint = rope_table(audio_len * 2, d, theta)
        v_joint = None
        if visual_len == audio_len:
            g2 = np.arange(audio_len)
            identity = True
        else:
            g1 = np_nearest_idx(visual_len, audio_len)  # upsample gather
            g2 = np_nearest_idx(audio_len, visual_len)  # decouple gather
            identity = bool(np.array_equal(g1[g2], np.arange(visual_len)))
        if identity:
            cos, sin = joint
            audio_joint = (cos[0::2], sin[0::2])
            visual_joint = (cos[1::2][g2], sin[1::2][g2])
    else:
        joint = audio
        v_joint = rope_table(visual_len, d, theta, freq_scaling=audio_len / visual_len)
    return RopeTables(
        joint=joint,
        v_joint=v_joint,
        audio=audio,
        visual_cross=rope_table(visual_len, d, theta),
        text=rope_table(text_len, d, theta),
        audio_joint=audio_joint,
        visual_joint=visual_joint,
    )


def triple_block_apply(
    params: Dict,
    audio: jnp.ndarray,
    cond: jnp.ndarray,
    v_cond: jnp.ndarray,
    vec: jnp.ndarray,
    ropes: RopeTables,
    cfg: MMDiTConfig,
    attn_mask: Optional[jnp.ndarray] = None,
    sync_vec: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    text_kv=None,
    mods=None,
):
    """TwoStreamCABlock (reference ``hifi_foley.py:179-333``). Returns (audio, v_cond).

    ``text_kv``: optional precomputed (t_k, t_v) for this block (``precompute_text_kv``);
    when given, ``cond`` is unused.
    ``mods``: optional precomputed (a_mod, v_mod) [1, 9H] adaLN vectors for this block at
    this timestep (``precompute_triple_mods``); when given, the ``audio_mod``/``v_cond_mod``
    weights are not read (they broadcast over the CFG batch — all rows share the timestep)."""
    nh, eps = cfg.num_heads, cfg.qk_norm_eps
    audio_len, visual_len = audio.shape[1], v_cond.shape[1]

    if mods is not None:
        a_mod, v_mod = mods
    else:
        mod_src = sync_vec if sync_vec is not None else vec
        a_mod = apply_dense(params["audio_mod"], jax.nn.silu(mod_src))
        v_mod = apply_dense(params["v_cond_mod"], jax.nn.silu(vec))
    (a1_shift, a1_scale, a1_gate, a2_shift, a2_scale, a2_gate,
     a3_shift, a3_scale, a3_gate) = jnp.split(a_mod, 9, axis=-1)
    (v1_shift, v1_scale, v1_gate, v2_shift, v2_scale, v2_gate,
     v3_shift, v3_scale, v3_gate) = jnp.split(v_mod, 9, axis=-1)

    # ---- 1. joint self-attention over [v_cond; audio] ----
    a_in = modulate_ref(layer_norm(audio), a1_shift, a1_scale)
    a_qkv = apply_dense(params["audio_self_attn_qkv"], a_in)
    a_q, a_k, a_v = (_split_heads(u, nh) for u in jnp.split(a_qkv, 3, axis=-1))

    v_in = modulate_ref(layer_norm(v_cond), v1_shift, v1_scale)
    v_qkv = apply_dense(params["v_cond_attn_qkv"], v_in)
    v_q, v_k, v_v = (_split_heads(u, nh) for u in jnp.split(v_qkv, 3, axis=-1))

    if (attn_impl == "pallas_fused" and cfg.qk_norm and attn_mask is None
            and cfg.interleaved_audio_visual_rope and ropes.audio_joint is not None):
        # Fully fused joint attention: per-position norm-weight/RoPE tables over the
        # [v_cond; audio] concat, qk-RMSNorm + rotation + SDPA in one Pallas kernel.
        from foley_tpu.ops.pallas.fused_attention import fused_qk_attention

        def cat_tab(v_vec, a_vec):
            return jnp.concatenate([
                jnp.broadcast_to(v_vec, (visual_len, v_vec.shape[-1])),
                jnp.broadcast_to(a_vec, (audio_len, a_vec.shape[-1])),
            ], axis=0)

        wq = cat_tab(params["v_cond_attn_q_norm"]["weight"], params["audio_self_q_norm"]["weight"])
        wk = cat_tab(params["v_cond_attn_k_norm"]["weight"], params["audio_self_k_norm"]["weight"])
        a_cos, a_sin = ropes.audio_joint
        v_cos, v_sin = ropes.visual_joint
        cos = jnp.concatenate([v_cos, a_cos], axis=0)
        sin = jnp.concatenate([v_sin, a_sin], axis=0)
        q = jnp.concatenate([v_q, a_q], axis=1)
        k = jnp.concatenate([v_k, a_k], axis=1)
        v = jnp.concatenate([v_v, a_v], axis=1)
        attn = fused_qk_attention(q, k, v, wq, wk, cos, sin, cos, sin, eps=eps)
        v_attn, a_attn = attn[:, :visual_len], attn[:, visual_len:]
        audio = audio + apply_gate(apply_dense(params["audio_self_proj"], _merge_heads(a_attn)), a1_gate)
        v_cond = v_cond + apply_gate(apply_dense(params["v_cond_self_proj"], _merge_heads(v_attn)), v1_gate)
        return _triple_block_tail(params, audio, cond, v_cond, ropes, cfg,
                                  (a2_shift, a2_scale, a2_gate, a3_shift, a3_scale, a3_gate),
                                  (v2_shift, v2_scale, v2_gate, v3_shift, v3_scale, v3_gate),
                                  attn_impl, text_kv=text_kv)

    a_q = _qk_norm(params["audio_self_q_norm"], a_q, eps)
    a_k = _qk_norm(params["audio_self_k_norm"], a_k, eps)
    v_q = _qk_norm(params["v_cond_attn_q_norm"], v_q, eps)
    v_k = _qk_norm(params["v_cond_attn_k_norm"], v_k, eps)

    if cfg.interleaved_audio_visual_rope:
        if ropes.audio_joint is not None:
            # Decomposed equivalent of interleave -> rotate -> decouple (see
            # build_rope_tables): per-stream rotation with precomputed row-gathered tables.
            a_q = apply_rotary_emb(a_q, *ropes.audio_joint)
            a_k = apply_rotary_emb(a_k, *ropes.audio_joint)
            v_q = apply_rotary_emb(v_q, *ropes.visual_joint)
            v_k = apply_rotary_emb(v_k, *ropes.visual_joint)
        else:
            # Exact fallback: interleave audio/visual tokens, rotate with the 2T table,
            # decouple (reference hifi_foley.py:236-251).
            q_i = interleave_sequences(a_q, v_q)
            k_i = interleave_sequences(a_k, v_k)
            q_i = apply_rotary_emb(q_i, *ropes.joint)
            k_i = apply_rotary_emb(k_i, *ropes.joint)
            a_q, v_q = decouple_interleaved(q_i, audio_len, visual_len)
            a_k, v_k = decouple_interleaved(k_i, audio_len, visual_len)
    else:
        a_q = apply_rotary_emb(a_q, *ropes.joint)
        a_k = apply_rotary_emb(a_k, *ropes.joint)
        if ropes.v_joint is not None:
            v_q = apply_rotary_emb(v_q, *ropes.v_joint)
            v_k = apply_rotary_emb(v_k, *ropes.v_joint)

    q = jnp.concatenate([v_q, a_q], axis=1)
    k = jnp.concatenate([v_k, a_k], axis=1)
    v = jnp.concatenate([v_v, a_v], axis=1)
    attn = sdpa(q, k, v, mask=attn_mask,
                impl="xla" if attn_impl == "pallas_fused" else attn_impl)
    v_attn, a_attn = attn[:, :visual_len], attn[:, visual_len:]

    audio = audio + apply_gate(apply_dense(params["audio_self_proj"], _merge_heads(a_attn)), a1_gate)
    v_cond = v_cond + apply_gate(apply_dense(params["v_cond_self_proj"], _merge_heads(v_attn)), v1_gate)

    return _triple_block_tail(
        params, audio, cond, v_cond, ropes, cfg,
        (a2_shift, a2_scale, a2_gate, a3_shift, a3_scale, a3_gate),
        (v2_shift, v2_scale, v2_gate, v3_shift, v3_scale, v3_gate),
        attn_impl, text_kv=text_kv,
    )


def _text_kv(params, cond, ropes_text, nh: int, eps: float):
    """Text-side K/V of one triple block's cross-attention: projection, k-norm, RoPE —
    all timestep-invariant (reference recomputes per forward, ``hifi_foley.py:293-308``)."""
    t_kv = apply_dense(params["text_cross_kv"], cond)
    t_k, t_v = (_split_heads(u, nh) for u in jnp.split(t_kv, 2, axis=-1))
    t_k = _qk_norm(params["text_cross_k_norm"], t_k, eps)
    t_k = apply_rotary_emb(t_k, *ropes_text)
    return t_k, t_v


def _triple_block_tail(params, audio, cond, v_cond, ropes, cfg, a_mods, v_mods, attn_impl,
                       text_kv=None):
    """Cross-attention vs text + gated MLPs (stages 2-3 of TwoStreamCABlock)."""
    nh, eps = cfg.num_heads, cfg.qk_norm_eps
    visual_len = v_cond.shape[1]
    a2_shift, a2_scale, a2_gate, a3_shift, a3_scale, a3_gate = a_mods
    v2_shift, v2_scale, v2_gate, v3_shift, v3_scale, v3_gate = v_mods

    # ---- 2. cross-attention: [v_cond; audio] queries vs text k/v ----
    a_in = modulate_ref(layer_norm(audio), a2_shift, a2_scale)
    v_in = modulate_ref(layer_norm(v_cond), v2_shift, v2_scale)
    a_q = _qk_norm(params["audio_cross_q_norm"], _split_heads(apply_dense(params["audio_cross_q"], a_in), nh), eps)
    v_q = _qk_norm(params["v_cond_cross_q_norm"], _split_heads(apply_dense(params["v_cond_cross_q"], v_in), nh), eps)
    # text k/v are timestep-invariant: take the per-generation precompute when provided
    # (hoisted out of the denoise step scan, ``precompute_text_kv``), else compute in-block.
    t_k, t_v = text_kv if text_kv is not None else _text_kv(params, cond, ropes.text, nh, eps)

    # 1-D RoPE on q (per-stream positions); text k was rotated in _text_kv.
    a_q = apply_rotary_emb(a_q, *ropes.audio)
    v_q = apply_rotary_emb(v_q, *ropes.visual_cross)

    q = jnp.concatenate([v_q, a_q], axis=1)
    cross = sdpa(q, t_k, t_v, impl="xla" if attn_impl == "pallas_fused" else attn_impl)
    v_x, a_x = cross[:, :visual_len], cross[:, visual_len:]
    audio = audio + apply_gate(apply_dense(params["audio_cross_proj"], _merge_heads(a_x)), a2_gate)
    v_cond = v_cond + apply_gate(apply_dense(params["v_cond_cross_proj"], _merge_heads(v_x)), v2_gate)

    # ---- 3. MLPs ----
    audio = audio + apply_gate(
        apply_mlp(params["audio_mlp"], modulate_ref(layer_norm(audio), a3_shift, a3_scale), cfg.mlp_act_type),
        a3_gate,
    )
    v_cond = v_cond + apply_gate(
        apply_mlp(params["v_cond_mlp"], modulate_ref(layer_norm(v_cond), v3_shift, v3_scale), cfg.mlp_act_type),
        v3_gate,
    )
    return audio, v_cond


def single_block_apply(
    params: Dict,
    x: jnp.ndarray,
    vec: jnp.ndarray,
    ropes: RopeTables,
    cfg: MMDiTConfig,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """SingleStreamBlock (reference ``hifi_foley.py:335-390``); ``vec`` is per-token [B, T, H]
    (2-D [B, H] when neither sync flag is set — per-batch modulation, reference parity).

    ``vec`` may carry HALF of ``x``'s batch rows (``apply(visual_rows_shared=True)``: the
    CFG halves of the modulation input are identical) — the modulation GEMM then runs on
    the half and its result is tiled, halving the block's biggest non-attention GEMM."""
    nh, eps = cfg.num_heads, cfg.qk_norm_eps
    mod = apply_dense(params["modulation"], jax.nn.silu(vec))
    if mod.shape[0] != x.shape[0]:
        mod = jnp.concatenate([mod] * (x.shape[0] // mod.shape[0]), axis=0)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

    x_n = modulate(layer_norm(x), shift_msa, scale_msa)
    qkv = apply_dense(params["linear_qkv"], x_n)
    q, k, v = (_split_heads(u, nh) for u in jnp.split(qkv, 3, axis=-1))
    if attn_impl == "pallas_fused":
        from foley_tpu.ops.pallas.fused_attention import fused_qk_attention

        cos, sin = ropes.audio
        length = cos.shape[0]
        wq = jnp.broadcast_to(params["q_norm"]["weight"], (length, cfg.head_dim))
        wk = jnp.broadcast_to(params["k_norm"]["weight"], (length, cfg.head_dim))
        out = _merge_heads(fused_qk_attention(q, k, v, wq, wk, cos, sin, cos, sin, eps=eps))
    else:
        q = rms_norm(q, params["q_norm"]["weight"], eps=eps)
        k = rms_norm(k, params["k_norm"]["weight"], eps=eps)
        q = apply_rotary_emb(q, *ropes.audio)
        k = apply_rotary_emb(k, *ropes.audio)
        out = _merge_heads(sdpa(q, k, v, impl=attn_impl))

    x = x + apply_gate(apply_conv1d(params["linear1"], out, padding=1), gate_msa)
    x_n = modulate(layer_norm(x), shift_mlp, scale_mlp)
    x = x + apply_gate(apply_conv_mlp(params["linear2"], x_n, kernel_size=3), gate_mlp)
    return x


#: Profiling-only knob (tools/profile_unroll.py): lax.scan unroll factor for the block
#: stacks. >1 trades HLO size/compile time for eliminating the per-iteration weight-stack
#: dynamic-slice copies (the op profile's 5.8% "data formatting"). Pre-hoist this was a
#: wash (ROADMAP measured-and-closed); read at import, subprocess-scoped in the tool.
_BLOCK_UNROLL = int(os.environ.get("FOLEY_TPU_BLOCK_UNROLL", "1"))


def _run_stack(stack, carry, make_body, remat: bool, offload_fetch: bool,
               prefetch_depth: int = 1, extra_xs=None):
    """Scan a block stack; a placement-split stack (``parallel/offload.py::
    offload_block_suffix``) runs one scan over the HBM-resident prefix, then applies each
    pinned-host block unrolled with an explicit fetch — the reference's per-block prefetch
    streaming (``hifi_foley.py:574-612``). Host-resident scan *operands* are avoided: they
    crash the axon runtime's compiler.

    ``prefetch_depth`` bounds the HBM fetch window: the copy of block ``i + depth`` is gated
    on block ``i``'s output via ``lax.optimization_barrier``, so at most ``depth`` offloaded
    blocks are device-resident at once. Without the gate XLA hoists every copy-start to the
    program head — all offloaded blocks live simultaneously, which RESOURCE_EXHAUSTs at
    54-block XXL swap (~8.5 GiB). depth=1 is strictly serial fetch→compute; depth=2 double
    buffers (fetch of the next block overlaps compute of the current one), the analog of the
    reference's prefetch stream (``hifi_foley.py:545-612``)."""
    from foley_tpu.parallel.offload import is_split_stack

    def scan(part, carry, fetch):
        body = make_body(fetch)
        if remat:
            body = jax.checkpoint(body)
        carry, _ = jax.lax.scan(body, carry,
                                part if extra_xs is None else (part,) + extra_xs,
                                unroll=_BLOCK_UNROLL)
        return carry

    if is_split_stack(stack):
        assert extra_xs is None, "extra_xs is unsupported for placement-split stacks"
        resident = stack["resident"]
        if jax.tree.leaves(resident)[0].shape[0]:
            carry = scan(resident, carry, False)
        # The body does NOT fetch internally: the fetch is issued here, gated to bound the
        # number of in-flight host->HBM copies.
        body = make_body(False)
        if remat:
            body = jax.checkpoint(body)
        blocks = stack["offloaded"]
        depth = max(1, min(int(prefetch_depth), len(blocks)))
        fetch = lambda b: jax.tree.map(
            lambda x: jax.device_put(x, jax.memory.Space.Device), b
        )
        window = [fetch(b) for b in blocks[:depth]]  # ungated: may overlap the resident scan
        for i in range(len(blocks)):
            carry, _ = body(carry, window.pop(0))
            nxt = i + depth
            if nxt < len(blocks):
                # Order the next copy-start after block i's compute so the scheduler cannot
                # hoist it (and every later one) to the program head.
                carry, gated = jax.lax.optimization_barrier((carry, blocks[nxt]))
                window.append(fetch(gated))
        return carry
    return scan(stack, carry, offload_fetch)


def precompute_text_kv(params: Dict, cond: jnp.ndarray, cfg: MMDiTConfig):
    """Per-generation precompute of every triple block's text cross-attention K/V.

    The text-side projection + k-norm + RoPE (``_text_kv``) depend only on the prompt
    features and the block weights — NOT on the timestep — yet sit inside the denoise step
    scan, where XLA cannot hoist them out of the inner block scan (the reference recomputes
    them per forward too, ``hifi_foley.py:293-308``). Computing them once per generation
    removes ~18 x [L_text, H] x [H, 2H] matmuls from every step (~2% of XXL step FLOPs;
    the stack is only ~[18, 2B, 77, H] x 2 in memory).

    Takes the RAW (condition_dim) text features in the compute dtype; applies the cond_in
    projection exactly as ``apply`` does. Returns (t_k, t_v) stacked [N_blocks, ...], or
    None when the triple stack is placement-split (host offload streams blocks; the tail
    computes in-block).
    """
    from foley_tpu.parallel.offload import is_split_stack

    stack = params["triple_blocks"]
    if is_split_stack(stack):
        return None
    cond_p = apply_dense(params["cond_in"]["linear_2"],
                         jax.nn.silu(apply_dense(params["cond_in"]["linear_1"], cond)))
    ropes_text = rope_table(cond.shape[1], cfg.head_dim, cfg.rope_theta)

    def body(_, block_params):
        return None, _text_kv(block_params, cond_p, ropes_text, cfg.num_heads, cfg.qk_norm_eps)

    _, (t_k, t_v) = jax.lax.scan(body, None, stack)
    return t_k, t_v


def precompute_triple_mods(params: Dict, timesteps: jnp.ndarray, cfg: MMDiTConfig,
                           compute_dtype):
    """Per-generation precompute of every triple block's adaLN modulation vectors.

    With ``sync_modulation`` off (every shipped config), the triple-stream modulation
    source is the timestep embedding alone (``mod_src = vec``; reference
    ``hifi_foley.py:212-216`` computes it per forward) — and the denoise schedule's
    timesteps are static per generation. Computing all S steps x N blocks of
    (audio_mod, v_cond_mod) up front removes the two [H, 9H] adaLN weight matrices from
    every step's HBM weight stream — 1.53 GiB/step at XXL, 16% of the weight bytes that
    bound bf16 batch-1 step time (ROADMAP op-profile entry) — for ~50 MB of precomputed
    vectors. Batch-free: every CFG row shares the timestep, so one vector per (step,
    block) broadcasts over the batch at use (``modulate``'s [1, 9H] path).

    Returns (a_mods, v_mods), each [S, N, 1, 9H] in the compute dtype — step-major for the
    denoise step scan, block axis for the inner stack scan, singleton batch for broadcast.
    None when the triple stack is placement-split (streamed blocks compute in-block) or
    the modulation source is per-token (``sync_modulation``).
    """
    from foley_tpu.parallel.offload import is_split_stack

    stack = params["triple_blocks"]
    if cfg.sync_modulation or is_split_stack(stack):
        return None
    vec = apply_time_in(params["time_in"], timesteps, compute_dtype)  # [S, H]
    sv = jax.nn.silu(vec)
    a_mods = jax.vmap(lambda p: apply_dense(p, sv))(stack["audio_mod"])   # [N, S, 9H]
    v_mods = jax.vmap(lambda p: apply_dense(p, sv))(stack["v_cond_mod"])
    reorder = lambda m: jnp.swapaxes(m, 0, 1)[:, :, None, :]  # [S, N, 1, 9H]
    return reorder(a_mods), reorder(v_mods)


def apply_final_layer(params: Dict, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """FinalLayer1D (reference ``mlp_layers.py:78-101``)."""
    if x.ndim == 3 and c.ndim == 3:
        # Per-token c makes shift/scale 3-D, which ``modulate_ref`` DROPS (the reference's
        # exact semantics — its checkpoints trained with this no-op; see modulate_ref).
        # Statically skip the adaLN dense whose output would be discarded.
        x = modulate_ref(layer_norm(x), None, None)
    else:
        mod = apply_dense(params["adaLN"], jax.nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate_ref(layer_norm(x), shift, scale)
    return apply_dense(params["linear"], x)


# ---------------------------------------------------------------------------------
# Empty (uncond / T2A) sequences
# ---------------------------------------------------------------------------------

def get_empty_clip_sequence(params: Dict, bs: int, length: int) -> jnp.ndarray:
    """Learned empty clip features broadcast to [bs, length, clip_dim] (reference :620-625)."""
    return jnp.broadcast_to(params["empty_clip_feat"][None], (bs, length, params["empty_clip_feat"].shape[-1]))


def get_empty_sync_sequence(params: Dict, bs: int, length: int) -> jnp.ndarray:
    return jnp.broadcast_to(params["empty_sync_feat"][None], (bs, length, params["empty_sync_feat"].shape[-1]))


# ---------------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------------

def apply(
    params: Dict,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: jnp.ndarray,
    clip_feat: jnp.ndarray,
    sync_feat: jnp.ndarray,
    cfg: MMDiTConfig,
    cond_mask: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    remat: bool = False,
    offload_fetch: bool = False,
    offload_prefetch: int = 1,
    text_kv=None,
    triple_mods=None,
    visual_rows_shared: bool = False,
    lora=None,
    lora_scale: float = 1.0,
) -> jnp.ndarray:
    """Full forward pass (reference ``hifi_foley.py:707-924``).

    Args:
        x: audio latents, channel-last [B, T, C_latent] (reference uses [B, C, T]).
        t: [B] timesteps in [0, 1000).
        cond: text features [B, L_text, condition_dim].
        clip_feat: SigLIP2 features [B, L_clip, clip_dim].
        sync_feat: Synchformer features [B, S*8, sync_feat_dim].
        cond_mask: optional [B, L_text] bool text mask (only used when
            ``cfg.use_attention_mask``; XXL/XL disable it).
        remat: rematerialize blocks (gradient checkpointing) for training.
        visual_rows_shared: STATIC promise that the two CFG halves of ``clip_feat`` and
            ``sync_feat`` are identical row-for-row (T2A: the cond visuals ARE the learned
            empty sequences the uncond half uses; ``generate_audio``/``generate_audio_multi``
            set it). The visual-derived projections (sync_in chain, visual_proj, and every
            single block's per-token modulation GEMM — 13% of XXL step FLOPs) then compute
            on the first half and tile. Exact; caller-asserted, never inferred.
        lora: optional unmerged LoRA tree (``models/lora.py``) — the TRAINING path: each
            block's effective ``w + lora_scale * a @ b`` is materialized inside the scan
            body (one block at a time; never a second full weight stack), and gradients
            flow to the stacked factors. Inference should :func:`lora.merge_lora` at load
            instead — the hoists (``text_kv``/``triple_mods``) read block weights directly
            and would silently bypass a runtime adapter, so combining them is rejected.

    Returns velocity [B, T, C_latent].
    """
    if lora is not None:
        assert text_kv is None and triple_mods is None, (
            "runtime (unmerged) LoRA is the training path; the denoise hoists read block "
            "weights directly — use lora.merge_lora(params, lora, scale) for inference")
    bs, tl = x.shape[0], x.shape[1] // cfg.patch_size
    # rows-shared contract: [uncond_half; cond_half] with identical visual halves
    assert not visual_rows_shared or bs % 2 == 0, bs
    half = bs // 2
    tile2 = lambda a: jnp.concatenate([a, a], axis=0)

    # ---- time & sync conditioning ----
    vec = apply_time_in(params["time_in"], t, x.dtype)  # [B, H]

    sync_vec = None
    sync_add = None
    sync_add_half = None  # rows-shared: [B/2, T, H], single blocks tile after their mod GEMM
    if cfg.sync_modulation or cfg.add_sync_feat_to_audio:
        assert sync_feat.shape[1] % 8 == 0, sync_feat.shape
        sfin = sync_feat[:half] if visual_rows_shared else sync_feat
        b_s, s = sfin.shape[0], sync_feat.shape[1] // 8
        sf = sfin.reshape(b_s, s, 8, cfg.sync_feat_dim) + params["sync_pos_emb"].astype(sync_feat.dtype)
        sf = sf.reshape(b_s, s * 8, cfg.sync_feat_dim)
        sf = apply_dense(params["sync_in"]["linear"], sf)
        sf = jax.nn.silu(sf)
        sf = apply_conv_mlp(params["sync_in"]["conv_mlp"], sf, kernel_size=cfg.sync_in_ksz)
        sf = nearest_exact_resize(sf, tl, axis=1)  # [B or B/2, T, H]
        if visual_rows_shared:
            sync_add_half = sf
            sf = tile2(sf)
        if cfg.sync_modulation:
            sync_vec = sf + vec[:, None, :]
        else:
            sync_add = sf

    # ---- embeddings ----
    if text_kv is None:  # hoisted path (precompute_text_kv) already consumed the projection
        cond = apply_dense(params["cond_in"]["linear_2"],
                           jax.nn.silu(apply_dense(params["cond_in"]["linear_1"], cond)))
    audio = apply_conv1d(params["audio_embedder"], x, stride=cfg.patch_size)  # [B, T, H]
    clip_in = clip_feat[:half] if visual_rows_shared else clip_feat
    v_cond = swiglu(
        apply_dense(params["visual_proj"]["w1"], clip_in),
        apply_dense(params["visual_proj"]["w3"], clip_in),
    )
    v_cond = apply_dense(params["visual_proj"]["w2"], v_cond)
    if visual_rows_shared:
        v_cond = tile2(v_cond)  # halves identical only at entry: the stream diverges in-block

    audio_len, visual_len, text_len = audio.shape[1], v_cond.shape[1], cond.shape[1]
    ropes = build_rope_tables(cfg, audio_len, visual_len, text_len)

    # ---- optional attention mask (reference hifi_foley.py:774-793) ----
    attn_mask = None
    if cfg.use_attention_mask:
        assert cond_mask is not None
        seq_len = text_len + visual_len + audio_len
        # NOTE(parity): the reference concatenates masks in [text; visual; audio] order but the
        # joint self-attention sequence is [visual; audio] only (text attends via cross-attn);
        # the mask is applied to the [v_cond; audio] SDPA. We build the same full mask and slice
        # the [visual; audio] block so behavior matches when the flag is on.
        ones_av = jnp.ones((bs, visual_len + audio_len), bool)
        concat = jnp.concatenate([cond_mask.astype(bool), ones_av], axis=1)
        m1 = jnp.broadcast_to(concat[:, None, None, :], (bs, 1, seq_len, seq_len))
        full = m1 & jnp.swapaxes(m1, 2, 3)
        full = full.at[:, :, :, 0].set(True)
        attn_mask = full[:, :, text_len:, text_len:]

    # ---- triple-stream stack (scan) ----
    if cfg.add_sync_feat_to_audio:
        audio = audio + sync_add  # injected before block 0 (reference :838-839)

    # Per-block hoisted operands ride the stack scan as extra scanned xs, in a fixed
    # order: the LoRA factor tree, then [t_k, t_v] (precompute_text_kv), then
    # [a_mod, v_mod] (precompute_triple_mods). LoRA and the hoists are mutually
    # exclusive (asserted above), but the unpack below stays general.
    tl_lora = lora.get("triple_blocks") if lora is not None else None
    sl_lora = lora.get("single_blocks") if lora is not None else None
    extras = ()
    if tl_lora:
        extras += (tl_lora,)
    if text_kv is not None:
        extras += tuple(text_kv)
    if triple_mods is not None:
        extras += tuple(triple_mods)

    def triple_body(fetch):
        def body(carry, xs):
            block_params, rest = (xs, ()) if not extras else (xs[0], xs[1:])
            if tl_lora:
                from foley_tpu.models.lora import merge_block_lora

                block_params = merge_block_lora(block_params, rest[0], lora_scale)
                rest = rest[1:]
            block_text_kv = None
            if text_kv is not None:
                block_text_kv, rest = rest[:2], rest[2:]
            block_mods = rest[:2] if triple_mods is not None else None
            if fetch:
                # Stream this block's params from pinned host memory into HBM (the block-swap
                # analog, parallel/offload.py). NOT unconditional: device_put(Space.Device) on
                # already-resident params forces a ~230 MB copy per block on this runtime
                # (measured 35.7 -> 429 ms/step).
                block_params = jax.device_put(block_params, jax.memory.Space.Device)
            a, vc = carry
            a, vc = triple_block_apply(
                block_params, a, cond, vc, vec, ropes, cfg,
                attn_mask=attn_mask, sync_vec=sync_vec, attn_impl=attn_impl,
                text_kv=block_text_kv, mods=block_mods,
            )
            return (a, vc), None
        return body

    audio, v_cond = _run_stack(
        params["triple_blocks"], (audio, v_cond), triple_body, remat, offload_fetch,
        prefetch_depth=offload_prefetch, extra_xs=extras or None,
    )

    # ---- per-token modulation vector for single blocks (reference :860-867) ----
    vec_tok_mod = None  # rows-shared fast path: [B/2, T, H] — blocks tile after the GEMM
    if cfg.sync_modulation:
        vec_tok = sync_vec
    elif cfg.add_sync_feat_to_audio:
        vec_tok = sync_add + vec[:, None, :]
        if visual_rows_shared:
            # vec rows are identical too (one timestep per step), so the per-token
            # modulation input's CFG halves match: run each block's [B*T, H] x [H, 6H]
            # mod GEMM on one half (13% of XXL step FLOPs halved).
            vec_tok_mod = sync_add_half + vec[:half, None, :]
    else:
        # Reference keeps vec 2-D here: single-block modulation is per-batch, and the
        # 2-D vector reaches the final layer where adaLN modulation APPLIES (3-D would be
        # silently dropped by modulate_ref — and a [B*T, H] GEMM instead of [B, H]).
        vec_tok = vec

    mod_vec = vec_tok_mod if vec_tok_mod is not None else vec_tok

    def single_body(fetch):
        def body(carry, xs):
            block_params = xs[0] if sl_lora else xs
            if sl_lora:
                from foley_tpu.models.lora import merge_block_lora

                block_params = merge_block_lora(block_params, xs[1], lora_scale)
            if fetch:
                block_params = jax.device_put(block_params, jax.memory.Space.Device)
            h = single_block_apply(block_params, carry, mod_vec, ropes, cfg,
                                   attn_impl=attn_impl)
            return h, None
        return body

    audio = _run_stack(params["single_blocks"], audio, single_body, remat, offload_fetch,
                       prefetch_depth=offload_prefetch,
                       extra_xs=(sl_lora,) if sl_lora else None)

    # ---- final layer (reference :916-923); vec is sync_vec if sync_modulation ----
    # 3-D final_vec (either sync flag): reference modulate drops the per-token shift/scale
    # (see modulate_ref) and apply_final_layer skips the dead adaLN dense; 2-D (no flags):
    # the modulation applies, matching the reference's 2-D vec path.
    final_vec = sync_vec if sync_vec is not None else vec_tok
    out = apply_final_layer(params["final_layer"], audio, final_vec)  # [B, T, p*C]
    if cfg.patch_size != 1:
        out = out.reshape(bs, tl * cfg.patch_size, cfg.audio_vae_latent_dim)
    return out
