"""AST (Audio Spectrogram Transformer) — Synchformer's audio branch, JAX port.

The reference vendors HF's AST with token-masking support (``modeling_ast.py``) wrapped by an
``AST`` adapter that shortens position embeddings to the 66-frame spec length and applies
factorized frequency/time aggregation (``ast_model.py:11-289``). In the foley pipeline these
weights load but only the sync-scoring capability uses them (SURVEY.md §2.6); they are ported
so the full Synchformer capability (AV desync scoring) is available.

Architecture: conv2d patch embedding (16x16, stride 10x10) over the [mel=128, time=66]
spectrogram -> tokens ordered (freq-major, time) with CLS + distillation tokens, learned
position embeddings (shortened to f*t+2 = 74), pre-LN ViT layers, final LayerNorm; then
FrequencyTransformerEncoderLayer (CLS-probe pooling over the 12 frequency patches per time
step) -> (B, S, t=6, 768).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.ops.nn import apply_dense
from foley_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ASTConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    frequency_stride: int = 10
    time_stride: int = 10
    num_mel_bins: int = 128
    max_length: int = 66           # reference patches max_length to max_spec_t=66
    layer_norm_eps: float = 1e-12

    @property
    def freq_patches(self) -> int:
        return (self.num_mel_bins - self.patch_size) // self.frequency_stride + 1

    @property
    def time_patches(self) -> int:
        return (self.max_length - self.patch_size) // self.time_stride + 1

    @classmethod
    def tiny(cls) -> "ASTConfig":
        return cls(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                   intermediate_size=64, num_mel_bins=36, max_length=26)


def convert_hf_state_dict(sd: Dict[str, np.ndarray], cfg: ASTConfig, prefix: str = "") -> Dict:
    """HF ASTModel state dict -> pytree. Position embeddings are truncated to f*t+2 tokens
    (reference ``ast_model.patch_position_emb``, ``ast_model.py:250-255``)."""

    def lin(name):
        return {"w": jnp.asarray(np.ascontiguousarray(sd[prefix + name + ".weight"].T)),
                "b": jnp.asarray(sd[prefix + name + ".bias"])}

    def ln(name):
        return {"weight": jnp.asarray(sd[prefix + name + ".weight"]),
                "bias": jnp.asarray(sd[prefix + name + ".bias"])}

    n_tok = cfg.freq_patches * cfg.time_patches + 2
    proj = sd[prefix + "embeddings.patch_embeddings.projection.weight"]  # [D, 1, 16, 16]
    d = proj.shape[0]
    params: Dict = {
        "cls_token": jnp.asarray(sd[prefix + "embeddings.cls_token"]),
        "distillation_token": jnp.asarray(sd[prefix + "embeddings.distillation_token"]),
        "position_embeddings": jnp.asarray(sd[prefix + "embeddings.position_embeddings"][:, :n_tok]),
        "patch_proj": {"w": jnp.asarray(np.ascontiguousarray(proj.reshape(d, -1).T)),
                       "b": jnp.asarray(sd[prefix + "embeddings.patch_embeddings.projection.bias"])},
        "layernorm": ln("layernorm"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layer.{i}."
        params["layers"].append({
            "ln_before": ln(b + "layernorm_before"),
            "q": lin(b + "attention.attention.query"),
            "k": lin(b + "attention.attention.key"),
            "v": lin(b + "attention.attention.value"),
            "attn_out": lin(b + "attention.output.dense"),
            "ln_after": ln(b + "layernorm_after"),
            "inter": lin(b + "intermediate.dense"),
            "out": lin(b + "output.dense"),
        })
    return params


def init(key, cfg: ASTConfig, dtype=jnp.float32) -> Dict:
    d = cfg.hidden_size
    n_tok = cfg.freq_patches * cfg.time_patches + 2
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_hidden_layers))

    def lin(i, o):
        return {"w": 0.02 * jax.random.normal(next(keys), (i, o), dtype), "b": jnp.zeros((o,), dtype)}

    def ln():
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    params: Dict = {
        "cls_token": 0.02 * jax.random.normal(next(keys), (1, 1, d), dtype),
        "distillation_token": 0.02 * jax.random.normal(next(keys), (1, 1, d), dtype),
        "position_embeddings": 0.02 * jax.random.normal(next(keys), (1, n_tok, d), dtype),
        "patch_proj": lin(cfg.patch_size * cfg.patch_size, d),
        "layernorm": ln(),
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append({
            "ln_before": ln(), "q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
            "attn_out": lin(d, d), "ln_after": ln(),
            "inter": lin(d, cfg.intermediate_size), "out": lin(cfg.intermediate_size, d),
        })
    return params


def _ln(p, x, eps):
    return layer_norm(x, p["weight"], p["bias"], eps=eps)


def _mha(q, k, v, nh, bias=None):
    b, l, dm = q.shape
    hd = dm // nh
    q, k, v = (u.reshape(b, l, nh, hd) for u in (q, k, v))
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
                        precision=prec) / (hd ** 0.5)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=prec).reshape(b, l, dm)


def _patchify_spec(spec_tf: jnp.ndarray, cfg: ASTConfig) -> jnp.ndarray:
    """[B, T, F] spectrogram -> patch features [B, f*t, P*P] with HF AST semantics:
    conv2d over [B, 1, F, T] with stride (10, 10), tokens ordered (f-major, t)."""
    b = spec_tf.shape[0]
    x = jnp.swapaxes(spec_tf, 1, 2)  # [B, F, T]
    p, fs, ts = cfg.patch_size, cfg.frequency_stride, cfg.time_stride
    f_n, t_n = cfg.freq_patches, cfg.time_patches
    f_idx = jnp.arange(f_n) * fs
    t_idx = jnp.arange(t_n) * ts
    # gather overlapping 16x16 patches: [B, f_n, t_n, P, P]
    patches = x[:, f_idx[:, None, None, None] + jnp.arange(p)[None, None, :, None],
                t_idx[None, :, None, None] + jnp.arange(p)[None, None, None, :]]
    return patches.reshape(b, f_n * t_n, p * p)


def token_mask_from_cont_mask(cont_mask: jnp.ndarray, cfg: ASTConfig) -> jnp.ndarray:
    """Continuous spec mask [B, T, F] (0 = masked) -> token keep-mask [B, 2+f*t] (True = keep).

    A patch token is kept iff ALL of its spectrogram cells are unmasked; CLS/distill always
    kept. This mirrors the reference's inf/nan patch trick (``modeling_ast.py:525-544``):
    masked cells become ``inf`` before patching, so ANY masked cell in a patch's receptive
    field poisons that token to nan and it is dropped (oracle-pinned,
    test_reference_oracle_sync::test_ast_cont_mask_oracle)."""
    patches = _patchify_spec(cont_mask.astype(jnp.float32), cfg)  # [B, f*t, P*P]
    keep = jnp.all(patches > 0, axis=-1)
    b = keep.shape[0]
    aux = jnp.ones((b, 2), bool)
    return jnp.concatenate([aux, keep], axis=1)


def apply(params: Dict, spec_tf: jnp.ndarray, cfg: ASTConfig,
          token_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """spec_tf: [B, T=max_length, F=num_mel_bins] -> last_hidden_state [B, 2+f*t, D].

    ``token_mask``: optional [B, 2+f*t] keep-mask (see ``token_mask_from_cont_mask``);
    masked tokens neither attend nor are attended to.
    """
    x = apply_dense(params["patch_proj"], _patchify_spec(spec_tf, cfg))
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, x.shape[-1]))
    dist = jnp.broadcast_to(params["distillation_token"].astype(x.dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, dist, x], axis=1) + params["position_embeddings"].astype(x.dtype)
    eps = cfg.layer_norm_eps
    bias = None
    if token_mask is not None:
        bias = jnp.where(token_mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
    for layer in params["layers"]:
        xn = _ln(layer["ln_before"], x, eps)
        attn = _mha(apply_dense(layer["q"], xn), apply_dense(layer["k"], xn),
                    apply_dense(layer["v"], xn), cfg.num_attention_heads, bias=bias)
        x = x + apply_dense(layer["attn_out"], attn)
        xn = _ln(layer["ln_after"], x, eps)
        x = x + apply_dense(layer["out"], jax.nn.gelu(apply_dense(layer["inter"], xn), approximate=False))
    return _ln(params["layernorm"], x, eps)


def extract_features_segments(
    params: Dict,
    freq_agg_params: Dict,
    specs: jnp.ndarray,
    cfg: ASTConfig,
    for_loop: bool = False,
    cont_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Segmented features [B, S, T, F] -> [B, S, t, D].

    ``for_loop=True`` processes one segment at a time (the reference's memory-lean mode,
    ``ast_model.forward`` for_loop branch); False batches all segments through the MXU.
    ``cont_mask`` [B, S, T, F] (0 = masked) masks spectrogram content (the reference's
    training-time masking path; unsupported with ``for_loop`` there too).
    """
    b, s = specs.shape[:2]
    if for_loop:
        assert cont_mask is None, "cont_mask is not supported with for_loop (ast_model.py:162)"
        outs = [extract_features(params, freq_agg_params, specs[:, i], cfg) for i in range(s)]
        out = jnp.stack(outs, axis=1)
    else:
        flat = specs.reshape(b * s, *specs.shape[2:])
        flat_mask = cont_mask.reshape(b * s, *cont_mask.shape[2:]) if cont_mask is not None else None
        out = extract_features(params, freq_agg_params, flat, cfg, cont_mask=flat_mask)
        out = out.reshape(b, s, *out.shape[1:])
    return out


def extract_features(
    params: Dict,
    freq_agg_params: Dict,
    spec_tf: jnp.ndarray,
    cfg: ASTConfig,
    num_heads_agg: Optional[int] = None,
    cont_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Factorized freq/time features: [BS, T, F] -> [BS, t, D]
    (reference ``ast_model.forward_segments`` + ``FrequencyTransformerEncoderLayer``).

    ``cont_mask`` [BS, T, F] (0 = masked): masked cells drop their tokens from both the
    encoder attention and the frequency aggregation (reference passes the derived token
    mask into ``freq_attn_agg``, ``ast_model.py:196-206``)."""
    from foley_tpu.models.synchformer import _spatial_agg

    token_mask = token_mask_from_cont_mask(cont_mask, cfg) if cont_mask is not None else None
    hidden = apply(params, spec_tf, cfg, token_mask=token_mask)  # [BS, 2+f*t, D]
    tokens = hidden[:, 2:]                        # drop CLS/distill
    bs = tokens.shape[0]
    f_n, t_n, d = cfg.freq_patches, cfg.time_patches, cfg.hidden_size
    x = tokens.reshape(bs, f_n, t_n, d)           # (f-major, t)
    x = jnp.swapaxes(x, 1, 2).reshape(bs * t_n, f_n, d)  # per-time frequency tokens
    key_mask = None
    if token_mask is not None:
        km = token_mask[:, 2:].reshape(bs, f_n, t_n)
        key_mask = jnp.swapaxes(km, 1, 2).reshape(bs * t_n, f_n)
    pooled = _spatial_agg(freq_agg_params, x, num_heads_agg or cfg.num_attention_heads,
                          key_mask=key_mask)
    return pooled.reshape(bs, t_n, d)
