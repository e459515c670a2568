"""SigLIP2 vision tower (google/siglip2-base-patch16-512) — JAX port.

Role in the pipeline: 768-d per-frame visual semantics at 8 fps from 512x512 frames
(reference ``nodes.py:199``, ``feature_utils.py:64-78``: HF ``get_image_features`` =
vision tower -> post-LN -> attention-pooling MAP head -> pooled [768]).

Architecture: pre-LN ViT (patch16), no class token, learned position embeddings, MAP pooling
head (probe token cross-attends all patch tokens, then LN + residual MLP; pooled = token 0).
Both checkpoint flavors convert: fixed-resolution SigLIP (conv2d patch embedding
[h, 3, P, P]) and naflex SigLIP2 (linear patch embedding [h, 3*P*P]) — detected by weight
rank. Frames are processed batched (B*T on the MXU), replacing the reference's per-frame
torchvision loop.
"""

from __future__ import annotations

import dataclasses
import functools as _functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.io.images import frames_to_u8
from foley_tpu.ops.nn import apply_dense
from foley_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 512
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @classmethod
    def tiny(cls) -> "SiglipVisionConfig":
        return cls(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=2, image_size=32, patch_size=8)


# ---------------------------------------------------------------------------------
# Convert
# ---------------------------------------------------------------------------------

def convert_hf_state_dict(sd: Dict[str, np.ndarray], cfg: SiglipVisionConfig,
                          prefix: str = "vision_model.") -> Dict:
    def lin(name):
        return {"w": jnp.asarray(np.ascontiguousarray(sd[prefix + name + ".weight"].T)),
                "b": jnp.asarray(sd[prefix + name + ".bias"])}

    def ln(name):
        return {"weight": jnp.asarray(sd[prefix + name + ".weight"]),
                "bias": jnp.asarray(sd[prefix + name + ".bias"])}

    pe = sd[prefix + "embeddings.patch_embedding.weight"]
    if pe.ndim == 4:  # conv2d [h, C, P, P] -> flattened linear [C*P*P, h] over (C, Ph, Pw)
        h = pe.shape[0]
        patch_w = jnp.asarray(np.ascontiguousarray(pe.reshape(h, -1).T))
    else:
        # naflex linear [h, Ph*Pw*C]: HF's processor orders patch features (ph, pw, c)
        # (image_processing_siglip2.convert_image_to_patches); permute the input axis to our
        # (c, ph, pw) patchify order.
        h = pe.shape[0]
        p = cfg.patch_size
        c = pe.shape[1] // (p * p)
        w = pe.reshape(h, p, p, c)            # [h, ph, pw, c]
        w = np.transpose(w, (0, 3, 1, 2))     # [h, c, ph, pw]
        patch_w = jnp.asarray(np.ascontiguousarray(w.reshape(h, -1).T))
    params: Dict = {
        "patch_embedding": {"w": patch_w,
                            "b": jnp.asarray(sd[prefix + "embeddings.patch_embedding.bias"])},
        "position_embedding": jnp.asarray(sd[prefix + "embeddings.position_embedding.weight"]),
        "post_layernorm": ln("post_layernorm"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}."
        params["layers"].append({
            "ln1": ln(b + "layer_norm1"),
            "q": lin(b + "self_attn.q_proj"),
            "k": lin(b + "self_attn.k_proj"),
            "v": lin(b + "self_attn.v_proj"),
            "out": lin(b + "self_attn.out_proj"),
            "ln2": ln(b + "layer_norm2"),
            "fc1": lin(b + "mlp.fc1"),
            "fc2": lin(b + "mlp.fc2"),
        })
    # MAP pooling head (torch nn.MultiheadAttention packs qkv in in_proj_weight [3h, h])
    if prefix + "head.probe" in sd:
        h = cfg.hidden_size
        in_w = sd[prefix + "head.attention.in_proj_weight"]
        in_b = sd[prefix + "head.attention.in_proj_bias"]
        params["head"] = {
            "probe": jnp.asarray(sd[prefix + "head.probe"]),
            "q": {"w": jnp.asarray(np.ascontiguousarray(in_w[:h].T)), "b": jnp.asarray(in_b[:h])},
            "k": {"w": jnp.asarray(np.ascontiguousarray(in_w[h:2 * h].T)), "b": jnp.asarray(in_b[h:2 * h])},
            "v": {"w": jnp.asarray(np.ascontiguousarray(in_w[2 * h:].T)), "b": jnp.asarray(in_b[2 * h:])},
            "out": lin("head.attention.out_proj"),
            "ln": ln("head.layernorm"),
            "fc1": lin("head.mlp.fc1"),
            "fc2": lin("head.mlp.fc2"),
        }
    return params


# ---------------------------------------------------------------------------------
# Random init (smoke runs / tests)
# ---------------------------------------------------------------------------------

def init(key, cfg: SiglipVisionConfig, dtype=jnp.float32) -> Dict:
    """Random params in ``convert_hf_state_dict``'s layout (incl. the MAP pooling head)."""
    h, inter = cfg.hidden_size, cfg.intermediate_size
    keys = iter(jax.random.split(key, 12 + 6 * cfg.num_hidden_layers))

    def lin(kin, kout):
        return {"w": 0.02 * jax.random.normal(next(keys), (kin, kout), dtype),
                "b": jnp.zeros((kout,), dtype)}

    def ln():
        return {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}

    params: Dict = {
        "patch_embedding": lin(cfg.num_channels * cfg.patch_size ** 2, h),
        "position_embedding": 0.02 * jax.random.normal(next(keys), (cfg.grid ** 2, h), dtype),
        "post_layernorm": ln(),
        "layers": [
            {"ln1": ln(), "q": lin(h, h), "k": lin(h, h), "v": lin(h, h), "out": lin(h, h),
             "ln2": ln(), "fc1": lin(h, inter), "fc2": lin(inter, h)}
            for _ in range(cfg.num_hidden_layers)
        ],
        "head": {
            "probe": 0.02 * jax.random.normal(next(keys), (1, 1, h), dtype),
            "q": lin(h, h), "k": lin(h, h), "v": lin(h, h), "out": lin(h, h),
            "ln": ln(), "fc1": lin(h, inter), "fc2": lin(inter, h),
        },
    }
    return params


def init_random(seed: int, feat_dim: int = 768) -> "Siglip2Encoder":
    """Random-weight encoder for checkpoint-free smoke runs (CLI ``--random_init`` V2A).

    ``feat_dim`` must match the MMDiT's ``clip_dim``; 768 selects the real base-model
    geometry, anything else a tiny 2-layer stand-in with the same code paths."""
    cfg = SiglipVisionConfig() if feat_dim == 768 else SiglipVisionConfig(
        hidden_size=feat_dim, intermediate_size=2 * feat_dim, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
    )
    return Siglip2Encoder(init(jax.random.PRNGKey(seed), cfg), cfg)


# ---------------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------------

def _ln(p, x, eps):
    return layer_norm(x, p["weight"], p["bias"], eps=eps)


def _mha(q, k, v, nh, impl: str = "xla"):
    b, lq, h = q.shape
    hd = h // nh
    q = q.reshape(b, lq, nh, hd)
    k = k.reshape(b, k.shape[1], nh, hd)
    v = v.reshape(b, v.shape[1], nh, hd)
    if impl == "pallas":
        from foley_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v).reshape(b, lq, h)
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
                        precision=prec) / (hd ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=prec).reshape(b, lq, h)


def _patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/P)*(W/P), C*P*P] with (C, Ph, Pw) feature order (torch conv)."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # [B, gh, gw, C, Ph, Pw]
    return x.reshape(b, gh * gw, c * patch * patch)


def _resize_pos_embed(pos: jnp.ndarray, target_grid: int) -> jnp.ndarray:
    """Bilinear-resize square positional embeddings [G*G, D] -> [g*g, D] (the naflex
    ``resize_positional_embeddings`` / fixed-res ``interpolate_pos_encoding`` mechanism)."""
    n, d = pos.shape
    g = int(round(n ** 0.5))
    if g == target_grid:
        return pos
    grid = pos.reshape(g, g, d)
    resized = jax.image.resize(grid, (target_grid, target_grid, d), method="bilinear")
    return resized.reshape(target_grid * target_grid, d)


def apply(params: Dict, images: jnp.ndarray, cfg: SiglipVisionConfig,
          pooled: bool = True, attn_impl: str = "xla") -> jnp.ndarray:
    """images: [B, H, W, C] normalized ((x-0.5)/0.5). Returns pooled [B, h] (get_image_features
    semantics) or token sequence [B, N, h]. Positional embeddings are bilinearly resized when
    the input grid differs from the checkpoint's.

    ``attn_impl``: "xla" (golden-pinned reference path) or "pallas" — the fused flash kernel.
    At the real 512^2 geometry the encoder runs 1024 tokens x 40 frames, past the measured
    ~1k-token point where XLA's HBM-materialized fp32 score tensors dominate
    (ops/attention.py PALLAS_FUSED_MIN_TOKENS); the MAP pooling head (1 query) stays XLA."""
    x = apply_dense(params["patch_embedding"], _patchify(images, cfg.patch_size))
    grid = images.shape[1] // cfg.patch_size
    pos = _resize_pos_embed(params["position_embedding"], grid)
    x = x + pos[None].astype(x.dtype)
    eps = cfg.layer_norm_eps
    nh = cfg.num_attention_heads
    for layer in params["layers"]:
        r = x
        xn = _ln(layer["ln1"], x, eps)
        attn = _mha(apply_dense(layer["q"], xn), apply_dense(layer["k"], xn),
                    apply_dense(layer["v"], xn), nh, impl=attn_impl)
        x = r + apply_dense(layer["out"], attn)
        r = x
        xn = _ln(layer["ln2"], x, eps)
        x = r + apply_dense(layer["fc2"], jax.nn.gelu(apply_dense(layer["fc1"], xn), approximate=True))
    x = _ln(params["post_layernorm"], x, eps)
    if not pooled:
        return x
    head = params["head"]
    b = x.shape[0]
    probe = jnp.broadcast_to(head["probe"].astype(x.dtype), (b,) + head["probe"].shape[1:])
    attn = _mha(apply_dense(head["q"], probe), apply_dense(head["k"], x),
                apply_dense(head["v"], x), nh)
    attn = apply_dense(head["out"], attn)
    hidden = _ln(head["ln"], attn, eps)
    out = attn + apply_dense(head["fc2"], jax.nn.gelu(apply_dense(head["fc1"], hidden), approximate=True))
    return out[:, 0]


# ---------------------------------------------------------------------------------
# Frame preprocessing + encode (reference nodes.py:184-196, feature_utils.py:64-78)
# ---------------------------------------------------------------------------------

def preprocess_frames(frames: np.ndarray, size: int = 512) -> np.ndarray:
    """[T, H, W, C] float [0,1] -> [T, size, size, C] normalized (x-0.5)/0.5.

    Bicubic+antialias resize via PIL (parity with torchvision v2 Resize(bicubic, antialias),
    which wraps the same PIL filter for uint8 inputs)."""
    from PIL import Image

    out = np.empty((frames.shape[0], size, size, frames.shape[-1]), np.float32)
    for i, f in enumerate(frames):
        img = Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
        img = img.resize((size, size), Image.BICUBIC)
        out[i] = np.asarray(img, np.float32) / 255.0
    return (out - 0.5) / 0.5


@_functools.partial(jax.jit, static_argnames=("size",))
def preprocess_frames_device(frames: jnp.ndarray, size: int = 512) -> jnp.ndarray:
    """Device-side analog of ``preprocess_frames`` (antialiased bicubic on the TPU).

    The whole frame batch resizes as ONE XLA program instead of a per-frame PIL loop —
    measured 34 s of host time for a 5 s clip on a 1-core host vs milliseconds on-device
    (tools/profile_v2a.py). Accepts uint8 (preferred: 4x cheaper transfer, and identical
    to PIL's quantization) or float [0,1]. The antialias kernel differs slightly from
    PIL's; bounded by the golden test."""
    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    t, _, _, c = frames.shape
    x = jax.image.resize(frames, (t, size, size, c), method="bicubic")
    return (jnp.clip(x, 0.0, 1.0) - 0.5) / 0.5


class Siglip2Encoder:
    def __init__(self, params: Dict, cfg: SiglipVisionConfig, preprocess: str = "pil",
                 compute_dtype=jnp.float32, attn_impl: str = "auto"):
        self.params = params
        self.cfg = cfg
        self.preprocess = preprocess  # "pil" (reference parity) | "device" (TPU resize)
        # Activation dtype for the ViT (ops cast weights TO activations, so fp32 pixels
        # mean fp32 compute regardless of weight storage). fp32 default = golden-test
        # parity; bf16 runs the MXU fast path (the reference itself runs fp16 on GPU,
        # nodes.py dtype selection) — measured in tools/profile_v2a.py --encoder_dtype.
        self.compute_dtype = compute_dtype
        # "auto": flash kernel once the token count crosses the measured ~1k threshold
        # (512^2 / patch 16 = 1024 tokens) on TPU; "xla" elsewhere (CPU tests, tiny grids).
        if attn_impl == "auto":
            from foley_tpu.ops.attention import resolve_attn_impl

            tokens = (cfg.image_size // cfg.patch_size) ** 2
            attn_impl = "pallas" if resolve_attn_impl("auto", tokens) != "xla" else "xla"
        self.attn_impl = attn_impl
        self._apply = jax.jit(apply, static_argnames=("cfg", "pooled", "attn_impl"))

    def encode(self, frames: np.ndarray) -> jnp.ndarray:
        """[T, H, W, C] float [0,1] frames -> [1, T, hidden] sequence of pooled features."""
        if self.preprocess == "device":
            from foley_tpu.io.images import box_downsample_u8

            # ship only the pixels the device resize can use: sources >2x the encoder
            # resolution box-downsample host-side first (k^2 fewer h2d bytes; the k x k
            # mean is the antialias prefilter the downscaling bicubic applies anyway)
            u8 = box_downsample_u8(frames_to_u8(np.asarray(frames)), self.cfg.image_size)
            pixels = preprocess_frames_device(jnp.asarray(u8), self.cfg.image_size)
        else:
            pixels = jnp.asarray(preprocess_frames(frames, self.cfg.image_size))
        feats = self._apply(self.params, pixels.astype(self.compute_dtype), self.cfg,
                            pooled=True, attn_impl=self.attn_impl)  # [T, h]
        return feats[None].astype(jnp.float32)


def encode_frames(encoder: Siglip2Encoder, frames: np.ndarray) -> jnp.ndarray:
    return encoder.encode(frames)


def _infer_config(sd, prefix: str, model_path: str) -> SiglipVisionConfig:
    """Derive the vision config from checkpoint shapes (+ colocated HF config.json).

    Hidden/intermediate/layers/patch/image size are shape-derivable; head count is not —
    config.json wins when present, else head_dim-64 (the siglip2-base family default).
    """
    import json
    import math
    import os

    pe = sd[prefix + "embeddings.patch_embedding.weight"]
    hidden = pe.shape[0]
    if pe.ndim == 4:  # conv2d [h, C, P, P]
        channels, patch = pe.shape[1], pe.shape[2]
    else:  # naflex linear [h, P*P*C]
        channels, patch = 3, int(math.isqrt(pe.shape[1] // 3))
    n_pos = sd[prefix + "embeddings.position_embedding.weight"].shape[0]
    image_size = int(math.isqrt(n_pos)) * patch
    inter = sd[prefix + "encoder.layers.0.mlp.fc1.weight"].shape[0]
    n_layers = 1 + max(
        int(k[len(prefix + "encoder.layers."):].split(".")[0])
        for k in sd
        if k.startswith(prefix + "encoder.layers.")
    )
    heads = max(1, hidden // 64)
    eps = 1e-6
    cfg_json = os.path.join(model_path, "config.json") if os.path.isdir(model_path) else None
    if cfg_json and os.path.exists(cfg_json):
        raw = json.load(open(cfg_json))
        raw = raw.get("vision_config", raw)
        heads = int(raw.get("num_attention_heads", heads))
        eps = float(raw.get("layer_norm_eps", eps))
    return SiglipVisionConfig(
        hidden_size=int(hidden), intermediate_size=int(inter), num_hidden_layers=int(n_layers),
        num_attention_heads=heads, image_size=int(image_size), patch_size=int(patch),
        num_channels=int(channels), layer_norm_eps=eps,
    )


def load(model_path: str, cfg: Optional[SiglipVisionConfig] = None) -> Siglip2Encoder:
    from foley_tpu.io.convert import load_torch_state_dict

    sd = load_torch_state_dict(model_path)
    prefix = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    cfg = cfg or _infer_config(sd, prefix, model_path)
    return Siglip2Encoder(convert_hf_state_dict(sd, cfg, prefix=prefix), cfg)
