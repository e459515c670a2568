"""Synchformer video feature extractor (MotionFormer divided space-time ViT) — JAX port.

Role in the pipeline: audio-visual sync features at 25 fps. Input: 16-frame 224x224 segments
with stride 8; output (8, 768) per segment, flattened to [B, S*8, 768]
(reference ``synchformer.py:46-52``, ``feature_utils.py:81-107``). Only the video half runs at
inference; the AST audio branch / GlobalTransformer sync-scorer weights are vendored
capabilities in the reference (SURVEY.md §2.6) and are ignored by the converter here.

Architecture (reference ``vit_helper.py``, ``video_model_builder.py``, ``motionformer.py``;
config ``divided_224_16x4.yaml``: ViT-B/16, depth 12, heads 12, temporal patch 2):
- Conv3d patch embedding (2, 16, 16) -> 8 x 14 x 14 tokens per segment + CLS;
- separate positional embeddings: spatial (196+CLS) tiled over time + temporal (8)
  repeat-interleaved over space (``video_model_builder.py:220-227``);
- 12 x DividedSpaceTimeBlock: time-attention (norm3) -> space-attention (norm1) -> MLP
  (norm2), each DividedAttention treating CLS specially: CLS attends globally; patch tokens
  attend within their time/space group with CLS k/v prepended (``vit_helper.py:56-114``);
- drop CLS, final LayerNorm, restore (t, h, w), then a SpatialTransformerEncoderLayer
  (pre-LN torch TransformerEncoderLayer with a CLS probe) pools each frame -> (8, 768)
  (``motionformer.py:219-235, 341-366``).

TPU-first: divided attention is expressed as batched reshapes + one fused SDPA per axis (the
group dimension folds into the batch), all segments and frames processed as one MXU batch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.configs import SynchformerConfig
from foley_tpu.io.images import frames_to_u8
from foley_tpu.ops.nn import apply_dense
from foley_tpu.ops.norms import layer_norm

EPS = 1e-6


# ---------------------------------------------------------------------------------
# Convert
# ---------------------------------------------------------------------------------

def convert_state_dict(sd: Dict[str, np.ndarray], cfg: SynchformerConfig,
                       prefix: str = "vfeat_extractor.") -> Dict:
    """Synchformer checkpoint (vfeat_extractor.* keys) -> pytree. Audio-branch keys ignored."""

    def lin(name):
        p = {"w": jnp.asarray(np.ascontiguousarray(sd[prefix + name + ".weight"].T))}
        if prefix + name + ".bias" in sd:
            p["b"] = jnp.asarray(sd[prefix + name + ".bias"])
        return p

    def ln(name):
        return {"weight": jnp.asarray(sd[prefix + name + ".weight"]),
                "bias": jnp.asarray(sd[prefix + name + ".bias"])}

    # Conv3d [D, C, kt, kh, kw] -> flattened dense [C*kt*kh*kw, D] (torch flatten order)
    w3 = sd[prefix + "patch_embed_3d.proj.weight"]
    d = w3.shape[0]
    params: Dict = {
        "patch_embed": {"w": jnp.asarray(np.ascontiguousarray(w3.reshape(d, -1).T)),
                        "b": jnp.asarray(sd[prefix + "patch_embed_3d.proj.bias"])},
        "cls_token": jnp.asarray(sd[prefix + "cls_token"]),
        "pos_embed": jnp.asarray(sd[prefix + "pos_embed"]),
        "temp_embed": jnp.asarray(sd[prefix + "temp_embed"]),
        "norm": ln("norm"),
        "blocks": [],
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        params["blocks"].append({
            "norm1": ln(b + "norm1"),
            "attn_qkv": lin(b + "attn.qkv"),
            "attn_proj": lin(b + "attn.proj"),
            "norm3": ln(b + "norm3"),
            "time_qkv": lin(b + "timeattn.qkv"),
            "time_proj": lin(b + "timeattn.proj"),
            "norm2": ln(b + "norm2"),
            "fc1": lin(b + "mlp.fc1"),
            "fc2": lin(b + "mlp.fc2"),
        })
    # SpatialTransformerEncoderLayer (torch nn.TransformerEncoderLayer, norm_first=True)
    params["spatial_agg"] = convert_torch_encoder_layer(sd, prefix + "spatial_attn_agg.", cfg.embed_dim)
    return params


def convert_torch_encoder_layer(sd: Dict[str, np.ndarray], prefix: str, dim: int) -> Dict:
    """Convert a torch ``nn.TransformerEncoderLayer`` (+ CLS probe) to the ``_spatial_agg``
    param layout. Shared by MotionFormer's spatial pooling and AST's frequency pooling
    (reference ``motionformer.py:258-366``, ``ast_model.py:263-289``)."""
    in_w = sd[prefix + "self_attn.in_proj_weight"]
    in_b = sd[prefix + "self_attn.in_proj_bias"]

    def lin(name):
        return {"w": jnp.asarray(np.ascontiguousarray(sd[prefix + name + ".weight"].T)),
                "b": jnp.asarray(sd[prefix + name + ".bias"])}

    def ln(name):
        return {"weight": jnp.asarray(sd[prefix + name + ".weight"]),
                "bias": jnp.asarray(sd[prefix + name + ".bias"])}

    return {
        "cls_token": jnp.asarray(sd[prefix + "cls_token"]),
        "q": {"w": jnp.asarray(np.ascontiguousarray(in_w[:dim].T)), "b": jnp.asarray(in_b[:dim])},
        "k": {"w": jnp.asarray(np.ascontiguousarray(in_w[dim:2 * dim].T)), "b": jnp.asarray(in_b[dim:2 * dim])},
        "v": {"w": jnp.asarray(np.ascontiguousarray(in_w[2 * dim:].T)), "b": jnp.asarray(in_b[2 * dim:])},
        "out": lin("self_attn.out_proj"),
        "linear1": lin("linear1"),
        "linear2": lin("linear2"),
        "norm1": ln("norm1"),
        "norm2": ln("norm2"),
    }


# ---------------------------------------------------------------------------------
# Random init (tests)
# ---------------------------------------------------------------------------------

def init(key, cfg: SynchformerConfig, dtype=jnp.float32) -> Dict:
    d = cfg.embed_dim
    n_sp = cfg.patches_per_frame
    keys = iter(jax.random.split(key, 16 + 8 * cfg.depth))

    def lin(kin, kout, bias=True):
        k = next(keys)
        p = {"w": 0.02 * jax.random.normal(k, (kin, kout), dtype)}
        if bias:
            p["b"] = jnp.zeros((kout,), dtype)
        return p

    def ln():
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    patch_in = 3 * cfg.temporal_patch_size * cfg.patch_size * cfg.patch_size
    params: Dict = {
        "patch_embed": lin(patch_in, d),
        "cls_token": 0.02 * jax.random.normal(next(keys), (1, 1, d), dtype),
        "pos_embed": 0.02 * jax.random.normal(next(keys), (1, n_sp + 1, d), dtype),
        "temp_embed": jnp.zeros((1, cfg.temporal_resolution, d), dtype),
        "norm": ln(),
        "blocks": [],
        "spatial_agg": {
            "cls_token": 0.02 * jax.random.normal(next(keys), (1, 1, d), dtype),
            "q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "out": lin(d, d),
            "linear1": lin(d, int(d * cfg.mlp_ratio)), "linear2": lin(int(d * cfg.mlp_ratio), d),
            "norm1": ln(), "norm2": ln(),
        },
    }
    for _ in range(cfg.depth):
        params["blocks"].append({
            "norm1": ln(), "attn_qkv": lin(d, 3 * d), "attn_proj": lin(d, d),
            "norm3": ln(), "time_qkv": lin(d, 3 * d), "time_proj": lin(d, d),
            "norm2": ln(), "fc1": lin(d, int(d * cfg.mlp_ratio)),
            "fc2": lin(int(d * cfg.mlp_ratio), d),
        })
    return params


def init_random(seed: int, feat_dim: int = 768) -> "SynchformerEncoder":
    """Random-weight encoder for checkpoint-free smoke runs (CLI ``--random_init`` V2A).

    ``feat_dim`` must match the MMDiT's ``sync_feat_dim``; 768 selects the real
    divided_224_16x4 geometry, anything else a tiny 2-layer stand-in. ``num_frames`` stays 16
    either way — the pipeline's segmentation (16-frame windows, stride 8) and the MMDiT's
    8-token sync grouping depend on it."""
    cfg = SynchformerConfig() if feat_dim == 768 else SynchformerConfig(
        img_size=32, patch_size=8, temporal_patch_size=2, num_frames=16,
        embed_dim=feat_dim, depth=2, num_heads=2, mlp_ratio=2.0,
    )
    return SynchformerEncoder(init(jax.random.PRNGKey(seed), cfg), cfg)


# ---------------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------------

def _ln(p, x):
    return layer_norm(x, p["weight"], p["bias"], eps=EPS)


def _sdpa(q, k, v, nh, bias: Optional[jnp.ndarray] = None):
    """[B, L, D] heads-folded SDPA (fp32 softmax); ``bias`` [B, 1, 1, Lk] adds to logits."""
    b, lq, dm = q.shape
    hd = dm // nh
    q = q.reshape(b, lq, nh, hd)
    k = k.reshape(b, k.shape[1], nh, hd)
    v = v.reshape(b, v.shape[1], nh, hd)
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
                        precision=prec) / (hd ** 0.5)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=prec).reshape(b, lq, dm)


def _divided_attention(p_qkv, p_proj, x, group: str, f: int, n: int, nh: int):
    """DividedAttention (reference vit_helper.py:56-114).

    x: [B, 1+f*n, D]. group='time' attends across frames within each spatial position;
    group='space' attends across spatial positions within each frame. CLS attends globally;
    each group additionally attends to the CLS key/value.
    """
    b, _, dm = x.shape
    qkv = apply_dense(p_qkv, x)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    cls_q, q_ = q[:, :1], q[:, 1:]
    cls_k, k_ = k[:, :1], k[:, 1:]
    cls_v, v_ = v[:, :1], v[:, 1:]

    # CLS token: full attention over all 1+f*n tokens
    cls_out = _sdpa(cls_q, k, v, nh)  # [B, 1, D]

    def regroup(t):
        t = t.reshape(b, f, n, dm)
        if group == "time":
            t = jnp.swapaxes(t, 1, 2).reshape(b * n, f, dm)   # (b n) f d
        else:
            t = t.reshape(b * f, n, dm)                        # (b f) n d
        return t

    qg, kg, vg = regroup(q_), regroup(k_), regroup(v_)
    r = qg.shape[0] // b
    cls_kg = jnp.repeat(cls_k, r, axis=0)
    cls_vg = jnp.repeat(cls_v, r, axis=0)
    out = _sdpa(qg, jnp.concatenate([cls_kg, kg], axis=1),
                jnp.concatenate([cls_vg, vg], axis=1), nh)

    if group == "time":
        out = out.reshape(b, n, f, dm).swapaxes(1, 2).reshape(b, f * n, dm)
    else:
        out = out.reshape(b, f * n, dm)
    out = jnp.concatenate([cls_out, out], axis=1)
    return apply_dense(p_proj, out)


def _block(p, x, f: int, n: int, nh: int):
    """DividedSpaceTimeBlock (reference vit_helper.py:117-167): time -> space -> MLP."""
    x = x + _divided_attention(p["time_qkv"], p["time_proj"], _ln(p["norm3"], x), "time", f, n, nh)
    x = x + _divided_attention(p["attn_qkv"], p["attn_proj"], _ln(p["norm1"], x), "space", f, n, nh)
    x = x + apply_dense(p["fc2"], jax.nn.gelu(apply_dense(p["fc1"], _ln(p["norm2"], x)), approximate=False))
    return x


def _spatial_agg(p, x, nh: int, key_mask: Optional[jnp.ndarray] = None):
    """SpatialTransformerEncoderLayer: prepend CLS, pre-LN torch encoder layer, return CLS.

    x: [B', N, D] -> [B', D] (reference motionformer.py:258-366). ``key_mask`` [B', N]
    (True = keep) masks attention *keys* — the reference expands its keep-mask to a
    key-dim src_mask (``motionformer.py:297-308``); the CLS key is always kept."""
    b = x.shape[0]
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype), (b,) + p["cls_token"].shape[1:])
    x = jnp.concatenate([cls, x], axis=1)
    bias = None
    if key_mask is not None:
        keep = jnp.concatenate([jnp.ones((b, 1), bool), key_mask], axis=1)  # CLS kept
        bias = jnp.where(keep[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
    xn = _ln(p["norm1"], x)
    attn = _sdpa(apply_dense(p["q"], xn), apply_dense(p["k"], xn), apply_dense(p["v"], xn), nh,
                 bias=bias)
    x = x + apply_dense(p["out"], attn)
    xn = _ln(p["norm2"], x)
    x = x + apply_dense(p["linear2"], jax.nn.gelu(apply_dense(p["linear1"], xn), approximate=False))
    return x[:, 0]


def _patchify_3d(x: jnp.ndarray, pt: int, ps: int) -> jnp.ndarray:
    """[B, T, H, W, C] -> [B, (T/pt)*(H/ps)*(W/ps), C*pt*ps*ps] in torch Conv3d flatten order
    (features ordered (C, kt, kh, kw); tokens ordered (t, h, w))."""
    b, t, h, w, c = x.shape
    gt, gh, gw = t // pt, h // ps, w // ps
    x = x.reshape(b, gt, pt, gh, ps, gw, ps, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))  # [B, gt, gh, gw, C, pt, ph, pw]
    return x.reshape(b, gt * gh * gw, c * pt * ps * ps)


def apply(params: Dict, segments: jnp.ndarray, cfg: SynchformerConfig) -> jnp.ndarray:
    """segments: [B, S, T=16, H, W, C] normalized frames -> features [B, S, 8, D].

    (The reference takes [B, S, T, C, H, W]; channel-last here.)
    """
    b, s, t, h, w, c = segments.shape
    nh = cfg.num_heads
    f = cfg.temporal_resolution          # 8
    n = cfg.patches_per_frame            # 196

    x = segments.reshape(b * s, t, h, w, c)
    x = apply_dense(params["patch_embed"], _patchify_3d(x, cfg.temporal_patch_size, cfg.patch_size))

    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b * s, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)

    # separate pos embeddings (reference video_model_builder.py:220-227)
    pos = params["pos_embed"].astype(x.dtype)
    cls_pos = pos[:, :1]
    tile_pos = jnp.tile(pos[:, 1:], (1, f, 1))
    tile_temp = jnp.repeat(params["temp_embed"].astype(x.dtype), n, axis=1)
    x = x + jnp.concatenate([cls_pos, tile_pos + tile_temp], axis=1)

    for blk in params["blocks"]:
        x = _block(blk, x, f, n, nh)

    x = x[:, 1:]                          # drop CLS (motionformer.py:226)
    x = _ln(params["norm"], x)

    # restore (t, h, w) and pool space per frame
    x = x.reshape(b * s * f, n, x.shape[-1])
    x = _spatial_agg(params["spatial_agg"], x, nh)  # [B*S*f, D]
    return x.reshape(b, s, f, x.shape[-1])


# ---------------------------------------------------------------------------------
# Preprocessing + encode (reference nodes.py:190-196: resize 224 short side, center-crop,
# normalize mean=std=0.5; feature_utils.py:91-107 for segmentation/flattening)
# ---------------------------------------------------------------------------------

def preprocess_frames(frames: np.ndarray, size: int = 224) -> np.ndarray:
    """[T, H, W, C] float [0,1] -> [T, size, size, C], (x-0.5)/0.5."""
    from PIL import Image

    t = frames.shape[0]
    out = np.empty((t, size, size, frames.shape[-1]), np.float32)
    for i, f in enumerate(frames):
        img = Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
        wd, ht = img.size
        scale = size / min(wd, ht)
        img = img.resize((max(size, round(wd * scale)), max(size, round(ht * scale))), Image.BICUBIC)
        left = (img.size[0] - size) // 2
        top = (img.size[1] - size) // 2
        img = img.crop((left, top, left + size, top + size))
        out[i] = np.asarray(img, np.float32) / 255.0
    return (out - 0.5) / 0.5


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("size",))
def preprocess_frames_device(frames: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Device-side analog of ``preprocess_frames``: short-side antialiased-bicubic resize to
    ``size`` + center crop, as one XLA program over the whole frame batch (the PIL loop costs
    tens of host seconds per clip on a 1-core host — tools/profile_v2a.py). Accepts uint8
    (preferred: 4x cheaper transfer, identical to PIL's quantization) or float [0,1]."""
    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    t, h, w, c = frames.shape
    scale = size / min(w, h)
    nh, nw = max(size, round(h * scale)), max(size, round(w * scale))
    x = jax.image.resize(frames, (t, nh, nw, c), method="bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top:top + size, left:left + size, :]
    return (jnp.clip(x, 0.0, 1.0) - 0.5) / 0.5


def upload_frames_async(frames: np.ndarray, target_short_side: int = 224) -> jnp.ndarray:
    """Start the uint8 host->device frame transfer WITHOUT blocking on it.

    ``jax.device_put`` dispatches asynchronously: calling this before running another
    encoder lets the (tunnel-bottlenecked, 7-35 MB/s measured) frame upload stream while
    that encoder's compute occupies the chip. Pass the result to ``encode_frames_device``
    as ``preloaded_u8``. Frames more than 2x taller than ``target_short_side`` are
    box-downsampled host-side first (``io/images.py::box_downsample_u8``): the device
    resize can't use the extra pixels, and shipping them costs k^2 more transfer —
    1080p sources upload 16x fewer bytes."""
    u8 = frames_to_u8(np.asarray(frames))
    from foley_tpu.io.images import box_downsample_u8

    return jax.device_put(box_downsample_u8(u8, target_short_side))


def encode_frames_device(encoder: "SynchformerEncoder", frames_25fps: np.ndarray,
                         segment_size: int = 16, stride: int = 8,
                         preloaded_u8: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Device-side 25 fps pipeline: ship each UNIQUE frame once as uint8, then resize,
    window into overlapping 16-frame/stride-8 segments (a gather — the 50% overlap costs
    no transfer), and encode. vs ``sync_segments`` + ``encode_segments``, host->device
    bytes drop ~8x (float32 -> uint8, overlapping segments -> unique frames): the measured
    tunnel-transfer bottleneck (tools/profile_v2a.py).

    ``preloaded_u8``: frames already in flight from ``upload_frames_async`` (overlapping
    this transfer with the other visual encoder's compute)."""
    t = frames_25fps.shape[0]
    num = max((t - segment_size) // stride + 1, 1)
    if preloaded_u8 is not None:
        u8 = preloaded_u8
    else:
        from foley_tpu.io.images import box_downsample_u8

        # ship only the pixels the device resize can use (see upload_frames_async)
        u8 = jnp.asarray(box_downsample_u8(
            frames_to_u8(np.asarray(frames_25fps)), encoder.cfg.img_size))
    dev = preprocess_frames_device(u8, encoder.cfg.img_size)
    # window indices; short inputs repeat the last frame (sync_segments semantics)
    idx = np.arange(num)[:, None] * stride + np.arange(segment_size)[None, :]
    idx = np.minimum(idx, t - 1)
    segs = jnp.take(dev, jnp.asarray(idx.reshape(-1)), axis=0)
    segs = segs.reshape(num, segment_size, *dev.shape[1:])
    return encoder.encode(segs)


class SynchformerEncoder:
    def __init__(self, params: Dict, cfg: SynchformerConfig, preprocess: str = "pil",
                 compute_dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.preprocess = preprocess  # "pil" (reference parity) | "device" (TPU resize)
        # ViT activation dtype; fp32 default = golden parity, bf16 = MXU fast path
        # (see Siglip2Encoder.compute_dtype / tools/profile_v2a.py --encoder_dtype)
        self.compute_dtype = compute_dtype
        self._apply = jax.jit(apply, static_argnames=("cfg",))

    def encode(self, segments: np.ndarray) -> jnp.ndarray:
        """[S, 16, H, W, C] preprocessed segments -> [1, S*8, D] flattened features."""
        x = jnp.asarray(segments)[None].astype(self.compute_dtype)  # [1, S, 16, H, W, C]
        feats = self._apply(self.params, x, self.cfg)  # [1, S, 8, D]
        return feats.reshape(1, -1, feats.shape[-1]).astype(jnp.float32)


def encode_segments(encoder: SynchformerEncoder, segments: np.ndarray) -> jnp.ndarray:
    """Preprocess raw [S, 16, H, W, C] float [0,1] segments and encode."""
    s, t = segments.shape[:2]
    size = encoder.cfg.img_size
    if getattr(encoder, "preprocess", "pil") == "device":
        flat = preprocess_frames_device(
            jnp.asarray(frames_to_u8(np.asarray(segments)).reshape(s * t, *segments.shape[2:])),
            size)
        return encoder.encode(flat.reshape(s, t, size, size, flat.shape[-1]))
    flat = preprocess_frames(segments.reshape(s * t, *segments.shape[2:]), size)
    return encoder.encode(flat.reshape(s, t, *flat.shape[1:]))


def load(model_path: str, cfg: Optional[SynchformerConfig] = None) -> SynchformerEncoder:
    from foley_tpu.io.convert import load_torch_state_dict

    sd = load_torch_state_dict(model_path)
    cfg = cfg or SynchformerConfig()
    prefix = "vfeat_extractor." if any(k.startswith("vfeat_extractor.") for k in sd) else ""
    return SynchformerEncoder(convert_state_dict(sd, cfg, prefix=prefix), cfg)
