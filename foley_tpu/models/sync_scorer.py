"""AV synchronization scorer — Synchformer's GlobalTransformer head, JAX port.

Capability parity with the reference's vendored sync-scoring stack (``synchformer.py:54-68,
115-256``, ``compute_desync_score.py``): project video features (MotionFormer) and audio
features (AST) to a shared 768-d space, concatenate ``[OFF, v..., MOD, a...]`` with a learned
198-position embedding, run a 3-layer GPT-style transformer, and read a 21-class temporal
offset (desync) prediction off the OFF token (+/-2 s grid, ``make_class_grid``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.ops.nn import apply_dense
from foley_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class SyncScorerConfig:
    n_embd: int = 768
    n_layer: int = 3
    n_head: int = 8
    pos_max_len: int = 198
    n_offset_classes: int = 21

    @classmethod
    def tiny(cls) -> "SyncScorerConfig":
        return cls(n_embd=16, n_layer=1, n_head=2, pos_max_len=20, n_offset_classes=5)


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: SyncScorerConfig,
                       prefix: str = "") -> Dict:
    """Synchformer checkpoint (vproj/aproj/transformer.* keys) -> pytree."""

    def lin(name):
        return {"w": jnp.asarray(np.ascontiguousarray(sd[prefix + name + ".weight"].T)),
                "b": jnp.asarray(sd[prefix + name + ".bias"])}

    def ln(name):
        return {"weight": jnp.asarray(sd[prefix + name + ".weight"]),
                "bias": jnp.asarray(sd[prefix + name + ".bias"])}

    t = "transformer."
    params: Dict = {
        "vproj": lin("vproj"),
        "aproj": lin("aproj"),
        "vis_in_lnorm": ln(t + "vis_in_lnorm"),
        "aud_in_lnorm": ln(t + "aud_in_lnorm"),
        "off_tok": jnp.asarray(sd[t + "OFF_tok"]),
        "mod_tok": jnp.asarray(sd[t + "MOD_tok"]),
        "pos_emb": jnp.asarray(sd[t + "pos_emb_cfg.pos_emb"]),
        "ln_f": ln(t + "ln_f"),
        "off_head": lin(t + "off_head"),
        "blocks": [],
    }
    for i in range(cfg.n_layer):
        b = f"{t}blocks.{i}."
        params["blocks"].append({
            "ln1": ln(b + "ln1"),
            "q": lin(b + "attn.query"),
            "k": lin(b + "attn.key"),
            "v": lin(b + "attn.value"),
            "proj": lin(b + "attn.proj"),
            "ln2": ln(b + "ln2"),
            "fc1": lin(b + "mlp.0"),
            "fc2": lin(b + "mlp.2"),
        })
    return params


def init(key, cfg: SyncScorerConfig, dtype=jnp.float32) -> Dict:
    d = cfg.n_embd
    keys = iter(jax.random.split(key, 16 + 8 * cfg.n_layer))

    def lin(i, o):
        return {"w": 0.02 * jax.random.normal(next(keys), (i, o), dtype), "b": jnp.zeros((o,), dtype)}

    def ln():
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    params: Dict = {
        "vproj": lin(d, d),
        "aproj": lin(d, d),
        "vis_in_lnorm": ln(),
        "aud_in_lnorm": ln(),
        "off_tok": jax.random.normal(next(keys), (1, 1, d), dtype),
        "mod_tok": jax.random.normal(next(keys), (1, 1, d), dtype),
        "pos_emb": jax.random.normal(next(keys), (1, cfg.pos_max_len, d), dtype),
        "ln_f": ln(),
        "off_head": lin(d, cfg.n_offset_classes),
        "blocks": [{
            "ln1": ln(), "q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "proj": lin(d, d),
            "ln2": ln(), "fc1": lin(d, 4 * d), "fc2": lin(4 * d, d),
        } for _ in range(cfg.n_layer)],
    }
    return params


def _ln(p, x):
    return layer_norm(x, p["weight"], p["bias"], eps=1e-5)  # torch LayerNorm default eps


def _block(p, x, nh):
    """GPT-style block (reference synchformer.py:238-256): x += attn(ln1(x)); x += mlp(ln2(x))."""
    b, l, dm = x.shape
    hd = dm // nh
    xn = _ln(p["ln1"], x)
    q = apply_dense(p["q"], xn).reshape(b, l, nh, hd)
    k = apply_dense(p["k"], xn).reshape(b, l, nh, hd)
    v = apply_dense(p["v"], xn).reshape(b, l, nh, hd)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
                        precision=prec) / (hd ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=prec).reshape(b, l, dm)
    x = x + apply_dense(p["proj"], attn)
    xn = _ln(p["ln2"], x)
    x = x + apply_dense(p["fc2"], jax.nn.gelu(apply_dense(p["fc1"], xn), approximate=False))
    return x


def compare_v_a(params: Dict, vis: jnp.ndarray, aud: jnp.ndarray, cfg: SyncScorerConfig) -> jnp.ndarray:
    """vis [B, S, tv, D], aud [B, S, ta, D] -> offset logits [B, n_offset_classes]
    (reference ``Synchformer.compare_v_a`` + ``GlobalTransformer.forward``)."""
    b = vis.shape[0]
    vis = apply_dense(params["vproj"], vis).reshape(b, -1, cfg.n_embd)
    aud = apply_dense(params["aproj"], aud).reshape(b, -1, cfg.n_embd)
    vis = _ln(params["vis_in_lnorm"], vis)
    aud = _ln(params["aud_in_lnorm"], aud)
    off = jnp.broadcast_to(params["off_tok"].astype(vis.dtype), (b, 1, cfg.n_embd))
    mod = jnp.broadcast_to(params["mod_tok"].astype(vis.dtype), (b, 1, cfg.n_embd))
    x = jnp.concatenate([off, vis, mod, aud], axis=1)
    seq = x.shape[1]
    assert seq <= params["pos_emb"].shape[1], (seq, params["pos_emb"].shape)
    x = x + params["pos_emb"][:, :seq].astype(x.dtype)
    for blk in params["blocks"]:
        x = _block(blk, x, cfg.n_head)
    x = _ln(params["ln_f"], x)
    return apply_dense(params["off_head"], x[:, 0])


def make_class_grid(
    leftmost: float = -2.0,
    rightmost: float = 2.0,
    grid_size: int = 21,
    add_extreme_offset: bool = False,
    seg_size_vframes: Optional[int] = None,
    nseg: Optional[int] = None,
    step_size_seg: Optional[float] = None,
    vfps: Optional[float] = None,
) -> np.ndarray:
    """Offset class grid in seconds (reference ``data_transforms.py:226-244``; same math in
    ``synchformer.py:259-277``). ``add_extreme_offset`` appends the out-of-range class used
    by syncability training: the trimmed segment-sequence duration in seconds."""
    assert grid_size >= 3, grid_size
    grid = np.linspace(leftmost, rightmost, grid_size).astype(np.float32)
    if add_extreme_offset:
        assert all([seg_size_vframes, nseg, step_size_seg]), (seg_size_vframes, nseg, step_size_seg)
        seg_size_sec = seg_size_vframes / vfps
        trim_size_in_seg = nseg - (1 - step_size_seg) * (nseg - 1)
        grid = np.concatenate([grid, np.array([trim_size_in_seg * seg_size_sec], np.float32)])
    return grid


def quantize_offset(grid: np.ndarray, off_sec: float) -> Tuple[float, int]:
    """Snap an offset in seconds onto the closest grid class (reference
    ``data_transforms.py:247-251``): returns (grid value, class index), first-minimum ties."""
    idx = int(np.abs(np.asarray(grid) - off_sec).argmin())
    return float(grid[idx]), idx


def predicted_offset_seconds(logits: jnp.ndarray, grid: Optional[np.ndarray] = None) -> np.ndarray:
    """argmax logits -> offset in seconds (the desync score, ``compute_desync_score.py``)."""
    grid = grid if grid is not None else make_class_grid()
    return grid[np.asarray(jnp.argmax(logits, axis=-1))]


class DesyncScorer:
    """Full AV-sync scoring pipeline (the reference's ``compute_desync_score.py`` capability):
    25 fps video segments -> MotionFormer features; 16 kHz audio -> mel/AST features;
    GlobalTransformer -> 21-class offset prediction in seconds."""

    def __init__(self, video_encoder, ast_params: Dict, freq_agg_params: Dict,
                 ast_cfg, scorer_params: Dict, scorer_cfg: SyncScorerConfig):
        self.video_encoder = video_encoder    # synchformer.SynchformerEncoder
        self.ast_params = ast_params
        self.freq_agg_params = freq_agg_params
        self.ast_cfg = ast_cfg
        self.scorer_params = scorer_params
        self.scorer_cfg = scorer_cfg

    def score(self, frames_25fps: np.ndarray, waveform_16k: np.ndarray) -> np.ndarray:
        """frames [T, H, W, C] float [0,1] @ 25 fps; waveform [T16k] -> offset seconds [1]."""
        from foley_tpu.models import ast as ast_mod
        from foley_tpu.models import synchformer as sync_mod
        from foley_tpu.ops.audio_dsp import segment_audio, sync_audio_spectrogram
        from foley_tpu.pipeline.features import sync_segments

        vis_feats = sync_mod.encode_segments(
            self.video_encoder, sync_segments(frames_25fps)
        )  # [1, S*8, D]
        s = vis_feats.shape[1] // self.video_encoder.cfg.out_features_per_segment
        vis = vis_feats.reshape(1, s, -1, vis_feats.shape[-1])

        segs = segment_audio(jnp.asarray(waveform_16k, jnp.float32)[None])  # [1, Sa, 10240]
        spec = sync_audio_spectrogram(segs)                    # [1, Sa, 128, 66]
        sa = spec.shape[1]
        spec_tf = jnp.swapaxes(spec.reshape(sa, *spec.shape[2:]), 1, 2)  # [Sa, 66, 128]
        aud = ast_mod.extract_features(self.ast_params, self.freq_agg_params, spec_tf, self.ast_cfg)
        aud = aud.reshape(1, sa, -1, aud.shape[-1])

        logits = compare_v_a(self.scorer_params, vis, aud, self.scorer_cfg)
        return predicted_offset_seconds(logits)


def load_desync_scorer(model_path: str) -> DesyncScorer:
    """Load the full Synchformer checkpoint (vfeat_extractor + afeat_extractor + transformer)."""
    from foley_tpu.configs import SynchformerConfig
    from foley_tpu.io.convert import load_torch_state_dict
    from foley_tpu.models import ast as ast_mod
    from foley_tpu.models import synchformer as sync_mod

    sd = load_torch_state_dict(model_path)
    video_cfg = SynchformerConfig()
    video_encoder = sync_mod.SynchformerEncoder(
        sync_mod.convert_state_dict(sd, video_cfg, prefix="vfeat_extractor."), video_cfg
    )
    ast_cfg = ast_mod.ASTConfig()
    ast_params = ast_mod.convert_hf_state_dict(sd, ast_cfg, prefix="afeat_extractor.ast.")
    freq_agg = sync_mod.convert_torch_encoder_layer(
        sd, "afeat_extractor.freq_attn_agg.", ast_cfg.hidden_size
    )
    scorer_cfg = SyncScorerConfig()
    scorer_params = convert_state_dict(sd, scorer_cfg)
    return DesyncScorer(video_encoder, ast_params, freq_agg, ast_cfg, scorer_params, scorer_cfg)
