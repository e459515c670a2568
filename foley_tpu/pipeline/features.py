"""Feature preparation: CFG stacking, text shape-bucketing, T2A empty sequences, frame
resampling.

Contracts preserved from the reference:
- CFG ordering: uncond (negative prompt) first, cond second (``utils.py:190-199``,
  ``feature_utils.py:145-149``);
- two-bucket text padding: 77 tokens normally, 128 when the prompt exceeds 77, sticky-max per
  session (``utils.py:164-188``) — this doubles as the jit shape-bucketing policy;
- T2A uses the model's *learned* empty clip/sync sequences with lengths derived from the
  duration: clip = duration*8, sync segments = (duration*25 - 16)//8 + 1 (``nodes.py:322-338``);
- V2A frame prep: pad short inputs by repeating the last frame, resample to 8 fps and 25 fps
  with ``linspace`` indices (``nodes.py:294-317``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from foley_tpu.configs import PipelineConfig
from foley_tpu.models import mmdit
from foley_tpu.ops.interp import linspace_resample_indices
from foley_tpu.sampling.denoise import DenoiseFeatures

TEXT_BUCKETS = (77, 128)


def pad_or_trim_time(x: jnp.ndarray, t_fixed: int) -> jnp.ndarray:
    """[B, T, D] -> [B, t_fixed, D]: right-pad with zeros or trim (``utils.py:104-111``)."""
    t_cur = x.shape[1]
    if t_cur == t_fixed:
        return x
    if t_cur > t_fixed:
        return x[:, :t_fixed]
    return jnp.pad(x, ((0, 0), (0, t_fixed - t_cur), (0, 0)))


def pick_text_bucket(token_len: int, cap: Optional[int] = None, sticky: Optional[int] = None) -> int:
    """Two-bucket policy with sticky-max upgrade (``utils.py:169-183``)."""
    bucket = TEXT_BUCKETS[0] if token_len <= TEXT_BUCKETS[0] else TEXT_BUCKETS[1]
    if cap is not None:
        bucket = min(bucket, cap)
    if sticky is not None:
        bucket = max(bucket, sticky)
    return bucket


def t2a_features(
    mmdit_params: Dict,
    pipeline_cfg: PipelineConfig,
    duration_s: float,
    batch_size: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Text-to-audio visual placeholders: the learned empty clip/sync sequences."""
    clip_len, sync_len = pipeline_cfg.t2a_lengths(duration_s)
    clip = mmdit.get_empty_clip_sequence(mmdit_params, batch_size, clip_len)
    sync = mmdit.get_empty_sync_sequence(mmdit_params, batch_size, sync_len)
    return clip, sync


def prepare_cfg_features(
    mmdit_params: Dict,
    text_feat: jnp.ndarray,          # [1, L, D] positive prompt features
    uncond_text_feat: jnp.ndarray,   # [1, L, D] negative prompt features
    clip_feat: jnp.ndarray,          # [1, L_clip, D]
    sync_feat: jnp.ndarray,          # [1, S*8, D]
    batch_size: int,
    use_cfg: bool = True,
    text_bucket: Optional[int] = None,
) -> DenoiseFeatures:
    """Repeat to batch, pad text to its bucket, and stack [uncond; cond] (``utils.py:159-199``).

    The CFG-uncond visual features are the model's learned empty sequences at the *same
    lengths* as the conditional features (``utils.py:190-191``).
    """
    if text_bucket is None:
        text_bucket = pick_text_bucket(int(text_feat.shape[1]))

    text = pad_or_trim_time(jnp.repeat(text_feat, batch_size, axis=0), text_bucket)
    uncond_text = pad_or_trim_time(jnp.repeat(uncond_text_feat, batch_size, axis=0), text_bucket)
    clip = jnp.repeat(clip_feat, batch_size, axis=0)
    sync = jnp.repeat(sync_feat, batch_size, axis=0)

    if not use_cfg:
        return DenoiseFeatures(cond=text, clip_feat=clip, sync_feat=sync)

    empty_clip = mmdit.get_empty_clip_sequence(mmdit_params, batch_size, clip.shape[1]).astype(clip.dtype)
    empty_sync = mmdit.get_empty_sync_sequence(mmdit_params, batch_size, sync.shape[1]).astype(sync.dtype)
    return DenoiseFeatures(
        cond=jnp.concatenate([uncond_text, text], axis=0),
        clip_feat=jnp.concatenate([empty_clip, clip], axis=0),
        sync_feat=jnp.concatenate([empty_sync, sync], axis=0),
    )


def apply_drop_visual(
    mmdit_params: Dict,
    clip_feat: jnp.ndarray,
    sync_feat: jnp.ndarray,
    drop_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Replace per-example visual features with the learned empty sequences where
    ``drop_mask`` is True (reference ``hifi_foley.py:739-741`` ``drop_visual`` — the
    structural CFG-uncond mechanism; the sampler instead passes explicit empty sequences)."""
    b = clip_feat.shape[0]
    empty_clip = mmdit.get_empty_clip_sequence(mmdit_params, b, clip_feat.shape[1]).astype(clip_feat.dtype)
    empty_sync = mmdit.get_empty_sync_sequence(mmdit_params, b, sync_feat.shape[1]).astype(sync_feat.dtype)
    m = drop_mask.reshape(b, 1, 1)
    return (
        jnp.where(m, empty_clip, clip_feat),
        jnp.where(m, empty_sync, sync_feat),
    )


def resample_frames(
    frames: np.ndarray,
    source_fps: float,
    duration_s: float,
    target_fps: int,
) -> np.ndarray:
    """Resample [T, H, W, C] frames to target fps over ``duration_s`` (``nodes.py:294-317``).

    Short inputs are padded by repeating the last frame.
    """
    needed_src = int(round(duration_s * source_fps))
    if frames.shape[0] < needed_src:
        pad = np.repeat(frames[-1:], needed_src - frames.shape[0], axis=0)
        frames = np.concatenate([frames, pad], axis=0)
    else:
        frames = frames[:needed_src]
    n_target = int(duration_s * target_fps)
    idx = np.asarray(linspace_resample_indices(frames.shape[0], n_target))
    return frames[idx]


def sync_segments(frames_25fps: np.ndarray, segment_size: int = 16, stride: int = 8) -> np.ndarray:
    """Window 25-fps frames into [S, 16, ...] segments, stride 8 (``feature_utils.py:91-97``)."""
    t = frames_25fps.shape[0]
    num = max((t - segment_size) // stride + 1, 1)
    if t < segment_size:
        pad = np.repeat(frames_25fps[-1:], segment_size - t, axis=0)
        frames_25fps = np.concatenate([frames_25fps, pad], axis=0)
    return np.stack(
        [frames_25fps[i * stride : i * stride + segment_size] for i in range(num)], axis=0
    )
