"""AV data transforms — the Synchformer train/eval pipeline equivalents.

Reference ``synchformer/data_transforms.py`` (~1.1k LoC of 25+ torch transform classes:
temporal crop + offset generation, 16-frame segment generation with 0.5 s step, mel + AST
normalization, color jitter, reverb/pitch/noise, letterbox resize). Inference-critical pieces
already live elsewhere (``synchformer.preprocess_frames``, ``ops/audio_dsp``); this module
provides the composable host-side (numpy) equivalents of the remaining train/eval transforms:
deterministic eval path (resize-crop-normalize, segmentation, offset grid targets) and the
representative training augmentations. Host-side by design — augmentation is data-loader
work; the TPU sees fixed-shape batches.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, item):
        for t in self.transforms:
            item = t(item)
        return item


# ---------------------------------------------------------------------------------
# Temporal transforms
# ---------------------------------------------------------------------------------

@dataclasses.dataclass
class TemporalCropAndOffset:
    """Crop a clip to ``crop_len_s`` and draw an AV offset from the class grid
    (reference EqualifyFromRight/TemporalCropAndOffsetRGB behavior family).

    Returns (frames, audio, offset_target_idx): audio is shifted by -offset relative to
    video, and the grid index is the classification target for the sync scorer.
    """

    crop_len_s: float = 5.0
    vfps: float = 25.0
    afps: int = 16000
    grid: Optional[np.ndarray] = None  # offset grid in seconds (default: ±2 s, 21 classes)
    rng: Optional[np.random.Generator] = None

    def __post_init__(self):
        if self.grid is None:
            from foley_tpu.models.sync_scorer import make_class_grid

            self.grid = make_class_grid()
        self.rng = self.rng or np.random.default_rng()

    def __call__(self, item: dict) -> dict:
        frames, audio = item["frames"], item["audio"]
        n_v = int(self.crop_len_s * self.vfps)
        n_a = int(self.crop_len_s * self.afps)
        offset_idx = int(self.rng.integers(0, len(self.grid)))
        offset_s = float(self.grid[offset_idx])

        max_v_start = max(frames.shape[0] - n_v, 0)
        v_start = int(self.rng.integers(0, max_v_start + 1))
        a_start = int(round((v_start / self.vfps + offset_s) * self.afps))
        a_start = int(np.clip(a_start, 0, max(audio.shape[-1] - n_a, 0)))

        out = dict(item)
        out["frames"] = _pad_take(frames, v_start, n_v, axis=0)
        out["audio"] = _pad_take(audio, a_start, n_a, axis=-1)
        out["offset_sec"] = offset_s
        out["offset_target"] = offset_idx
        return out


def _pad_take(x: np.ndarray, start: int, length: int, axis: int) -> np.ndarray:
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(start, start + length)
    out = x[tuple(sl)]
    if out.shape[axis] < length:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, length - out.shape[axis])
        out = np.pad(out, pad, mode="edge" if x.ndim > 1 else "constant")
    return out


@dataclasses.dataclass
class GenerateMultipleSegments:
    """16-frame video segments, stride 8 (0.32 s @ 25 fps) + aligned 0.64 s audio windows
    (reference GenerateMultipleSegments; inference variant in features.sync_segments)."""

    segment_size_vframes: int = 16
    stride_vframes: int = 8
    vfps: float = 25.0
    afps: int = 16000

    def __call__(self, item: dict) -> dict:
        from foley_tpu.pipeline.features import sync_segments

        out = dict(item)
        out["v_segments"] = sync_segments(item["frames"], self.segment_size_vframes, self.stride_vframes)
        if "audio" in item:
            a_seg = int(self.segment_size_vframes / self.vfps * self.afps)  # 10240
            a_stride = int(self.stride_vframes / self.vfps * self.afps)     # 5120
            audio = np.asarray(item["audio"]).reshape(-1)
            n = max((audio.shape[0] - a_seg) // a_stride + 1, 1)
            if audio.shape[0] < a_seg:
                audio = np.pad(audio, (0, a_seg - audio.shape[0]))
            out["a_segments"] = np.stack(
                [audio[i * a_stride : i * a_stride + a_seg] for i in range(n)], axis=0
            )
        return out


# ---------------------------------------------------------------------------------
# Visual transforms
# ---------------------------------------------------------------------------------

@dataclasses.dataclass
class ResizeAndLetterbox:
    """Resize keeping aspect ratio then pad to square (reference letterbox aug)."""

    size: int = 224

    def __call__(self, item: dict) -> dict:
        from PIL import Image

        frames = item["frames"]
        out_frames = np.zeros((frames.shape[0], self.size, self.size, frames.shape[-1]), np.float32)
        for i, f in enumerate(frames):
            img = Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
            w, h = img.size
            scale = self.size / max(w, h)
            nw, nh = max(round(w * scale), 1), max(round(h * scale), 1)
            img = img.resize((nw, nh), Image.BICUBIC)
            top, left = (self.size - nh) // 2, (self.size - nw) // 2
            out_frames[i, top : top + nh, left : left + nw] = np.asarray(img, np.float32) / 255.0
        out = dict(item)
        out["frames"] = out_frames
        return out


@dataclasses.dataclass
class RandomResizedCropFrames:
    """Consistent random resized crop across all frames of a clip (training aug)."""

    size: int = 224
    scale: Tuple[float, float] = (0.5, 1.0)
    rng: Optional[np.random.Generator] = None

    def __call__(self, item: dict) -> dict:
        from PIL import Image

        rng = self.rng or np.random.default_rng()
        frames = item["frames"]
        t, h, w, c = frames.shape
        area = float(rng.uniform(*self.scale)) * h * w
        side = int(np.sqrt(area))
        side = min(side, h, w)
        top = int(rng.integers(0, h - side + 1))
        left = int(rng.integers(0, w - side + 1))
        crop = frames[:, top : top + side, left : left + side]
        out_frames = np.stack([
            np.asarray(
                Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8)).resize(
                    (self.size, self.size), Image.BICUBIC
                ),
                np.float32,
            ) / 255.0
            for f in crop
        ])
        out = dict(item)
        out["frames"] = out_frames
        return out


@dataclasses.dataclass
class ColorJitterFrames:
    """Brightness/contrast/saturation jitter, one draw per clip (training aug)."""

    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    rng: Optional[np.random.Generator] = None

    def __call__(self, item: dict) -> dict:
        rng = self.rng or np.random.default_rng()
        f = item["frames"].astype(np.float32)
        b = 1.0 + float(rng.uniform(-self.brightness, self.brightness))
        c = 1.0 + float(rng.uniform(-self.contrast, self.contrast))
        s = 1.0 + float(rng.uniform(-self.saturation, self.saturation))
        f = f * b
        mean = f.mean(axis=(1, 2, 3), keepdims=True)
        f = (f - mean) * c + mean
        gray = f.mean(axis=-1, keepdims=True)
        f = (f - gray) * s + gray
        out = dict(item)
        out["frames"] = np.clip(f, 0.0, 1.0)
        return out


@dataclasses.dataclass
class RandomHorizontalFlipFrames:
    p: float = 0.5
    rng: Optional[np.random.Generator] = None

    def __call__(self, item: dict) -> dict:
        rng = self.rng or np.random.default_rng()
        out = dict(item)
        if rng.random() < self.p:
            out["frames"] = item["frames"][:, :, ::-1].copy()
        return out


@dataclasses.dataclass
class NormalizeFrames:
    """(x - mean) / std per channel (reference uses 0.5/0.5 for Synchformer)."""

    mean: float = 0.5
    std: float = 0.5

    def __call__(self, item: dict) -> dict:
        out = dict(item)
        out["frames"] = (item["frames"].astype(np.float32) - self.mean) / self.std
        return out


# ---------------------------------------------------------------------------------
# Audio transforms
# ---------------------------------------------------------------------------------

@dataclasses.dataclass
class RandomAudioGain:
    min_db: float = -6.0
    max_db: float = 6.0
    rng: Optional[np.random.Generator] = None

    def __call__(self, item: dict) -> dict:
        rng = self.rng or np.random.default_rng()
        gain = 10 ** (float(rng.uniform(self.min_db, self.max_db)) / 20.0)
        out = dict(item)
        out["audio"] = np.clip(item["audio"] * gain, -1.0, 1.0)
        return out


@dataclasses.dataclass
class AddGaussianNoise:
    snr_db: float = 30.0
    rng: Optional[np.random.Generator] = None

    def __call__(self, item: dict) -> dict:
        rng = self.rng or np.random.default_rng()
        audio = item["audio"].astype(np.float32)
        sig_power = np.mean(audio ** 2) + 1e-12
        noise_power = sig_power / (10 ** (self.snr_db / 10.0))
        noise = rng.normal(0.0, np.sqrt(noise_power), audio.shape).astype(np.float32)
        out = dict(item)
        out["audio"] = audio + noise
        return out


class AudioMelSpectrogram:
    """Synchformer audio spec: mel -> log -> pad/trim 66 -> AST normalize (host-side wrapper
    over the on-TPU ops/audio_dsp implementation)."""

    def __call__(self, item: dict) -> dict:
        import jax.numpy as jnp

        from foley_tpu.ops.audio_dsp import sync_audio_spectrogram

        out = dict(item)
        segs = item.get("a_segments", item["audio"][None])
        out["a_spec"] = np.asarray(sync_audio_spectrogram(jnp.asarray(segs, jnp.float32)))
        return out


def eval_transforms(crop_len_s: float = 5.0, size: int = 224) -> Compose:
    """Deterministic eval pipeline (reference eval transform stack)."""
    return Compose([
        GenerateMultipleSegments(),
        NormalizeFrames(),
        AudioMelSpectrogram(),
    ])


def train_transforms(crop_len_s: float = 5.0, size: int = 224, seed: int = 0) -> Compose:
    """Training pipeline with the representative augmentation set."""
    rng = np.random.default_rng(seed)
    return Compose([
        TemporalCropAndOffset(crop_len_s=crop_len_s, rng=rng),
        RandomResizedCropFrames(size=size, rng=rng),
        ColorJitterFrames(rng=rng),
        RandomHorizontalFlipFrames(rng=rng),
        RandomAudioGain(rng=rng),
        AddGaussianNoise(rng=rng),
        GenerateMultipleSegments(),
        NormalizeFrames(),
        AudioMelSpectrogram(),
    ])
