"""Video frame reading (host-side). The reference reads frames with PyAV at a target fps
(``feature_utils.py:20-61``); PyAV isn't in this image, so frames are decoded with an ffmpeg
rawvideo pipe when ffmpeg is available, and a clear error is raised otherwise."""

from __future__ import annotations

import json
import shutil
import subprocess
from typing import Optional, Tuple

import numpy as np


def _probe(path: str) -> Tuple[int, int, float]:
    ffprobe = shutil.which("ffprobe")
    if ffprobe is None:
        raise RuntimeError("ffprobe not found; install ffmpeg to read videos")
    out = subprocess.run(
        [ffprobe, "-v", "quiet", "-print_format", "json", "-show_streams",
         "-select_streams", "v:0", path],
        capture_output=True, text=True, check=True,
    ).stdout
    info = json.loads(out)["streams"][0]
    num, den = (int(x) for x in info.get("avg_frame_rate", "25/1").split("/"))
    fps = num / max(den, 1)
    return int(info["width"]), int(info["height"]), fps


def read_video_frames(
    path: str, target_fps: Optional[float] = None, max_frames: Optional[int] = None
) -> Tuple[np.ndarray, float]:
    """Decode frames to [T, H, W, 3] float32 in [0, 1]. Returns (frames, effective_fps)."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg not found; install ffmpeg to read videos")
    w, h, src_fps = _probe(path)
    fps = target_fps or src_fps
    cmd = [ffmpeg, "-v", "quiet", "-i", path]
    if target_fps:
        cmd += ["-vf", f"fps={target_fps}"]
    cmd += ["-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1"]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    n = len(raw) // (w * h * 3)
    if max_frames:
        n = min(n, max_frames)
    frames = np.frombuffer(raw[: n * w * h * 3], np.uint8).reshape(n, h, w, 3)
    return frames.astype(np.float32) / 255.0, fps
