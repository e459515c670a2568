"""Video frame reading (host-side). The reference reads frames with PyAV at a target fps
(``feature_utils.py:20-61``); PyAV isn't in this image, so video files are decoded with an
ffmpeg rawvideo pipe when ffmpeg is available, and a clear error is raised otherwise. A
directory of image frames (PNG/JPEG/...) is also accepted — V2A without any video toolchain."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
from typing import Optional, Tuple

import numpy as np

_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tif", ".tiff")


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


def _natural_key(name: str):
    """Sort key treating digit runs numerically, so frame_2 < frame_10 (and 2.png < 10.png)."""
    import re

    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name.lower())]


def read_frames_dir(
    path: str, fps: float = 16.0, target_fps: Optional[float] = None,
    max_frames: Optional[int] = None,
) -> Tuple[np.ndarray, float]:
    """Read a directory of image files (natural-sorted by name) as video frames — no ffmpeg.

    The sequence is declared to play at ``fps``; ``target_fps`` resamples with the same
    ``torch.linspace`` + truncating ``index_select`` recipe the sampler uses everywhere else
    (``ops/interp.py::linspace_resample_indices``, reference ``nodes.py:294-317``). Frame
    selection happens on the *name list* before any decoding, so a bounded request never
    decodes the whole directory. Returns ([T, H, W, 3] float32 in [0, 1], effective_fps);
    all frames must share one size."""
    from PIL import Image

    from foley_tpu.ops.interp import linspace_resample_indices

    names = sorted((n for n in os.listdir(path) if n.lower().endswith(_IMAGE_EXTS)),
                   key=_natural_key)
    if not names:
        raise RuntimeError(f"no image frames ({'/'.join(_IMAGE_EXTS)}) under {path}")
    if target_fps and target_fps != fps:
        n_out = max(int(round(len(names) * target_fps / fps)), 1)
        idx = np.asarray(linspace_resample_indices(len(names), n_out))
        names = [names[i] for i in idx]
        fps = target_fps
    if max_frames:
        names = names[:max_frames]
    frames = np.stack([
        np.asarray(Image.open(os.path.join(path, n)).convert("RGB"), np.uint8) for n in names
    ])
    return frames.astype(np.float32) / 255.0, float(fps)


def _read_with_pyav(
    path: str, target_fps: Optional[float] = None, max_frames: Optional[int] = None,
) -> Tuple[np.ndarray, float]:
    """Decode with PyAV (reference ``feature_utils.py:20-61``); optional fps resample by
    nearest-frame selection (the ffmpeg path's ``-vf fps=`` analog)."""
    import av

    with av.open(path) as container:
        stream = container.streams.video[0]
        src_fps = float(stream.average_rate or 25.0)
        decoded = [f.to_ndarray(format="rgb24") for f in container.decode(stream)]
    if not decoded:
        raise RuntimeError(f"no video frames decoded from {path}")
    frames = np.stack(decoded)
    fps = src_fps
    if target_fps and abs(target_fps - src_fps) > 1e-6:
        n_out = max(1, int(round(len(frames) * target_fps / src_fps)))
        idx = np.clip(np.round(np.arange(n_out) * src_fps / target_fps).astype(int),
                      0, len(frames) - 1)
        frames = frames[idx]
        fps = target_fps
    if max_frames:
        frames = frames[:max_frames]
    return frames.astype(np.float32) / 255.0, fps


def read_video_frames(
    path: str, target_fps: Optional[float] = None, max_frames: Optional[int] = None,
    dir_fps: float = 16.0,
) -> Tuple[np.ndarray, float]:
    """Decode frames to [T, H, W, 3] float32 in [0, 1]. Returns (frames, effective_fps).

    ``path`` may be a video file (decoded via ffmpeg) or a directory of image frames
    (read via PIL, declared to play at ``dir_fps``)."""
    if os.path.isdir(path):
        return read_frames_dir(path, fps=dir_fps, target_fps=target_fps, max_frames=max_frames)
    from foley_tpu.io.avi import is_mjpeg_avi, read_avi

    if is_mjpeg_avi(path):
        # our own muxer's container (io/avi.py) decodes in-process — no toolchain needed;
        # non-MJPEG AVIs fall through to ffmpeg/PyAV below
        try:
            frames, src_fps, _, _ = read_avi(path)
        except ValueError:
            pass
        else:
            if target_fps and abs(target_fps - src_fps) > 1e-6:
                n_out = max(1, int(round(len(frames) * target_fps / src_fps)))
                idx = np.clip(np.round(np.arange(n_out) * src_fps / target_fps).astype(int),
                              0, len(frames) - 1)
                frames, src_fps = frames[idx], target_fps
            if max_frames:
                frames = frames[:max_frames]
            return frames, float(src_fps)
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        # in-process decode fallback, the reference's own path (feature_utils.py:20-61
        # reads via PyAV, no ffmpeg binary needed)
        try:
            import av  # noqa: F401
        except ImportError:
            raise RuntimeError(
                "no video decoder: install ffmpeg or the 'av' (PyAV) package, or pass a "
                "directory of image frames"
            ) from None
        return _read_with_pyav(path, target_fps=target_fps, max_frames=max_frames)
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
