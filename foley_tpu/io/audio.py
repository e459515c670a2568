"""Audio IO: WAV writing (stdlib, no soundfile dependency) and ffmpeg mux.

Capability parity with the reference's outputs: 48 kHz waveforms as AUDIO dicts; the
audio+video merge shells out to ffmpeg like ``media_utils.py:16-101`` when available.
"""

from __future__ import annotations

import shutil
import subprocess
import wave
from typing import Optional

import numpy as np

AUDIO_QUALITY_SETTINGS = {
    "high": ["-b:a", "192k"],
    "medium": ["-b:a", "128k"],
    "low": ["-b:a", "96k"],
}


def write_wav(path: str, waveform: np.ndarray, sample_rate: int = 48000) -> None:
    """Write [C, T] or [T] float waveform in [-1, 1] to 16-bit PCM WAV.

    Uses the native C++ PCM/framing path (foley_tpu.io.native) when built."""
    wav = np.asarray(waveform, np.float32)
    if wav.ndim == 1:
        wav = wav[None]
    assert wav.ndim == 2, f"expected [C, T], got {wav.shape}"
    from foley_tpu.io.native import wav_image

    with open(path, "wb") as f:
        f.write(wav_image(wav, sample_rate))


class MediaProcessingError(RuntimeError):
    pass


def merge_audio_video(
    video_path: str,
    audio_path: str,
    output_path: str,
    quality: str = "high",
    ffmpeg_bin: Optional[str] = None,
) -> str:
    """Mux audio onto video with ffmpeg: copy video stream, AAC stereo from mono
    (reference ``media_utils.py:16-101``)."""
    ffmpeg = ffmpeg_bin or shutil.which("ffmpeg")
    if ffmpeg is None:
        raise MediaProcessingError(
            "ffmpeg not found. Please install ffmpeg: https://ffmpeg.org/download.html"
        )
    cmd = [
        ffmpeg, "-y",
        "-i", video_path,
        "-i", audio_path,
        "-c:v", "copy",
        "-c:a", "aac",
        "-af", "pan=stereo|c0=c0|c1=c0",
        *AUDIO_QUALITY_SETTINGS.get(quality, AUDIO_QUALITY_SETTINGS["high"]),
        "-map", "0:v:0", "-map", "1:a:0",
        "-shortest", output_path,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise MediaProcessingError(f"ffmpeg failed ({proc.returncode}): {proc.stderr[-2000:]}")
    return output_path
