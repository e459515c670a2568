"""Audio IO: WAV writing (stdlib, no soundfile dependency) and ffmpeg mux.

Capability parity with the reference's outputs: 48 kHz waveforms as AUDIO dicts; the
audio+video merge shells out to ffmpeg like ``media_utils.py:16-101`` when available.
"""

from __future__ import annotations

import os
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


def read_wav(path: str, target_sr: Optional[int] = None) -> "tuple[np.ndarray, int]":
    """Read a WAV file to a mono fp32 [T] waveform in [-1, 1] plus its sample rate.

    Decodes PCM 16/24/32-bit and IEEE float32 (the formats the reference's torchaudio ingest
    path sees in practice); multi-channel is averaged to mono. The native C++ one-call path
    (``native/audioio.cpp::af_load_wav_mono``: parse + decode + mono + resample, no Python
    copies) is used when built; the stdlib/numpy decode below is the fallback."""
    from foley_tpu.io.native import load_wav_mono

    try:
        native = load_wav_mono(path, target_sr)
    except OSError:
        native = None  # unsupported encoding in the native path: fall through and let the
        # Python parser produce its (more descriptive) error or handle the file
    if native is not None:
        return native
    with open(path, "rb") as f:
        header = f.read(12)
        if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
            raise MediaProcessingError(f"not a RIFF/WAVE file: {path}")
        fmt = None
        data = None
        while True:
            chunk = f.read(8)
            if len(chunk) < 8:
                break
            cid, size = chunk[:4], int.from_bytes(chunk[4:8], "little")
            payload = f.read(size + (size & 1))[:size]
            if cid == b"fmt ":
                fmt = payload
            elif cid == b"data":
                data = payload
    if fmt is None or data is None:
        raise MediaProcessingError(f"missing fmt/data chunk: {path}")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sr = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 0xFFFE and len(fmt) >= 26:  # WAVE_FORMAT_EXTENSIBLE: sub-format GUID
        audio_format = int.from_bytes(fmt[24:26], "little")
    if audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, "<f4").astype(np.float32)
    elif audio_format == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif audio_format == 1 and bits == 24:
        raw = np.frombuffer(data, np.uint8)
        raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
        x = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int8).astype(np.int32) << 16)
        ).astype(np.float32) / 8388608.0
    else:
        raise MediaProcessingError(f"unsupported WAV format {audio_format}/{bits}bit: {path}")
    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels).mean(axis=1)
    if target_sr and target_sr != sr:
        from foley_tpu.io.native import resample_linear

        x = resample_linear(x, sr, target_sr)
        sr = target_sr
    return np.ascontiguousarray(x, np.float32), sr


def merge_audio_video(
    video_path: str,
    audio_path: str,
    output_path: str,
    quality: str = "high",
    ffmpeg_bin: Optional[str] = None,
    frames_fps: float = 16.0,
) -> str:
    """Mux audio onto video with ffmpeg: copy video stream, AAC stereo from mono
    (reference ``media_utils.py:16-101``).

    When ``video_path`` is an image-frame DIRECTORY (the framework's no-video-toolchain
    V2A input, ``pipeline/video.py::read_frames_dir``), no ffmpeg is needed: the frames +
    audio are muxed into an MJPEG+PCM AVI (``io/avi.py``) and the actual ``.avi`` path is
    returned — use the return value, not ``output_path``."""
    if os.path.isdir(video_path):
        from foley_tpu.io.avi import merge_frames_dir_audio

        # frames_fps must match the rate the frames were CONDITIONED at (CLI --frames_fps),
        # or the muxed video plays at the wrong speed against its audio
        return merge_frames_dir_audio(video_path, audio_path, output_path,
                                      fps=frames_fps, quality=quality)
    ffmpeg = ffmpeg_bin or shutil.which("ffmpeg")
    if ffmpeg is None:
        raise MediaProcessingError(
            "ffmpeg not found (required to mux onto a video FILE; a frames directory "
            "input muxes without it). Install ffmpeg: https://ffmpeg.org/download.html"
        )
    cmd = [
        ffmpeg, "-y",
        "-i", video_path,
        "-i", audio_path,
        "-c:v", "copy",
        "-c:a", "aac",
        "-ac", "2",
        "-af", "pan=stereo|c0=c0|c1=c0",
        *AUDIO_QUALITY_SETTINGS.get(quality, AUDIO_QUALITY_SETTINGS["high"]),
        "-map", "0:v:0", "-map", "1:a:0",
        "-shortest", output_path,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise MediaProcessingError(f"ffmpeg failed ({proc.returncode}): {proc.stderr[-2000:]}")
    return output_path
