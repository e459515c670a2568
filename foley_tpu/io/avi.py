"""Dependency-free AVI (MJPEG + PCM) muxer — the no-ffmpeg fallback for merge_audio_video.

The reference muxes generated audio onto the input video by shelling out to ffmpeg
(reference ``media_utils.py:16-101``: copy video stream, AAC stereo panned from mono).
This framework also ingests V2A conditioning from *image-frame directories*
(``pipeline/video.py::read_frames_dir``) so it runs where no video toolchain exists — but
that left no way to produce a watchable muxed result in those environments. This module
closes the loop: it writes a standard RIFF/AVI container with an MJPEG video stream
(frames JPEG-encoded via PIL, the same library the frames-dir reader already uses) and a
16-bit stereo PCM audio stream (mono duplicated to both channels, mirroring the
reference's ``pan=stereo|c0=c0|c1=c0``), interleaved per frame with a standard ``idx1``
index. Pure stdlib ``struct`` byte assembly — no ffmpeg, no PyAV.

Beyond-reference capability (PARITY.md "Beyond-reference"); the ffmpeg path remains the
default whenever an actual video *file* is the input.
"""

from __future__ import annotations

import io
import os
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

# JPEG quality per the sampler's audio-quality knob (the reference maps the same knob to
# AAC bitrates; here it shapes the MJPEG stream).
_JPEG_QUALITY = {"low": 70, "medium": 85, "high": 95}


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(fourcc: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + data)


def _frames_to_uint8(frames: np.ndarray) -> np.ndarray:
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.clip(np.round(frames * 255.0), 0, 255).astype(np.uint8)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected [T, H, W, 3] frames, got {frames.shape}")
    return frames


def _audio_to_stereo_i16(audio: np.ndarray) -> np.ndarray:
    """Mono float [-1,1] (or int16) -> interleaved stereo int16, both channels the mono
    signal (the reference's pan=stereo|c0=c0|c1=c0)."""
    audio = np.asarray(audio)
    if audio.dtype == np.int16:
        # normalize BEFORE any channel mix: mean() of int16 would produce full-range
        # floats the [-1,1] clip below turns into a square wave
        audio = audio.astype(np.float32) / 32767.0
    if audio.ndim == 2:  # [C, T] -> mono mix like read_wav
        audio = audio.mean(axis=0)
    audio = np.round(np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)
    return np.repeat(audio[:, None], 2, axis=1).reshape(-1)  # interleaved LRLR...


def build_avi_bytes(
    frames: np.ndarray,
    fps: float,
    audio: np.ndarray,
    sample_rate: int,
    quality: str = "high",
) -> bytes:
    """Assemble an AVI in memory: MJPEG video from ``frames`` ([T, H, W, 3] uint8 or
    float [0,1]) at ``fps``, 16-bit stereo PCM from mono ``audio`` float [-1,1].

    Streams are interleaved per video frame (``00dc`` then that frame's ``01wb`` slice)
    and indexed in ``idx1``; audio past the last frame interval rides the final chunk.
    """
    from PIL import Image

    frames = _frames_to_uint8(frames)
    pcm = _audio_to_stereo_i16(audio)
    n_frames, height, width = frames.shape[0], frames.shape[1], frames.shape[2]
    jpeg_q = _JPEG_QUALITY.get(quality, _JPEG_QUALITY["high"])

    jpegs: List[bytes] = []
    for fr in frames:
        buf = io.BytesIO()
        Image.fromarray(fr).save(buf, format="JPEG", quality=jpeg_q)
        jpegs.append(buf.getvalue())

    # per-frame audio slices (in samples-per-channel), last one takes the tail
    n_samples = len(pcm) // 2
    bounds = [min(int(round(i * sample_rate / fps)), n_samples) for i in range(n_frames + 1)]
    bounds[-1] = n_samples

    body = bytearray()
    index: List[Tuple[bytes, int, int]] = []  # (fourcc, offset-from-'movi'-fourcc, size)

    def emit(fourcc: bytes, data: bytes) -> None:
        index.append((fourcc, 4 + len(body), len(data)))
        body.extend(_chunk(fourcc, data))

    for i, jb in enumerate(jpegs):
        emit(b"00dc", jb)
        seg = pcm[2 * bounds[i]: 2 * bounds[i + 1]]
        if seg.size:
            emit(b"01wb", seg.astype("<i2").tobytes())

    movi = _list(b"movi", bytes(body))
    idx1 = _chunk(b"idx1", b"".join(
        fcc + struct.pack("<III", 0x10, ofs, size) for fcc, ofs, size in index
    ))

    block_align = 4  # stereo int16
    byte_rate = sample_rate * block_align
    duration = max(n_frames / fps, 1e-6)
    max_jpeg = max((len(j) for j in jpegs), default=0)

    avih = struct.pack(
        "<14I",
        int(round(1e6 / fps)),                       # dwMicroSecPerFrame
        int(sum(map(len, jpegs)) / duration) + byte_rate,  # dwMaxBytesPerSec
        0,                                           # dwPaddingGranularity
        0x110,                                       # AVIF_HASINDEX | AVIF_ISINTERLEAVED
        n_frames, 0, 2,                              # dwTotalFrames/dwInitialFrames/dwStreams
        max_jpeg,                                    # dwSuggestedBufferSize
        width, height, 0, 0, 0, 0,
    )
    strh_v = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4h",
        0, 0, 0, 0,
        1000, int(round(fps * 1000)),                # dwScale/dwRate (fractional fps)
        0, n_frames, max_jpeg, 0xFFFFFFFF, 0,
        0, 0, width, height,                         # rcFrame
    )
    strf_v = struct.pack(  # BITMAPINFOHEADER
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    strh_a = b"auds" + b"\x00\x00\x00\x00" + struct.pack(
        "<IHHIIIIIIII4h",
        0, 0, 0, 0,
        block_align, byte_rate,                      # dwScale/dwRate: bytes-based PCM timing
        0, n_samples, byte_rate, 0xFFFFFFFF, block_align,
        0, 0, 0, 0,
    )
    strf_a = struct.pack("<HHIIHH", 1, 2, sample_rate, byte_rate, block_align, 16)

    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
        + _list(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)),
    )
    payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def mux_frames_audio_avi(
    frames: np.ndarray,
    fps: float,
    audio: np.ndarray,
    sample_rate: int,
    output_path: str,
    quality: str = "high",
) -> str:
    """``build_avi_bytes`` written to ``output_path``."""
    with open(output_path, "wb") as f:
        f.write(build_avi_bytes(frames, fps, audio, sample_rate, quality=quality))
    return output_path


def merge_frames_dir_audio(
    frames_dir: str,
    audio_path: str,
    output_path: str,
    fps: float = 16.0,
    quality: str = "high",
) -> str:
    """Mux a frames directory + WAV into an AVI (no external tools).

    The output extension is forced to ``.avi`` (the container actually written) — callers
    should use the returned path. ``fps`` declares the sequence's playback rate, matching
    ``read_frames_dir``'s convention."""
    from foley_tpu.io.audio import read_wav
    from foley_tpu.pipeline.video import read_frames_dir

    frames, eff_fps = read_frames_dir(frames_dir, fps=fps)
    audio, sr = read_wav(audio_path)
    out = os.path.splitext(output_path)[0] + ".avi"
    return mux_frames_audio_avi(frames, eff_fps, audio, sr, out, quality=quality)


# ---------------------------------------------------------------------------------
# Minimal reader (round-trip validation + tests)
# ---------------------------------------------------------------------------------

def read_avi_info(path: str) -> dict:
    """Parse an AVI's headers and stream chunks (enough to validate our own output and
    re-extract the streams): returns dict with width/height/fps/n_frames, audio
    sample_rate/channels, the JPEG payloads, and the concatenated PCM bytes."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError(f"not an AVI file: {path}")

    info: dict = {"jpegs": [], "index_entries": 0}
    pcm_chunks: list = []  # joined once at the end (bytes += is quadratic over many chunks)

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            payload = buf[pos + 8:pos + 8 + size]
            if fourcc == b"LIST":
                walk(buf, pos + 12, pos + 8 + size)
            elif fourcc == b"avih":
                fields = struct.unpack("<14I", payload[:56])
                info["fps"] = 1e6 / fields[0]
                info["n_frames"] = fields[4]
                info["width"], info["height"] = fields[8], fields[9]
            elif fourcc == b"strh" and payload[:4] == b"vids":
                info["video_handler"] = payload[4:8]
                scale, rate = struct.unpack("<II", payload[20:28])
                info["fps"] = rate / max(scale, 1)
            elif fourcc == b"strf" and len(payload) == 40:
                info["video_compression"] = payload[16:20]  # BITMAPINFOHEADER.biCompression
            elif fourcc == b"strf" and len(payload) == 16:
                tag, ch, sr, _, _, bits = struct.unpack("<HHIIHH", payload)
                info.update(audio_format=tag, channels=ch, sample_rate=sr, bits=bits)
            elif fourcc == b"00dc":
                info["jpegs"].append(payload)
            elif fourcc == b"01wb":
                pcm_chunks.append(payload)
            elif fourcc == b"idx1":
                info["index_entries"] = size // 16
            pos += 8 + size + (size % 2)

    try:
        walk(data, 12, len(data))
    except Exception as e:  # truncated headers etc. -> the callers' ValueError fall-through
        raise ValueError(f"malformed AVI {path}: {type(e).__name__}: {e}") from e
    info["pcm"] = b"".join(pcm_chunks)
    return info


def is_mjpeg_avi(path: str) -> bool:
    """Cheap sniff: RIFF/AVI magic in the first 12 bytes (full MJPG validation happens in
    ``read_avi``, which raises on unsupported codecs)."""
    try:
        with open(path, "rb") as f:
            head = f.read(12)
    except OSError:
        return False
    return len(head) == 12 and head[:4] == b"RIFF" and head[8:12] == b"AVI "


def read_avi(path: str):
    """Decode an MJPEG(+PCM) AVI with no external tools (PIL for the JPEG frames).

    Returns (frames float32 [T, H, W, 3] in [0,1], fps, audio float32 mono or None,
    sample_rate or None). Raises on non-MJPEG video or non-16-bit-PCM audio — callers
    fall back to ffmpeg/PyAV for those."""
    from PIL import Image

    info = read_avi_info(path)
    comp = info.get("video_compression", info.get("video_handler", b""))
    if comp not in (b"MJPG", b"mjpg"):
        raise ValueError(f"AVI video codec {comp!r} is not MJPEG; use ffmpeg/PyAV for {path}")
    if not info["jpegs"]:
        raise ValueError(f"no video frames in {path}")
    try:
        frames = np.stack([
            np.asarray(Image.open(io.BytesIO(jb)).convert("RGB"), np.uint8)
            for jb in info["jpegs"]
        ]).astype(np.float32) / 255.0
    except Exception as e:  # corrupt JPEG payloads / ragged frame sizes -> ValueError
        raise ValueError(f"undecodable MJPEG frames in {path}: {e}") from e

    audio = sr = None
    if info["pcm"] and info.get("audio_format") == 1 and info.get("bits") == 16:
        ch = max(int(info.get("channels", 1)), 1)
        pcm = np.frombuffer(info["pcm"], "<i2")
        pcm = pcm[: (len(pcm) // ch) * ch].reshape(-1, ch)
        audio = (pcm.astype(np.float32) / 32767.0).mean(axis=1)
        sr = int(info["sample_rate"])
    return frames, float(info["fps"]), audio, sr
