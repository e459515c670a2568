"""ctypes bindings for the native audio IO library (native/audioio.cpp), with numpy fallback.

The serving path's host-side per-request work — PCM conversion, peak normalization, linear
resampling, WAV framing — runs in C++ when the library is built (``make -C native`` or
``build_native()``); otherwise numpy equivalents keep everything working. The reference has
no native sources to mirror (SURVEY.md §2); this is the framework's own native runtime slot.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from foley_tpu.utils.logging import get_logger

logger = get_logger()

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libaudioio.so"))
_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


def build_native() -> bool:
    """Compile the library with make; returns True on success."""
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning(f"native build failed: {e}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if not os.path.exists(_LIB_PATH):
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.af_float_to_pcm16.argtypes = [f32p, i16p, ctypes.c_long]
        lib.af_float_to_pcm16.restype = ctypes.c_long
        lib.af_peak.argtypes = [f32p, ctypes.c_long]
        lib.af_peak.restype = ctypes.c_float
        lib.af_scale.argtypes = [f32p, ctypes.c_long, ctypes.c_float]
        lib.af_scale.restype = None
        lib.af_resample_linear.argtypes = [f32p, ctypes.c_long, f32p, ctypes.c_long]
        lib.af_resample_linear.restype = ctypes.c_long
        lib.af_wav_image.argtypes = [f32p, ctypes.c_long, ctypes.c_int, ctypes.c_int, u8p]
        lib.af_wav_image.restype = ctypes.c_long
        if hasattr(lib, "af_load_wav_mono"):  # present since the data-pipeline build
            lib.af_load_wav_mono.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.af_load_wav_mono.restype = ctypes.c_long
        _lib = lib
        logger.info(f"native audioio loaded from {_LIB_PATH}")
    except OSError as e:
        logger.warning(f"native audioio unavailable ({e}); using numpy fallback")
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def float_to_pcm16(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(x.size, np.int16)
        lib.af_float_to_pcm16(x.reshape(-1), out, x.size)
        return out.reshape(x.shape)
    return (np.clip(x, -1.0, 1.0) * 32767.0).round().astype(np.int16)


def peak(x: np.ndarray) -> float:
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is not None:
        return float(lib.af_peak(x.reshape(-1), x.size))
    return float(np.abs(x).max()) if x.size else 0.0


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    n_out = int(round(x.shape[0] * sr_out / sr_in))
    lib = _load()
    if lib is not None:
        out = np.empty(n_out, np.float32)
        lib.af_resample_linear(x, x.shape[0], out, n_out)
        return out
    if x.shape[0] <= 1 or n_out <= 1:
        return np.full((n_out,), x[0] if x.size else 0.0, np.float32)
    pos = np.linspace(0, x.shape[0] - 1, n_out)
    i0 = np.clip(pos.astype(np.int64), 0, x.shape[0] - 2)
    frac = (pos - i0).astype(np.float32)
    return (1 - frac) * x[i0] + frac * x[i0 + 1]


def load_wav_mono(path: str, target_sr: Optional[int] = None):
    """Native one-call WAV ingest: parse + decode (PCM 16/24/32, float32) + mono-average +
    linear resample, no Python-side copies (the training data-loader hot loop,
    ``native/audioio.cpp::af_load_wav_mono``). Returns (mono fp32 [T], sample_rate) or None
    when the library is unavailable / lacks the symbol (caller falls back to
    ``io/audio.py::read_wav``). Raises on unreadable/unsupported files."""
    lib = _load()
    if lib is None or not hasattr(lib, "af_load_wav_mono"):
        return None
    tsr = int(target_sr) if target_sr else 0
    sr = ctypes.c_int(0)
    n = lib.af_load_wav_mono(path.encode(), tsr, None, 0, ctypes.byref(sr))
    if n < 0:
        raise OSError(f"af_load_wav_mono({path!r}) failed with code {n}")
    out = np.empty(int(n), np.float32)
    got = lib.af_load_wav_mono(path.encode(), tsr,
                               out.ctypes.data_as(ctypes.c_void_p), n, ctypes.byref(sr))
    if got != n:
        raise OSError(f"af_load_wav_mono({path!r}) decode failed with code {got}")
    return out, int(sr.value)


def wav_image(waveform: np.ndarray, sample_rate: int) -> bytes:
    """[C, T] or [T] float -> complete WAV file bytes (header + 16-bit PCM)."""
    wav = np.asarray(waveform, np.float32)
    if wav.ndim == 1:
        wav = wav[None]
    channels, t = wav.shape
    interleaved = np.ascontiguousarray(wav.T.reshape(-1), np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(44 + 2 * t * channels, np.uint8)
        n = lib.af_wav_image(interleaved, t, channels, sample_rate, out)
        return bytes(out[:n].tobytes())
    # numpy fallback via stdlib wave
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(float_to_pcm16(interleaved).tobytes())
    return buf.getvalue()
