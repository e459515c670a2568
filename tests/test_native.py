"""Native audioio library: build, and parity between C++ and numpy paths."""

import io
import wave

import numpy as np
import pytest

from foley_tpu.io import native


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.build_native(), "g++ build of native/audioio.cpp failed"
    assert native.native_available()


def test_pcm16_matches_numpy():
    rng = np.random.default_rng(0)
    x = (rng.random(10000).astype(np.float32) * 2.4 - 1.2)  # includes clipping range
    got = native.float_to_pcm16(x)
    ref = (np.clip(x, -1, 1) * 32767.0).round().astype(np.int16)
    np.testing.assert_array_equal(got, ref)


def test_peak():
    x = np.asarray([0.1, -0.9, 0.5], np.float32)
    assert native.peak(x) == pytest.approx(0.9)


def test_resample_linear_matches_numpy_interp():
    rng = np.random.default_rng(1)
    x = rng.random(1600).astype(np.float32)
    got = native.resample_linear(x, 16000, 48000)
    n_out = 4800
    ref = np.interp(np.linspace(0, len(x) - 1, n_out), np.arange(len(x)), x).astype(np.float32)
    assert got.shape == (n_out,)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_wav_image_valid():
    rng = np.random.default_rng(2)
    wav = (rng.random((1, 4800)).astype(np.float32) - 0.5)
    img = native.wav_image(wav, 48000)
    with wave.open(io.BytesIO(img)) as f:
        assert f.getframerate() == 48000
        assert f.getnchannels() == 1
        assert f.getnframes() == 4800
        pcm = np.frombuffer(f.readframes(4800), "<i2")
    np.testing.assert_array_equal(pcm, native.float_to_pcm16(wav[0]))


def test_wav_image_stereo():
    wav = np.stack([np.ones(100, np.float32) * 0.5, -np.ones(100, np.float32) * 0.5])
    img = native.wav_image(wav, 48000)
    with wave.open(io.BytesIO(img)) as f:
        assert f.getnchannels() == 2
        assert f.getnframes() == 100


def _wav_bytes(fmt_code, bits, channels, sr, payload):
    import struct

    fmt = struct.pack("<HHIIHH", fmt_code, channels, sr, sr * channels * bits // 8,
                      channels * bits // 8, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_load_wav_mono_matches_python_parser(tmp_path, monkeypatch):
    """The native one-call ingest (af_load_wav_mono) and the stdlib/numpy parser decode
    PCM16 / PCM24 / PCM32 / float32, mono-average, and resample identically."""
    import numpy as np
    import pytest

    from foley_tpu.io import audio as audio_mod
    from foley_tpu.io import native as native_mod

    if not native_mod.native_available() or native_mod._lib is None or not hasattr(
        native_mod._lib, "af_load_wav_mono"
    ):
        pytest.skip("native af_load_wav_mono not built")

    rng = np.random.default_rng(0)
    x = (rng.normal(size=(1000, 2)) * 0.3).clip(-0.99, 0.99)
    sr = 22050

    def pcm24(v):
        q = np.clip(np.round(v * 8388608.0), -8388608, 8388607).astype(np.int32)
        b = np.zeros((q.size, 3), np.uint8)
        flat = q.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        return b.tobytes()

    cases = {
        "pcm16.wav": _wav_bytes(1, 16, 2, sr, (np.round(x * 32767)).astype("<i2").tobytes()),
        "pcm24.wav": _wav_bytes(1, 24, 2, sr, pcm24(x)),
        "pcm32.wav": _wav_bytes(1, 32, 2, sr,
                                (np.round(x * 2147483647)).astype("<i4").tobytes()),
        "f32.wav": _wav_bytes(3, 32, 2, sr, x.astype("<f4").tobytes()),
    }
    for name, blob in cases.items():
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(blob)
        for target in (None, 48000):
            got_native, sr_n = native_mod.load_wav_mono(p, target)
            # force the Python parser by hiding the native fast path
            monkeypatch.setattr(audio_mod, "read_wav", audio_mod.read_wav)  # keep ref
            monkeypatch.setattr(native_mod, "load_wav_mono", lambda *a, **k: None)
            try:
                got_py, sr_p = audio_mod.read_wav(p, target_sr=target)
            finally:
                monkeypatch.undo()
            assert sr_n == sr_p == (target or sr)
            assert got_native.shape == got_py.shape, name
            np.testing.assert_allclose(got_native, got_py, atol=2e-5, err_msg=name)
