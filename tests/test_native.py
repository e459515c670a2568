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
