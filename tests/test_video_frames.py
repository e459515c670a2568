"""Frames-directory video ingest (V2A without ffmpeg) + the CLI V2A smoke path.

The reference reads videos with PyAV (``feature_utils.py:20-61``) and has no image-sequence
input; here a directory of image frames is a first-class video source so V2A runs in
environments with no video toolchain at all.
"""

import os

import numpy as np
import pytest
from PIL import Image

from foley_tpu.pipeline.video import read_frames_dir, read_video_frames


def _write_frames(path, n=8, h=24, w=32):
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(os.path.join(path, f"frame_{i:04d}.png"))
    return frames


def test_read_frames_dir_order_values_fps(tmp_path):
    d = str(tmp_path / "frames")
    ref = _write_frames(d, n=8)
    (tmp_path / "frames" / "notes.txt").write_text("ignored")  # non-image files skipped
    frames, fps = read_frames_dir(d, fps=12.0)
    assert frames.shape == (8, 24, 32, 3) and fps == 12.0
    assert frames.dtype == np.float32 and 0.0 <= frames.min() and frames.max() <= 1.0
    # PNG round-trips uint8 exactly; sorted-name order == write order
    np.testing.assert_array_equal((frames * 255).round().astype(np.uint8), ref)


def test_read_frames_dir_resample_matches_sampler_recipe(tmp_path):
    """fps resampling uses the same linspace+truncate indices as the sampler's
    resample_frames (ops/interp.py::linspace_resample_indices — torch .long() truncates)."""
    d = str(tmp_path / "frames")
    ref = _write_frames(d, n=10)
    frames, fps = read_frames_dir(d, fps=20.0, target_fps=10.0)
    assert fps == 10.0 and frames.shape[0] == 5
    idx = np.floor(np.linspace(0, 9, 5)).astype(int)  # [0, 2, 4, 6, 9]
    np.testing.assert_array_equal((frames * 255).round().astype(np.uint8), ref[idx])
    # max_frames truncates after resampling
    frames, _ = read_frames_dir(d, fps=20.0, max_frames=3)
    assert frames.shape[0] == 3


def test_read_frames_dir_natural_sort(tmp_path):
    """Non-zero-padded numeric names read in temporal order (2.png before 10.png)."""
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    order = [1, 2, 3, 10, 11, 20]
    for i, n in enumerate(order):
        Image.fromarray(np.full((8, 8, 3), i * 10, np.uint8)).save(d / f"{n}.png")
    frames, _ = read_frames_dir(str(d), fps=8.0)
    np.testing.assert_array_equal(
        (frames[:, 0, 0, 0] * 255).round().astype(int), [i * 10 for i in range(len(order))])


def test_read_video_frames_accepts_directory(tmp_path):
    d = str(tmp_path / "frames")
    ref = _write_frames(d, n=4)
    frames, fps = read_video_frames(d, dir_fps=8.0)
    assert frames.shape == (4, 24, 32, 3) and fps == 8.0
    np.testing.assert_array_equal((frames * 255).round().astype(np.uint8), ref)
    with pytest.raises(RuntimeError, match="no image frames"):
        read_frames_dir(str(tmp_path))


def test_cli_v2a_from_frames_dir(tmp_path):
    """End-to-end: --random_init tiny + a frames directory -> valid WAV, with the declared
    --frames_fps flowing into the 8/25-fps feature resampling (regression: the CLI used to
    drop the source fps and let the sampler assume 16)."""
    import wave

    from foley_tpu.cli import main

    d = str(tmp_path / "frames")
    _write_frames(d, n=16, h=40, w=40)
    out = str(tmp_path / "v2a.wav")
    rc = main([
        "--random_init", "tiny", "--single_video", d, "--frames_fps", "16",
        "--single_prompt", "clink", "--duration", "1", "--num_inference_steps", "2",
        "--batch_size", "1", "--seed", "0", "--precision", "fp32", "--output", out,
    ])
    assert rc == 0 and os.path.exists(out)
    with wave.open(out) as f:
        assert f.getframerate() == 48000
        assert f.getnframes() == 48000
        pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    assert np.abs(pcm).max() > 0


def test_cli_desync_score_with_wav_and_frames_dir(tmp_path, monkeypatch, capsys):
    """--desync_score works with zero ffmpeg: frames from a directory, audio from
    --audio_input (stdlib WAV reader, resampled to the scorer's 16 kHz)."""
    import foley_tpu.models.sync_scorer as scorer_mod
    from foley_tpu.cli import main
    from foley_tpu.io.audio import write_wav

    d = str(tmp_path / "frames")
    _write_frames(d, n=10)
    wav_path = str(tmp_path / "a.wav")
    write_wav(wav_path, np.sin(np.linspace(0, 700, 24000)).astype(np.float32), 48000)

    seen = {}

    class FakeScorer:
        def score(self, frames, waveform):
            seen["frames"] = frames.shape
            seen["samples"] = waveform.shape[0]
            return np.asarray([0.25])

    monkeypatch.setattr(scorer_mod, "load_desync_scorer", lambda path: FakeScorer())
    rc = main(["--desync_score", "--single_video", d, "--frames_fps", "16",
               "--audio_input", wav_path])
    assert rc == 0
    assert "predicted AV offset: +0.25" in capsys.readouterr().out
    assert seen["frames"][0] == 16           # 10 frames @16fps -> 25fps resample
    assert seen["samples"] == 8000           # 0.5 s of 48k audio -> 16 kHz


def test_cli_oom_hint(tmp_path, monkeypatch, capsys):
    """Device-OOM failures print the fp8/block-swap recipe instead of only a raw XLA error
    (measured: 60 s XXL at bf16 overshoots a 16 GiB chip)."""
    import foley_tpu.api.nodes as nodes_mod
    from foley_tpu.cli import main

    def boom(self, *a, **k):
        raise RuntimeError("INTERNAL: ... Ran out of memory in memory space hbm. "
                           "Used 16.08G of 15.75G hbm.")

    monkeypatch.setattr(nodes_mod.HunyuanFoleySampler, "generate_audio", boom)
    rc = main(["--random_init", "tiny", "--single_prompt", "x", "--duration", "1",
               "--num_inference_steps", "2", "--precision", "fp32",
               "--output", str(tmp_path / "o.wav")])
    err = capsys.readouterr().err
    assert rc == 1 and "fp8_e4m3fn" in err and "error:" in err


def test_pyav_fallback_with_stub(monkeypatch, tmp_path):
    """When ffmpeg is absent, read_video_frames decodes via PyAV (reference
    feature_utils.py:20-61). av isn't in this image, so drive the path with a stub
    exposing the exact API surface used (open/streams/decode/to_ndarray/average_rate)."""
    import sys
    import types

    import numpy as np

    from foley_tpu.pipeline import video as video_mod

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (10, 8, 8, 3), dtype=np.uint8)

    class _Frame:
        def __init__(self, arr):
            self._arr = arr

        def to_ndarray(self, format):
            assert format == "rgb24"
            return self._arr

    class _Container:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        streams = types.SimpleNamespace(
            video=[types.SimpleNamespace(average_rate=20.0)])

        def decode(self, stream):
            return (_Frame(a) for a in raw)

    fake_av = types.ModuleType("av")
    fake_av.open = lambda path: _Container()
    monkeypatch.setitem(sys.modules, "av", fake_av)
    monkeypatch.setattr(video_mod.shutil, "which", lambda name: None)

    vid = tmp_path / "clip.mp4"
    vid.write_bytes(b"\x00")  # never parsed by the stub
    frames, fps = video_mod.read_video_frames(str(vid))
    assert frames.shape == (10, 8, 8, 3) and fps == 20.0
    assert frames.dtype == np.float32 and frames.max() <= 1.0

    # fps resample by nearest-frame selection
    frames2, fps2 = video_mod.read_video_frames(str(vid), target_fps=10.0)
    assert fps2 == 10.0 and frames2.shape[0] == 5
    np.testing.assert_allclose(frames2[1], raw[2].astype(np.float32) / 255.0)

    # no decoder at all -> actionable error
    monkeypatch.delitem(sys.modules, "av")
    import builtins

    real_import = builtins.__import__

    def no_av(name, *a, **k):
        if name == "av":
            raise ImportError("no av")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_av)
    import pytest

    with pytest.raises(RuntimeError, match="ffmpeg or the 'av'"):
        video_mod.read_video_frames(str(vid))


def test_video_decoder_dispatch_order(monkeypatch, tmp_path):
    """read_video_frames dispatch order with a SYNTHESIZED AVI: (1) an MJPEG AVI decodes
    in-process even when `av` is importable and ffmpeg is absent (never pays an external
    decode for our own container); (2) a non-MJPEG file on the same host falls through to
    PyAV (the reference's own path, feature_utils.py:20-61)."""
    import sys
    import types

    import numpy as np

    from foley_tpu.io.avi import mux_frames_audio_avi
    from foley_tpu.pipeline import video as video_mod

    frames = np.zeros((4, 16, 16, 3), np.uint8)
    frames[:, :, :, 0] = 200  # flat red: JPEG round-trips near-exactly
    avi = str(tmp_path / "clip.avi")
    mux_frames_audio_avi(frames, 8.0, np.zeros(1000, np.float32), 8000, avi)

    pyav_called = {"n": 0}

    class _Container:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        streams = types.SimpleNamespace(video=[types.SimpleNamespace(average_rate=8.0)])

        def decode(self, stream):
            pyav_called["n"] += 1
            return (types.SimpleNamespace(to_ndarray=lambda format, i=i: frames[i])
                    for i in range(len(frames)))

    fake_av = types.ModuleType("av")
    fake_av.open = lambda path: _Container()
    monkeypatch.setitem(sys.modules, "av", fake_av)
    monkeypatch.setattr(video_mod.shutil, "which", lambda name: None)  # no ffmpeg

    got, fps = video_mod.read_video_frames(avi)
    assert got.shape == (4, 16, 16, 3) and fps == 8.0
    assert pyav_called["n"] == 0  # our own container never leaves the process
    assert np.abs(got[0, :, :, 0] * 255.0 - 200).max() < 6  # actually decoded the MJPEG

    # a non-MJPEG file on the same host dispatches to PyAV
    other = tmp_path / "clip.mp4"
    other.write_bytes(b"\x00" * 64)
    got2, fps2 = video_mod.read_video_frames(str(other))
    assert pyav_called["n"] == 1 and got2.shape == (4, 16, 16, 3) and fps2 == 8.0


# ---------------------------------------------------------------------------------
# AVI muxer (io/avi.py) — the no-ffmpeg merge_audio_video fallback for frames dirs
# ---------------------------------------------------------------------------------

def test_avi_mux_round_trip(tmp_path):
    """mux_frames_audio_avi writes a parseable RIFF/AVI whose MJPEG frames decode back to
    the source images (JPEG-lossy tolerance) and whose PCM dequantizes to the source mono
    audio duplicated to stereo."""
    from PIL import Image

    from foley_tpu.io.avi import mux_frames_audio_avi, read_avi_info

    rng = np.random.default_rng(3)
    n, h, w, fps, sr = 6, 32, 48, 12.0, 8000
    # smooth gradients: JPEG-friendly so the lossy round-trip stays tight
    grid = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.stack([
        np.stack([
            grid[0] / h * 255, grid[1] / w * 255, np.full((h, w), 40 * i, np.float32)
        ], axis=-1) for i in range(n)
    ]).astype(np.uint8)
    audio = (0.3 * np.sin(2 * np.pi * 440 * np.arange(int(0.5 * sr)) / sr)).astype(np.float32)

    out = str(tmp_path / "clip.avi")
    assert mux_frames_audio_avi(frames, fps, audio, sr, out) == out
    info = read_avi_info(out)
    assert (info["width"], info["height"], info["n_frames"]) == (w, h, n)
    assert abs(info["fps"] - fps) < 1e-6
    assert info["audio_format"] == 1 and info["channels"] == 2
    assert info["sample_rate"] == sr and info["bits"] == 16
    assert len(info["jpegs"]) == n
    assert info["index_entries"] == n + sum(
        1 for i in range(n)
        if int(round((i + 1) * sr / fps)) > int(round(i * sr / fps)) or i == n - 1
    )
    for i, jb in enumerate(info["jpegs"]):
        import io as _io

        dec = np.asarray(Image.open(_io.BytesIO(jb)).convert("RGB"), np.float32)
        assert dec.shape == (h, w, 3)
        assert np.abs(dec - frames[i].astype(np.float32)).mean() < 8.0  # JPEG quality 95
    pcm = np.frombuffer(info["pcm"], "<i2").reshape(-1, 2)
    assert pcm.shape[0] == len(audio)
    np.testing.assert_array_equal(pcm[:, 0], pcm[:, 1])  # mono panned to both channels
    np.testing.assert_allclose(pcm[:, 0] / 32767.0, audio, atol=1.0 / 32767.0)


def test_merge_audio_video_frames_dir_no_ffmpeg(tmp_path, monkeypatch):
    """merge_audio_video on a frames DIRECTORY muxes an .avi with no ffmpeg binary at all,
    returning the real output path; a video FILE without ffmpeg still errors actionably."""
    import shutil as _shutil

    from foley_tpu.io.audio import MediaProcessingError, merge_audio_video, write_wav
    from foley_tpu.io.avi import read_avi_info

    monkeypatch.setattr(_shutil, "which", lambda name: None)  # simulate no ffmpeg anywhere

    d = str(tmp_path / "frames")
    _write_frames(d, n=5, h=16, w=16)
    wav = str(tmp_path / "a.wav")
    write_wav(wav, 0.2 * np.ones(4000, np.float32), 8000)

    out = merge_audio_video(d, wav, str(tmp_path / "out.mp4"))
    assert out.endswith(".avi") and os.path.exists(out)
    info = read_avi_info(out)
    assert info["n_frames"] == 5 and info["sample_rate"] == 8000

    vid_file = tmp_path / "clip.mp4"
    vid_file.write_bytes(b"\x00" * 64)
    with pytest.raises(MediaProcessingError, match="ffmpeg not found"):
        merge_audio_video(str(vid_file), wav, str(tmp_path / "out2.mp4"))


def test_read_video_frames_decodes_mjpeg_avi_natively(tmp_path):
    """read_video_frames on an io/avi.py MJPEG AVI decodes in-process (this image has no
    ffmpeg and no PyAV — reaching either fallback would error), including the nearest-frame
    target_fps resample the other decode paths use."""
    from foley_tpu.io.avi import mux_frames_audio_avi
    from foley_tpu.pipeline.video import read_video_frames

    n, h, w = 8, 24, 32
    grid = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.stack([
        np.stack([grid[0] / h, grid[1] / w, np.full((h, w), i / n, np.float32)], axis=-1)
        for i in range(n)
    ])
    path = str(tmp_path / "clip.avi")
    mux_frames_audio_avi(frames, 16.0, np.zeros(8000, np.float32), 16000, path)

    got, fps = read_video_frames(path)
    assert got.shape == (n, h, w, 3) and fps == 16.0
    assert np.abs(got - frames).mean() < 0.04  # JPEG-lossy round trip

    half, fps2 = read_video_frames(path, target_fps=8.0)
    assert half.shape[0] == 4 and fps2 == 8.0
    got3, _ = read_video_frames(path, max_frames=3)
    assert got3.shape[0] == 3


def test_cli_desync_score_avi_embedded_audio(tmp_path, monkeypatch, capsys):
    """--desync_score on an MJPEG+PCM AVI scores the file's OWN audio track with zero
    external tools (no --audio_input, no ffmpeg)."""
    import foley_tpu.models.sync_scorer as scorer_mod
    from foley_tpu.cli import main
    from foley_tpu.io.avi import mux_frames_audio_avi

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(10, 24, 24, 3), dtype=np.uint8)
    audio = np.sin(np.linspace(0, 300, 8000)).astype(np.float32) * 0.4
    path = str(tmp_path / "clip.avi")
    mux_frames_audio_avi(frames, 16.0, audio, 16000, path)

    seen = {}

    class FakeScorer:
        def score(self, fr, waveform):
            seen["frames"] = fr.shape
            seen["samples"] = waveform.shape[0]
            return np.asarray([-0.5])

    monkeypatch.setattr(scorer_mod, "load_desync_scorer", lambda p: FakeScorer())
    rc = main(["--desync_score", "--single_video", path])
    assert rc == 0
    assert "predicted AV offset: -0.50" in capsys.readouterr().out
    assert seen["frames"][0] == 16  # 10 frames @16fps -> 25 fps resample
    assert seen["samples"] == 8000  # embedded 16 kHz PCM used as-is


def test_avi_mux_fixes(tmp_path, monkeypatch):
    """Regression pack: (1) merge_audio_video forwards frames_fps into the AVI header;
    (2) int16 [C, T] audio is normalized before the stereo mix (not clipped to a square
    wave); (3) a malformed RIFF/AVI falls through read_video_frames' AVI branch as
    ValueError -> the actionable no-decoder error, not a struct.error crash."""
    import shutil as _shutil

    from foley_tpu.io.audio import merge_audio_video, write_wav
    from foley_tpu.io.avi import build_avi_bytes, read_avi_info
    from foley_tpu.pipeline.video import read_video_frames

    # (1) fps plumb
    monkeypatch.setattr(_shutil, "which", lambda name: None)
    d = str(tmp_path / "frames")
    _write_frames(d, n=6, h=16, w=16)
    wav = str(tmp_path / "a.wav")
    write_wav(wav, 0.1 * np.ones(4000, np.float32), 8000)
    out = merge_audio_video(d, wav, str(tmp_path / "o.mp4"), frames_fps=24.0)
    assert abs(read_avi_info(out)["fps"] - 24.0) < 1e-6

    # (2) int16 [C, T] input survives the stereo conversion
    pcm_in = (np.linspace(-0.5, 0.5, 1000) * 32767).astype(np.int16)[None]  # [1, T]
    data = build_avi_bytes(np.zeros((2, 8, 8, 3), np.uint8), 8.0, pcm_in, 8000)
    f = tmp_path / "i16.avi"
    f.write_bytes(data)
    got = np.frombuffer(read_avi_info(str(f))["pcm"], "<i2").reshape(-1, 2)[:, 0]
    np.testing.assert_array_equal(got, pcm_in[0])

    # (3) malformed AVI (valid magic, truncated headers) -> clean fall-through error.
    # The oracle tests install an import-only "av" stub in sys.modules; block it so the
    # fall-through lands on the no-decoder error rather than the stub's missing .open
    import builtins
    import sys

    monkeypatch.delitem(sys.modules, "av", raising=False)
    real_import = builtins.__import__

    def no_av(name, *a, **k):
        if name == "av":
            raise ImportError("no av")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_av)
    bad = tmp_path / "bad.avi"
    bad.write_bytes(b"RIFF" + b"\x28\x00\x00\x00" + b"AVI " + b"avih" + b"\x04\x00\x00\x00" + b"\x00" * 4)
    with pytest.raises(RuntimeError, match="no video decoder"):
        read_video_frames(str(bad))
