"""CLI --stream_pcm: raw int16 PCM to stdout as windows finalize (the CLI analog of
serving's ``response=pcm16_stream``; reference parity surface: the reference has no
streaming CLI at all — this is beyond-reference, wired through
``pipeline/longform.py::generate_audio_long_stream``)."""

import numpy as np
import pytest


def test_cli_stream_pcm_t2a(capsysbinary):
    """--stream_pcm --first_window: full duration emitted as raw PCM on stdout, ramp
    schedule active (preamble + main window), non-silent output."""
    from foley_tpu.cli import main

    rc = main([
        "--random_init", "tiny", "--single_prompt", "rain", "--duration", "3",
        "--num_inference_steps", "2", "--precision", "fp32", "--seed", "3",
        "--stream_pcm", "--first_window", "1",
    ])
    out = capsysbinary.readouterr().out
    assert rc == 0
    pcm = np.frombuffer(out, "<i2")
    assert pcm.shape[0] == 3 * 48000  # exactly the requested duration, sample-accurate
    assert np.abs(pcm).max() > 0


def test_cli_first_window_requires_stream(capsys):
    """--first_window without --stream_pcm is a config error (batch output gains
    nothing from the ramp), rejected before any model work."""
    from foley_tpu.cli import main

    rc = main([
        "--random_init", "tiny", "--single_prompt", "x", "--duration", "1",
        "--num_inference_steps", "2", "--precision", "fp32", "--first_window", "0.5",
    ])
    assert rc == 2
    assert "--stream_pcm" in capsys.readouterr().err


def test_read_wav_mono_rejects_bad_formats(tmp_path):
    """--continue_audio input validation: non-48 kHz or non-16-bit WAVs raise ValueError
    (a 24-bit file read as '<i2' would silently decode to garbage and condition the
    continuation on noise); valid 16-bit 48 kHz stereo is downmixed to mono."""
    import wave

    from foley_tpu.cli import _read_wav_mono

    def write(path, sr, sampwidth, nch=1):
        with wave.open(str(path), "wb") as f:
            f.setnchannels(nch)
            f.setsampwidth(sampwidth)
            f.setframerate(sr)
            f.writeframes(b"\x00" * (sampwidth * nch * 100))

    write(tmp_path / "lowrate.wav", 16000, 2)
    with pytest.raises(ValueError, match="48 kHz"):
        _read_wav_mono(str(tmp_path / "lowrate.wav"))

    write(tmp_path / "s24.wav", 48000, 3)
    with pytest.raises(ValueError, match="16-bit"):
        _read_wav_mono(str(tmp_path / "s24.wav"))

    write(tmp_path / "ok.wav", 48000, 2, nch=2)
    out = _read_wav_mono(str(tmp_path / "ok.wav"))
    assert out.shape == (100,) and out.dtype == np.float32


def test_cli_stream_pcm_v2a(capsysbinary, tmp_path):
    """--stream_pcm + --single_video (r4 verdict #6): the full duration streams as raw
    PCM with the video's features encoded once at the window plan's duration; the
    output depends on the video (a different frames dir changes the audio)."""
    from PIL import Image

    from foley_tpu.cli import main

    def frames_dir(name, seed):
        d = tmp_path / name
        d.mkdir()
        r = np.random.default_rng(seed)
        for i in range(20):
            Image.fromarray(r.integers(0, 256, (24, 24, 3), dtype=np.uint8)).save(
                d / f"f_{i:03d}.png")
        return str(d)

    argv = [
        "--random_init", "tiny", "--random_init_perturb",  # live model: output must
        "--single_prompt", "splash", "--duration", "1",    # depend on the video
        "--num_inference_steps", "2", "--precision", "fp32", "--seed", "4",
        "--stream_pcm", "--frames_fps", "16",
    ]
    rc = main(argv + ["--single_video", frames_dir("a", 1)])
    out_a = capsysbinary.readouterr().out
    assert rc == 0
    pcm_a = np.frombuffer(out_a, "<i2")
    assert pcm_a.shape[0] == 48000 and np.abs(pcm_a).max() > 0

    rc = main(argv + ["--single_video", frames_dir("b", 2)])
    pcm_b = np.frombuffer(capsysbinary.readouterr().out, "<i2")
    assert rc == 0 and pcm_b.shape == pcm_a.shape
    assert np.abs(pcm_a.astype(np.int32) - pcm_b.astype(np.int32)).max() > 0


def test_cli_stream_pcm_rejects_v2a_continuation(capsys, tmp_path):
    """--stream_pcm + --single_video + --continue_audio: continuation is
    text-conditioned only; rejected before any model work."""
    from foley_tpu.cli import main

    d = tmp_path / "frames"
    d.mkdir()
    rc = main([
        "--random_init", "tiny", "--single_prompt", "x", "--duration", "1",
        "--num_inference_steps", "2", "--precision", "fp32",
        "--stream_pcm", "--single_video", str(d), "--continue_audio", "x.wav",
    ])
    assert rc == 2
    assert "text-conditioned" in capsys.readouterr().err


def test_cli_stream_block_swap_and_quant(capsysbinary):
    """--blocks_to_swap + --quantization int4 compose on the streaming path: the split
    quantized stacks stream per-block inside the windowed denoise and the output is
    sample-accurate (the low-HBM deployment mode, ROADMAP int4 swap table)."""
    from foley_tpu.cli import main

    rc = main([
        "--random_init", "tiny", "--single_prompt", "rain", "--duration", "2",
        "--num_inference_steps", "2", "--precision", "fp32", "--seed", "3",
        "--stream_pcm", "--quantization", "int4", "--blocks_to_swap", "3",
    ])
    out = capsysbinary.readouterr().out
    assert rc == 0
    pcm = np.frombuffer(out, "<i2")
    assert pcm.shape[0] == 2 * 48000
    assert np.abs(pcm).max() > 0


def test_cli_prefetch_requires_swap(capsys):
    """--prefetch_blocks without --blocks_to_swap errors loudly (it would otherwise be
    silently ignored — the swap_args dict is only built when blocks_to_swap > 0)."""
    from foley_tpu.cli import main

    rc = main(["--random_init", "tiny", "--single_prompt", "x", "--duration", "1",
               "--prefetch_blocks", "1"])
    assert rc == 2
    assert "--blocks_to_swap" in capsys.readouterr().err


def test_cli_batch_quantized_random_init(tmp_path):
    """--random_init + --quantization no longer silently no-ops: the batch (sampler-node)
    path runs with int8-quantized random weights and writes a valid WAV."""
    import wave

    from foley_tpu.cli import main

    out = str(tmp_path / "q.wav")
    rc = main([
        "--random_init", "tiny", "--single_prompt", "x", "--duration", "1",
        "--num_inference_steps", "2", "--precision", "fp32", "--seed", "1",
        "--quantization", "int8", "--blocks_to_swap", "2", "--output", out,
    ])
    assert rc == 0
    with wave.open(out) as f:
        assert f.getframerate() == 48000 and f.getnframes() == 48000
