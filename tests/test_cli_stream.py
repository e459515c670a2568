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


def test_cli_stream_pcm_rejects_v2a(capsys, tmp_path):
    """--stream_pcm + --single_video is rejected with a clear error (V2A streaming needs
    the sampler node's encoders; use the serving route)."""
    from foley_tpu.cli import main

    d = tmp_path / "frames"
    d.mkdir()
    rc = main([
        "--random_init", "tiny", "--single_prompt", "x", "--duration", "1",
        "--num_inference_steps", "2", "--precision", "fp32",
        "--stream_pcm", "--single_video", str(d),
    ])
    assert rc == 2
    assert "stream_pcm" in capsys.readouterr().err
