"""Data transform pipeline tests (train/eval AV transforms)."""

import numpy as np
import pytest

from foley_tpu.pipeline import transforms as T


@pytest.fixture
def clip():
    rng = np.random.default_rng(0)
    return {
        "frames": rng.random((50, 32, 48, 3)).astype(np.float32),  # 2 s @ 25 fps
        "audio": (rng.random(32000).astype(np.float32) - 0.5) * 0.2,  # 2 s @ 16 kHz
    }


def test_temporal_crop_and_offset(clip):
    t = T.TemporalCropAndOffset(crop_len_s=1.0, rng=np.random.default_rng(1))
    out = t(clip)
    assert out["frames"].shape[0] == 25
    assert out["audio"].shape[-1] == 16000
    assert 0 <= out["offset_target"] < 21
    assert out["offset_sec"] == pytest.approx(float(t.grid[out["offset_target"]]))


def test_generate_segments(clip):
    out = T.GenerateMultipleSegments()(clip)
    s = (50 - 16) // 8 + 1
    assert out["v_segments"].shape == (s, 16, 32, 48, 3)
    sa = (32000 - 10240) // 5120 + 1
    assert out["a_segments"].shape == (sa, 10240)


def test_letterbox_preserves_aspect(clip):
    out = T.ResizeAndLetterbox(size=64)(clip)
    f = out["frames"]
    assert f.shape[1:3] == (64, 64)
    # letterbox bars (input is wider than tall -> top/bottom padding)
    assert np.all(f[:, 0] == 0) and np.all(f[:, -1] == 0)


def test_color_jitter_and_flip_shapes(clip):
    rng = np.random.default_rng(2)
    out = T.ColorJitterFrames(rng=rng)(clip)
    assert out["frames"].shape == clip["frames"].shape
    assert out["frames"].min() >= 0 and out["frames"].max() <= 1
    out2 = T.RandomHorizontalFlipFrames(p=1.0, rng=rng)(clip)
    np.testing.assert_array_equal(out2["frames"], clip["frames"][:, :, ::-1])


def test_audio_augs(clip):
    rng = np.random.default_rng(3)
    g = T.RandomAudioGain(rng=rng)(clip)
    assert g["audio"].shape == clip["audio"].shape
    n = T.AddGaussianNoise(snr_db=20, rng=rng)(clip)
    noise = n["audio"] - clip["audio"]
    snr = 10 * np.log10(np.mean(clip["audio"] ** 2) / np.mean(noise ** 2))
    assert 17 < snr < 23


def test_eval_pipeline_end_to_end(clip):
    out = T.eval_transforms()(clip)
    assert "v_segments" in out and "a_spec" in out
    assert out["a_spec"].shape[-2:] == (128, 66)
    assert np.all(np.isfinite(out["a_spec"]))


def test_train_pipeline_end_to_end(clip):
    out = T.train_transforms(crop_len_s=1.0, size=32, seed=0)(clip)
    assert out["v_segments"].shape[1] == 16
    assert "offset_target" in out
    assert np.all(np.isfinite(out["a_spec"]))
