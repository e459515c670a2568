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


def test_temporal_crop_half_set_eval_target_raises(clip):
    # one eval-target key without the other must fail loudly, not silently fall back to a
    # random draw that overwrites the provided target
    item = dict(clip, offset_sec=0.4)
    with pytest.raises(ValueError, match="BOTH offset_sec and v_start_i_sec"):
        T.TemporalCropAndOffset(crop_len_s=1.0, rng=np.random.default_rng(0))(item)


def test_generate_segments_video_only(clip):
    item = {"frames": clip["frames"]}
    out = T.GenerateMultipleSegments()(item)
    assert out["v_segments"].shape == ((50 - 16) // 8 + 1, 16, 32, 48, 3)
    assert "a_segments" not in out


def test_generate_segments_integer_stride_is_verbatim(clip):
    # seg=22/stride=15: the float roundtrip int(15/22*22)==14 would lose a frame
    t = T.GenerateMultipleSegments(segment_size_vframes=22, stride_vframes=15)
    out = t({"frames": clip["frames"]})
    n = (50 - 22) // 15 + 1
    assert out["v_segments"].shape[0] == n
    # consecutive segments are exactly 15 frames apart
    np.testing.assert_array_equal(out["v_segments"][1], clip["frames"][t_start(15, n, 50, 22) + 15 :][:22])


def t_start(stride, n, v_len, seg):
    step = stride / seg
    seq = int((n * step + (1 - step)) * seg)
    return (v_len - seq) // 2


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


def test_lowpass_attenuates_high_freqs(clip):
    sr = 16000
    t = np.arange(sr) / sr
    tone_lo = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    tone_hi = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    item = {"audio": tone_lo + tone_hi, "afps": sr}
    out = T.AudioRandomLowpassFilter(p=1.0, cutoff_freq=1000.0,
                                     rng=np.random.default_rng(0))(item)
    spec = np.abs(np.fft.rfft(out["audio"]))
    freqs = np.fft.rfftfreq(sr, 1 / sr)
    lo = spec[np.argmin(np.abs(freqs - 200))]
    hi = spec[np.argmin(np.abs(freqs - 6000))]
    assert hi < 0.05 * lo  # ≥26 dB attenuation at 6 kHz vs 200 Hz


def test_pitch_shift_moves_tone(clip):
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = T.AudioRandomPitchShift(p=1.0, shift=1200,
                                  rng=np.random.default_rng(0))({"audio": tone, "afps": sr})
    assert out["audio"].shape == tone.shape  # length preserved
    spec = np.abs(np.fft.rfft(out["audio"] * np.hanning(sr)))
    peak = np.fft.rfftfreq(sr, 1 / sr)[np.argmax(spec)]
    assert 800 < peak < 950  # +1 octave from 440 Hz (phase-vocoder tolerance)


def test_reverb_adds_tail(clip):
    sr = 16000
    impulse = np.zeros(sr, np.float32)
    impulse[100] = 1.0
    out = T.AudioRandomReverb(p=1.0, rng=np.random.default_rng(0))({"audio": impulse, "afps": sr})
    assert out["audio"].shape == impulse.shape
    tail = out["audio"][2000:6000]
    assert np.abs(tail).max() > 1e-4  # energy spread past the impulse
    assert np.isfinite(out["audio"]).all()


def test_volume_and_gauss_noise(clip):
    v = T.AudioRandomVolume(p=1.0, gain=0.5, rng=np.random.default_rng(0))(clip)
    np.testing.assert_allclose(v["audio"], clip["audio"] * 0.5, atol=1e-6)
    n = T.AudioRandomGaussNoise(p=1.0, amplitude=0.01, rng=np.random.default_rng(0))(clip)
    assert 0.005 < np.std(n["audio"] - clip["audio"]) < 0.02
    # p=0 -> identity
    same = T.AudioRandomGaussNoise(p=0.0, rng=np.random.default_rng(0))(clip)
    np.testing.assert_array_equal(same["audio"], clip["audio"])


def test_resample_audio_and_rgb(clip):
    item = dict(clip, vfps=25.0, afps=16000)
    out = T.ResampleAudio(new_fps=8000)(item)
    assert out["audio"].shape[-1] == 16000 and out["afps"] == 8000
    out2 = T.ResampleRGB(new_fps=12.5)(item)
    assert out2["frames"].shape[0] == 25 and out2["vfps"] == 12.5


def test_letterbox_pad_rectangular(clip):
    out = T.ResizeAndLetterboxPad(new_h=40, new_w=60)(clip)
    assert out["frames"].shape[1:3] == (40, 60)


def test_equalify_from_right():
    rng = np.random.default_rng(0)
    item = {
        "frames": rng.random((75, 8, 8, 3)).astype(np.float32),  # 3 s @ 25 fps
        "audio": rng.random(32000).astype(np.float32),           # 2 s @ 16 kHz
        "vfps": 25.0, "afps": 16000,
    }
    out = T.EqualifyFromRight()(item)
    assert out["frames"].shape[0] == 50 and out["audio"].shape[-1] == 32000


def test_spec_postprocessing_chain(clip):
    out = T.AudioMelSpectrogram()(T.GenerateMultipleSegments()(clip))
    chained = T.PadOrTruncate(max_spec_t=50)(out)
    assert chained["a_spec"].shape[-1] == 50
    padded = T.PadOrTruncate(max_spec_t=80)(out)
    assert padded["a_spec"].shape[-1] == 80
    normed = T.AudioNormalizeAST(mean=0.0, std=1.0)(out)
    np.testing.assert_allclose(normed["a_spec"], out["a_spec"] / 2.0, rtol=1e-6)


def test_permute_and_convert_and_identity(clip):
    item = {"frames": (clip["frames"] * 255).astype(np.uint8), "audio": clip["audio"]}
    f = T.RGBToFloatToZeroOne()(item)
    assert f["frames"].dtype == np.float32 and f["frames"].max() <= 1.0
    h = T.RGBToHalfToZeroOne()(item)
    assert h["frames"].dtype == np.float16
    p = T.PermuteStreams(einops_order_rgb="t h w c -> t c h w")(f)
    assert p["frames"].shape == (50, 3, 32, 48)
    assert T.DoNothing()(clip) is clip


def test_syncability_crop_targets():
    rng = np.random.default_rng(0)
    item = {
        "frames": rng.random((150, 8, 8, 3)).astype(np.float32),  # 6 s @ 25 fps
        "audio": rng.random(96000).astype(np.float32),
    }
    seen = set()
    for seed in range(8):
        out = T.TemporalCropAndOffsetForSyncabilityTraining(
            crop_len_s=1.0, rng=np.random.default_rng(seed))(item)
        seen.add(out["syncable_target"])
        if out["syncable_target"] == 0:
            assert out["offset_target"] == -1
        else:
            assert out["offset_target"] >= 0
    assert seen == {0, 1}  # both classes drawn across seeds


def test_color_distortion_framewise_and_sometimes_upscale(clip):
    out = T.ApplyColorJitterFrameWise(rng=np.random.default_rng(0))(clip)
    assert out["frames"].shape == clip["frames"].shape
    d = T.RandomApplyColorDistortion(p_color_jitter=1.0, p_gray=1.0,
                                     rng=np.random.default_rng(0))(clip)
    # grayscale applied: channels equal
    np.testing.assert_allclose(d["frames"][..., 0], d["frames"][..., 1], atol=1e-6)
    up = T.RGBSpatialCropSometimesUpscale(sometimes_p=1.0, smaller_size=16, target_size=24,
                                          rng=np.random.default_rng(0))(clip)
    assert up["frames"].shape[1:3] == (24, 24)
