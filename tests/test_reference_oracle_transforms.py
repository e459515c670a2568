"""Literal-reference oracles for the data-transforms suite.

Runs the reference's OWN ``synchformer/data_transforms.py`` (pure-torch subset — classes
that only need torchvision/torchaudio at import time, satisfied by the placeholder stubs in
``reference_oracle.py``) and pins our ``pipeline/transforms.py`` equivalents against it:
grid/quantize helpers, EqualifyFromRight's floor-divide audio-length arithmetic, the
deterministic (eval-target) branches of both temporal crops, GenerateMultipleSegments'
shared-count/centered-start semantics, ResampleRGB index math, and the spec postprocessing
chain (PadOrTruncate / AudioLog / AudioNormalizeAST / PermuteStreams / RGBToFloat-Half).

Layout convention: the reference item is ``video [T, C, H, W]`` / ``audio [Ta]`` torch; ours
is ``frames [T, H, W, C]`` numpy — permuted at the test boundary only (the converter owns
layout permutes everywhere else too).

Randomized branches (python ``random`` / torch RNG vs our numpy Generator) are documented
behavioral redesigns, not oracle targets — see PARITY.md §2.6.
"""

import numpy as np
import pytest
import torch

from tests.reference_oracle import import_reference

from foley_tpu.models import sync_scorer
from foley_tpu.pipeline import transforms as T

dt = import_reference("hunyuanvideo_foley.models.synchformer.data_transforms")


def ref_item(Tv, Ta, vfps=25, afps=16000, seed=0, split="test"):
    g = torch.Generator().manual_seed(seed)
    video = torch.randint(0, 256, (Tv, 3, 8, 12), generator=g, dtype=torch.uint8).float()
    audio = torch.rand(Ta, generator=g) - 0.5
    return {
        "video": video,
        "audio": audio,
        "path": "synthetic",
        "split": split,
        "targets": {},
        "meta": {
            "audio": {"framerate": [afps], "duration": [Ta / afps]},
            "video": {"fps": [vfps], "duration": [Tv / vfps]},
        },
    }


def ours_item(ref):
    return {
        "frames": ref["video"].permute(0, 2, 3, 1).numpy().copy(),
        "audio": ref["audio"].numpy().copy(),
        "vfps": float(ref["meta"]["video"]["fps"][0]),
        "afps": float(ref["meta"]["audio"]["framerate"][0]),
    }


def assert_video_eq(ref_video, ours_frames):
    np.testing.assert_array_equal(ref_video.numpy(), np.transpose(ours_frames, (0, 3, 1, 2)))


# ---------------------------------------------------------------------------------
# helpers: class grid + offset quantization
# ---------------------------------------------------------------------------------

@pytest.mark.parametrize("left,right,size", [(-2.0, 2.0, 21), (-1.0, 1.0, 9), (-5.5, 5.5, 41)])
def test_make_class_grid_matches_reference(left, right, size):
    ref = dt.make_class_grid(left, right, size).numpy()
    np.testing.assert_array_equal(sync_scorer.make_class_grid(left, right, size), ref)


def test_make_class_grid_extreme_offset_matches_reference():
    kw = dict(seg_size_vframes=16, nseg=14, step_size_seg=0.5, vfps=25)
    ref = dt.make_class_grid(-2.0, 2.0, 21, add_extreme_offset=True, **kw).numpy()
    got = sync_scorer.make_class_grid(-2.0, 2.0, 21, add_extreme_offset=True, **kw)
    np.testing.assert_array_equal(got, ref)
    assert got[-1] == pytest.approx(7.5 * 0.64)  # trimmed sequence duration appended


@pytest.mark.parametrize("off", [0.36, -1.93, 0.0, 2.4, -2.4, 1.999])
def test_quantize_offset_matches_reference(off):
    grid = dt.make_class_grid(-2.0, 2.0, 21)
    ref_label, ref_idx = dt.quantize_offset(grid, off)
    got_label, got_idx = sync_scorer.quantize_offset(grid.numpy(), off)
    assert got_idx == int(ref_idx)
    assert got_label == pytest.approx(float(ref_label))


# ---------------------------------------------------------------------------------
# EqualifyFromRight — the floor-divide audio-length arithmetic
# ---------------------------------------------------------------------------------

@pytest.mark.parametrize(
    "Tv,Ta,vfps,afps,max_len",
    [
        (83, 53333, 25, 16000, 10),   # non-integral durations: round() would give 52800, ref 52480
        (75, 32000, 25, 16000, 10),   # audio-bound, integral
        (300, 160000, 25, 16000, 5),  # max_len-bound
        (90, 50000, 30, 16000, 10),   # afps % vfps != 0 -> a_frames_per_v_frame floor-divides
    ],
)
def test_equalify_from_right_matches_reference(Tv, Ta, vfps, afps, max_len):
    ref = dt.EqualifyFromRight(clip_max_len_sec=max_len)(ref_item(Tv, Ta, vfps, afps))
    got = T.EqualifyFromRight(clip_max_len_sec=max_len)(ours_item(ref_item(Tv, Ta, vfps, afps)))
    assert_video_eq(ref["video"], got["frames"])
    np.testing.assert_array_equal(ref["audio"].numpy(), got["audio"])


# ---------------------------------------------------------------------------------
# TemporalCropAndOffset — deterministic eval-target branch
# ---------------------------------------------------------------------------------

def _ref_temporal_crop(**kw):
    return dt.TemporalCropAndOffset(crop_len_sec=2.0, max_off_sec=2.0, grid_size=21, **kw)


@pytest.mark.parametrize("offset,v_start", [(0.36, 1.24), (-1.5, 1.46), (0.0, 0.0), (1.99, 0.02)])
def test_temporal_crop_eval_branch_matches_reference(offset, v_start):
    # (-1.5, 1.46): a_start_i = int(-0.04*16000) lands small-negative -> reference's
    # rounding-error fix branch (data_transforms.py:382-389) snaps it to 0
    item = ref_item(Tv=150, Ta=96000)
    item["targets"] = {"offset_sec": offset, "v_start_i_sec": v_start}
    ref = _ref_temporal_crop()(item)

    ours = ours_item(ref_item(Tv=150, Ta=96000))
    ours["offset_sec"], ours["v_start_i_sec"] = offset, v_start
    got = T.TemporalCropAndOffset(crop_len_s=2.0)(ours)

    assert_video_eq(ref["video"], got["frames"])
    np.testing.assert_array_equal(ref["audio"].numpy(), got["audio"])
    assert got["offset_sec"] == pytest.approx(ref["targets"]["offset_sec"])
    assert got["offset_label"] == pytest.approx(float(ref["targets"]["offset_label"]))
    assert got["offset_target"] == int(ref["targets"]["offset_target"])
    assert got["v_start_i_sec"] == pytest.approx(ref["targets"]["v_start_i_sec"])


# ---------------------------------------------------------------------------------
# GenerateMultipleSegments — shared count, centered start, explicit n_segments
# ---------------------------------------------------------------------------------

def _ref_segments(item, seg=16, n=None, step=0.5):
    return dt.GenerateMultipleSegments(
        segment_size_vframes=seg, n_segments=n, is_start_random=False, step_size_seg=step
    )(item)


@pytest.mark.parametrize(
    "Tv,Ta,n,step",
    [
        (50, 32000, None, 0.5),   # Synchformer geometry, equal durations
        (50, 32000, 3, 0.5),      # explicit n < max -> centered sequence
        (52, 32000, None, 0.5),   # video longer than audio: audio bounds the count, just fits
        (48, 35000, None, 1.0),   # non-overlapping stride
        (57, 33000, 2, 0.5),      # odd remainder -> max_start // 2 centering
    ],
)
def test_generate_segments_matches_reference(Tv, Ta, n, step):
    ref = _ref_segments(ref_item(Tv, Ta), n=n, step=step)
    got = T.GenerateMultipleSegments(
        stride_vframes=int(step * 16), n_segments=n
    )(ours_item(ref_item(Tv, Ta)))
    assert ref["video"].shape[0] == got["v_segments"].shape[0]
    np.testing.assert_array_equal(
        ref["video"].numpy(), np.transpose(got["v_segments"], (0, 1, 4, 2, 3))
    )
    np.testing.assert_array_equal(ref["audio"].numpy(), got["a_segments"])


def test_generate_segments_fractional_step_matches_reference():
    """step_size_seg values whose video stride is fractional (0.3 * 16 = 4.8 -> 4) are only
    representable through the reference's int-truncating step math — the step_size_seg
    parameterization reproduces them exactly."""
    ref = _ref_segments(ref_item(80, 52000), n=4, step=0.3)
    got = T.GenerateMultipleSegments(step_size_seg=0.3, n_segments=4)(
        ours_item(ref_item(80, 52000))
    )
    np.testing.assert_array_equal(
        ref["video"].numpy(), np.transpose(got["v_segments"], (0, 1, 4, 2, 3))
    )
    np.testing.assert_array_equal(ref["audio"].numpy(), got["a_segments"])


def test_generate_segments_audio_overrun_asserts_like_reference():
    """Centering follows the VIDEO stream; a much-shorter audio cannot accommodate the
    sequence and the reference asserts on the audio ranges (data_transforms.py:540) — ours
    raises the mirrored assertion instead of silently emitting ragged segments."""
    with pytest.raises(AssertionError):
        _ref_segments(ref_item(60, 32000))
    with pytest.raises(AssertionError):
        T.GenerateMultipleSegments()(ours_item(ref_item(60, 32000)))


# ---------------------------------------------------------------------------------
# Syncability temporal crop — the reference's eval branch computes the crop then CRASHES
# ---------------------------------------------------------------------------------

def test_syncability_eval_branch_reference_crashes_after_cropping():
    """data_transforms.py:675 reads ``offset_is_syncable``, assigned only in the train branch
    (:597): the fixed-offset eval path raises UnboundLocalError — dead code in the reference
    (same class of pinned divergence as hifi_foley's use_attention_mask). The item is mutated
    in place BEFORE the crash, so the cropped streams are still the literal reference output;
    we pin our (working) eval branch against them."""
    t = dt.TemporalCropAndOffsetForSyncabilityTraining(
        max_off_sec=2.0, grid_size=21, segment_size_vframes=16,
        n_segments=14, step_size_seg=0.5, vfps=25.0,
    )
    assert t.crop_len_sec == pytest.approx(4.8)  # trim_size_in_seg * seg_size_sec, rounded
    item = ref_item(Tv=175, Ta=112000)
    item["targets"] = {"offset_sec": 0.36, "v_start_i_sec": 1.0}
    with pytest.raises((UnboundLocalError, NameError)):
        t(item)
    # reference crop lengths: int(4.8 * fps)
    assert item["video"].shape[0] == 120 and item["audio"].shape[0] == 76800
    assert item["targets"]["offset_target"] == 12  # 0.36 -> grid value 0.4

    ours = ours_item(ref_item(Tv=175, Ta=112000))
    ours["offset_sec"], ours["v_start_i_sec"] = 0.36, 1.0
    got = T.TemporalCropAndOffsetForSyncabilityTraining(crop_len_s=4.8)(ours)
    assert_video_eq(item["video"], got["frames"])
    np.testing.assert_array_equal(item["audio"].numpy(), got["audio"])
    assert got["offset_target"] == int(item["targets"]["offset_target"])
    assert got["syncable_target"] == 1  # 0.36 is within the grid span -> syncable


# ---------------------------------------------------------------------------------
# ResampleRGB — index math
# ---------------------------------------------------------------------------------

@pytest.mark.parametrize("Tv,orig,new", [(60, 30, 25), (48, 24, 25), (100, 25, 25), (50, 25, 12)])
def test_resample_rgb_matches_reference(Tv, orig, new):
    ref = dt.ResampleRGB(new_fps=new)(ref_item(Tv, 32000, vfps=orig))
    got = T.ResampleRGB(new_fps=new)(ours_item(ref_item(Tv, 32000, vfps=orig)))
    assert_video_eq(ref["video"], got["frames"])
    assert ref["meta"]["video"]["fps"][0] == got["vfps"]


# ---------------------------------------------------------------------------------
# Spec postprocessing chain + dtype converts + permutes
# ---------------------------------------------------------------------------------

def _spec_items(S=3, F=128, Ts=52, seed=1):
    g = torch.Generator().manual_seed(seed)
    spec = torch.rand(S, F, Ts, generator=g) * 4 + 0.1
    ref = {"audio": spec, "meta": {"audio": {"framerate": [16000]}, "video": {"fps": [25]}}}
    return ref, {"a_spec": spec.numpy().copy()}


@pytest.mark.parametrize("max_t", [66, 40])
def test_pad_truncate_log_normalize_chain_matches_reference(max_t):
    ref, ours = _spec_items()
    ref = dt.AudioNormalizeAST(mean=-4.27, std=4.57)(
        dt.PadOrTruncate(max_spec_t=max_t)(dt.AudioLog()(ref))
    )
    got = T.AudioNormalizeAST(mean=-4.27, std=4.57)(
        T.PadOrTruncate(max_spec_t=max_t)(T.AudioLog()(ours))
    )
    np.testing.assert_allclose(ref["audio"].numpy(), got["a_spec"], rtol=1e-6, atol=1e-7)
    assert ref["meta"]["audio"]["norm_stats"]["mean"] == -4.27  # reference stashes stats


def test_permute_streams_matches_reference():
    ref, ours = _spec_items()
    ref_out = dt.PermuteStreams(einops_order_audio="S F T -> S T F", einops_order_rgb=None)(
        dict(ref, video=torch.zeros(1))
    )
    got = T.PermuteStreams(einops_order_audio="S F T -> S T F")(ours)
    np.testing.assert_array_equal(ref_out["audio"].numpy(), got["a_spec"])


def test_rgb_to_float_and_half_match_reference():
    g = torch.Generator().manual_seed(2)
    vid = torch.randint(0, 256, (4, 3, 6, 5), generator=g, dtype=torch.uint8)
    ref_item_ = {"video": vid}
    ours_ = {"frames": vid.permute(0, 2, 3, 1).numpy().copy()}
    ref_f = dt.RGBToFloatToZeroOne()(dict(ref_item_))["video"]
    got_f = T.RGBToFloatToZeroOne()(dict(ours_))["frames"]
    assert got_f.dtype == np.float32
    np.testing.assert_array_equal(ref_f.numpy(), np.transpose(got_f, (0, 3, 1, 2)))
    ref_h = dt.RGBToHalfToZeroOne()(dict(ref_item_))["video"]
    got_h = T.RGBToHalfToZeroOne()(dict(ours_))["frames"]
    assert got_h.dtype == np.float16
    np.testing.assert_array_equal(
        ref_h.float().numpy(), np.transpose(got_h.astype(np.float32), (0, 3, 1, 2))
    )


def test_rgb_to_float_float_input_divergence_pinned():
    """The reference divides by 255 UNCONDITIONALLY (data_transforms.py:695), mangling
    already-[0,1] float frames to [0, 0.004]; ours casts non-uint8 input through unchanged
    (this module's item convention is float [0,1]) — a documented divergence."""
    frames = np.full((2, 3, 4, 4), 0.5, np.float32)
    ref = dt.RGBToFloatToZeroOne()({"video": torch.from_numpy(frames)})["video"]
    np.testing.assert_allclose(ref.numpy(), frames / 255.0, rtol=1e-6)  # reference mangles
    got = T.RGBToFloatToZeroOne()({"frames": frames})["frames"]
    np.testing.assert_array_equal(got, frames)  # ours passes through


def test_do_nothing_matches_reference():
    item = {"anything": 1}
    assert dt.DoNothing()(item) is item
    assert T.DoNothing()(item) is item
