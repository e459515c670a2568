"""Golden tests: encoder/mux GLUE vs the reference's LITERAL utility code.

Round-3 verdict item 7: sweep the remaining unpinned reference surfaces. This pins the
pinnable ones without av/ffmpeg:

- ``media_utils.merge_audio_video`` ARG CONSTRUCTION (``media_utils.py:16-101``): the
  literal function runs with an intercepted ``subprocess.Popen``; the captured ffmpeg
  command is compared against the one ``foley_tpu/io/audio.py::merge_audio_video`` builds.
- ``feature_utils.encode_video_with_sync`` segmentation/fold order
  (``feature_utils.py:81-109``): literal code with a recording stub Synchformer vs our
  ``pipeline/features.py::sync_segments`` + the (s t)-fold convention.
- ``feature_utils.encode_video_with_siglip2`` batching/fold (``feature_utils.py:64-79``).
- ``feature_utils.feature_process`` prompt ordering + text trim (``feature_utils.py:141+``):
  prompts are stacked [neg, prompt], text = rows [1:], uncond = rows [:1] — the convention
  our serving/pipeline glue replicates.

NOT pinnable here (one-line PARITY notes, per the verdict's 'why it can't be' rule):
- ``get_frames_av`` (``feature_utils.py:20-61``): its body IS av decoding; no PyAV in this
  image, nothing to execute without it. Our ``pipeline/video.py::_read_with_pyav``
  transcribes it and is stub-tested (test_video_frames).
- audiotools/julius resample internals: see PARITY "Known intentional divergences".
"""

import subprocess
import types

import numpy as np
import torch

from tests.reference_oracle import import_reference, install_stubs

install_stubs()
media_utils = import_reference("hunyuanvideo_foley.utils.media_utils")
feature_utils = import_reference("hunyuanvideo_foley.utils.feature_utils")


def _capture_reference_ffmpeg_cmd(monkeypatch, tmp_path, quality):
    """Run the literal merge_audio_video with Popen intercepted; return its argv."""
    captured = {}

    class _FakeProc:
        returncode = 0

        def communicate(self):
            return "", ""

    def fake_popen(cmd, **kwargs):
        captured["cmd"] = list(cmd)
        return _FakeProc()

    monkeypatch.setattr(media_utils.subprocess, "Popen", fake_popen)
    a, v = tmp_path / "a.wav", tmp_path / "v.mp4"
    a.write_bytes(b"x")
    v.write_bytes(b"x")
    out = media_utils.merge_audio_video(str(a), str(v), str(tmp_path / "o.mp4"),
                                        quality=quality)
    assert out == str(tmp_path / "o.mp4")
    return captured["cmd"]


def _capture_our_ffmpeg_cmd(monkeypatch, tmp_path, quality):
    from foley_tpu.io import audio as audio_mod

    captured = {}

    def fake_run(cmd, **kwargs):
        captured["cmd"] = list(cmd)
        return types.SimpleNamespace(returncode=0, stderr="")

    monkeypatch.setattr(audio_mod.subprocess, "run", fake_run)
    audio_mod.merge_audio_video(str(tmp_path / "v.mp4"), str(tmp_path / "a.wav"),
                                str(tmp_path / "o.mp4"), quality=quality,
                                ffmpeg_bin="ffmpeg")
    return captured["cmd"]


def _opt_pairs(cmd):
    """{flag: [values...]} for flag/value argv entries (repeated flags accumulate)."""
    pairs = {}
    i = 0
    while i < len(cmd):
        if cmd[i].startswith("-") and i + 1 < len(cmd) and not cmd[i + 1].startswith("-"):
            pairs.setdefault(cmd[i], []).append(cmd[i + 1])
            i += 2
        else:
            i += 1
    return pairs


def test_merge_audio_video_arg_construction(monkeypatch, tmp_path):
    """Our ffmpeg command carries the reference's exact codec/filter/bitrate/map settings
    at every quality level. Deliberate deltas (documented): we add ``-shortest`` (the mux
    must not outrun the shorter stream) and put ``-y`` first; both are placement/robustness
    only — every encoding-relevant option matches."""
    for quality in ("high", "medium", "low", "unknown-falls-back-to-high"):
        ref = _capture_reference_ffmpeg_cmd(monkeypatch, tmp_path, quality)
        ours = _capture_our_ffmpeg_cmd(monkeypatch, tmp_path, quality)

        ref_pairs, our_pairs = _opt_pairs(ref), _opt_pairs(ours)
        # input order: video first, audio second (map indices depend on it)
        assert ref_pairs["-i"] == [str(tmp_path / "v.mp4"), str(tmp_path / "a.wav")]
        assert our_pairs["-i"] == ref_pairs["-i"]
        for flag in ("-c:v", "-c:a", "-ac", "-af", "-b:a", "-map"):
            assert our_pairs[flag] == ref_pairs[flag], (flag, quality)
        # the reference appends -y (overwrite) and the output last; ours leads with -y
        assert ref[-1] == ours[-1] == str(tmp_path / "o.mp4")
        assert "-y" in ref and "-y" in ours
        assert "-shortest" in ours  # deliberate extra, see docstring


def test_encode_video_with_sync_segmentation_glue():
    """The literal encode_video_with_sync (segment stack at i*8..i*8+16, fold
    '(b s) 1 t d -> b (s t) d') against our sync_segments + (s t) fold, through the SAME
    recording stub model — pins segment boundaries and token order."""
    monkey_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self  # reference calls .cuda() mid-glue
    try:
        torch.manual_seed(0)
        b, t, d = 1, 40, 6
        x = torch.rand(b, t, 3, 224, 224)
        w = torch.rand(d)

        class _StubSync:
            def __call__(self, seg):
                # seg: [N, 1, 16, 3, 224, 224] -> [N, 1, 8, d]: per-frame means of the
                # EVEN frames (position-sensitive, so any boundary/order bug shows)
                m = seg[:, 0, 0::2].mean(dim=(2, 3, 4))  # [N, 8]
                return (m[..., None] * w).unsqueeze(1)

        model_dict = types.SimpleNamespace(syncformer_model=_StubSync())
        ref_out = feature_utils.encode_video_with_sync(x, model_dict, batch_size=3)
        assert ref_out.shape == (b, ((t - 16) // 8 + 1) * 8, d)
        # batching must not change anything
        ref_full = feature_utils.encode_video_with_sync(x, model_dict, batch_size=-1)
        np.testing.assert_allclose(ref_out.numpy(), ref_full.numpy(), rtol=1e-6, atol=1e-6)
    finally:
        torch.Tensor.cuda = monkey_cuda

    from foley_tpu.pipeline.features import sync_segments

    segs = sync_segments(x[0].numpy())                      # [S, 16, 3, 224, 224]
    m = segs[:, 0::2].mean(axis=(2, 3, 4))                  # [S, 8]
    ours = (m[..., None] * w.numpy()).reshape(1, -1, d)     # (s t) fold
    np.testing.assert_allclose(ours, ref_out.numpy(), rtol=1e-5, atol=1e-6)


def test_encode_video_with_siglip2_batching_glue():
    """The literal encode_video_with_siglip2 ((b t) flatten, micro-batch loop, pooler
    fallback, (b t) d -> b t d fold) with a recording stub: batching is a no-op and row t
    is exactly the stub of frame t."""
    torch.manual_seed(1)
    b, t, d = 1, 7, 5
    x = torch.rand(b, t, 3, 8, 8)
    w = torch.rand(d)

    class _StubSiglip:
        def get_image_features(self, pixel_values):
            return pixel_values.mean(dim=(1, 2, 3))[:, None] * w

    model_dict = types.SimpleNamespace(siglip2_model=_StubSiglip())
    out = feature_utils.encode_video_with_siglip2(x, model_dict, batch_size=3)
    out_full = feature_utils.encode_video_with_siglip2(x, model_dict, batch_size=-1)
    assert out.shape == (b, t, d)
    np.testing.assert_allclose(out.numpy(), out_full.numpy(), rtol=1e-6, atol=1e-6)
    for i in range(t):
        np.testing.assert_allclose(
            out[0, i].numpy(), (x[0, i].mean() * w).numpy(), rtol=1e-6, atol=1e-6)


def test_feature_process_prompt_ordering(monkeypatch):
    """The literal feature_process stacks prompts [neg, prompt], takes text = rows [1:],
    uncond = rows [:1], and trims both to cfg text_length — the exact convention our
    serving glue uses (serving/server.py builds [neg, prompt] and slices [1:2]/[0:1])."""
    L, D, text_length = 12, 4, 9
    torch.manual_seed(2)
    hidden = torch.rand(2, L, D)

    def fake_encode_video_features(video_path, model_dict):
        return (feature_utils.AttributeDict(
            {"siglip2_feat": torch.zeros(1, 1, 1), "syncformer_feat": torch.zeros(1, 1, 1)}),
            5.0)

    class _Tok:
        def __call__(self, text, padding=None, return_tensors=None):
            assert list(text) == ["quiet hiss", "glass shattering"]  # [neg, prompt]
            return types.SimpleNamespace(to=lambda device: {"input_ids": torch.zeros(2, L)})

    class _Clap:
        def __call__(self, **kwargs):
            return types.SimpleNamespace(last_hidden_state=hidden, attentions=None)

    monkeypatch.setattr(feature_utils, "encode_video_features", fake_encode_video_features)
    model_dict = types.SimpleNamespace(clap_tokenizer=_Tok(), clap_model=_Clap(),
                                       device="cpu")
    cfg = feature_utils.AttributeDict(
        {"model_config": feature_utils.AttributeDict(
            {"model_kwargs": feature_utils.AttributeDict({"text_length": text_length})})})
    _, text_feats, _ = feature_utils.feature_process(
        "ignored.mp4", "glass shattering", model_dict, cfg, neg_prompt="quiet hiss")
    # prompt row is index 1, uncond row is index 0; both trimmed to text_length
    np.testing.assert_allclose(text_feats.text_feat.numpy(),
                               hidden[1:, :text_length].numpy())
    np.testing.assert_allclose(text_feats.uncond_text_feat.numpy(),
                               hidden[:1, :text_length].numpy())
