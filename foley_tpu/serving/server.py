"""HTTP serving for Foley generation — the production-deployment surface.

The reference serves through ComfyUI's graph runtime only. This module adds a standalone
service: a thread-safe ``FoleyService`` wrapping the model bundle with AOT compile warm-up
over declared (duration, batch, text-bucket) shape buckets (so the first request is never
paused by XLA compilation), plus a stdlib HTTP server exposing:

- ``GET /``                   -> minimal web UI (prompt box -> audio player; the reference
  CLI's --gradio mode analog, ``cli.py:88-96``)
- ``GET /healthz``            -> {"status": "ok", "warm_buckets": [...]}
- ``GET /metrics``            -> request counters + end-to-end latency percentiles
- ``POST /generate``          -> WAV bytes (audio/wav) or JSON with base64 audio
  body: {"prompt": str, "negative_prompt": str, "duration": float, "steps": int,
         "cfg_scale": float, "sampler": str, "batch_size": int, "seed": int,
         "response": "wav"|"json"|"avi"}
  V2A (server started with video encoders): add {"frames_b64": base64(.npz with "frames"
  [T,H,W,3] uint8 or float[0,1]), "frames_fps": float} or {"frames_path": server-local
  video file / image-frames directory}. Visual features reuse the T2A shape buckets
  (clip/sync lengths are duration-derived either way), so V2A requests hit the same
  warmed programs. Add {"mux_video": true} to get the request's frames muxed with the
  generated audio (MJPEG+PCM AVI, ``io/avi.py`` — no ffmpeg on the server): JSON responses
  gain "video_base64"; "response": "avi" returns the container directly (video/x-msvideo).

Generation is serialized with a lock (one TPU program at a time); duration is snapped to the
warmed bucket set to avoid recompiles in production. ``BatchingFoleyService`` (enabled with
``--max_batch > 1``) coalesces concurrent same-bucket requests into one micro-batched TPU
program with distinct prompts/seeds per row.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from foley_tpu.pipeline.generate import ModelBundle, generate_audio
from foley_tpu.utils.logging import get_logger

logger = get_logger()


class FoleyService:
    def __init__(
        self,
        bundle: ModelBundle,
        text_encoder=None,
        durations: Sequence[float] = (5.0,),
        batch_sizes: Sequence[int] = (1,),
        text_buckets: Sequence[int] = (77,),
        default_steps: int = 50,
        video_encoders: Optional[Dict] = None,
        mesh=None,
        v2a_warmup_hw: Optional[Tuple[int, int]] = None,
        frames_root: Optional[str] = "/",
    ):
        self.bundle = bundle
        self.text_encoder = text_encoder
        self.video_encoders = video_encoders
        # frames_path allowlist root: requests may only read under this directory
        # (None disables frames_path entirely). The HTTP entrypoint narrows this to
        # --frames_root / loopback-only; the permissive default is for in-process use.
        self.frames_root = frames_root
        # (H, W) to warm the V2A device-resize programs at; those programs are
        # shape-specialized, so set this to the production camera geometry
        self.v2a_warmup_hw = v2a_warmup_hw
        # multi-chip serving: a jax.sharding.Mesh activated around every device call; the
        # bundle must already be sharded over it (parallel.inference.shard_bundle)
        self.mesh = mesh
        self.durations = sorted(durations)
        self.batch_sizes = sorted(batch_sizes)
        self.text_buckets = sorted(text_buckets)
        self.default_steps = default_steps
        self._lock = threading.Lock()
        self.warm_buckets: List[Tuple[float, int, int]] = []
        self._metrics_lock = threading.Lock()
        self._requests_total = 0
        self._failures_total = 0
        self._in_flight = 0
        self._latencies_ms: List[float] = []  # ring buffer, newest-last

    # -- observability ----------------------------------------------------------
    _LATENCY_WINDOW = 512

    def _record_request(self, elapsed_ms: float, ok: bool) -> None:
        with self._metrics_lock:
            self._requests_total += 1
            if not ok:
                self._failures_total += 1
            self._latencies_ms.append(elapsed_ms)
            if len(self._latencies_ms) > self._LATENCY_WINDOW:
                del self._latencies_ms[: -self._LATENCY_WINDOW]

    def metrics(self) -> Dict:
        """Counters + e2e latency percentiles over the last ``_LATENCY_WINDOW`` requests."""
        with self._metrics_lock:
            lat = list(self._latencies_ms)
            out = {
                "requests_total": self._requests_total,
                "failures_total": self._failures_total,
                "in_flight": self._in_flight,
                "warm_buckets": list(self.warm_buckets),
            }
        if lat:
            arr = np.sort(np.asarray(lat))
            out["latency_ms"] = {
                "p50": round(float(np.percentile(arr, 50)), 1),
                "p95": round(float(np.percentile(arr, 95)), 1),
                "max": round(float(arr[-1]), 1),
                "window": len(arr),
            }
        return out

    def _begin_request(self) -> float:
        """Start metrics accounting for one HTTP request (returns the start time)."""
        import time as _time

        with self._metrics_lock:
            self._in_flight += 1
        return _time.monotonic()

    def _end_request(self, t0: float, ok: bool) -> None:
        import time as _time

        with self._metrics_lock:
            self._in_flight -= 1
        self._record_request((_time.monotonic() - t0) * 1e3, ok)

    def _mesh_ctx(self):
        import contextlib

        return self.mesh if self.mesh is not None else contextlib.nullcontext()

    # -- warmup -----------------------------------------------------------------
    def warmup(self, steps: Optional[int] = None) -> None:
        """Pre-compile every declared shape bucket (the CompileConfig node's runtime)."""
        import jax.numpy as jnp

        steps = steps or self.default_steps
        for d in self.durations:
            for b in self.batch_sizes:
                for tb in self.text_buckets:
                    logger.info(f"warmup: duration={d}s batch={b} text_bucket={tb}")
                    z = jnp.zeros((1, tb, self.bundle.pipeline_cfg.model.condition_dim), jnp.float32)
                    with self._mesh_ctx():
                        generate_audio(
                            self.bundle, z, z, d,
                            guidance_scale=4.5, num_inference_steps=steps,
                            batch_size=b, seed=0, text_bucket=tb,
                        )
                    self.warm_buckets.append((d, b, tb))
        if self.video_encoders:
            # The ViT programs depend only on duration (frame counts are fps-derived and
            # preprocessing outputs the encoders' fixed input size) — compile them now so
            # the first video request isn't paused by SigLIP2/Synchformer compilation.
            # The device-resize programs are additionally specialized on the SOURCE frame
            # geometry: pass v2a_warmup_hw (the production camera resolution) to pre-compile
            # those too; other resolutions compile a small resize program on first sight.
            from foley_tpu.api.nodes import HunyuanFoleySampler

            h, w = self.v2a_warmup_hw or (32, 32)
            for d in self.durations:
                logger.info(f"warmup: v2a encoders duration={d}s source {h}x{w}")
                frames = np.zeros((max(int(round(d * 16.0)), 1), h, w, 3), np.float32)
                HunyuanFoleySampler._encode_video(
                    self.video_encoders, frames, 16.0, d, self.bundle.pipeline_cfg
                )

    def _snap_duration(self, duration: float) -> float:
        for d in self.durations:
            if duration <= d:
                return d
        return self.durations[-1]

    def _continuation_wav(self, request: Dict):
        """Decode a request's ``continue_b64`` WAV (if any) -> [1, T] float mono at the
        DAC sample rate, or None."""
        if "continue_b64" not in request:
            return None
        import io as _io
        import wave as wave_mod

        raw = base64.b64decode(request["continue_b64"])
        with wave_mod.open(_io.BytesIO(raw)) as f:
            sr_want = self.bundle.pipeline_cfg.dac.sample_rate
            if f.getframerate() != sr_want:
                raise ValueError(
                    f"continue_b64 WAV must be {sr_want} Hz (got {f.getframerate()})")
            if f.getsampwidth() != 2:
                raise ValueError("continue_b64 WAV must be 16-bit PCM")
            nch = f.getnchannels()
            pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
        mono = (pcm.astype(np.float32) / 32767.0).reshape(-1, nch).mean(axis=1)
        return mono[None]

    # -- V2A inputs -------------------------------------------------------------
    def _frames_from_request(self, request: Dict):
        """Decode a request's video input, if any -> ([T,H,W,3] float [0,1], fps)."""
        fps = float(request.get("frames_fps", 16.0))
        if "frames_b64" in request:
            import io as _io

            raw = base64.b64decode(request["frames_b64"])
            with np.load(_io.BytesIO(raw)) as z:
                frames = z["frames"]
            if frames.dtype == np.uint8:
                frames = frames.astype(np.float32) / 255.0
            return np.clip(frames.astype(np.float32), 0.0, 1.0), fps
        if "frames_path" in request:
            import os as _os

            from foley_tpu.pipeline.video import read_video_frames

            # frames_path makes the SERVER read a local file/dir on a client's behalf —
            # gate it behind the allowlist so a non-loopback deployment isn't a
            # local-file-probing vector
            if self.frames_root is None:
                raise ValueError(
                    "frames_path is disabled on this server (non-loopback bind without "
                    "--frames_root); send frames_b64 instead"
                )
            path = _os.path.realpath(str(request["frames_path"]))
            root = _os.path.realpath(self.frames_root)
            if path != root and not path.startswith(root.rstrip(_os.sep) + _os.sep):
                raise ValueError("frames_path outside the server's --frames_root allowlist")
            return read_video_frames(path, dir_fps=fps)
        return None, None

    def _visual_features(self, request: Dict, bucket_duration: float,
                         return_frames: bool = False):
        """Encode request video (when present) into (clip_feat, sync_feat, frames_fps);
        ``frames_fps`` is (frames, fps) when ``return_frames`` (for response muxing), else
        None. All three are None for T2A requests."""
        if "frames_b64" not in request and "frames_path" not in request:
            return None, None, None
        if not self.video_encoders:
            # before decoding the (possibly multi-MB) payload: fail with the real reason
            raise ValueError(
                "V2A request (frames_b64/frames_path) but the server has no video encoders; "
                "start it with --enable_v2a"
            )
        frames, fps = self._frames_from_request(request)
        from foley_tpu.api.nodes import HunyuanFoleySampler

        clip_feat, sync_feat = HunyuanFoleySampler._encode_video(
            self.video_encoders, frames, fps, bucket_duration, self.bundle.pipeline_cfg
        )
        return clip_feat, sync_feat, ((frames, fps) if return_frames else None)

    # -- inference --------------------------------------------------------------
    def generate(self, request: Dict) -> Dict:
        import jax.numpy as jnp

        prompt = request.get("prompt", "")
        neg = request.get("negative_prompt", "noisy, harsh")
        duration = float(request.get("duration", 5.0))
        # continuation: "continue_b64" carries a WAV whose tail conditions `duration`
        # seconds of NEW audio (pipeline/longform.py::continue_audio). Shapes depend on
        # (context, duration) and compile on first sight while holding the lock.
        cont_wav = self._continuation_wav(request)
        if cont_wav is not None and ("frames_b64" in request or "frames_path" in request):
            raise ValueError("continuation (continue_b64) is text-conditioned only; "
                             "remove frames_b64/frames_path")
        # beyond the largest warmed bucket: windowed long-form instead of the old silent
        # snap-down — the window is the largest warmed duration
        long_form = duration > self.durations[-1]
        bucket_duration = duration if long_form else self._snap_duration(duration)
        if long_form and ("frames_b64" in request or "frames_path" in request):
            # long-form V2A: windows slice the FULL video's features — encode at the
            # plan's snapped duration (raises if the window bucket is under the 8 s grid)
            from foley_tpu.pipeline.longform import plan_v2a_long

            bucket_duration, _, _ = plan_v2a_long(
                self.bundle.pipeline_cfg, duration, window_s=float(self.durations[-1])
            )
        steps = int(request.get("steps", self.default_steps))
        batch = int(request.get("batch_size", 1))
        want_mux = bool(request.get("mux_video", False))
        clip_feat, sync_feat, frames_fps = self._visual_features(
            request, bucket_duration, return_frames=want_mux
        )
        if self.text_encoder is not None:
            from foley_tpu.models import clap as clap_mod

            feats = clap_mod.encode_text(self.text_encoder, [neg, prompt])
            text, uncond = feats[1:2], feats[0:1]
        else:
            tb = self.text_buckets[0]
            text = uncond = jnp.zeros(
                (1, tb, self.bundle.pipeline_cfg.model.condition_dim), jnp.float32
            )
        with self._lock, self._mesh_ctx():
            if cont_wav is not None:
                from foley_tpu.pipeline.longform import continue_audio, default_window_s

                result = continue_audio(
                    self.bundle, cont_wav, text, uncond, duration,
                    context_s=float(request.get("context_s", 4.0)),
                    window_s=default_window_s(self.bundle.pipeline_cfg),
                    guidance_scale=float(request.get("cfg_scale", 4.5)),
                    num_inference_steps=steps,
                    sampler=request.get("sampler", "euler"),
                    batch_size=batch,
                    seed=int(request.get("seed", 0)),
                    text_bucket=self.text_buckets[0],
                )
            elif long_form:
                from foley_tpu.pipeline.longform import generate_audio_long

                result = generate_audio_long(
                    self.bundle, text, uncond, duration,
                    clip_feat=clip_feat, sync_feat=sync_feat,
                    window_s=float(self.durations[-1]),
                    guidance_scale=float(request.get("cfg_scale", 4.5)),
                    num_inference_steps=steps,
                    sampler=request.get("sampler", "euler"),
                    batch_size=batch,
                    seed=int(request.get("seed", 0)),
                    text_bucket=self.text_buckets[0],
                    # arbitrary durations must reuse a bounded program set in production
                    # (compiles hold the generation lock) — snap to the window-stride grid
                    snap_to_window_grid=True,
                )
            else:
                result = generate_audio(
                    self.bundle, text, uncond, bucket_duration,
                    clip_feat=clip_feat,
                    sync_feat=sync_feat,
                    guidance_scale=float(request.get("cfg_scale", 4.5)),
                    num_inference_steps=steps,
                    sampler=request.get("sampler", "euler"),
                    batch_size=batch,
                    seed=int(request.get("seed", 0)),
                    text_bucket=self.text_buckets[0],
                )
        n = int(duration * result.sample_rate)
        out = {
            "waveform": np.asarray(result.audio_first)[0, :, :n],  # [C, T] trimmed to request
            "sample_rate": result.sample_rate,
            "timings": result.timings,
        }
        if frames_fps is not None:
            # mux the request's own frames with the generated audio (MJPEG+PCM AVI,
            # io/avi.py — no ffmpeg on the server required)
            from foley_tpu.io.avi import build_avi_bytes

            frames, fps = frames_fps
            out["video_avi"] = build_avi_bytes(
                frames, fps, out["waveform"], result.sample_rate,
                quality=str(request.get("quality", "high")),
            )
        return out

    def generate_stream(self, request: Dict):
        """Streaming variant of ``generate``: yields a header dict, then one dict per
        finalized audio chunk — ``{"pcm": <raw little-endian int16 mono PCM bytes>,
        "start_sample": int, "final": bool}``.

        Long-form (over-bucket) requests emit one chunk per window the moment it is
        denoised (``pipeline/longform.py::generate_audio_long_stream``):
        time-to-first-audio is ~one window instead of the whole request. In-bucket
        durations emit a single chunk through the same program ``generate`` uses.
        Streams the FIRST batch row; bypasses micro-batching (the stream holds the
        generation lock until done)."""
        import jax.numpy as jnp

        if request.get("mux_video"):
            raise ValueError("mux_video is not supported with response=pcm16_stream")
        cont_wav = self._continuation_wav(request)
        if cont_wav is not None and ("frames_b64" in request or "frames_path" in request):
            raise ValueError("continuation (continue_b64) is text-conditioned only; "
                             "remove frames_b64/frames_path")
        prompt = request.get("prompt", "")
        neg = request.get("negative_prompt", "noisy, harsh")
        duration = float(request.get("duration", 5.0))
        long_form = duration > self.durations[-1]
        bucket_duration = duration if long_form else self._snap_duration(duration)
        if long_form and ("frames_b64" in request or "frames_path" in request):
            from foley_tpu.pipeline.longform import plan_v2a_long

            bucket_duration, _, _ = plan_v2a_long(
                self.bundle.pipeline_cfg, duration, window_s=float(self.durations[-1])
            )
        steps = int(request.get("steps", self.default_steps))
        batch = int(request.get("batch_size", 1))
        # optional latency ramp: a smaller first window cuts time-to-first-audio to
        # ~first_window_s/window_s of a full window's denoise (longform._prepare_long);
        # windowed (long-form/continuation) paths only — in-bucket single shots have no
        # window schedule to ramp. Validated HERE, before the response header is sent,
        # so bad requests get a clean 500 instead of a mid-stream disconnect.
        ramp = {}
        if request.get("first_window_s") is not None:
            if not long_form and cont_wav is None:
                raise ValueError(
                    "first_window_s applies to windowed streams only (duration over the "
                    "largest bucket, or continuation); this request is single-shot")
            ramp["first_window_s"] = float(request["first_window_s"])
        clip_feat, sync_feat, _ = self._visual_features(request, bucket_duration)
        if self.text_encoder is not None:
            from foley_tpu.models import clap as clap_mod

            feats = clap_mod.encode_text(self.text_encoder, [neg, prompt])
            text, uncond = feats[1:2], feats[0:1]
        else:
            tb = self.text_buckets[0]
            text = uncond = jnp.zeros(
                (1, tb, self.bundle.pipeline_cfg.model.condition_dim), jnp.float32
            )
        pcfg = self.bundle.pipeline_cfg
        sr = pcfg.dac.sample_rate
        from foley_tpu.pipeline.longform import emitted_samples

        if cont_wav is not None:
            # Continuation emits on the LATENT grid (continue_audio_stream yields
            # latent_length(duration) frames of new audio — the generated region is
            # frame-granular, there is no sub-frame tail to emit), so the header must
            # promise the latent-grid total: for off-grid durations (e.g. 5.25 s)
            # int(duration*sr) would overshoot what the stream emits and the client
            # would misread every successful stream as a mid-stream failure.
            n_total = pcfg.latent_length(duration) * pcfg.dac.hop_length
        else:
            n_total = emitted_samples(duration, sr)
        yield {"header": {"sample_rate": sr, "channels": 1, "total_samples": n_total}}
        common = dict(
            guidance_scale=float(request.get("cfg_scale", 4.5)),
            num_inference_steps=steps, sampler=request.get("sampler", "euler"),
            batch_size=batch,
            seed=int(request.get("seed", 0)), text_bucket=self.text_buckets[0],
        )
        with self._lock, self._mesh_ctx():
            if cont_wav is not None:
                from foley_tpu.pipeline.longform import continue_audio_stream, default_window_s

                for ch in continue_audio_stream(
                    self.bundle, cont_wav, text, uncond, duration,
                    context_s=float(request.get("context_s", 4.0)),
                    window_s=default_window_s(self.bundle.pipeline_cfg), **common, **ramp,
                ):
                    yield {"pcm": ch.pcm16[0].tobytes(),
                           "start_sample": ch.start_sample, "final": ch.final}
            elif long_form:
                from foley_tpu.pipeline.longform import generate_audio_long_stream

                for ch in generate_audio_long_stream(
                    self.bundle, text, uncond, duration,
                    clip_feat=clip_feat, sync_feat=sync_feat,
                    window_s=float(self.durations[-1]),
                    snap_to_window_grid=True, **common, **ramp,
                ):
                    yield {"pcm": ch.pcm16[0].tobytes(),
                           "start_sample": ch.start_sample, "final": ch.final}
            else:
                result = generate_audio(
                    self.bundle, text, uncond, bucket_duration,
                    clip_feat=clip_feat, sync_feat=sync_feat, **common,
                )
                from foley_tpu.io.native import float_to_pcm16

                w = np.asarray(result.audio_first)[0, 0, :n_total]
                yield {"pcm": float_to_pcm16(w).tobytes(),
                       "start_sample": 0, "final": True}


class BatchingFoleyService(FoleyService):
    """Continuous-batching service: concurrent requests with matching shape buckets
    (duration, steps, sampler, cfg_scale) are micro-batched into one TPU program via
    ``generate_audio_multi`` — distinct prompts and seeds per row.

    Two-stage pipeline (continuous batching): a *former* thread admits queued requests into
    groups and runs the host/encoder work (CLAP text encoding, padding) while the previous
    group's denoise program is still on-device; prepared groups hand off through a bounded
    queue to a *dispatcher* thread that owns the device. So >1 group is in flight at a time:
    group N executes while group N+1 is formed and encoded, keeping the chip busy back-to-back
    instead of serving one request-group per wall-clock round trip.
    """

    def __init__(self, *args, max_batch: int = 4, batch_window_s: float = 0.05,
                 pipeline_depth: int = 2, **kwargs):
        super().__init__(*args, **kwargs)
        import queue as _queue

        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self._queue: "list" = []
        self._queue_lock = threading.Lock()
        self._queue_event = threading.Event()
        # prepared-group handoff; bounded so the former backpressures instead of running
        # unboundedly ahead of the device
        self._dispatch_q: "_queue.Queue" = _queue.Queue(maxsize=max(pipeline_depth - 1, 1))
        self.events: List[Tuple[str, int, float]] = []  # (stage, group_id, t) observability
        self._events_lock = threading.Lock()
        self._group_counter = 0
        threading.Thread(target=self._form_loop, daemon=True).start()
        threading.Thread(target=self._dispatch_loop, daemon=True).start()

    class _Pending:
        def __init__(self, request):
            self.request = request
            self.event = threading.Event()
            self.result = None
            self.error = None

    def generate(self, request: Dict) -> Dict:
        if ("frames_b64" in request or "frames_path" in request
                or float(request.get("duration", 5.0)) > self.durations[-1]):
            # V2A rows carry per-request visual features generate_audio_multi doesn't
            # batch, and over-bucket durations take the windowed long-form path; serve
            # both directly (lock-serialized with the dispatcher's device work).
            return FoleyService.generate(self, request)
        pending = self._Pending(request)
        with self._queue_lock:
            self._queue.append(pending)
        self._queue_event.set()
        pending.event.wait()
        if pending.error is not None:
            raise pending.error
        return pending.result

    def _bucket(self, req: Dict):
        return (
            self._snap_duration(float(req.get("duration", 5.0))),
            int(req.get("steps", self.default_steps)),
            req.get("sampler", "euler"),
            float(req.get("cfg_scale", 4.5)),
        )

    def _mark(self, stage: str, gid: int) -> None:
        import time as _time

        with self._events_lock:
            self.events.append((stage, gid, _time.monotonic()))

    def groups_in_flight(self) -> int:
        """Groups prepared or executing but not yet finished (from the event log)."""
        with self._events_lock:
            started = {g for s, g, _ in self.events if s == "prepare_start"}
            finished = {g for s, g, _ in self.events if s == "done"}
        return len(started - finished)

    def _form_loop(self):
        """Admit requests into bucket groups and run host-side prep, overlapping the device."""
        import time as _time

        while True:
            self._queue_event.wait()
            _time.sleep(self.batch_window_s)  # let concurrent arrivals coalesce
            with self._queue_lock:
                if not self._queue:
                    self._queue_event.clear()
                    continue
                head = self._queue[0]
                bucket = self._bucket(head.request)
                group = [p for p in self._queue if self._bucket(p.request) == bucket][: self.max_batch]
                for p in group:
                    self._queue.remove(p)
                if not self._queue:
                    self._queue_event.clear()
                self._group_counter += 1
                gid = self._group_counter
            try:
                self._mark("prepare_start", gid)
                prepared = self._prepare_group(group, bucket)
                self._mark("prepare_done", gid)
                self._dispatch_q.put((gid, group, bucket, prepared))  # blocks at depth limit
            except Exception as e:  # noqa: BLE001
                for p in group:
                    p.error = e
                    p.event.set()

    def _dispatch_loop(self):
        while True:
            gid, group, bucket, prepared = self._dispatch_q.get()
            try:
                self._mark("device_start", gid)
                self._dispatch_group(group, bucket, prepared)
            except Exception as e:  # noqa: BLE001
                for p in group:
                    p.error = e
                    p.event.set()
            finally:
                self._mark("done", gid)

    def _prepare_group(self, group, bucket):
        """Host/encoder work for one group (runs while the previous group is on-device)."""
        import jax.numpy as jnp

        tb = self.text_buckets[0]
        dim = self.bundle.pipeline_cfg.model.condition_dim
        texts, unconds, seeds = [], [], []
        for p in group:
            req = p.request
            if self.text_encoder is not None:
                from foley_tpu.models import clap as clap_mod

                feats = clap_mod.encode_text(
                    self.text_encoder,
                    [req.get("negative_prompt", "noisy, harsh"), req.get("prompt", "")],
                )
                texts.append(np.asarray(feats[1]))
                unconds.append(np.asarray(feats[0]))
            else:
                texts.append(np.zeros((tb, dim), np.float32))
                unconds.append(np.zeros((tb, dim), np.float32))
            seeds.append(int(req.get("seed", 0)))

        max_l = max(t.shape[0] for t in texts)
        pad = lambda t: np.pad(t, ((0, max_l - t.shape[0]), (0, 0)))
        text_b = jnp.asarray(np.stack([pad(t) for t in texts]))
        uncond_b = jnp.asarray(np.stack([pad(t) for t in unconds]))
        return text_b, uncond_b, seeds

    def _dispatch_group(self, group, bucket, prepared):
        from foley_tpu.pipeline.generate import generate_audio_multi

        duration, steps, sampler, cfg_scale = bucket
        text_b, uncond_b, seeds = prepared
        with self._lock, self._mesh_ctx():
            result = generate_audio_multi(
                self.bundle, text_b, uncond_b, duration, seeds,
                guidance_scale=cfg_scale, num_inference_steps=steps, sampler=sampler,
                text_bucket=self.text_buckets[0],
            )
        for i, p in enumerate(group):
            n = int(float(p.request.get("duration", duration)) * result.sample_rate)
            p.result = {
                "waveform": result.audio_batch[i][:, :n],
                "sample_rate": result.sample_rate,
                "timings": None,
            }
            p.event.set()


def _wav_bytes(waveform: np.ndarray, sample_rate: int) -> bytes:
    # Native C++ PCM conversion + WAV framing when built (numpy fallback inside).
    from foley_tpu.io.native import wav_image

    return wav_image(waveform, sample_rate)


_INDEX_HTML = b"""<!doctype html>
<html><head><meta charset="utf-8"><title>foley-tpu</title>
<style>body{font-family:sans-serif;max-width:640px;margin:3em auto;padding:0 1em}
label{display:block;margin:.6em 0 .2em}input,select{width:100%;padding:.4em}
button{margin-top:1em;padding:.6em 1.4em}#status{margin-top:1em;color:#555}</style></head>
<body><h2>foley-tpu &mdash; text &rarr; Foley audio</h2>
<label>Prompt</label><input id="prompt" value="rain on a tin roof">
<label>Negative prompt</label><input id="neg" value="noisy, harsh">
<label>Duration (s)</label><input id="dur" type="number" value="5" min="1" max="600">
<label>Steps</label><input id="steps" type="number" value="50" min="10" max="100">
<label>CFG scale</label><input id="cfg" type="number" value="4.5" step="0.5" min="1" max="10">
<label>Seed</label><input id="seed" type="number" value="0">
<button onclick="gen()">Generate</button>
<div id="status"></div><audio id="player" controls style="width:100%;margin-top:1em"></audio>
<script>
async function gen(){
  const s=document.getElementById('status');s.textContent='generating...';
  const body={prompt:prompt_el('prompt'),negative_prompt:prompt_el('neg'),
    duration:+prompt_el('dur'),steps:+prompt_el('steps'),cfg_scale:+prompt_el('cfg'),
    seed:+prompt_el('seed')};
  const r=await fetch('/generate',{method:'POST',body:JSON.stringify(body)});
  if(!r.ok){s.textContent='error: '+await r.text();return;}
  const blob=await r.blob();
  document.getElementById('player').src=URL.createObjectURL(blob);
  s.textContent='done';
}
function prompt_el(id){return document.getElementById(id).value}
</script></body></html>
"""


def create_server(service: FoleyService, host: str = "127.0.0.1", port: int = 8321) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.info("http: " + fmt % args)

        def _send(self, code: int, body: bytes, ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                payload = {"status": "ok", "warm_buckets": service.warm_buckets}
                self._send(200, json.dumps(payload).encode())
            elif self.path == "/metrics":
                self._send(200, json.dumps(service.metrics()).encode())
            elif self.path in ("/", "/index.html"):
                self._send(200, _INDEX_HTML, ctype="text/html; charset=utf-8")
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, b'{"error": "not found"}')
                return
            # metrics accounting spans parse + generate + WAV framing (so malformed
            # payloads count as failures too) and completes BEFORE the response is sent:
            # by the time a client has its answer, /metrics already reflects it
            t0 = service._begin_request()
            ok = False
            streamed = False  # True once stream headers are on the wire (no _send after)
            body, ctype = b"", "application/json"
            try:
                length = int(self.headers.get("Content-Length", 0))
                request = json.loads(self.rfile.read(length) or b"{}")
                if request.get("response") == "pcm16_stream":
                    # Raw int16 mono PCM streamed chunk-by-chunk as windows finalize
                    # (long-form: time-to-first-audio ~= one window). The first
                    # generator item (the header) runs all request validation, so
                    # errors before it still produce a clean JSON 500.
                    gen = service.generate_stream(request)
                    header = next(gen)["header"]
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header("X-Sample-Rate", str(header["sample_rate"]))
                    self.send_header("X-Channels", str(header["channels"]))
                    self.send_header("X-Total-Samples", str(header["total_samples"]))
                    # body is delimited by connection close (works for HTTP/1.0 clients;
                    # no Content-Length is known up front)
                    self.send_header("Connection", "close")
                    self.end_headers()
                    streamed = True
                    for chunk in gen:
                        self.wfile.write(chunk["pcm"])
                        self.wfile.flush()
                    ok = True
                    self.close_connection = True
                    return
                out = service.generate(request)
                wav = _wav_bytes(out["waveform"], out["sample_rate"])
                mode = request.get("response", "wav")
                if mode == "json":
                    payload = {
                        "audio_base64": base64.b64encode(wav).decode(),
                        "sample_rate": out["sample_rate"],
                        "timings": out["timings"],
                    }
                    if "video_avi" in out:
                        payload["video_base64"] = base64.b64encode(out["video_avi"]).decode()
                    body = json.dumps(payload).encode()
                elif mode == "avi":
                    if "video_avi" not in out:
                        raise ValueError(
                            'response="avi" requires a V2A request with "mux_video": true '
                            "(no video was produced to return)"
                        )
                    body, ctype = out["video_avi"], "video/x-msvideo"
                else:
                    body, ctype = wav, "audio/wav"
                ok = True
            except Exception as e:  # noqa: BLE001 — surface errors to the client
                logger.warning(f"generate failed: {e}")
                body = json.dumps({"error": str(e)}).encode()
            finally:
                service._end_request(t0, ok)
            if streamed:
                # headers already on the wire: a mid-stream failure can only be signaled
                # by the early connection close (the client sees fewer than
                # X-Total-Samples samples); never append a JSON body to a PCM stream
                self.close_connection = True
                return
            self._send(200 if ok else 500, body, ctype=ctype)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> int:
    """``python -m foley_tpu.serving.server --model_path ... [--random_init tiny]``"""
    import argparse

    p = argparse.ArgumentParser("foley-tpu-serve", description=__doc__)
    p.add_argument("--model_path", default=None)
    p.add_argument("--random_init", default=None)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--quantization", default="none",
                   choices=["none", "auto", "fp8_e4m3fn", "fp8_e5m2", "int8", "int8_dynamic",
                            "int4"],
                   help="weight quantization for the checkpoint load (same modes as the "
                        "HunyuanModelLoader node)")
    p.add_argument("--lora", default="",
                   help="LoRA adapter dir (training/loop.py::export_lora) merged into the "
                        "model weights at load, before any --quantization")
    p.add_argument("--lora_scale", type=float, default=1.0,
                   help="multiplier on the adapter's own recommended scale")
    p.add_argument("--config", default="xxl", choices=["xxl", "xl", "tiny"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--durations", default="5")
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--max_batch", type=int, default=1,
                   help=">1 enables request coalescing (BatchingFoleyService)")
    p.add_argument("--enable_v2a", action="store_true",
                   help="load the SigLIP2/Synchformer encoders so requests may carry video "
                        "(frames_b64 / frames_path)")
    p.add_argument("--v2a_preprocess", default="device", choices=["device", "pil"],
                   help="frame resize/normalize on the TPU (fast; default) or via PIL "
                        "(bit-parity with the reference's torchvision pipeline but tens of "
                        "host-seconds per clip on weak hosts)")
    p.add_argument("--v2a_warmup_hw", default="",
                   help='source frame geometry "HxW" (e.g. 360x640) to pre-compile the '
                        "V2A device-resize programs at — set to the production camera "
                        "resolution so the first video request is fully warm")
    p.add_argument("--frames_root", default=None,
                   help="directory allowlist for request frames_path reads; required to "
                        "enable frames_path on a non-loopback --host (loopback binds "
                        "default to unrestricted)")
    p.add_argument("--mesh", default="",
                   help='multi-chip serving over a ("data","model") mesh, e.g. '
                        '"data=4,model=2" on a v5p-8: MMDiT shards per the Megatron '
                        "col/row rules, DAC replicates, and every request runs under the "
                        "mesh (XLA inserts the ICI collectives). Empty = single chip.")
    p.add_argument("--blocks_to_swap", type=int, default=0,
                   help="host-offload the LAST N transformer blocks (54 = every block "
                        "off-chip). Composes with --quantization int4 (blocks stream 4x "
                        "fewer host->HBM bytes: 232 vs 766 ms/step at N=54, ROADMAP); "
                        "single-chip only (mutually exclusive with --mesh)")
    p.add_argument("--prefetch_blocks", type=int, default=0,
                   help="extra offloaded-block fetches in flight (HBM window = N+1); "
                        ">0 measured faster at small swaps but RESOURCE_EXHAUSTs at "
                        "swap>=36 on this runtime — opt-in (same knob as the CLI's)")
    args = p.parse_args(argv)
    if args.blocks_to_swap and args.mesh:
        p.error("--blocks_to_swap is a single-chip memory mode; drop --mesh")
    if args.prefetch_blocks and not args.blocks_to_swap:
        p.error("--prefetch_blocks only applies with --blocks_to_swap > 0")

    # validate pure-string args BEFORE the minutes-long checkpoint load
    mesh_spec = {}
    for kv in filter(None, args.mesh.split(",")) if args.mesh else ():
        key, _, val = kv.partition("=")
        key = key.strip()
        if key not in ("data", "model") or not val.strip().isdigit() or int(val) < 1 \
                or key in mesh_spec:
            p.error(f"--mesh: bad entry {kv!r} (expected e.g. \"data=4,model=2\", "
                    "positive sizes, no duplicate axes)")
        mesh_spec[key] = int(val)
    warmup_hw = None
    if args.v2a_warmup_hw:
        parts = args.v2a_warmup_hw.lower().split("x")
        if len(parts) != 2 or not all(x.isdigit() and int(x) > 0 for x in parts):
            p.error(f'--v2a_warmup_hw: bad geometry {args.v2a_warmup_hw!r} '
                    '(expected "HxW", positive integers)')
        warmup_hw = (int(parts[0]), int(parts[1]))
    if warmup_hw and args.v2a_preprocess != "device":
        # PIL preprocessing outputs a fixed size — no program depends on the source
        # geometry, and the host-side PIL loop at camera resolution costs tens of seconds
        logger.warning("--v2a_warmup_hw has no effect with --v2a_preprocess pil; ignoring")
        warmup_hw = None

    import jax

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.random_init:
        from foley_tpu.configs import get_config
        from foley_tpu.models import dac_vae

        fm = HunyuanModelLoader.init_random(args.random_init, args.precision, 0)
        if args.lora:
            from foley_tpu.api.nodes import _merge_lora_if_given

            fm["params"] = _merge_lora_if_given(fm["params"], args.lora, args.lora_scale)
        cfg = get_config(args.random_init)
        bundle = ModelBundle(
            mmdit_params=fm["params"],
            dac_params=dac_vae.init(jax.random.PRNGKey(1), cfg.dac),
            pipeline_cfg=cfg,
            compute_dtype=fm["dtype"],
        )
        text_encoder = None
        video_encoders = None
        if args.enable_v2a:
            from foley_tpu.models import siglip2, synchformer

            video_encoders = {
                "siglip2": siglip2.init_random(2, cfg.model.clip_dim),
                "synchformer": synchformer.init_random(3, cfg.model.sync_feat_dim),
            }
    else:
        import os

        from foley_tpu.pipeline.standalone import load_model

        manager = load_model(args.model_path, config=args.config,
                             precision=args.precision, quantization=args.quantization,
                             lora_path=args.lora, lora_scale=args.lora_scale)
        bundle = ModelBundle(
            mmdit_params=manager.foley["params"],
            dac_params=manager.dac["params"],
            pipeline_cfg=manager.pipeline_cfg,
            compute_dtype=manager.foley["dtype"],
            latent_stats=manager.foley.get("latent_stats"),
        )
        text_encoder = manager.clap
        video_encoders = None
        if args.enable_v2a:
            video_encoders = {"siglip2": manager.siglip2, "synchformer": manager.synchformer}

    if video_encoders:
        for enc in video_encoders.values():
            enc.preprocess = args.v2a_preprocess

    if args.blocks_to_swap > 0:
        from foley_tpu.parallel.offload import host_memory_available, offload_block_suffix

        if host_memory_available():
            # the low-HBM serving mode: split stacks stream per-block inside the denoise
            # scan (composes with --quantization int4 — ROADMAP int4 swap table)
            bundle = bundle._replace(
                mmdit_params=offload_block_suffix(bundle.mmdit_params,
                                                  args.blocks_to_swap),
                offload_prefetch=args.prefetch_blocks + 1)
        else:
            logger.warning("--blocks_to_swap ignored: backend has no pinned_host memory")

    mesh = None
    if mesh_spec:
        from foley_tpu.parallel.inference import shard_bundle
        from foley_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=mesh_spec.get("data"), model=mesh_spec.get("model"))
        bundle = shard_bundle(bundle, mesh)

    if args.frames_root:
        frames_root = args.frames_root
    elif args.host in ("127.0.0.1", "localhost", "::1"):
        frames_root = "/"  # loopback clients already have local file access
    else:
        frames_root = None  # public bind: frames_path off unless explicitly allowlisted

    service_cls = FoleyService if args.max_batch <= 1 else BatchingFoleyService
    extra = {} if args.max_batch <= 1 else {"max_batch": args.max_batch}
    service = service_cls(
        bundle, text_encoder,
        durations=tuple(float(x) for x in args.durations.split(",")),
        video_encoders=video_encoders,
        mesh=mesh,
        v2a_warmup_hw=warmup_hw,
        frames_root=frames_root,
        **extra,
    )
    service.warmup(steps=args.warmup_steps)
    server = create_server(service, args.host, args.port)
    logger.info(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
