"""Serving layer: warmup buckets, /healthz, /generate returning valid WAV over HTTP."""

import base64
import json
import threading
import urllib.error
import urllib.request
import wave
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foley_tpu.configs import TINY
from foley_tpu.models import dac_vae, mmdit
from foley_tpu.pipeline.generate import ModelBundle
from foley_tpu.serving import FoleyService, create_server


@pytest.fixture(scope="module")
def service():
    from foley_tpu.models import siglip2, synchformer

    bundle = ModelBundle(
        mmdit_params=mmdit.init(jax.random.PRNGKey(0), TINY.model),
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    encoders = {
        "siglip2": siglip2.init_random(2, TINY.model.clip_dim),
        "synchformer": synchformer.init_random(3, TINY.model.sync_feat_dim),
    }
    svc = FoleyService(bundle, durations=(1.0,), text_buckets=(16,), default_steps=2,
                       video_encoders=encoders)
    svc.warmup(steps=2)
    return svc


def _frames_b64(n=16, h=24, w=24) -> str:
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, frames=frames)
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def server(service):
    srv = create_server(service, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_warmup_registered(service):
    assert (1.0, 1, 16) in service.warm_buckets


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["warm_buckets"]


def test_generate_wav(server):
    req = urllib.request.Request(
        server + "/generate",
        data=json.dumps({"prompt": "clink", "duration": 1.0, "steps": 2, "seed": 3}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    with wave.open(io.BytesIO(data)) as f:
        assert f.getframerate() == 48000
        assert f.getnframes() == 48000


def test_generate_json_and_determinism(server):
    def call(seed):
        req = urllib.request.Request(
            server + "/generate",
            data=json.dumps({"prompt": "x", "duration": 1.0, "steps": 2, "seed": seed,
                             "response": "json"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    a, b, c = call(1), call(1), call(2)
    assert a["audio_base64"] == b["audio_base64"]
    assert a["audio_base64"] != c["audio_base64"]
    assert a["sample_rate"] == 48000


def test_unknown_route(server):
    req = urllib.request.Request(server + "/nope", data=b"{}")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_index_page(server):
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        body = r.read().decode()
    assert r.headers["Content-Type"].startswith("text/html")
    assert "/generate" in body and "foley-tpu" in body


def test_generate_audio_multi_row_equals_solo():
    """A single row of the micro-batched path equals generate_audio with that seed."""
    from foley_tpu.pipeline.generate import generate_audio, generate_audio_multi

    bundle = ModelBundle(
        mmdit_params=mmdit.init(jax.random.PRNGKey(0), TINY.model),
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.normal(size=(1, 10, TINY.model.condition_dim)).astype(np.float32))
    t2 = jnp.asarray(rng.normal(size=(1, 10, TINY.model.condition_dim)).astype(np.float32))
    uz = jnp.zeros_like(t1)
    multi = generate_audio_multi(
        bundle, jnp.concatenate([t1, t2]), jnp.concatenate([uz, uz]), 1.0, seeds=[11, 22],
        guidance_scale=4.5, num_inference_steps=2, text_bucket=16, return_latents=True,
    )
    solo = generate_audio(bundle, t2, uz, 1.0, guidance_scale=4.5, num_inference_steps=2,
                          batch_size=1, seed=22, text_bucket=16, return_latents=True)
    assert multi.audio_batch.shape[0] == 2
    # Denoise-path equality is asserted on the LATENTS: the random-init DAC decoder is
    # effectively chaotic (saturated tanh output), so fp32-rounding-level latent differences
    # between the fused (denoise_and_decode) and two-program paths flip boundary samples.
    np.testing.assert_allclose(multi.latents[1], solo.latents[0], atol=2e-4, rtol=1e-3)
    assert multi.audio_batch.shape == (2, 1, 48000)
    assert np.isfinite(multi.audio_batch).all()
    # distinct prompts/seeds -> distinct rows
    assert np.abs(multi.latents[0] - multi.latents[1]).max() > 0


def test_batching_service_coalesces_concurrent_requests():
    from concurrent.futures import ThreadPoolExecutor

    from foley_tpu.serving.server import BatchingFoleyService

    bundle = ModelBundle(
        mmdit_params=mmdit.init(jax.random.PRNGKey(0), TINY.model),
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    svc = BatchingFoleyService(bundle, durations=(1.0,), text_buckets=(16,),
                               default_steps=2, max_batch=4, batch_window_s=0.2)
    reqs = [{"prompt": f"p{i}", "duration": 1.0, "steps": 2, "seed": i} for i in range(3)]
    with ThreadPoolExecutor(3) as ex:
        outs = list(ex.map(svc.generate, reqs))
    for out in outs:
        assert out["waveform"].shape == (1, 48000)
        assert out["sample_rate"] == 48000
    # distinct seeds -> distinct outputs
    assert np.abs(outs[0]["waveform"] - outs[1]["waveform"]).max() > 0


def test_batching_service_error_does_not_wedge_worker():
    from foley_tpu.serving.server import BatchingFoleyService

    bundle = ModelBundle(
        mmdit_params=mmdit.init(jax.random.PRNGKey(0), TINY.model),
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    svc = BatchingFoleyService(bundle, durations=(1.0,), text_buckets=(16,),
                               default_steps=2, batch_window_s=0.05)
    with pytest.raises(Exception):
        svc.generate({"prompt": "x", "duration": 1.0, "steps": 2, "sampler": "bogus"})
    # worker survives and serves the next valid request
    out = svc.generate({"prompt": "x", "duration": 1.0, "steps": 2, "seed": 1})
    assert out["waveform"].shape == (1, 48000)


def test_batching_service_splits_mismatched_buckets():
    """Requests with different (duration/steps) buckets are served in separate groups."""
    from concurrent.futures import ThreadPoolExecutor

    from foley_tpu.serving.server import BatchingFoleyService

    bundle = ModelBundle(
        mmdit_params=mmdit.init(jax.random.PRNGKey(0), TINY.model),
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    svc = BatchingFoleyService(bundle, durations=(1.0,), text_buckets=(16,),
                               default_steps=2, batch_window_s=0.2)
    reqs = [
        {"prompt": "a", "duration": 1.0, "steps": 2, "seed": 1},
        {"prompt": "b", "duration": 1.0, "steps": 4, "seed": 2},  # different bucket
        {"prompt": "c", "duration": 1.0, "steps": 2, "seed": 3},
    ]
    with ThreadPoolExecutor(3) as ex:
        outs = list(ex.map(svc.generate, reqs))
    for out in outs:
        assert out["waveform"].shape == (1, 48000)


def test_metrics_endpoint_counts_and_latency(server):
    """GET /metrics reflects served requests (counter, latency percentiles, no failures)."""
    req = urllib.request.Request(
        server + "/generate",
        data=json.dumps({"prompt": "tick", "duration": 1.0, "steps": 2, "seed": 7}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        r.read()
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests_total"] >= 1 and m["failures_total"] == 0 and m["in_flight"] == 0
    assert m["latency_ms"]["p50"] > 0 and m["latency_ms"]["p95"] >= m["latency_ms"]["p50"]
    # failures are counted too (V2A without encoders on a fresh service via HTTP handler)
    bad = urllib.request.Request(
        server + "/generate", data=b'{"duration": 1.0, "steps": "not-an-int"}',
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(bad, timeout=60)
    except urllib.error.HTTPError as e:
        assert e.code == 500
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        m2 = json.loads(r.read())
    assert m2["failures_total"] == m["failures_total"] + 1


def test_v2a_request_service_level(service):
    """frames_b64 flows through the sampler's video-encoder path and reuses the warmed
    T2A shape bucket (clip/sync lengths are duration-derived either way)."""
    out = service.generate({
        "prompt": "clink", "duration": 1.0, "steps": 2, "seed": 1,
        "frames_b64": _frames_b64(), "frames_fps": 16.0,
    })
    assert out["waveform"].shape == (1, 48000)
    wf = np.asarray(out["waveform"])
    assert np.all(np.isfinite(wf)) and np.abs(wf).max() > 0


def test_v2a_mux_video_response(service):
    """mux_video=true returns the request's own frames muxed with the generated audio as
    an MJPEG+PCM AVI (io/avi.py) — no ffmpeg on the server."""
    from foley_tpu.io.avi import read_avi_info

    out = service.generate({
        "prompt": "clink", "duration": 1.0, "steps": 2, "seed": 1,
        "frames_b64": _frames_b64(), "frames_fps": 16.0, "mux_video": True,
    })
    assert "video_avi" in out
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".avi") as f:
        f.write(out["video_avi"])
        f.flush()
        info = read_avi_info(f.name)
    assert info["n_frames"] == 16 and len(info["jpegs"]) == 16
    assert info["sample_rate"] == out["sample_rate"] and info["channels"] == 2
    pcm = np.frombuffer(info["pcm"], "<i2").reshape(-1, 2)
    assert pcm.shape[0] == out["waveform"].shape[-1]
    np.testing.assert_allclose(
        pcm[:, 0] / 32767.0, np.asarray(out["waveform"])[0], atol=1.5 / 32767.0
    )
    # T2A requests with mux_video are a no-op (no frames to mux)
    out2 = service.generate({"prompt": "clink", "duration": 1.0, "steps": 2,
                             "seed": 1, "mux_video": True})
    assert "video_avi" not in out2


def test_long_form_request_over_bucket(service):
    """A request beyond the largest warmed bucket takes the windowed long-form path (T2A)
    instead of silently snapping down; V2A + over-bucket errors actionably."""
    out = service.generate({"prompt": "wind", "duration": 2.5, "steps": 2, "seed": 3})
    assert out["waveform"].shape == (1, int(2.5 * 48000))
    assert np.all(np.isfinite(np.asarray(out["waveform"])))
    # V2A over-bucket routes through the windowed path, whose stride must cover the 8 s
    # conditioning grid — impossible with this service's 1 s window bucket: loud error
    with pytest.raises(ValueError, match="window - overlap"):
        service.generate({"prompt": "wind", "duration": 2.5, "steps": 2,
                          "frames_b64": _frames_b64()})
    # r4 verdict #3: multi-stage solvers now route through the windowed path too
    out_h = service.generate({"prompt": "wind", "duration": 2.5, "steps": 2, "seed": 3,
                              "sampler": "heun-2"})
    assert out_h["waveform"].shape == (1, int(2.5 * 48000))
    assert np.all(np.isfinite(np.asarray(out_h["waveform"])))


def test_v2a_request_frames_path(service, tmp_path):
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(16):
        Image.fromarray(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)).save(
            d / f"f_{i:03d}.png")
    out = service.generate({
        "prompt": "clink", "duration": 1.0, "steps": 2, "seed": 1,
        "frames_path": str(d), "frames_fps": 16.0,
    })
    assert out["waveform"].shape == (1, 48000)


def test_frames_path_allowlist(service, tmp_path):
    """frames_path is gated by frames_root: None disables it, a root rejects escapes."""
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(16):
        Image.fromarray(np.zeros((24, 24, 3), np.uint8)).save(d / f"f_{i:03d}.png")
    req = {"prompt": "clink", "duration": 1.0, "steps": 2, "seed": 1,
           "frames_path": str(d), "frames_fps": 16.0}

    saved = service.frames_root
    try:
        service.frames_root = None  # public-bind default: frames_path off
        with pytest.raises(ValueError, match="disabled"):
            service.generate(dict(req))
        service.frames_root = str(tmp_path / "elsewhere")  # allowlist miss
        with pytest.raises(ValueError, match="allowlist"):
            service.generate(dict(req))
        service.frames_root = str(tmp_path)  # allowlist hit
        out = service.generate(dict(req))
        assert out["waveform"].shape == (1, 48000)
    finally:
        service.frames_root = saved


def test_v2a_without_encoders_is_a_clear_error(service):
    svc = FoleyService(service.bundle, durations=(1.0,), text_buckets=(16,), default_steps=2)
    with pytest.raises(ValueError, match="enable_v2a"):
        svc.generate({"prompt": "x", "duration": 1.0, "steps": 2,
                      "frames_b64": _frames_b64()})


def test_v2a_http_roundtrip(server):
    req = urllib.request.Request(
        server + "/generate",
        data=json.dumps({
            "prompt": "clink", "duration": 1.0, "steps": 2, "seed": 5,
            "frames_b64": _frames_b64(), "frames_fps": 16.0,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        with wave.open(io.BytesIO(r.read())) as f:
            assert f.getframerate() == 48000 and f.getnframes() == 48000


def test_batching_service_serves_v2a_directly(service):
    """V2A requests bypass the coalescing queue (per-request visual features aren't
    batchable) but still serialize with the device lock."""
    from foley_tpu.serving.server import BatchingFoleyService

    svc = BatchingFoleyService(
        service.bundle, durations=(1.0,), text_buckets=(16,), default_steps=2,
        video_encoders=service.video_encoders, max_batch=2, batch_window_s=0.01,
    )
    out = svc.generate({"prompt": "clink", "duration": 1.0, "steps": 2, "seed": 2,
                        "frames_b64": _frames_b64()})
    assert out["waveform"].shape == (1, 48000)


def test_sharded_serving_over_virtual_mesh(service):
    """Multi-chip serving: the bundle sharded over a ('data','model') mesh serves requests
    with outputs matching the single-chip service bit-for-bit (same program, computation
    follows sharding; 8-virtual-device CPU mesh)."""
    from foley_tpu.parallel.inference import shard_bundle
    from foley_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    sharded = FoleyService(shard_bundle(service.bundle, mesh), durations=(1.0,),
                           text_buckets=(16,), default_steps=2, mesh=mesh)
    req = {"prompt": "clink", "duration": 1.0, "steps": 2, "seed": 11}
    got = sharded.generate(req)
    ref = service.generate(req)
    assert got["waveform"].shape == ref["waveform"].shape == (1, 48000)
    np.testing.assert_allclose(np.asarray(got["waveform"]), np.asarray(ref["waveform"]),
                               atol=1e-5, rtol=1e-5)

    # the windowed long-form path also runs under the mesh and matches single-chip
    long_req = {"prompt": "wind", "duration": 2.5, "steps": 2, "seed": 3}
    got_l = sharded.generate(long_req)
    ref_l = service.generate(long_req)
    assert got_l["waveform"].shape == ref_l["waveform"].shape == (1, int(2.5 * 48000))
    np.testing.assert_allclose(np.asarray(got_l["waveform"]), np.asarray(ref_l["waveform"]),
                               atol=1e-5, rtol=1e-5)


def test_cli_gradio_flag(monkeypatch):
    """--gradio hands off to the serving stack with mapped args (reference cli.py:88-96)."""
    import foley_tpu.serving.server as srv
    from foley_tpu.cli import main

    captured = {}
    monkeypatch.setattr(srv, "main", lambda argv: captured.update(argv=argv) or 0)
    rc = main(["--gradio", "--random_init", "tiny", "--duration", "2",
               "--num_inference_steps", "4", "--port", "9999"])
    assert rc == 0
    argv = captured["argv"]
    assert argv[argv.index("--random_init") + 1] == "tiny"
    assert argv[argv.index("--port") + 1] == "9999"
    assert argv[argv.index("--durations") + 1] == "2.0"
    assert argv[argv.index("--warmup_steps") + 1] == "4"
    # no model source -> usage error
    assert main(["--gradio"]) == 2


def test_continuous_batching_overlaps_groups(monkeypatch):
    """While group 1 executes on-device, group 2 is admitted and fully prepared
    (>1 group in flight — continuous batching, not serve-one-group-at-a-time)."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    import foley_tpu.pipeline.generate as gen_mod
    from foley_tpu.serving.server import BatchingFoleyService

    bundle = ModelBundle(
        mmdit_params=mmdit.init(jax.random.PRNGKey(0), TINY.model),
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    svc = BatchingFoleyService(bundle, durations=(1.0,), text_buckets=(16,),
                               default_steps=2, max_batch=1, batch_window_s=0.02,
                               pipeline_depth=2)

    device_busy = threading.Event()
    release = threading.Event()
    real = gen_mod.generate_audio_multi
    n_calls = []

    def gated(*args, **kwargs):
        n_calls.append(1)
        if len(n_calls) == 1:  # hold group 1 "on device" until the test releases it
            device_busy.set()
            assert release.wait(timeout=60)
        return real(*args, **kwargs)

    monkeypatch.setattr(gen_mod, "generate_audio_multi", gated)

    reqs = [{"prompt": f"p{i}", "duration": 1.0, "steps": 2, "seed": i} for i in range(2)]
    with ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(svc.generate, r) for r in reqs]
        assert device_busy.wait(timeout=60)
        # group 2 must reach prepare_done while group 1 is still on-device
        deadline = time.monotonic() + 60
        prepared = set()
        while time.monotonic() < deadline:
            with svc._events_lock:
                prepared = {g for s, g, _ in svc.events if s == "prepare_done"}
            if len(prepared) >= 2:
                break
            time.sleep(0.01)
        assert len(prepared) >= 2, svc.events
        assert svc.groups_in_flight() >= 2
        release.set()
        outs = [f.result(timeout=300) for f in futs]
    for out in outs:
        assert out["waveform"].shape == (1, 48000)


def test_generate_pcm16_stream(server):
    """response=pcm16_stream: raw int16 mono PCM with sample-accounting headers; the
    long-form (over-bucket) stream equals the WAV route's payload within 1 LSB (the
    stream decodes per window with a halo; the WAV route decodes once at the end)."""
    def post(body, timeout=600):
        return urllib.request.urlopen(
            urllib.request.Request(server + "/generate", data=json.dumps(body).encode()),
            timeout=timeout,
        )

    req = {"prompt": "wind", "duration": 2.5, "steps": 2, "seed": 3,
           "response": "pcm16_stream"}
    with post(req) as r:
        assert r.headers["Content-Type"] == "application/octet-stream"
        assert r.headers["X-Sample-Rate"] == "48000"
        assert r.headers["X-Channels"] == "1"
        total = int(r.headers["X-Total-Samples"])
        body = r.read()  # connection close delimits the stream
    assert total == int(2.5 * 48000)
    pcm = np.frombuffer(body, "<i2")
    assert pcm.shape[0] == total

    with post({**req, "response": "wav"}) as r:
        wav_body = r.read()
    with wave.open(io.BytesIO(wav_body)) as f:
        assert f.getframerate() == 48000 and f.getnchannels() == 1
        wav_pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    assert wav_pcm.shape == pcm.shape
    assert np.abs(pcm.astype(np.int32) - wav_pcm.astype(np.int32)).max() <= 1

    # in-bucket durations stream a single chunk through the same program as /generate
    with post({"prompt": "clink", "duration": 1.0, "steps": 2, "seed": 1,
               "response": "pcm16_stream"}) as r:
        assert int(r.headers["X-Total-Samples"]) == 48000
        assert len(np.frombuffer(r.read(), "<i2")) == 48000

    # request validation failures surface as clean JSON 500s (header runs them first)
    with pytest.raises(urllib.error.HTTPError) as exc:
        post({**req, "mux_video": True})
    assert exc.value.code == 500
    assert "mux_video" in json.loads(exc.value.read())["error"]


def test_continuation_request(service):
    """continue_b64 routes to audio continuation: `duration` seconds of NEW audio
    conditioned on the uploaded WAV's tail; validation errors are actionable."""
    from foley_tpu.io.native import wav_image

    rng = np.random.default_rng(4)
    src = np.clip(rng.normal(scale=0.1, size=48000).astype(np.float32), -1, 1)
    wav_b64 = base64.b64encode(wav_image(src, 48000)).decode()
    req = {"prompt": "more of this", "duration": 1.0, "steps": 2, "seed": 2,
           "continue_b64": wav_b64, "context_s": 0.5}
    out = service.generate(dict(req))
    assert out["waveform"].shape == (1, 48000)
    assert np.all(np.isfinite(np.asarray(out["waveform"])))
    out2 = service.generate(dict(req))
    np.testing.assert_array_equal(out["waveform"], out2["waveform"])

    with pytest.raises(ValueError, match="48000"):
        bad = base64.b64encode(wav_image(src[:8000], 16000)).decode()
        service.generate({**req, "continue_b64": bad})
    with pytest.raises(ValueError, match="text-conditioned"):
        service.generate({**req, "frames_b64": _frames_b64()})


def test_continuation_stream(server):
    """continue_b64 + response=pcm16_stream streams the continuation; payload equals
    the batch continuation route's WAV PCM within 1 LSB."""
    from foley_tpu.io.native import wav_image

    rng = np.random.default_rng(5)
    src = np.clip(rng.normal(scale=0.1, size=48000).astype(np.float32), -1, 1)
    req = {"prompt": "keep going", "duration": 1.0, "steps": 2, "seed": 6,
           "continue_b64": base64.b64encode(wav_image(src, 48000)).decode(),
           "context_s": 0.5}

    def post(body):
        return urllib.request.urlopen(
            urllib.request.Request(server + "/generate", data=json.dumps(body).encode()),
            timeout=600)

    with post({**req, "response": "pcm16_stream"}) as r:
        assert int(r.headers["X-Total-Samples"]) == 48000
        pcm = np.frombuffer(r.read(), "<i2")
    assert pcm.shape[0] == 48000
    with post(req) as r:
        with wave.open(io.BytesIO(r.read())) as f:
            wav_pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    assert np.abs(pcm.astype(np.int32) - wav_pcm.astype(np.int32)).max() <= 1


def test_continuation_stream_off_grid_duration(server):
    """Off-latent-grid continuation duration: the stream emits whole latent frames only
    (latent_length(duration)*hop samples), so X-Total-Samples must promise the
    latent-grid total — int(duration*sr) would overshoot and clients would misread
    every successful stream as a mid-stream failure."""
    from foley_tpu.io.native import wav_image

    rng = np.random.default_rng(9)
    src = np.clip(rng.normal(scale=0.1, size=48000).astype(np.float32), -1, 1)
    req = {"prompt": "keep going", "duration": 1.05, "steps": 2, "seed": 7,
           "continue_b64": base64.b64encode(wav_image(src, 48000)).decode(),
           "context_s": 0.5, "response": "pcm16_stream"}
    with urllib.request.urlopen(
            urllib.request.Request(server + "/generate", data=json.dumps(req).encode()),
            timeout=600) as r:
        total = int(r.headers["X-Total-Samples"])
        pcm = np.frombuffer(r.read(), "<i2")
    expect = TINY.latent_length(1.05) * TINY.dac.hop_length
    assert expect < int(1.05 * 48000)  # genuinely off-grid
    assert total == expect and pcm.shape[0] == total


def test_stream_first_window_ramp(server):
    """first_window_s latency ramp: the over-bucket stream honors it (sample accounting
    unchanged — the ramp only re-slices the window schedule); single-shot requests
    reject the knob with a clean pre-header 500."""
    def post(body):
        return urllib.request.urlopen(
            urllib.request.Request(server + "/generate", data=json.dumps(body).encode()),
            timeout=600)

    req = {"prompt": "wind", "duration": 2.5, "steps": 2, "seed": 3,
           "response": "pcm16_stream", "first_window_s": 0.8}
    with post(req) as r:
        total = int(r.headers["X-Total-Samples"])
        pcm = np.frombuffer(r.read(), "<i2")
    assert total == int(2.5 * 48000) and pcm.shape[0] == total

    with pytest.raises(urllib.error.HTTPError) as exc:
        post({"prompt": "clink", "duration": 1.0, "steps": 2,
              "response": "pcm16_stream", "first_window_s": 0.8})
    assert exc.value.code == 500
    assert "first_window_s" in json.loads(exc.value.read())["error"]


# -- live-model streaming (VERDICT r4 #2) -------------------------------------------
# The module `service` fixture uses raw mmdit.init, whose zero-init final layer gives
# exactly zero velocity — route-plumbing coverage only. These fixtures perturb the zero
# leaves so the server's OWN plan/ramp composition (generate_stream builds its own
# window schedule and ramp kwargs) is checked by a model that would expose a schedule
# divergence: a deliberate off-by-one in the server's plan makes the equalities fail.


@pytest.fixture(scope="module")
def live_service():
    from foley_tpu.core.params import perturb_zero_leaves
    from foley_tpu.models import siglip2, synchformer

    bundle = ModelBundle(
        mmdit_params=perturb_zero_leaves(
            mmdit.init(jax.random.PRNGKey(0), TINY.model), jax.random.PRNGKey(100)),
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    encoders = {
        "siglip2": siglip2.init_random(2, TINY.model.clip_dim),
        "synchformer": synchformer.init_random(3, TINY.model.sync_feat_dim),
    }
    # no warmup: these tests compile on demand while holding the generation lock
    return FoleyService(bundle, durations=(1.0,), text_buckets=(16,), default_steps=2,
                        video_encoders=encoders)


@pytest.fixture(scope="module")
def live_server(live_service):
    srv = create_server(live_service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(server, body, timeout=600):
    return urllib.request.urlopen(
        urllib.request.Request(server + "/generate", data=json.dumps(body).encode()),
        timeout=timeout)


def test_live_stream_matches_wav(live_server):
    """Over-bucket stream == WAV route payload (<=1 LSB) through a REAL-velocity model:
    the server composes the same window schedule for both routes."""
    req = {"prompt": "wind", "duration": 2.5, "steps": 2, "seed": 3}
    with _post(live_server, {**req, "response": "pcm16_stream"}) as r:
        total = int(r.headers["X-Total-Samples"])
        pcm = np.frombuffer(r.read(), "<i2")
    assert total == int(2.5 * 48000) and pcm.shape[0] == total
    assert np.abs(pcm).max() > 0  # non-silent: the perturbed model emits real velocity
    with _post(live_server, req) as r:
        with wave.open(io.BytesIO(r.read())) as f:
            wav_pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    assert np.abs(pcm.astype(np.int32) - wav_pcm.astype(np.int32)).max() <= 1


def test_live_continuation_stream_matches_wav(live_server):
    """Continuation stream == continuation WAV route through a real-velocity model."""
    from foley_tpu.io.native import wav_image

    rng = np.random.default_rng(5)
    src = np.clip(rng.normal(scale=0.1, size=48000).astype(np.float32), -1, 1)
    req = {"prompt": "keep going", "duration": 1.0, "steps": 2, "seed": 6,
           "continue_b64": base64.b64encode(wav_image(src, 48000)).decode(),
           "context_s": 0.5}
    with _post(live_server, {**req, "response": "pcm16_stream"}) as r:
        assert int(r.headers["X-Total-Samples"]) == 48000
        pcm = np.frombuffer(r.read(), "<i2")
    assert pcm.shape[0] == 48000 and np.abs(pcm).max() > 0
    with _post(live_server, req) as r:
        with wave.open(io.BytesIO(r.read())) as f:
            wav_pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    assert np.abs(pcm.astype(np.int32) - wav_pcm.astype(np.int32)).max() <= 1


def test_live_ramp_stream_matches_pipeline(live_service, live_server):
    """first_window_s at the HTTP layer == the pipeline called with the kwargs the
    server is SUPPOSED to pass (window=largest bucket, grid snap, ramp): covers the
    server's own ramp-kwargs composition (server.py generate_stream), which the WAV
    route cannot (it ignores first_window_s)."""
    from foley_tpu.pipeline.longform import generate_audio_long

    req = {"prompt": "wind", "duration": 2.5, "steps": 2, "seed": 3,
           "response": "pcm16_stream", "first_window_s": 0.8}
    with _post(live_server, req) as r:
        total = int(r.headers["X-Total-Samples"])
        pcm = np.frombuffer(r.read(), "<i2")
    assert total == int(2.5 * 48000) and pcm.shape[0] == total
    assert np.abs(pcm).max() > 0

    tb = live_service.text_buckets[0]
    text = jnp.zeros((1, tb, TINY.model.condition_dim), jnp.float32)
    ref = generate_audio_long(
        live_service.bundle, text, text, 2.5, window_s=1.0, guidance_scale=4.5,
        num_inference_steps=2, batch_size=1, seed=3, text_bucket=tb,
        snap_to_window_grid=True, first_window_s=0.8)
    ref_pcm = np.round(np.clip(np.asarray(ref.audio_first)[0, 0, :total], -1, 1)
                       * 32767.0).astype(np.int32)
    assert np.abs(pcm.astype(np.int32) - ref_pcm).max() <= 1


def test_live_v2a_stream_matches_wav(live_server):
    """In-bucket V2A stream == the V2A WAV route through a real-velocity model, and the
    audio DEPENDS on the frames — covers the stream route's own visual-feature
    composition (generate_stream calls _visual_features independently of generate)."""
    def frames(seed):
        rng = np.random.default_rng(seed)
        buf = io.BytesIO()
        np.savez(buf, frames=rng.integers(0, 256, size=(16, 24, 24, 3), dtype=np.uint8))
        return base64.b64encode(buf.getvalue()).decode()

    req = {"prompt": "clink", "duration": 1.0, "steps": 2, "seed": 5,
           "frames_b64": frames(1), "frames_fps": 16.0}
    with _post(live_server, {**req, "response": "pcm16_stream"}) as r:
        assert int(r.headers["X-Total-Samples"]) == 48000
        pcm = np.frombuffer(r.read(), "<i2")
    assert pcm.shape[0] == 48000 and np.abs(pcm).max() > 0
    with _post(live_server, req) as r:
        with wave.open(io.BytesIO(r.read())) as f:
            wav_pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    assert np.abs(pcm.astype(np.int32) - wav_pcm.astype(np.int32)).max() <= 1

    with _post(live_server, {**req, "response": "pcm16_stream",
                             "frames_b64": frames(2)}) as r:
        pcm_b = np.frombuffer(r.read(), "<i2")
    assert np.abs(pcm.astype(np.int32) - pcm_b.astype(np.int32)).max() > 0


def test_serving_block_swap_flag():
    """--blocks_to_swap: rejected with --mesh BEFORE any model load; a service whose
    bundle carries block-swapped (split) stacks serves deterministic, finite audio
    (numerical equivalence of the split forward is pinned in test_aux/test_mmdit)."""
    from foley_tpu.parallel.offload import (
        host_memory_available,
        is_split_stack,
        offload_block_suffix,
    )
    from foley_tpu.serving.server import main

    with pytest.raises(SystemExit):
        main(["--random_init", "tiny", "--blocks_to_swap", "3", "--mesh", "data=2"])
    with pytest.raises(SystemExit):  # --prefetch_blocks only applies with swap > 0
        main(["--random_init", "tiny", "--prefetch_blocks", "1"])

    if not host_memory_available():
        pytest.skip("no pinned_host memory kind on this backend")
    from foley_tpu.core.params import perturb_zero_leaves

    params = perturb_zero_leaves(mmdit.init(jax.random.PRNGKey(0), TINY.model),
                                 jax.random.PRNGKey(100))
    bundle = ModelBundle(
        mmdit_params=offload_block_suffix(params, 3),
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    assert is_split_stack(bundle.mmdit_params["single_blocks"])
    svc = FoleyService(bundle, durations=(1.0,), text_buckets=(16,), default_steps=2)
    req = {"prompt": "clink", "duration": 1.0, "steps": 2, "seed": 3}
    out1 = svc.generate(dict(req))
    out2 = svc.generate(dict(req))
    w = np.asarray(out1["waveform"])
    assert w.shape == (1, 48000) and np.isfinite(w).all() and np.abs(w).max() > 0
    np.testing.assert_array_equal(w, np.asarray(out2["waveform"]))
