"""Serving layer: warmup buckets, /healthz, /generate returning valid WAV over HTTP."""

import base64
import json
import threading
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
    bundle = ModelBundle(
        mmdit_params=mmdit.init(jax.random.PRNGKey(0), TINY.model),
        dac_params=dac_vae.init(jax.random.PRNGKey(1), TINY.dac),
        pipeline_cfg=TINY,
        compute_dtype=jnp.float32,
    )
    svc = FoleyService(bundle, durations=(1.0,), text_buckets=(16,), default_steps=2)
    svc.warmup(steps=2)
    return svc


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
