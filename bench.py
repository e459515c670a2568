#!/usr/bin/env python
"""Benchmark: end-to-end Foley generation throughput on the available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: audio-seconds generated per second per chip for a 5 s / 48 kHz clip at 50 Euler steps
with CFG (the driver-defined north star; BASELINE.json). vs_baseline compares against the
north-star target rate of 2.5 audio-sec/sec (5 s clip in <= 2 s wall on v5p-8).

The full XXL model (~5.1 B params) is run with random weights in bf16 — identical compute to
a checkpointed run. Falls back to the XL config, then TINY, if the chip can't hold XXL.
"""

import json
import os
import sys
import time


def run_once(config_name: str, duration_s: float, steps: int, batch_size: int,
             mode: str = "bf16"):
    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.models import dac_vae
    from foley_tpu.pipeline.generate import ModelBundle, generate_audio

    cfg = get_config(config_name)
    foley_model = HunyuanModelLoader.init_random(config_name, "bf16", seed=0)
    params = foley_model["params"]
    foley_model["params"] = None
    if mode == "fp8_e4m3fn":
        # device-side pure cast: no host round-trip; transient peak bf16+fp8 ~14.5 GiB
        # fits the 16 GiB chip, then the bf16 source is dropped
        from foley_tpu.io.quantize import quantize_fp8

        params, _, _ = quantize_fp8(params, "fp8_e4m3fn")
    elif mode in ("int8", "int8_dynamic"):
        from foley_tpu.io.quantize import quantize_int8

        params, _, _ = quantize_int8(params, dynamic=(mode == "int8_dynamic"),
                                     on_host=True, consume=True)
    elif mode == "int4":
        from foley_tpu.io.quantize import quantize_int4

        params, _, _ = quantize_int4(params, consume=True)
    elif mode != "bf16":
        raise ValueError(f"unknown bench mode {mode!r}")
    dac_params = dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32)
    bundle = ModelBundle(
        mmdit_params=params,
        dac_params=dac_params,
        pipeline_cfg=cfg,
        compute_dtype=jnp.bfloat16,
    )

    ltxt = 77
    text = jnp.zeros((1, ltxt, cfg.model.condition_dim), jnp.float32)

    def once(seed):
        return generate_audio(
            bundle, text, text, duration_s,
            guidance_scale=4.5, num_inference_steps=steps,
            sampler="euler", batch_size=batch_size, seed=seed,
        )

    once(0)  # compile + warm
    # median of per-iteration walls: robust to tunnel-latency spikes between host and chip
    walls = []
    for i in range(5):
        t0 = time.perf_counter()
        result = once(i + 1)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return walls[len(walls) // 2], result


def run_v2a_once(config_name: str, duration_s: float, steps: int):
    """End-to-end VIDEO->audio wall (the north star's named pipeline): encode synthetic
    24 fps frames with REAL-geometry encoders (SigLIP2-base 512^2, Synchformer ViT-B,
    device preprocessing, upload/compute overlap — the production ``_encode_video``
    schedule) + the same denoise/decode the T2A bench times. Includes the host->device
    frame transfer; on tunneled runtimes that transfer dominates (phase split + MFU:
    ROADMAP round-5 V2A bench / tools/profile_v2a.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanFoleySampler, HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.models import dac_vae, siglip2, synchformer
    from foley_tpu.pipeline.generate import ModelBundle, generate_audio

    cfg = get_config(config_name)
    foley_model = HunyuanModelLoader.init_random(config_name, "bf16", seed=0)
    bundle = ModelBundle(
        mmdit_params=foley_model["params"],
        dac_params=dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32),
        pipeline_cfg=cfg,
        compute_dtype=jnp.bfloat16,
    )
    foley_model["params"] = None
    deps = {"siglip2": siglip2.init_random(2, cfg.model.clip_dim),
            "synchformer": synchformer.init_random(3, cfg.model.sync_feat_dim)}
    for enc in deps.values():
        enc.preprocess = "device"
        enc.compute_dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    frames = rng.random((int(duration_s * 24), 360, 640, 3), dtype=np.float32)
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)

    def once(seed):
        clip_feat, sync_feat = HunyuanFoleySampler._encode_video(
            deps, frames, 24, duration_s, cfg)
        return generate_audio(
            bundle, text, text, duration_s, clip_feat=clip_feat, sync_feat=sync_feat,
            guidance_scale=4.5, num_inference_steps=steps,
            sampler="euler", batch_size=1, seed=seed,
        )

    once(0)  # compile + warm
    walls = []
    for i in range(3):  # ~16 s/iter on the tunnel: median of 3
        t0 = time.perf_counter()
        result = once(i + 1)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return walls[len(walls) // 2], result


def accelerator_reachable(timeout_s: int = 120, retry_budget_s: float = 1500.0) -> bool:
    """Bounded device-init probe in a subprocess, retried across a grace window.

    The axon TPU service can go fully unavailable (observed 1.5+ h outages) in a mode where
    even ``jax.devices()`` blocks forever — probing in-process would hang the whole bench.
    Transient outages shorter than ``retry_budget_s`` are waited out (probe every ~60 s)
    so a round-end capture doesn't record 0.0 for a blip; a persistent outage still fails
    with the error JSON below."""
    import subprocess

    deadline = time.monotonic() + retry_budget_s
    while True:
        t0 = time.monotonic()
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
            err = (r.stderr or b"").decode(errors="replace")
            if "UNAVAILABLE" not in err and "backend" not in err:
                # not the outage signature (hang, or UNAVAILABLE backend-init error) —
                # a broken env fails fast instead of burning the whole grace window
                print(f"accelerator probe failed hard (not an outage): {err[-500:]}",
                      file=sys.stderr)
                return False
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        print(f"accelerator probe failed; retrying "
              f"({int(deadline - time.monotonic())}s of grace left)", file=sys.stderr)
        time.sleep(max(0.0, 60.0 - (time.monotonic() - t0)))


def main():
    duration_s, steps = 5.0, 50
    # --mode <bf16|fp8_e4m3fn|int8|int8_dynamic|int4>: measure a weight-quantized variant
    # (fidelity per mode: ROADMAP round-4 quant table / tools/profile_quant.py). The
    # headline stays bf16 = reference-equivalent numerics.
    mode = "bf16"
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    # --v2a: the video->audio pipeline end-to-end (real-geometry encoders + denoise);
    # the headline default stays T2A — the V2A number is transfer-bound on tunneled
    # runtimes (ROADMAP round-5 V2A bench records the phase split)
    v2a = "--v2a" in sys.argv
    if v2a and mode != "bf16":
        # run_v2a_once always builds a bf16 bundle; a quantized label on a bf16
        # measurement would corrupt the perf tables
        print("error: --v2a does not support --mode (V2A measures the bf16 bundle)",
              file=sys.stderr)
        return 2
    if not accelerator_reachable():
        print(json.dumps({
            "metric": "audio_sec_per_sec_per_chip", "value": 0.0,
            "unit": "audio-sec/sec/chip", "vs_baseline": 0.0,
            "error": "accelerator unreachable: device init kept timing out across a "
                     "25-minute retry window (known axon service outage mode)",
        }))
        return 1
    for config_name in ("xxl", "xl", "tiny"):
        try:
            if v2a:
                elapsed, _ = run_v2a_once(config_name, duration_s, steps)
            else:
                elapsed, _ = run_once(config_name, duration_s, steps, batch_size=1,
                                      mode=mode)
            audio_sec_per_sec = duration_s / elapsed
            target_rate = 2.5  # 5 s clip in <= 2 s (BASELINE.json north star)
            suffix = ("" if mode == "bf16" else f"_{mode}") + ("_v2a" if v2a else "")
            print(json.dumps({
                "metric": f"audio_sec_per_sec_per_chip_{config_name}_5s_50step_euler_cfg"
                          f"{suffix}",
                "value": round(audio_sec_per_sec, 4),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(audio_sec_per_sec / target_rate, 4),
            }))
            return 0
        except Exception as e:
            print(f"bench {config_name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
    print(json.dumps({
        "metric": "audio_sec_per_sec_per_chip", "value": 0.0,
        "unit": "audio-sec/sec/chip", "vs_baseline": 0.0,
    }))
    return 1


if __name__ == "__main__":
    sys.exit(main())
