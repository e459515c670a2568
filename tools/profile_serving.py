#!/usr/bin/env python
"""Serving throughput on the real TPU: continuous batching vs one-request-at-a-time.

Drives ``BatchingFoleyService`` directly (no HTTP) with N concurrent 5 s requests and
reports aggregate audio-sec/sec. The reference has no serving layer at all; this measures
the framework's request-coalescing headroom over the single-stream bench number
(micro-batching amortizes weight HBM traffic across rows: batch-2 denoise was measured at
3.14 audio-sec/sec vs 2.8 at batch-1).
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.models import dac_vae
    from foley_tpu.pipeline.generate import ModelBundle
    from foley_tpu.serving.server import BatchingFoleyService, FoleyService

    config = sys.argv[1] if len(sys.argv) > 1 else "xxl"
    n_requests = 16
    duration, steps = (5.0, 50) if config == "xxl" else (1.0, 2)

    fm = HunyuanModelLoader.init_random(config, "bf16", seed=0)
    cfg = fm["cfg"]
    bundle = ModelBundle(
        mmdit_params=fm["params"],
        dac_params=dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32),
        pipeline_cfg=cfg,
        compute_dtype=jnp.bfloat16,
    )

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def drive(service, tag):
        def wave(timed):
            results = [None] * n_requests

            def worker(i):
                results[i] = service.generate({
                    "prompt": f"sound {i}", "duration": duration, "steps": steps, "seed": i,
                })

            t0 = time.perf_counter()
            threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_requests)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            assert all(r is not None for r in results)
            if timed:
                emit(measure=f"serving_{tag}_agg_audio_sec_per_sec",
                     value=round(n_requests * duration / wall, 3),
                     wall_s=round(wall, 1), requests=n_requests)

        wave(timed=False)  # compile wave (all group-size programs get built here)
        wave(timed=True)

    # sequential baseline: plain service, callers serialized by its lock
    svc = FoleyService(bundle, durations=(duration,), batch_sizes=(1,), default_steps=steps)
    drive(svc, "sequential")

    # continuous batching: coalesce up to 4 rows per program, two-stage pipeline
    bsvc = BatchingFoleyService(bundle, durations=(duration,), batch_sizes=(1,),
                                default_steps=steps, max_batch=4, batch_window_s=0.25)
    drive(bsvc, "batched_max4")
    return 0


if __name__ == "__main__":
    sys.exit(main())
