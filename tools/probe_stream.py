#!/usr/bin/env python
"""Time-to-first-audio of streaming long-form on the real TPU (XXL bf16, 50-step CFG).

Measures what the streaming API buys: the wall time until the FIRST finalized audio
chunk is on the host (one window denoised + its segment decoded) vs the total wall for
the whole duration — the batch path makes a listener wait for the latter. Run alone on
the TPU (processes contend).

    python tools/probe_stream.py [duration_s]                    # default 90
    python tools/probe_stream.py 90 --first_window 8             # latency-ramp TTFA
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = sys.argv[1:]
    config = "xxl"
    steps = 50
    if "--config" in argv:  # CPU smoke: --config tiny --steps 2
        config = argv[argv.index("--config") + 1]
        del argv[argv.index("--config") : argv.index("--config") + 2]
    if "--steps" in argv:
        steps = int(argv[argv.index("--steps") + 1])
        del argv[argv.index("--steps") : argv.index("--steps") + 2]
    first_window = None
    if "--first_window" in argv:
        first_window = float(argv[argv.index("--first_window") + 1])
        del argv[argv.index("--first_window") : argv.index("--first_window") + 2]
    dur = float(argv[0]) if argv else 90.0
    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.core.params import perturb_zero_leaves
    from foley_tpu.models import dac_vae
    from foley_tpu.pipeline.generate import ModelBundle
    from foley_tpu.pipeline.longform import generate_audio_long_stream

    cfg = get_config(config)
    fm = HunyuanModelLoader.init_random(config, "bf16", seed=0)
    dac_params = dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32)
    bundle = ModelBundle(
        mmdit_params=perturb_zero_leaves(fm["params"], jax.random.PRNGKey(7)),
        dac_params=dac_params, pipeline_cfg=cfg, compute_dtype=jnp.bfloat16,
    )
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)

    def run(seed):
        t0 = time.perf_counter()
        ttfa = None
        chunks = []
        for ch in generate_audio_long_stream(
            bundle, text, text, dur, window_s=min(30.0, cfg.max_duration_s), guidance_scale=4.5,
            num_inference_steps=steps, batch_size=1, seed=seed,
            first_window_s=first_window,
        ):
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            chunks.append(ch)
        return ttfa, time.perf_counter() - t0, chunks

    ttfa_c, wall_c, _ = run(0)  # compile + warm
    ttfa, wall, chunks = run(1)
    total_samples = sum(c.audio.shape[-1] for c in chunks)
    first_audio_s = chunks[0].audio.shape[-1] / chunks[0].sample_rate
    ramp_tag = f"_ramp{int(first_window)}s" if first_window else ""
    print(json.dumps({
        "measure": f"stream_ttfa_{int(dur)}s_{config}_bf16_{steps}step_cfg{ramp_tag}",
        "ttfa_s": round(ttfa, 2),
        "total_wall_s": round(wall, 2),
        "first_chunk_audio_s": round(first_audio_s, 2),
        "chunks": len(chunks),
        "audio_sec_per_sec": round(dur / wall, 3),
        "samples_ok": bool(total_samples == int(dur * chunks[0].sample_rate)),
        "finite": bool(all(np.all(np.isfinite(c.audio)) for c in chunks)),
        "cold_ttfa_s": round(ttfa_c, 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
