#!/usr/bin/env python
"""Post-hoist A/B: block-stack scan unroll vs the per-iteration weight-slice copies.

The round-3 op profile shows 5.8% of the XXL 5 s step in "data formatting" (dominated by
the scan's per-iteration dynamic-slices of the stacked weights). Pre-hoist, unrolling was
a wash (ROADMAP measured-and-closed) — but the hoists changed the copy/compute balance, so
re-measure once. One subprocess per unroll factor (FOLEY_TPU_BLOCK_UNROLL is read at
import in models/mmdit.py). Run alone on the TPU.

    python tools/profile_unroll.py [factors...]   # default: 1 2 6
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_factor() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.pipeline.features import prepare_cfg_features, t2a_features
    from foley_tpu.sampling.denoise import denoise_latents, prepare_latents

    cfg = get_config("xxl")
    fm = HunyuanModelLoader.init_random("xxl", "bf16", seed=0)
    params = fm["params"]
    fm["params"] = None
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)
    clip_feat, sync_feat = t2a_features(params, cfg, 5.0, batch_size=1)
    features = prepare_cfg_features(params, text, text, clip_feat, sync_feat,
                                    batch_size=1, use_cfg=True, text_bucket=77)
    lat_len, steps = cfg.latent_length(5.0), 10

    def run(seed):
        lat = prepare_latents(jax.random.PRNGKey(seed), 1, lat_len,
                              cfg.model.audio_vae_latent_dim)
        return np.asarray(denoise_latents(
            params, lat, features, jnp.float32(4.5), cfg=cfg.model,
            diffusion=cfg.diffusion, num_steps=steps, solver="euler", use_cfg=True,
            attn_impl="xla", compute_dtype=jnp.bfloat16, visual_rows_shared=True,
        ))

    t0 = time.perf_counter()
    run(0)
    compile_s = time.perf_counter() - t0
    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        run(i + 1)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    print(json.dumps({
        "measure": "unroll_step_ms",
        "unroll": int(os.environ.get("FOLEY_TPU_BLOCK_UNROLL", "1")),
        "value": round(1e3 * walls[1] / steps, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)
    return 0


def main():
    if os.environ.get("_FOLEY_UNROLL_CHILD"):
        return run_factor()
    factors = [int(a) for a in sys.argv[1:]] or [1, 2, 6]
    for f in factors:
        env = dict(os.environ, FOLEY_TPU_BLOCK_UNROLL=str(f), _FOLEY_UNROLL_CHILD="1")
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
        if proc.returncode != 0:
            print(json.dumps({"measure": "unroll_step_ms", "unroll": f,
                              "error": f"rc={proc.returncode}"}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
