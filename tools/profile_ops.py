#!/usr/bin/env python
"""Op-level profile of the XXL denoise step on the real TPU (xprof trace -> op breakdown)."""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/foley_xprof"


def main():
    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.pipeline.features import prepare_cfg_features, t2a_features
    from foley_tpu.sampling.denoise import denoise_latents, prepare_latents

    cfg = get_config("xxl")
    fm = HunyuanModelLoader.init_random("xxl", "bf16", seed=0)
    params = fm["params"]
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)
    clip_feat, sync_feat = t2a_features(params, cfg, 5.0, batch_size=1)
    features = prepare_cfg_features(params, text, text, clip_feat, sync_feat,
                                    batch_size=1, use_cfg=True, text_bucket=77)
    lat_len = cfg.latent_length(5.0)

    def run(seed, steps=10):
        lat = prepare_latents(jax.random.PRNGKey(seed), 1, lat_len,
                              cfg.model.audio_vae_latent_dim)
        return np.asarray(denoise_latents(
            params, lat, features, jnp.float32(4.5), cfg=cfg.model, diffusion=cfg.diffusion,
            num_steps=steps, solver="euler", use_cfg=True, attn_impl="xla",
            compute_dtype=jnp.bfloat16,
        ))

    run(0)  # compile + warm
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        run(1)
    print("trace captured", flush=True)

    xplanes = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return 1
    from xprof.convert import raw_to_tool_data as rtd

    for tool in ("op_profile", "overview_page^"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
            out = f"/tmp/foley_{tool.strip('^')}.json"
            with open(out, "w") as f:
                f.write(data if isinstance(data, str) else data.decode())
            print("wrote", out, flush=True)
        except Exception as e:
            print(f"{tool} failed: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
