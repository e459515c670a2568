#!/usr/bin/env python
"""XXL denoise step time by weight quantization mode (bf16 / fp8 / int8) on the real TPU."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.core.params import param_bytes
    from foley_tpu.io.quantize import quantize_fp8, quantize_int8
    from foley_tpu.pipeline.features import prepare_cfg_features, t2a_features
    from foley_tpu.sampling.denoise import denoise_latents, prepare_latents

    cfg = get_config("xxl")
    fm = HunyuanModelLoader.init_random("xxl", "bf16", seed=0)
    base = fm["params"]
    fm["params"] = None
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)
    clip_feat, sync_feat = t2a_features(base, cfg, 5.0, batch_size=1)
    features = prepare_cfg_features(base, text, text, clip_feat, sync_feat,
                                    batch_size=1, use_cfg=True, text_bucket=77)
    lat_len = cfg.latent_length(5.0)
    steps = 10

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def measure(tag, params):
        def run(seed):
            lat = prepare_latents(jax.random.PRNGKey(seed), 1, lat_len,
                                  cfg.model.audio_vae_latent_dim)
            return np.asarray(denoise_latents(
                params, lat, features, jnp.float32(4.5), cfg=cfg.model,
                diffusion=cfg.diffusion, num_steps=steps, solver="euler", use_cfg=True,
                attn_impl="xla", compute_dtype=jnp.bfloat16,
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
        emit(measure=f"quant_{tag}_step_ms", value=round(1e3 * walls[1] / steps, 2),
             resident_gib=round(param_bytes(params) / 2**30, 2), compile_s=round(compile_s, 1))

    measure("bf16", base)
    q8, _, _ = quantize_fp8(base, "fp8_e4m3fn")
    measure("fp8_e4m3fn", q8)
    del q8
    qi, _, _ = quantize_int8(base)
    measure("int8", qi)
    return 0


if __name__ == "__main__":
    sys.exit(main())
