#!/usr/bin/env python
"""Round-2b: polyphase DAC decode timing + 30 s attention crossover (real TPU, run alone)."""

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
    from foley_tpu.models import dac_vae
    from foley_tpu.pipeline.features import prepare_cfg_features, t2a_features
    from foley_tpu.sampling.denoise import denoise_latents, prepare_latents

    cfg = get_config("xxl")

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    dac_params = dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32)
    decode = jax.jit(dac_vae.decode, static_argnames=("cfg",))
    for dur in (5.0, 15.0):
        lat = cfg.latent_length(dur)
        z0 = prepare_latents(jax.random.PRNGKey(0), 1, lat, cfg.model.audio_vae_latent_dim)
        np.asarray(decode(dac_params, z0, cfg.dac))  # compile
        walls = []
        for i in range(7):
            zi = prepare_latents(jax.random.PRNGKey(i + 1), 1, lat, cfg.model.audio_vae_latent_dim)
            zi = jax.block_until_ready(zi)
            t0 = time.perf_counter()
            np.asarray(decode(dac_params, zi, cfg.dac))
            walls.append(time.perf_counter() - t0)
        walls.sort()
        emit(measure=f"dac_decode_polyphase_{int(dur)}s_ms",
             value=round(1e3 * walls[len(walls) // 2], 2))

    fm = HunyuanModelLoader.init_random("xxl", "bf16", seed=0)
    params = fm["params"]
    steps = 10
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)
    for dur in (30.0,):
        clip_feat, sync_feat = t2a_features(params, cfg, dur, batch_size=1)
        features = prepare_cfg_features(
            params, text, text, clip_feat, sync_feat, batch_size=1, use_cfg=True, text_bucket=77,
        )
        lat_len = cfg.latent_length(dur)
        for impl in ("xla", "pallas_fused"):
            def run(seed):
                lat = prepare_latents(
                    jax.random.PRNGKey(seed), 1, lat_len, cfg.model.audio_vae_latent_dim
                )
                out = denoise_latents(
                    params, lat, features, jnp.float32(4.5),
                    cfg=cfg.model, diffusion=cfg.diffusion, num_steps=steps,
                    solver="euler", use_cfg=True, attn_impl=impl, compute_dtype=jnp.bfloat16,
                )
                return np.asarray(out)

            run(0)
            walls = []
            for i in range(3):
                t0 = time.perf_counter()
                run(i + 1)
                walls.append(time.perf_counter() - t0)
            walls.sort()
            emit(measure=f"denoise_step_ms_{impl}_{int(dur)}s",
                 value=round(1e3 * walls[len(walls) // 2] / steps, 2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
