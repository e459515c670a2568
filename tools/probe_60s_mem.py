#!/usr/bin/env python
"""AOT-compile the fused 60 s XXL bf16 denoise+decode program and print its HBM budget.

Diagnoses the 60 s long-form OOM without paying a full run: jit .lower().compile() +
memory_analysis() gives the compiler's own accounting (temp/argument/output bytes).
Optionally executes one short-schedule run (--run) to separate compile-fits from
runtime-allocation failures.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    run = "--run" in sys.argv
    steps = 4 if run else 50
    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.models import dac_vae
    from foley_tpu.pipeline.features import prepare_cfg_features, t2a_features
    from foley_tpu.pipeline.generate import _DECODE_CHUNK_FRAMES
    from foley_tpu.sampling.denoise import denoise_and_decode, prepare_latents

    cfg = get_config("xxl")
    fm = HunyuanModelLoader.init_random("xxl", "bf16", seed=0)
    params = fm["params"]
    dac_params = dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32)
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)
    clip_feat, sync_feat = t2a_features(params, cfg, 60.0, batch_size=1)
    features = prepare_cfg_features(params, text, text, clip_feat, sync_feat,
                                    batch_size=1, use_cfg=True, text_bucket=77)
    lat_len = cfg.latent_length(60.0)
    lat = prepare_latents(jax.random.PRNGKey(0), 1, lat_len, cfg.model.audio_vae_latent_dim)

    kw = dict(cfg=cfg.model, diffusion=cfg.diffusion, dac_cfg=cfg.dac, num_steps=steps,
              solver="euler", use_cfg=True, attn_impl="pallas_fused",
              compute_dtype=jnp.bfloat16, decode_chunk_frames=_DECODE_CHUNK_FRAMES,
              output_pcm16=True)
    print(f"lowering 60s XXL (latent {lat_len}, steps {steps}, "
          f"chunk {_DECODE_CHUNK_FRAMES})...", flush=True)
    try:
        lowered = denoise_and_decode.lower(
            params, dac_params, lat, features, jnp.float32(4.5), None, **kw)
        compiled = lowered.compile()
    except Exception as e:
        print(f"COMPILE FAILED: {type(e).__name__}:\n{e}")
        return 1
    try:
        m = compiled.memory_analysis()
        gib = 1024 ** 3
        print(f"temp={m.temp_size_in_bytes / gib:.3f} GiB "
              f"args={m.argument_size_in_bytes / gib:.3f} GiB "
              f"out={m.output_size_in_bytes / gib:.3f} GiB "
              f"alias={m.alias_size_in_bytes / gib:.3f} GiB "
              f"gen={m.generated_code_size_in_bytes / 1024**2:.1f} MiB")
        total = (m.temp_size_in_bytes + m.argument_size_in_bytes
                 + m.generated_code_size_in_bytes - m.alias_size_in_bytes)
        print(f"peak estimate (args+temp+code-alias) = {total / gib:.3f} GiB "
              f"vs 15.75 GiB budget")
    except Exception as e:
        print(f"memory_analysis unavailable: {e}")
    if run:
        import time
        t0 = time.perf_counter()
        _, audio = compiled(params, dac_params, lat, features, jnp.float32(4.5), None)
        a = np.asarray(audio)
        print(f"RUN OK in {time.perf_counter() - t0:.1f}s  audio {a.shape} {a.dtype} "
              f"max |a| = {np.abs(a).max()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
