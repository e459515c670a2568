#!/usr/bin/env python
"""Round-2c: diagnose DAC decode slowness — fp32 precision mode variants (real TPU)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import foley_tpu.ops.nn as nn_mod
    from foley_tpu.configs import get_config
    from foley_tpu.models import dac_vae
    from foley_tpu.sampling.denoise import prepare_latents

    cfg = get_config("xxl")
    dac_params = dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32)
    lat5 = cfg.latent_length(5.0)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def time_decode(tag, fn):
        fn(prepare_latents(jax.random.PRNGKey(0), 1, lat5, cfg.model.audio_vae_latent_dim))
        walls = []
        for i in range(7):
            z = prepare_latents(jax.random.PRNGKey(i + 1), 1, lat5, cfg.model.audio_vae_latent_dim)
            z = jax.block_until_ready(z)
            t0 = time.perf_counter()
            np.asarray(fn(z))
            walls.append(time.perf_counter() - t0)
        walls.sort()
        emit(measure=f"dac_decode_5s_ms_{tag}", value=round(1e3 * walls[len(walls) // 2], 2))

    orig = nn_mod._precision
    for tag, prec in (("highest", lax.Precision.HIGHEST), ("high", lax.Precision.HIGH),
                      ("default", None)):
        nn_mod._precision = lambda x, _p=prec: _p if x.dtype == jnp.float32 else None
        decode = jax.jit(dac_vae.decode, static_argnames=("cfg",))
        time_decode(tag, lambda z, d=decode: d(dac_params, z, cfg.dac))
    nn_mod._precision = orig

    # bf16 compute decode (params + latents cast; fp32 default islands preserved elsewhere)
    dac_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), dac_params)
    decode = jax.jit(dac_vae.decode, static_argnames=("cfg",))
    time_decode("bf16", lambda z: decode(dac_bf16, z.astype(jnp.bfloat16), cfg.dac))

    # numerics: bf16 vs fp32 decode correlation on the same latents
    z = prepare_latents(jax.random.PRNGKey(42), 1, lat5, cfg.model.audio_vae_latent_dim)
    a32 = np.asarray(decode(dac_params, z, cfg.dac)).reshape(-1)
    a16 = np.asarray(decode(dac_bf16, z.astype(jnp.bfloat16), cfg.dac)).reshape(-1).astype(np.float32)
    corr = float(np.corrcoef(a32, a16)[0, 1])
    emit(measure="dac_decode_bf16_vs_fp32_corr", value=round(corr, 6))
    return 0


if __name__ == "__main__":
    sys.exit(main())
