#!/usr/bin/env python
"""XXL block-swap (host offload) validation + latency curve on the real TPU (run alone).

The round-1 whole-stack host-resident scan hit a TPU backend INTERNAL error through the axon
tunnel; this measures the segmented per-block suffix split (parallel/offload.py)."""

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
    from foley_tpu.parallel.offload import merge_block_suffix, offload_block_suffix
    from foley_tpu.pipeline.features import prepare_cfg_features, t2a_features
    from foley_tpu.sampling.denoise import denoise_latents, prepare_latents

    cfg = get_config("xxl")
    fm = HunyuanModelLoader.init_random("xxl", "bf16", seed=0)
    base_params = fm["params"]
    # optional storage mode for the offloaded blocks (argv[1], e.g. "int4"): quantized
    # stacks stream proportionally fewer host->HBM bytes per step — int4 quarters them
    # (composition proven in test_aux::test_block_swap_composes_with_quantized_storage)
    quant = sys.argv[1] if len(sys.argv) > 1 else ""
    if quant:
        from foley_tpu.io.quantize import quantize_params

        base_params, _, _ = quantize_params(base_params, quant,
                                            on_host=True, consume=True)
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)
    clip_feat, sync_feat = t2a_features(base_params, cfg, 5.0, batch_size=1)
    features = prepare_cfg_features(base_params, text, text, clip_feat, sync_feat,
                                    batch_size=1, use_cfg=True, text_bucket=77)
    lat_len = cfg.latent_length(5.0)
    steps = 10

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def offloaded_bytes(p):
        total = 0
        for key in ("triple_blocks", "single_blocks"):
            st = p.get(key)
            if isinstance(st, dict) and "offloaded" in st:
                for seg in st["offloaded"]:
                    total += param_bytes(seg)
        return total

    # single rolling params var: offload_block_suffix merges a previous split first, so the
    # full-model copy is never duplicated in HBM (duplication caused RESOURCE_EXHAUSTED)
    cur = base_params
    del base_params
    fm["params"] = None
    # (swap, prefetch-window) grid. window=1 (gated serial fetch) is the shipping default —
    # measured SAFE at any swap depth; window>=2 RESOURCE_EXHAUSTs at 36 blocks on the axon
    # runtime (the barrier pairing appears to device-promote the pending host operands), and
    # window>=len(blocks) degenerates to the ungated all-up-front fetch (the round-2 design:
    # fast at 36, OOM at 54). 54 = every block off-chip, the minimal-HBM headline mode.
    grid = [(0, 1), (10, 1), (36, 1), (54, 1)]
    for swap, window in grid:
        try:
            cur = offload_block_suffix(cur, swap) if swap else cur
            params = cur
            def run(seed):
                lat = prepare_latents(jax.random.PRNGKey(seed), 1, lat_len,
                                      cfg.model.audio_vae_latent_dim)
                return np.asarray(denoise_latents(
                    params, lat, features, jnp.float32(4.5), cfg=cfg.model,
                    diffusion=cfg.diffusion, num_steps=steps, solver="euler", use_cfg=True,
                    attn_impl="xla", compute_dtype=jnp.bfloat16, offload_prefetch=window,
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
            emit(measure=f"blockswap{'_' + quant if quant else ''}_{swap}_w{window}_step_ms",
                 value=round(1e3 * walls[len(walls) // 2] / steps, 2),
                 host_resident_gib=round(offloaded_bytes(params) / 2**30, 2),
                 compile_s=round(compile_s, 1))
        except Exception as e:
            emit(measure=f"blockswap{'_' + quant if quant else ''}_{swap}_w{window}_step_ms",
                 error=f"{type(e).__name__}: {e}"[:300])
    return 0


if __name__ == "__main__":
    sys.exit(main())
