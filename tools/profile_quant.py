#!/usr/bin/env python
"""XXL denoise step time by weight quantization mode on the real TPU.

One subprocess per mode: the unquantized base (9.6 GiB bf16) plus a quantized copy don't fit
HBM together, so each mode gets a fresh process (and the bf16 run saves its final latents to
/tmp for the cross-mode fidelity correlation).

Modes: bf16 (reference-equivalent), fp8_e4m3fn (storage), int8 (weight-only, fused dequant),
int8_dynamic (int8xint8 MXU with per-token activation quant — numerics-deviating opt-in).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ("bf16", "fp8_e4m3fn", "int8", "int8_dynamic", "int4")
REF_LATENTS = "/tmp/foley_quant_bf16_latents.npy"


def run_mode(mode: str) -> int:
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

    if mode == "bf16":
        params = base
    elif mode == "fp8_e4m3fn":
        params, _, _ = quantize_fp8(base, "fp8_e4m3fn")
        del base
    elif mode == "int4":
        from foley_tpu.io.quantize import quantize_int4

        params, _, _ = quantize_int4(base, consume=True)
        del base
    else:
        # host-side + consuming: the bf16 model and its int8 copy never coexist in HBM
        params, _, _ = quantize_int8(base, dynamic=(mode == "int8_dynamic"),
                                     on_host=True, consume=True)
        del base

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
    walls, out = [], None
    for i in range(3):
        t0 = time.perf_counter()
        out = run(i + 1)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    # fidelity vs the bf16 baseline: correlation of final latents at the same seed (seed 3)
    if mode == "bf16":
        np.save(REF_LATENTS, out)
        corr = 1.0
    elif os.path.exists(REF_LATENTS):
        ref = np.load(REF_LATENTS)
        corr = float(np.corrcoef(out.ravel(), ref.ravel())[0, 1])
    else:
        corr = float("nan")
    print(json.dumps({
        "measure": f"quant_{mode}_step_ms",
        "value": round(1e3 * walls[1] / steps, 2),
        "resident_gib": round(param_bytes(params) / 2**30, 2),
        "compile_s": round(compile_s, 1),
        "latent_corr_vs_bf16": round(corr, 6),
    }), flush=True)
    return 0


def main():
    if len(sys.argv) > 1:
        return run_mode(sys.argv[1])
    for mode in MODES:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__), mode])
        if proc.returncode != 0:
            print(json.dumps({"measure": f"quant_{mode}_step_ms",
                              "error": f"subprocess rc={proc.returncode}"}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
