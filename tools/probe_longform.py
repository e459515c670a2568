#!/usr/bin/env python
"""Long-form e2e rates on the real TPU: generate_audio at 30 s and 60 s, XXL bf16,
50-step Euler + CFG (run alone — TPU processes contend).

Exercises the full production path: auto attn dispatch (pallas_fused at ≥1000 tokens),
chunked DAC decode past 1536 latent frames, int16 PCM fetch, adaLN + text-K/V hoists,
T2A CFG-half dedup. Prints one JSON line per duration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = sys.argv[1:]
    windowed = "--windowed" in argv
    if windowed:
        argv.remove("--windowed")
    v2a = "--v2a" in argv  # windowed V2A: per-window slices of full-video features
    if v2a:
        argv.remove("--v2a")
        windowed = True
    durations = [float(d) for d in argv] or ([90.0] if windowed else [30.0, 60.0])
    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.models import dac_vae
    from foley_tpu.pipeline.generate import ModelBundle, generate_audio
    from foley_tpu.pipeline.longform import generate_audio_long

    from foley_tpu.core.params import perturb_zero_leaves

    cfg = get_config("xxl")
    fm = HunyuanModelLoader.init_random("xxl", "bf16", seed=0)
    dac_params = dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32)
    bundle = ModelBundle(
        # perturbed zero-init leaves: the denoiser emits real velocity, so this run also
        # exercises the windowed stitch numerically (not just its compute schedule)
        mmdit_params=perturb_zero_leaves(fm["params"], jax.random.PRNGKey(7)),
        dac_params=dac_params, pipeline_cfg=cfg,
        compute_dtype=jnp.bfloat16,
    )
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)

    for dur in durations:
        if windowed:
            # the unbounded-duration path: 30 s windows, flow-match-inpainting stitch,
            # one chunked decode at the end (pipeline/longform.py). Memory stays bounded
            # by the window, so this runs at ANY duration on the 16 GiB chip.
            clip_full = sync_full = None
            if v2a:
                # full-video conditioning features at the plan's snapped duration; each
                # window slices its exact rows (full CFG compute — no T2A dedup)
                from foley_tpu.pipeline.longform import plan_v2a_long

                feat_dur, _, ov_s = plan_v2a_long(cfg, dur, window_s=30.0)
                clip_len, sync_len = cfg.t2a_lengths(feat_dur)
                rng = np.random.default_rng(5)
                clip_full = jnp.asarray(
                    rng.normal(size=(1, clip_len, cfg.model.clip_dim)), jnp.float32)
                sync_full = jnp.asarray(
                    rng.normal(size=(1, sync_len, cfg.model.sync_feat_dim)), jnp.float32)

            def once(seed):
                return generate_audio_long(
                    bundle, text, text, dur, window_s=30.0, guidance_scale=4.5,
                    num_inference_steps=50, batch_size=1, seed=seed,
                    clip_feat=clip_full, sync_feat=sync_full)
            n_warm = 1  # each extra run re-pays len(sched) full window denoises
        else:
            def once(seed):
                return generate_audio(
                    bundle, text, text, dur, guidance_scale=4.5, num_inference_steps=50,
                    sampler="euler", batch_size=1, seed=seed)
            n_warm = 3

        t0 = time.perf_counter()
        r = once(0)  # compile + warm
        compile_s = time.perf_counter() - t0
        walls = []
        for i in range(n_warm):
            t0 = time.perf_counter()
            r = once(i + 1)
            walls.append(time.perf_counter() - t0)
        wall = sorted(walls)[len(walls) // 2]
        a = r.audio_batch
        rec = {
            "measure": f"longform_{int(dur)}s_xxl_bf16_50step_cfg"
                       + ("_windowed" if windowed else "") + ("_v2a" if v2a else ""),
            "wall_s": round(wall, 2),
            "audio_sec_per_sec": round(dur / wall, 3),
            "first_call_s": round(compile_s, 1),
            "windows": int(r.timings.get("windows", 1)) if windowed else 1,
            "finite": bool(np.all(np.isfinite(a))),
            "peak": float(np.abs(a).max()),
            "moved": bool(np.abs(a).max() > 0),  # perturbed model: non-trivial output
        }
        if windowed:
            # design invariant: compiled denoise variants == distinct known_frames values
            from foley_tpu.pipeline.longform import window_schedule

            if v2a:
                total, ov = cfg.latent_length(feat_dur), cfg.latent_length(ov_s)
            else:
                total, ov = cfg.latent_length(dur), cfg.latent_length(min(5.0, 30.0 / 4.0))
            sched = window_schedule(total, cfg.latent_length(30.0), ov)
            rec["denoise_variants"] = len({k for _, k in sched})
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
