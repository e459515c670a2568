#!/usr/bin/env python
"""V2A end-to-end phase profile on the real TPU at full model dims.

The headline bench (bench.py) measures T2A; this tool measures the *video* pipeline the
reference calls PHASE 1 + PHASE 2 (``nodes.py:278-405``): SigLIP2-base (512^2, 12-layer)
over the 8 fps frames, Synchformer (divided_224_16x4 ViT-B) over 16-frame/stride-8 segments
at 25 fps, then the XXL denoise+decode. Encoders are random-init at the REAL geometry —
identical compute to checkpointed runs.

Phases reported (median of --iters):
  * resample_s   : host fps resampling + 16-frame segmentation (numpy index work)
  * siglip2_s    : 8 fps frames -> features (includes preprocessing in the chosen mode)
  * synchformer_s: 25 fps segments -> features (ditto)
  * denoise_s    : CFG denoise scan + DAC decode (same program the bench times)

--preprocess pil measures the reference-parity host path (per-frame PIL bicubic — 34 s of
host time for a 5 s clip on this 1-core box); --preprocess device (default) runs the
antialiased-bicubic resize on the TPU as one XLA program per encoder.

Usage: python tools/profile_v2a.py [--duration 5] [--steps 50] [--preprocess device|pil]
Prints one JSON line for ROADMAP records.
"""

import argparse
import json
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="xxl", choices=["xxl", "xl", "tiny"])
    ap.add_argument("--duration", type=float, default=5.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frame_rate", type=float, default=24.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--preprocess", default="device", choices=["device", "pil"])
    ap.add_argument("--overlap", action="store_true",
                    help="device mode with the production overlap schedule: Synchformer "
                         "frame upload dispatched before the SigLIP2 ViT runs, no host "
                         "materialization between phases (matches nodes._encode_video)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanFoleySampler, HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.models import dac_vae, siglip2, synchformer
    from foley_tpu.pipeline.features import resample_frames, sync_segments
    from foley_tpu.pipeline.generate import ModelBundle, generate_audio

    cfg = get_config(args.config)
    fm = HunyuanModelLoader.init_random(args.config, "bf16", seed=0)
    bundle = ModelBundle(
        mmdit_params=fm["params"],
        dac_params=dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32),
        pipeline_cfg=cfg,
        compute_dtype=jnp.bfloat16,
    )
    sig = siglip2.init_random(2, cfg.model.clip_dim)
    sync = synchformer.init_random(3, cfg.model.sync_feat_dim)
    sig.preprocess = sync.preprocess = args.preprocess

    # synthetic clip at the requested frame rate (decode is out of scope — file IO, not TPU)
    rng = np.random.default_rng(0)
    n_frames = int(round(args.duration * args.frame_rate))
    frames = rng.random((n_frames, 360, 640, 3), dtype=np.float32)
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)

    def one_pass():
        t = {}
        t0 = time.perf_counter()
        f8 = resample_frames(frames, args.frame_rate, args.duration, cfg.siglip2_fps)
        f25 = resample_frames(frames, args.frame_rate, args.duration, cfg.synchformer_fps)
        # host segmentation only exists in the pil path (device mode gathers on-chip and
        # the [S,16,H,W,C] copy is ~620 MB of wasted host memcpy)
        segs = sync_segments(f25) if args.preprocess == "pil" else None
        t["resample_s"] = time.perf_counter() - t0

        if args.overlap:
            # production schedule (nodes._encode_video): the big Synchformer frame upload
            # is dispatched async BEFORE the SigLIP2 ViT occupies the chip; features stay
            # on-device (no host round trip). Phase walls measure dispatch completion
            # points, so only features_s/total_s are meaningful here.
            t0 = time.perf_counter()
            preloaded = synchformer.upload_frames_async(f25)
            clip_feat = sig.encode(f8)
            sync_feat = synchformer.encode_frames_device(sync, f25, preloaded_u8=preloaded)
            clip_feat, sync_feat = jax.block_until_ready((clip_feat, sync_feat))
            t["features_s"] = time.perf_counter() - t0
        else:
            t0 = time.perf_counter()
            clip_feat = np.asarray(sig.encode(f8))  # preprocess (chosen mode) + ViT
            t["siglip2_s"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            if args.preprocess == "device":
                # unique-frame uint8 transfer + on-device segmentation gather
                sync_feat = np.asarray(synchformer.encode_frames_device(sync, f25))
            else:
                sync_feat = np.asarray(synchformer.encode_segments(sync, segs))
            t["synchformer_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        result = generate_audio(
            bundle, text, text, args.duration,
            clip_feat=jnp.asarray(clip_feat), sync_feat=jnp.asarray(sync_feat),
            guidance_scale=4.5, num_inference_steps=args.steps, batch_size=1, seed=0,
        )
        np.asarray(result.audio_first)
        t["denoise_s"] = time.perf_counter() - t0
        t["total_s"] = sum(t.values())
        return t

    one_pass()  # compile + warm
    runs = [one_pass() for _ in range(args.iters)]
    med = {k: round(float(np.median([r[k] for r in runs])), 4) for k in runs[0]}
    med.update(
        tool="profile_v2a", config=args.config, duration=args.duration, steps=args.steps,
        frames=n_frames, audio_sec_per_sec=round(args.duration / med["total_s"], 4),
    )
    print(json.dumps(med))
    return 0


if __name__ == "__main__":
    sys.exit(main())
