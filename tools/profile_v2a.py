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
    ap.add_argument("--frame_hw", type=str, default="360x640",
                    help="source frame resolution HxW (e.g. 1080x1920 to exercise the "
                         "host box-downsample upload path, io/images.py)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--preprocess", default="device", choices=["device", "pil"])
    ap.add_argument("--overlap", action="store_true",
                    help="device mode with the production overlap schedule: Synchformer "
                         "frame upload dispatched before the SigLIP2 ViT runs, no host "
                         "materialization between phases (matches nodes._encode_video)")
    ap.add_argument("--perturb", action="store_true",
                    help="perturb the denoiser's zero-init leaves (live model — real "
                         "velocity; costs nothing per round-4 hardware reval)")
    ap.add_argument("--encoder_dtype", default="fp32", choices=["fp32", "bf16"],
                    help="encoder ViT activation dtype (fp32 = golden parity; bf16 = MXU "
                         "fast path)")
    ap.add_argument("--mfu", action="store_true",
                    help="also measure compute-only encoder time on device-resident "
                         "inputs, H2D transfer time, and MFU via XLA cost-analysis FLOPs "
                         "over the 197 TF/s v5e bf16 peak (round-4 MFU definition)")
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
    fm = HunyuanModelLoader.init_random(args.config, "bf16", seed=0, perturb=args.perturb)
    bundle = ModelBundle(
        mmdit_params=fm["params"],
        dac_params=dac_vae.init(jax.random.PRNGKey(1), cfg.dac, dtype=jnp.float32),
        pipeline_cfg=cfg,
        compute_dtype=jnp.bfloat16,
    )
    sig = siglip2.init_random(2, cfg.model.clip_dim)
    sync = synchformer.init_random(3, cfg.model.sync_feat_dim)
    sig.preprocess = sync.preprocess = args.preprocess
    enc_dtype = jnp.bfloat16 if args.encoder_dtype == "bf16" else jnp.float32
    sig.compute_dtype = sync.compute_dtype = enc_dtype

    # synthetic clip at the requested frame rate (decode is out of scope — file IO, not TPU)
    rng = np.random.default_rng(0)
    n_frames = int(round(args.duration * args.frame_rate))
    fh, fw = (int(x) for x in args.frame_hw.split("x"))
    frames = rng.random((n_frames, fh, fw, 3), dtype=np.float32)
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
        encoder_dtype=args.encoder_dtype, perturb=bool(args.perturb),
    )

    if args.mfu:
        # Transfer vs compute within encode (r4 verdict #1): the encode phases above
        # conflate the tunnel H2D transfer (measured 7-35 MB/s session variance) with ViT
        # compute. Measure each alone: H2D of the exact uint8 payloads the device paths
        # ship, then the jitted ViTs on device-RESIDENT preprocessed inputs. MFU uses the
        # round-4 definition (cost-analysis dense FLOPs / wall / 197 TF/s v5e bf16 peak);
        # for fp32 activations the matmuls run 3-pass HIGHEST precision, so MFU against
        # the bf16 peak deliberately punishes the fp32 mode.
        from foley_tpu.io.images import frames_to_u8
        from foley_tpu.models.siglip2 import preprocess_frames_device as sig_pre
        from foley_tpu.models.synchformer import preprocess_frames_device as sync_pre

        sig_u8 = sync_u8 = frames_to_u8

        peak = 197e12
        f8 = resample_frames(frames, args.frame_rate, args.duration, cfg.siglip2_fps)
        f25 = resample_frames(frames, args.frame_rate, args.duration, cfg.synchformer_fps)
        from foley_tpu.io.images import box_downsample_u8

        raw8, raw25 = sig_u8(f8), sync_u8(f25)
        t0 = time.perf_counter()
        u8_8 = box_downsample_u8(raw8, sig.cfg.image_size)
        u8_25 = box_downsample_u8(raw25, sync.cfg.img_size)
        med["downsample_s"] = round(time.perf_counter() - t0, 4)
        med["h2d_mb_raw"] = round((raw8.nbytes + raw25.nbytes) / 1e6, 1)

        def h2d(x):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(x))
            return time.perf_counter() - t0

        h2d(u8_8)  # warm the transfer path once
        med["h2d_siglip_s"] = round(float(np.median([h2d(u8_8) for _ in range(args.iters)])), 4)
        med["h2d_sync_s"] = round(float(np.median([h2d(u8_25) for _ in range(args.iters)])), 4)
        med["h2d_mb"] = round((u8_8.nbytes + u8_25.nbytes) / 1e6, 1)

        # device-resident preprocessed inputs
        pix8 = jax.block_until_ready(
            sig_pre(jax.device_put(u8_8), sig.cfg.image_size)).astype(enc_dtype)
        dev25 = jax.block_until_ready(sync_pre(jax.device_put(u8_25), sync.cfg.img_size))
        t = f25.shape[0]
        num = max((t - 16) // 8 + 1, 1)
        idx = np.minimum(np.arange(num)[:, None] * 8 + np.arange(16)[None, :], t - 1)
        segs = jnp.take(dev25, jnp.asarray(idx.reshape(-1)), axis=0)
        segs = jax.block_until_ready(
            segs.reshape(1, num, 16, *dev25.shape[1:])).astype(enc_dtype)

        def bench_compute(fn, *a, flops_kw=None, **kw):
            # FLOPs always from the XLA lowering (flops_kw overrides kw for it): pallas
            # custom-calls are opaque to cost_analysis, which would deflate the MFU
            # numerator under the round-4 single-definition rule.
            lowered = fn.lower(*a, **{**kw, **(flops_kw or {})})
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            jax.block_until_ready(fn(*a, **kw))  # compile+warm
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*a, **kw))
                times.append(time.perf_counter() - t0)
            w = float(np.median(times))
            return w, flops, (flops / (w * peak) if flops else 0.0)

        # measure the production dispatch (attn_impl="auto" -> pallas flash on TPU at the
        # real 1024-token geometry; tools/probe_siglip_attn.py has the xla-vs-pallas A/B)
        w, fl, mfu = bench_compute(sig._apply, sig.params, pix8, sig.cfg, pooled=True,
                                   attn_impl=sig.attn_impl, flops_kw={"attn_impl": "xla"})
        med.update(siglip2_compute_s=round(w, 4), siglip2_gflops=round(fl / 1e9, 1),
                   siglip2_mfu=round(mfu, 3), siglip2_attn_impl=sig.attn_impl)
        w, fl, mfu = bench_compute(sync._apply, sync.params, segs, sync.cfg)
        med.update(sync_compute_s=round(w, 4), sync_gflops=round(fl / 1e9, 1),
                   sync_mfu=round(mfu, 3))

        def cos(a, b):
            a, b = np.asarray(a, np.float32).ravel(), np.asarray(b, np.float32).ravel()
            return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

        # bf16 activation fidelity vs the golden-pinned fp32 path (random weights =
        # worst case, as in the quant table)
        med["siglip2_bf16_cos"] = round(cos(
            sig._apply(sig.params, pix8.astype(jnp.float32), sig.cfg, pooled=True),
            sig._apply(sig.params, pix8.astype(jnp.bfloat16), sig.cfg, pooled=True)), 5)
        med["sync_bf16_cos"] = round(cos(
            sync._apply(sync.params, segs.astype(jnp.float32), sync.cfg),
            sync._apply(sync.params, segs.astype(jnp.bfloat16), sync.cfg)), 5)

    print(json.dumps(med))
    return 0


if __name__ == "__main__":
    sys.exit(main())
