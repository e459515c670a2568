"""A/B the SigLIP2 ViT attention impl (xla vs pallas flash) on the real TPU.

At the real geometry (512^2 / patch 16 -> 1024 tokens x 40 frames x 12 heads) XLA
materializes a fp32 [40,12,1024,1024] score tensor per layer (~2 GiB of HBM traffic each
way); the pallas kernel keeps scores in VMEM. The MMDiT A/B (flash_attention.py docstring)
found pallas 6% SLOWER at foley lengths — this probe answers whether the ViT geometry
flips that. Timing uses the compute-only pattern of tools/profile_v2a.py (device-resident
input, block_until_ready) plus a final np.asarray materialization per DEVELOPMENT.md.

Usage: python tools/probe_siglip_attn.py [--frames 40] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--block_q", type=int, default=0,
                    help="override flash_attention.BLOCK_Q (q-tile size) for tuning runs")
    args = ap.parse_args()

    if args.block_q:
        from foley_tpu.ops.pallas import flash_attention as FL

        FL.BLOCK_Q = args.block_q

    from foley_tpu.models import siglip2

    enc = siglip2.init_random(2)  # real base geometry: 27 layers, 512^2, patch 16
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (args.frames, 360, 640, 3), dtype=np.uint8)
    pix = jax.block_until_ready(
        siglip2.preprocess_frames_device(jax.device_put(u8), enc.cfg.image_size)
    ).astype(jnp.bfloat16)

    out = {"platform": jax.devices()[0].platform, "frames": args.frames,
           "tokens": (enc.cfg.image_size // enc.cfg.patch_size) ** 2,
           "resolved_auto": enc.attn_impl}

    ref = None
    for impl in ("xla", "pallas"):
        fn = lambda: enc._apply(enc.params, pix, enc.cfg, pooled=True, attn_impl=impl)
        y = jax.block_until_ready(fn())  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            y = fn()
            _ = np.asarray(y)  # host materialization: dependency chain through the tunnel
            times.append(time.perf_counter() - t0)
        out[f"{impl}_s"] = round(float(np.median(times)), 4)
        a = np.asarray(y, np.float32).ravel()
        if ref is None:
            ref = a
        else:
            cos = float(np.dot(ref, a) / (np.linalg.norm(ref) * np.linalg.norm(a) + 1e-12))
            out["cos_vs_xla"] = round(cos, 6)
    out["speedup"] = round(out["xla_s"] / out["pallas_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
