"""Decompose the SigLIP2 ViT wall: per-layer slope + sublayer micro-timings on the TPU.

The encoder's 5 s-clip wall is 0.34 s (pallas attention) against a ~44 ms matmul roofline
(8.7 TF / 197 TF/s) — MFU 13%. This probe finds where the other ~0.3 s goes:

1. layer-count sweep: time apply() with the layer list sliced to k in {0, 9, 18, 27};
   the slope is the true per-layer cost, the intercept is patchify + pos-embed + head.
2. sublayer micros on the real activation shape [40, 1024, 768] bf16: layernorm,
   attention block (qkv + flash + out), MLP block — each as its own jitted program.

Usage: python tools/probe_siglip_layers.py [--iters 5] [--attn_impl pallas]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, iters):
    y = jax.block_until_ready(fn())  # compile + warm
    np.asarray(jax.tree_util.tree_leaves(y)[0][..., :1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        y = fn()
        # host materialization EVERY iteration: block_until_ready alone under-reports
        # through the tunnel (DEVELOPMENT.md / CLAUDE.md timing gotcha)
        np.asarray(jax.tree_util.tree_leaves(y)[0][..., :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--attn_impl", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args()

    from foley_tpu.models import siglip2

    enc = siglip2.init_random(2)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (args.frames, 360, 640, 3), dtype=np.uint8)
    pix = jax.block_until_ready(
        siglip2.preprocess_frames_device(jax.device_put(u8), enc.cfg.image_size)
    ).astype(jnp.bfloat16)

    out = {"platform": jax.devices()[0].platform, "attn_impl": args.attn_impl}

    # 1. layer-count sweep (pooled head included every time; slope isolates the layers)
    apply_j = jax.jit(siglip2.apply, static_argnames=("cfg", "pooled", "attn_impl"))
    walls = {}
    for k in (0, 9, 18, 27):
        p_k = dict(enc.params)
        p_k["layers"] = enc.params["layers"][:k]
        walls[k] = _time(functools.partial(
            apply_j, p_k, pix, enc.cfg, pooled=True, attn_impl=args.attn_impl), args.iters)
        out[f"wall_{k}_layers_s"] = round(walls[k], 4)
    out["per_layer_ms"] = round((walls[27] - walls[0]) / 27 * 1e3, 3)
    out["intercept_ms"] = round(walls[0] * 1e3, 2)

    # 2. sublayer micros at the real activation shape
    layer = enc.params["layers"][0]
    eps = enc.cfg.layer_norm_eps
    nh = enc.cfg.num_attention_heads
    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (args.frames, 1024, 768), jnp.bfloat16))

    ln_j = jax.jit(lambda x: siglip2._ln(layer["ln1"], x, eps))
    out["ln_ms"] = round(_time(functools.partial(ln_j, x), args.iters) * 1e3, 3)

    def attn_block(x):
        return siglip2.apply_dense(layer["out"], siglip2._mha(
            siglip2.apply_dense(layer["q"], x), siglip2.apply_dense(layer["k"], x),
            siglip2.apply_dense(layer["v"], x), nh, impl=args.attn_impl))

    out["attn_block_ms"] = round(_time(functools.partial(
        jax.jit(attn_block), x), args.iters) * 1e3, 3)

    def mlp_block(x):
        return siglip2.apply_dense(
            layer["fc2"], jax.nn.gelu(siglip2.apply_dense(layer["fc1"], x), approximate=True))

    out["mlp_block_ms"] = round(_time(functools.partial(
        jax.jit(mlp_block), x), args.iters) * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
