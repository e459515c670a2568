#!/usr/bin/env python
"""XXL LoRA fine-tuning on REAL TPU hardware: prove the 16 GiB fit and measure ms/step.

ROADMAP has claimed since round 4 that LoRA fine-tuning "fits one 16 GiB chip" (9.56 GiB
frozen bf16 base + ~60 MB rank-16 factors + Adam moments; the per-block ``w + s*a@b``
merge rides the block scan so peak adds ONE block's effective weights) — but the claim
was arithmetic, never executed at XXL on the chip. This probe runs the real
``make_lora_train_step`` (training/train.py) on a random-init XXL base with a synthetic
5 s batch and reports compile time, steady-state ms/step, and device memory stats.

The reference has no training path at all (SURVEY.md §0); this validates a
beyond-reference capability on the target hardware.

Usage: python tools/probe_lora_xxl.py [--steps 8] [--duration 5] [--rank 16] [--batch 1]
Prints one JSON line for ROADMAP records.

Timing follows the CLAUDE.md rule: a data-dependency chain exists (state feeds the next
step) and each timed step materializes the loss on the host (np.asarray equivalent via
float()), so tunnel under-reporting does not apply.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="xxl", choices=["tiny", "xl", "xxl"])
    ap.add_argument("--duration", type=float, default=5.0)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=8, help="timed steps (after 2 warmup)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foley_tpu.configs import get_config
    from foley_tpu.core.cache import enable_compilation_cache
    from foley_tpu.models import lora as lora_mod
    from foley_tpu.models import mmdit
    from foley_tpu.training.train import make_lora_train_step

    enable_compilation_cache()
    cfg = get_config(args.config)
    m = cfg.model
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    t0 = time.perf_counter()
    base = mmdit.init(jax.random.PRNGKey(0), m, dtype=jnp.bfloat16)
    base_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(base))
    lora0 = lora_mod.init_lora(jax.random.PRNGKey(1), base, rank=args.rank)
    lora_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(lora0))
    jax.block_until_ready(jax.tree.leaves(base)[0])
    t_init = time.perf_counter() - t0
    print(f"init: base {base_bytes / 2**30:.2f} GiB bf16, lora {lora_bytes / 2**20:.1f} MiB "
          f"(rank {args.rank}), {t_init:.1f}s", file=sys.stderr)

    T = int(round(args.duration * m.audio_frame_rate))
    rng = np.random.default_rng(0)
    B = args.batch
    batch = {
        "latents": jnp.asarray(rng.normal(size=(B, T, m.audio_vae_latent_dim)).astype(np.float32)),
        "cond": jnp.asarray(rng.normal(size=(B, m.text_length, m.condition_dim)).astype(np.float32)),
        "clip_feat": jnp.asarray(rng.normal(size=(B, m.clip_length, m.clip_dim)).astype(np.float32)),
        "sync_feat": jnp.asarray(rng.normal(size=(B, m.sync_length, m.sync_feat_dim)).astype(np.float32)),
    }

    init_state, train_step = make_lora_train_step(m, base, compute_dtype=jnp.bfloat16)
    state = init_state(lora0)
    jitted = jax.jit(train_step)
    key = jax.random.PRNGKey(2)

    t0 = time.perf_counter()
    state, loss = jitted(state, batch, jax.random.fold_in(key, 0))
    first_loss = float(loss)  # host materialization = real completion
    t_compile = time.perf_counter() - t0
    print(f"first step (compile+run): {t_compile:.1f}s, loss {first_loss:.4f}", file=sys.stderr)
    state, loss = jitted(state, batch, jax.random.fold_in(key, 1))
    float(loss)

    losses = []
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss = jitted(state, batch, jax.random.fold_in(key, 2 + i))
        losses.append(float(loss))  # per-step host sync: timing counts full round trips
    wall = time.perf_counter() - t0
    ms_per_step = wall / args.steps * 1e3

    mem = {}
    try:
        stats = dev.memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                mem[k.replace("bytes", "GiB")] = round(stats[k] / 2**30, 2)
    except Exception:
        pass

    finite = all(np.isfinite(l) for l in losses + [first_loss])
    out = {
        "probe": "lora_xxl_train_step",
        "config": args.config,
        "duration_s": args.duration,
        "rank": args.rank,
        "batch": B,
        "base_gib_bf16": round(base_bytes / 2**30, 2),
        "lora_mib": round(lora_bytes / 2**20, 1),
        "compile_plus_first_step_s": round(t_compile, 1),
        "ms_per_step": round(ms_per_step, 1),
        "loss_first": round(first_loss, 4),
        "loss_last": round(losses[-1], 4),
        "losses_finite": finite,
        "loss_decreased": losses[-1] < first_loss,
        "memory": mem,
    }
    print(json.dumps(out))
    return 0 if finite else 1


if __name__ == "__main__":
    sys.exit(main())
