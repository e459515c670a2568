#!/usr/bin/env python
"""Long-run training validation on real hardware (ROADMAP "long-run training validation").

The reference vendors training-only artifacts but never exercises a training path
(SURVEY.md §0); foley-tpu makes training first-class, so this tool validates that the
full pipeline — WAV corpus -> DAC latent shards -> flow_match_batches -> PrefetchLoader ->
jitted train step — actually *learns* over hundreds of steps, not just that one step runs:

  * loss decreases substantially (overfit on a tiny fixed corpus),
  * no NaN/Inf anywhere in the trajectory or final params,
  * mid-run orbax checkpointing doesn't perturb training,
  * the train->deploy export at the end produces finite audio through the sampler path.

Usage:  python tools/train_longrun.py [--num_steps 600] [--config tiny]
Prints one JSON line with the trajectory summary for ROADMAP records.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="tiny", choices=["tiny", "xl", "xxl"])
    ap.add_argument("--num_steps", type=int, default=600)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--clip_seconds", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foley_tpu.configs import get_config
    from foley_tpu.io.audio import write_wav
    from foley_tpu.models import dac_vae, mmdit
    from foley_tpu.training.data import (
        AudioFolderDataset,
        NpzShardDataset,
        PrefetchLoader,
        encode_corpus,
        flow_match_batches,
        latent_stats_from_shards,
    )
    from foley_tpu.training import loop

    cfg = get_config(args.config)
    workdir = tempfile.mkdtemp(prefix="foley_longrun_")
    corpus = os.path.join(workdir, "wavs")
    os.makedirs(corpus)
    rng = np.random.default_rng(0)
    # a fixed 6-clip corpus with distinct spectral content (tones, chirp, filtered noise)
    n = int(48000 * args.clip_seconds)
    t = np.linspace(0, args.clip_seconds, n, False)
    clips = [
        0.3 * np.sin(2 * np.pi * 220 * t) * np.exp(-2 * t),
        0.3 * np.sin(2 * np.pi * 440 * t) * np.exp(-1 * t),
        0.3 * np.sin(2 * np.pi * (200 + 800 * t) * t),
        0.2 * rng.standard_normal(n) * np.exp(-4 * t),
        0.25 * np.sign(np.sin(2 * np.pi * 110 * t)) * np.exp(-3 * t),
        0.2 * np.cumsum(rng.standard_normal(n)) / np.sqrt(np.arange(1, n + 1)),
    ]
    for i, wav in enumerate(clips):
        write_wav(os.path.join(corpus, f"clip_{i}.wav"), wav.astype(np.float32), 48000)

    dac_params = dac_vae.init(jax.random.PRNGKey(0), cfg.dac)
    shard_dir = os.path.join(workdir, "shards")
    dataset = AudioFolderDataset(corpus, args.clip_seconds, cfg.dac.sample_rate, seed=0)
    encode_corpus(dac_params, cfg.dac, dataset, shard_dir,
                  num_clips=len(clips) * 4, batch_size=args.batch_size)

    params = mmdit.init(jax.random.PRNGKey(1), cfg.model)
    # from-scratch training: standardize latents to the unit-noise scale (the random-init
    # DAC encoder's raw latents are arbitrarily scaled; a pretrained run would pass None)
    stats = latent_stats_from_shards(shard_dir)
    batches = PrefetchLoader(
        flow_match_batches(iter(NpzShardDataset(shard_dir)), params, cfg,
                           batch_size=args.batch_size, latent_stats=stats),
        depth=2,
    )
    losses = []
    ckpt_dir = os.path.join(workdir, "ckpts")
    state = loop.train(
        params, iter(batches), cfg.model, num_steps=args.num_steps,
        ckpt_dir=ckpt_dir, ckpt_every=max(args.num_steps // 3, 1), log_every=10,
        metrics_fn=lambda step, loss: losses.append((step, loss)),
    )
    batches.close()

    steps = np.array([s for s, _ in losses])
    vals = np.array([v for _, v in losses])
    k = max(len(vals) // 10, 1)
    head, tail = float(vals[:k].mean()), float(vals[-k:].mean())
    finite = bool(np.all(np.isfinite(vals))) and all(
        bool(np.isfinite(x).all()) for x in jax.tree.leaves(state.params))

    # train -> deploy: exported params must generate finite audio through the sampler path
    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.pipeline.generate import ModelBundle, generate_audio

    export_dir = os.path.join(workdir, "deploy")
    loop.export_for_inference(state, export_dir, latent_stats=stats)
    (fm,) = HunyuanModelLoader().load_model(export_dir, precision="fp32", config=args.config)
    bundle = ModelBundle(mmdit_params=fm["params"], dac_params=dac_params,
                         pipeline_cfg=cfg, compute_dtype=jnp.float32,
                         latent_stats=fm.get("latent_stats"))
    text = jnp.zeros((1, 8, cfg.model.condition_dim), jnp.float32)
    res = generate_audio(bundle, text, text, args.clip_seconds,
                         num_inference_steps=8, batch_size=1, seed=0)
    deploy_ok = bool(np.isfinite(np.asarray(res.audio_batch)).all())

    out = {
        "tool": "train_longrun",
        "config": args.config,
        "num_steps": args.num_steps,
        "loss_head": round(head, 5),
        "loss_tail": round(tail, 5),
        "loss_drop_ratio": round(head / max(tail, 1e-9), 3),
        "finite": finite,
        "deploy_ok": deploy_ok,
        "ok": bool(finite and deploy_ok and tail < 0.7 * head),
        "trajectory": [(int(s), round(float(v), 5)) for s, v in losses[:: max(len(losses) // 20, 1)]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
