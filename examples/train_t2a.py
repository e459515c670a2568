#!/usr/bin/env python
"""End-to-end T2A fine-tuning demo: WAV corpus -> DAC latent shards -> flow-matching steps.

Runnable with no checkpoints (random tiny model + a synthesized corpus); point
``--corpus``/``--model_path`` at real data and converted weights for actual fine-tuning.
The full recipe:

1. ``AudioFolderDataset`` crops fixed-length clips from a WAV folder (native/stdlib decode).
2. ``encode_corpus`` DAC-encodes them ONCE into .npz latent shards (frozen encoders never
   run during training — the standard TPU input-pipeline shape).
3. ``flow_match_batches`` assembles {latents, cond, clip_feat, sync_feat} with the model's
   learned empty sequences (audio-only conditioning, the reference's T2A branch).
4. ``PrefetchLoader`` stages batches on device from a background thread.
5. ``training.loop.train`` runs the jitted flow-matching step with orbax checkpoint/resume.
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="", help="folder of WAV files (synthesized if empty)")
    ap.add_argument("--config", default="tiny", choices=["tiny", "xl", "xxl"])
    ap.add_argument("--clip_seconds", type=float, default=1.0)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--num_steps", type=int, default=10)
    ap.add_argument("--num_clips", type=int, default=8, help="clips to encode into shards")
    ap.add_argument("--ckpt_dir", default="", help="orbax checkpoint dir (resume-exact)")
    ap.add_argument("--model_path", default="",
                    help="pretrained MMDiT to fine-tune (.pth/.safetensors/orbax dir); "
                         "random init if empty")
    ap.add_argument("--dac_path", default="",
                    help="DAC-VAE checkpoint used to encode the corpus; REQUIRED with "
                         "--model_path (a pretrained MMDiT only understands latents from "
                         "the DAC it was trained with — encoding with a random DAC would "
                         "silently destroy it)")
    ap.add_argument("--export_dir", default="",
                    help="after training, export bare params (+ latent stats when training "
                         "from scratch) in the layout HunyuanModelLoader loads")
    args = ap.parse_args()
    if args.model_path and not args.dac_path:
        ap.error("--model_path fine-tuning requires --dac_path (see its help)")

    import jax

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
    from foley_tpu.training.loop import train

    cfg = get_config(args.config)
    workdir = tempfile.mkdtemp(prefix="foley_train_")

    corpus = args.corpus
    if not corpus:  # synthesize a toy corpus so the demo runs anywhere
        corpus = os.path.join(workdir, "wavs")
        os.makedirs(corpus)
        rng = np.random.default_rng(0)
        for i in range(4):
            t = np.linspace(0, args.clip_seconds, int(48000 * args.clip_seconds), False)
            wav = 0.3 * np.sin(2 * np.pi * (220 + 110 * i) * t) * np.exp(-2 * t)
            write_wav(os.path.join(corpus, f"tone_{i}.wav"), wav.astype(np.float32), 48000)
        print(f"synthesized 4 demo clips under {corpus}")

    if args.dac_path:
        from foley_tpu.io.convert import convert_dac_state_dict, load_torch_state_dict

        dac_params = convert_dac_state_dict(load_torch_state_dict(args.dac_path), cfg.dac,
                                            consume=True)
    else:
        dac_params = dac_vae.init(jax.random.PRNGKey(0), cfg.dac)
    shard_dir = os.path.join(workdir, "shards")
    dataset = AudioFolderDataset(corpus, args.clip_seconds, cfg.dac.sample_rate, seed=0)
    encode_corpus(dac_params, cfg.dac, dataset, shard_dir, num_clips=args.num_clips,
                  batch_size=args.batch_size)

    if args.model_path:
        from foley_tpu.api.nodes import HunyuanModelLoader

        (fm,) = HunyuanModelLoader().load_model(args.model_path, precision="fp32",
                                                config=args.config)
        params = fm["params"]
    else:
        params = mmdit.init(jax.random.PRNGKey(1), cfg.model)
    # standardize latents when training from scratch (random DAC => arbitrary latent scale);
    # fine-tuning a pretrained model should skip this (it lives in the raw DAC latent space)
    stats = latent_stats_from_shards(shard_dir) if not args.model_path else None
    batches = PrefetchLoader(
        flow_match_batches(iter(NpzShardDataset(shard_dir)), params, cfg,
                           batch_size=args.batch_size, latent_stats=stats),
        depth=2,
    )
    state = train(params, iter(batches), cfg.model, num_steps=args.num_steps,
                  ckpt_dir=args.ckpt_dir or None, log_every=max(args.num_steps // 5, 1))
    batches.close()
    if args.export_dir:
        from foley_tpu.training.loop import export_for_inference

        export_for_inference(state, args.export_dir, latent_stats=stats)
    print(f"done: {int(state.step)} steps")


if __name__ == "__main__":
    main()
