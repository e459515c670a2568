"""Self-contained CLI (the reference's ``cli.py`` shells out to scripts that don't ship —
``cli.py:94-138``; this one actually runs the pipeline).

Examples:
    # Text-to-audio with a checkpoint
    python -m foley_tpu.cli --model_path ckpts/ --single_prompt "glass shattering" \
        --duration 5 --num_inference_steps 50 --guidance_scale 4.5 --output out.wav

    # Smoke test with random weights (no checkpoint; BASELINE config 1 shape)
    python -m foley_tpu.cli --random_init tiny --single_prompt "test" --duration 1 \
        --num_inference_steps 10 --precision fp32 --output /tmp/t2a.wav
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("foley-tpu", description=__doc__)
    p.add_argument("--model_path", type=str, default=None,
                   help="Directory with hunyuanvideo_foley / vae / synchformer checkpoints")
    p.add_argument("--config", type=str, default="xxl", choices=["xxl", "xl", "tiny"])
    p.add_argument("--random_init", type=str, default=None, metavar="CONFIG",
                   help="Skip checkpoints; random-init the given config (smoke tests)")
    p.add_argument("--random_init_perturb", action="store_true",
                   help="with --random_init: perturb the zero-init leaves so the model "
                        "emits real velocity (conditioning-sensitive smoke tests; raw "
                        "init leaves latents at the initial noise)")
    p.add_argument("--single_prompt", type=str, default="")
    p.add_argument("--neg_prompt", type=str, default="noisy, harsh")
    p.add_argument("--single_video", type=str, default=None,
                   help="Video file (ffmpeg) or directory of image frames (PIL) for V2A")
    p.add_argument("--frames_fps", type=float, default=16.0,
                   help="Frame rate declared for --single_video when it is a frames directory")
    p.add_argument("--csv_path", type=str, default=None, help="Batch CSV: video_path,prompt")
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--guidance_scale", type=float, default=4.5)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--sampler", type=str, default="euler",
                   choices=["euler", "heun-2", "midpoint-2", "kutta-4"])
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precision", type=str, default="bf16", choices=["bf16", "fp16", "fp32"])
    p.add_argument("--quantization", type=str, default="none",
                   choices=["none", "auto", "fp8_e4m3fn", "fp8_e5m2", "int8", "int8_dynamic", "int4"])
    p.add_argument("--blocks_to_swap", type=int, default=0,
                   help="host-offload the LAST N transformer blocks (block swap, "
                        "parallel/offload.py; 54 = every block off-chip). Composes with "
                        "--quantization: int4 blocks stream 4x fewer host->HBM bytes "
                        "(measured 232 vs 766 ms/step at N=54, ROADMAP)")
    p.add_argument("--prefetch_blocks", type=int, default=0,
                   help="extra offloaded-block fetches in flight (HBM window = N+1); "
                        ">0 measured faster at small swaps but RESOURCE_EXHAUSTs at "
                        "swap>=36 on this runtime — opt-in")
    p.add_argument("--lora", type=str, default=None, metavar="DIR",
                   help="LoRA adapter dir (training/loop.py::export_lora) merged into the "
                        "model weights at load (before any --quantization)")
    p.add_argument("--lora_scale", type=float, default=1.0,
                   help="multiplier on the adapter's own recommended scale; 0 disables")
    p.add_argument("--output", type=str, default="output.wav")
    p.add_argument("--merge_video", action="store_true",
                   help="Mux generated audio onto --single_video with ffmpeg")
    p.add_argument("--desync_score", action="store_true",
                   help="Score AV sync of --single_video's own audio (Synchformer offset head)")
    p.add_argument("--audio_input", type=str, default=None,
                   help="Edit an existing WAV toward the prompt (SDEdit-style partial "
                        "denoise); with --desync_score, the audio track to score against "
                        "(no ffmpeg needed; required when --single_video is a frames dir)")
    p.add_argument("--v2a_preprocess", type=str, default="device",
                   choices=["device", "pil"],
                   help="V2A frame resize/normalize on the TPU (fast; default) or via PIL "
                        "(bit-parity with the reference's torchvision pipeline, but tens "
                        "of host-seconds per clip on weak hosts)")
    p.add_argument("--strength", type=float, default=0.6,
                   help="Edit strength in (0, 1]: fraction of the schedule to re-run")
    p.add_argument("--continue_audio", type=str, default=None, metavar="WAV",
                   help="Continue an existing 48 kHz WAV by --duration seconds toward the "
                        "prompt (the encoded tail is clamped as the first window's known "
                        "prefix — flow-match inpainting); writes the NEW audio to --output")
    p.add_argument("--context_s", type=float, default=4.0,
                   help="--continue_audio: seconds of the source's tail to condition on")
    p.add_argument("--stream_pcm", action="store_true",
                   help="stream raw int16 mono PCM to stdout chunk-by-chunk as long-form "
                        "windows finalize (the CLI analog of serving's pcm16_stream; "
                        "pipe to `aplay -f S16_LE -r 48000 -c 1`); T2A prompts, "
                        "--single_video (V2A) and --continue_audio; logs go to stderr")
    p.add_argument("--first_window", type=float, default=None,
                   help="--stream_pcm latency ramp: denoise/emit this many seconds first "
                        "(time-to-first-audio ~ first_window/window of a full window's "
                        "cost; measured 2.61 s vs 9.14 s at XXL 90 s)")
    p.add_argument("--progress", action="store_true",
                   help="log a tick per denoise step (the reference's ProgressBar UX); "
                        "off by default — the loop is one jitted scan and ticks add a "
                        "host callback per step")
    p.add_argument("--allow_unconditioned", action="store_true",
                   help="Permit generation with zero text features when CLAP is not loaded")
    p.add_argument("--gradio", action="store_true",
                   help="Launch the prompt-box web UI (reference cli.py:42,88-96) instead of "
                        "one-shot generation; serves GET / plus the JSON/WAV API")
    p.add_argument("--host", type=str, default="127.0.0.1", help="--gradio bind host")
    p.add_argument("--port", type=int, default=8321, help="--gradio bind port")
    p.add_argument("--max_batch", type=int, default=1,
                   help="--gradio only: >1 enables request coalescing in the server")
    p.add_argument("--mesh", type=str, default="",
                   help='--gradio only: multi-chip serving mesh, e.g. "data=4,model=2"')
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from foley_tpu.api.nodes import HunyuanDependenciesLoader, HunyuanFoleySampler, HunyuanModelLoader
    from foley_tpu.io.audio import write_wav
    from foley_tpu.utils.logging import get_logger

    logger = get_logger()

    if args.prefetch_blocks and not args.blocks_to_swap:
        print("error: --prefetch_blocks only applies with --blocks_to_swap > 0",
              file=sys.stderr)
        return 2
    if args.stream_pcm and (args.audio_input or args.csv_path
                            or args.desync_score or args.gradio):
        print("error: --stream_pcm supports prompt (T2A), --single_video (V2A) and "
              "--continue_audio runs", file=sys.stderr)
        return 2
    if args.stream_pcm and args.single_video and args.continue_audio:
        print("error: audio continuation is text-conditioned only; drop --single_video",
              file=sys.stderr)
        return 2

    if args.gradio:
        # Web-UI mode: hand off to the serving stack (warmup + HTTP server + browser UI).
        from foley_tpu.serving import server as serving_server

        serve_argv = ["--host", args.host, "--port", str(args.port),
                      "--precision", args.precision,
                      "--quantization", args.quantization,
                      "--config", args.config,
                      "--durations", str(args.duration),
                      "--warmup_steps", str(args.num_inference_steps),
                      "--max_batch", str(args.max_batch),
                      "--v2a_preprocess", args.v2a_preprocess]
        if args.blocks_to_swap:
            serve_argv += ["--blocks_to_swap", str(args.blocks_to_swap)]
            if args.prefetch_blocks:
                serve_argv += ["--prefetch_blocks", str(args.prefetch_blocks)]
        if args.mesh:
            serve_argv += ["--mesh", args.mesh]
        if args.lora:
            serve_argv += ["--lora", args.lora, "--lora_scale", str(args.lora_scale)]
        if args.random_init:
            serve_argv += ["--random_init", args.random_init]
        elif args.model_path:
            serve_argv += ["--model_path", args.model_path]
        else:
            print("error: --gradio needs --model_path or --random_init", file=sys.stderr)
            return 2
        return serving_server.main(serve_argv)

    if args.desync_score:
        return _desync_score(args, logger)

    if args.csv_path:
        return _process_batch(args, logger)

    try:
        from foley_tpu.core.cache import enable_compilation_cache

        enable_compilation_cache()
        if args.random_init:
            foley_model = HunyuanModelLoader.init_random(
                args.random_init, args.precision, args.seed,
                perturb=args.random_init_perturb)
            if args.lora:
                from foley_tpu.api.nodes import _merge_lora_if_given

                foley_model["params"] = _merge_lora_if_given(
                    foley_model["params"], args.lora, args.lora_scale)
            if args.quantization not in ("none", "auto"):
                # checkpoint-free quant smoke runs (the loader path quantizes in
                # load_model; random-init must do it here or the flag silently no-ops)
                from foley_tpu.io.quantize import quantize_params

                foley_model["params"], _, _ = quantize_params(
                    foley_model["params"], args.quantization,
                    on_host=True, consume=True)
            from foley_tpu.configs import get_config
            from foley_tpu.models import dac_vae
            import jax

            cfg = get_config(args.random_init)
            dependencies = {
                "dac_params": dac_vae.init(jax.random.PRNGKey(args.seed + 1), cfg.dac),
                "dac_cfg": cfg.dac,
            }
            if args.single_video:
                # checkpoint-free V2A smoke: random-weight encoders matched to the model dims
                from foley_tpu.models import siglip2 as siglip_mod
                from foley_tpu.models import synchformer as sync_mod

                dependencies["siglip2"] = siglip_mod.init_random(args.seed + 2, cfg.model.clip_dim)
                dependencies["synchformer"] = sync_mod.init_random(
                    args.seed + 3, cfg.model.sync_feat_dim)
        else:
            if not args.model_path:
                print("error: provide --model_path or --random_init", file=sys.stderr)
                return 2
            mp = args.model_path
            loader = HunyuanModelLoader()
            (foley_model,) = loader.load_model(
                os.path.join(mp, "hunyuanvideo_foley.safetensors"),
                precision="auto" if args.precision == "bf16" else args.precision,
                quantization=args.quantization,
                config=args.config,
                lora_path=args.lora or "",
                lora_scale=args.lora_scale,
            )
            deps_loader = HunyuanDependenciesLoader()
            # Encoders colocated under the model dir load automatically (clap/, siglip2/ —
            # the layout pipeline/standalone.py uses); absent dirs are skipped.
            clap_dir = os.path.join(mp, "clap")
            siglip_dir = os.path.join(mp, "siglip2")
            (dependencies,) = deps_loader.load_dependencies(
                os.path.join(mp, "vae_128d_48k.safetensors"),
                os.path.join(mp, "synchformer_state_dict.safetensors"),
                siglip2_model=siglip_dir if os.path.isdir(siglip_dir) else "",
                clap_model=clap_dir if os.path.isdir(clap_dir) else "",
            )

        for key in ("siglip2", "synchformer"):
            if key in dependencies:
                dependencies[key].preprocess = args.v2a_preprocess

        if args.stream_pcm:
            return _stream_pcm(args, foley_model, dependencies, logger)
        if args.first_window is not None:
            print("error: --first_window is a --stream_pcm latency ramp (batch outputs "
                  "gain nothing from it)", file=sys.stderr)
            return 2

        if args.continue_audio:
            return _continue_audio(args, foley_model, dependencies, logger)

        if args.audio_input:
            return _edit_audio(args, foley_model, dependencies, logger)

        image, fps = None, 16.0
        if args.single_video:
            from foley_tpu.pipeline.video import read_video_frames

            image, fps = read_video_frames(args.single_video, dir_fps=args.frames_fps)
            logger.info(f"read {image.shape[0]} frames @ {fps} fps")

        sampler_node = HunyuanFoleySampler()
        swap_args = ({"blocks_to_swap": args.blocks_to_swap,
                      "prefetch_blocks": args.prefetch_blocks}
                     if args.blocks_to_swap > 0 else None)
        t0 = time.perf_counter()
        audio_first, audio_batch = sampler_node.generate_audio(
            foley_model,
            dependencies,
            block_swap_args=swap_args,
            frame_rate=fps,  # the source fps, so 8/25-fps feature resampling is correct
            duration=args.duration,
            prompt=args.single_prompt,
            negative_prompt=args.neg_prompt,
            cfg_scale=args.guidance_scale,
            steps=args.num_inference_steps,
            sampler=args.sampler,
            batch_size=args.batch_size,
            seed=args.seed,
            image=image,
            # --random_init smoke runs have no text encoder by construction
            allow_unconditioned=args.allow_unconditioned or bool(args.random_init),
            progress=args.progress,
        )
        dt = time.perf_counter() - t0
        wf = np.asarray(audio_first["waveform"])[0]  # [C, T]
        write_wav(args.output, wf, audio_first["sample_rate"])
        logger.info(
            f"wrote {args.output}: {wf.shape[-1] / audio_first['sample_rate']:.2f}s audio "
            f"in {dt:.2f}s wall"
        )
        if args.merge_video and args.single_video:
            from foley_tpu.io.audio import merge_audio_video

            out_video = os.path.splitext(args.output)[0] + ".mp4"
            # frames-dir inputs mux to .avi without ffmpeg; the callee returns the real path
            out_video = merge_audio_video(args.single_video, args.output, out_video,
                                          frames_fps=args.frames_fps)
            logger.info(f"muxed {out_video}")
        return 0
    except ImportError as e:
        print(f"missing dependency: {e}", file=sys.stderr)
        return 1
    except Exception as e:
        print(f"error: {e}", file=sys.stderr)
        if _looks_like_oom(e):
            print("hint: the model + workspace exceeded device memory. Long durations at "
                  "bf16 can exceed a 16 GiB chip (measured: 60 s XXL overshoots by ~340 MB)"
                  " — retry with --quantization fp8_e4m3fn (halves weight memory, "
                  "~indistinguishable audio) or a HunyuanBlockSwap config.",
                  file=sys.stderr)
        return 1


def _looks_like_oom(e: Exception) -> bool:
    msg = str(e).lower()
    return any(s in msg for s in ("resource_exhausted", "ran out of memory",
                                  "exceeded hbm", "out of memory in memory space"))


def _edit_audio(args, foley_model, dependencies, logger) -> int:
    """SDEdit-style re-prompting of an existing WAV (pipeline/edit.py)."""
    import wave as wave_mod

    import jax.numpy as jnp
    import numpy as np

    from foley_tpu.io.audio import write_wav
    from foley_tpu.pipeline.edit import edit_audio
    from foley_tpu.pipeline.generate import ModelBundle

    with wave_mod.open(args.audio_input) as f:
        assert f.getframerate() == 48000, "edit input must be 48 kHz"
        pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2").astype(np.float32) / 32767.0
        wav = pcm.reshape(-1, f.getnchannels()).mean(axis=1)  # mono mixdown

    cfg = foley_model["cfg"]
    bundle = ModelBundle(
        mmdit_params=foley_model["params"],
        dac_params=dependencies["dac_params"],
        pipeline_cfg=cfg,
        compute_dtype=foley_model.get("dtype", jnp.bfloat16),
        latent_stats=foley_model.get("latent_stats"),
    )
    if "clap" in dependencies:
        from foley_tpu.models import clap as clap_mod

        feats = clap_mod.encode_text(dependencies["clap"], [args.neg_prompt, args.single_prompt])
        text, uncond = feats[1:2], feats[0:1]
    else:
        text = uncond = jnp.zeros((1, cfg.model.text_length, cfg.model.condition_dim), jnp.float32)
        logger.warning("CLAP unavailable; using zero text features")

    result = edit_audio(
        bundle, wav, text, uncond,
        strength=args.strength, guidance_scale=args.guidance_scale,
        num_inference_steps=args.num_inference_steps, sampler=args.sampler, seed=args.seed,
    )
    write_wav(args.output, result.audio_first[0], result.sample_rate)
    logger.info(f"edited {args.audio_input} -> {args.output} (strength {args.strength})")
    return 0


def _bundle_and_text(args, foley_model, dependencies, logger):
    """The ModelBundle + (text, uncond) features the longform entry points consume —
    shared by --continue_audio and --stream_pcm."""
    import jax.numpy as jnp

    from foley_tpu.pipeline.generate import ModelBundle

    if getattr(args, "blocks_to_swap", 0) > 0:
        from foley_tpu.parallel.offload import host_memory_available, offload_block_suffix

        if host_memory_available():
            # split stacks stream per-block inside the scan (mmdit handles the split
            # layout directly; composes with --quantization — see ROADMAP int4 swap table)
            foley_model["params"] = offload_block_suffix(
                foley_model["params"], args.blocks_to_swap)
        else:
            logger.warning("--blocks_to_swap ignored: backend has no pinned_host memory")
    cfg = foley_model["cfg"]
    bundle = ModelBundle(
        mmdit_params=foley_model["params"],
        dac_params=dependencies["dac_params"],
        pipeline_cfg=cfg,
        compute_dtype=foley_model.get("dtype", jnp.bfloat16),
        latent_stats=foley_model.get("latent_stats"),
        offload_prefetch=getattr(args, "prefetch_blocks", 0) + 1,
    )
    if "clap" in dependencies:
        from foley_tpu.models import clap as clap_mod

        feats = clap_mod.encode_text(dependencies["clap"], [args.neg_prompt, args.single_prompt])
        text, uncond = feats[1:2], feats[0:1]
    else:
        text = uncond = jnp.zeros((1, cfg.model.text_length, cfg.model.condition_dim), jnp.float32)
        logger.warning("CLAP unavailable; using zero text features")
    return bundle, text, uncond


def _read_wav_mono(path: str):
    """48 kHz WAV -> mono float32 [-1, 1] (stdlib reader; mixes multi-channel down)."""
    import wave as wave_mod

    import numpy as np

    with wave_mod.open(path) as f:
        # ValueError (not assert — survives python -O) mirroring serving's
        # _continuation_wav: a 24/8-bit or non-48 kHz WAV read as '<i2' would silently
        # decode to garbage and condition the continuation on noise.
        if f.getframerate() != 48000:
            raise ValueError(f"input WAV must be 48 kHz, got {f.getframerate()} Hz")
        if f.getsampwidth() != 2:
            raise ValueError(
                f"input WAV must be 16-bit PCM, got {8 * f.getsampwidth()}-bit")
        pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2").astype(np.float32) / 32767.0
        return pcm.reshape(-1, f.getnchannels()).mean(axis=1)


def _stream_pcm(args, foley_model, dependencies, logger, out=None) -> int:
    """--stream_pcm: raw int16 mono PCM to stdout chunk-by-chunk as long-form windows
    finalize (the CLI analog of serving's ``response=pcm16_stream``); pipe to
    ``aplay -f S16_LE -r 48000 -c 1``. Logs go to stderr, so piping stays clean.
    T2A prompts, V2A (--single_video; windows slice the full video's features, encoded
    once at ``plan_v2a_long``'s duration) and --continue_audio runs."""
    from foley_tpu.pipeline.longform import (
        continue_audio_stream,
        default_window_s,
        generate_audio_long_stream,
    )

    # incompatible-flag combinations are rejected in main() before any model load
    bundle, text, uncond = _bundle_and_text(args, foley_model, dependencies, logger)
    window_s = default_window_s(bundle.pipeline_cfg)
    common = dict(
        guidance_scale=args.guidance_scale, num_inference_steps=args.num_inference_steps,
        sampler=args.sampler, batch_size=args.batch_size, seed=args.seed,
        window_s=window_s, first_window_s=args.first_window,
    )
    if args.continue_audio:
        chunks = continue_audio_stream(
            bundle, _read_wav_mono(args.continue_audio), text, uncond, args.duration,
            context_s=args.context_s, **common)
    elif args.single_video:
        from foley_tpu.api.nodes import HunyuanFoleySampler
        from foley_tpu.pipeline.longform import plan_v2a_long
        from foley_tpu.pipeline.video import read_video_frames

        frames, fps = read_video_frames(args.single_video, dir_fps=args.frames_fps)
        logger.info(f"read {frames.shape[0]} frames @ {fps} fps")
        # encode the FULL video's features at the window plan's (possibly snapped)
        # duration — the same contract the serving route uses (server.py generate_stream);
        # _prepare_long re-derives the identical plan from (duration, window_s) and each
        # window consumes its exact slice
        feat_dur, _, _ = plan_v2a_long(bundle.pipeline_cfg, args.duration, window_s=window_s)
        clip_feat, sync_feat = HunyuanFoleySampler._encode_video(
            dependencies, frames, fps, feat_dur, bundle.pipeline_cfg)
        chunks = generate_audio_long_stream(
            bundle, text, uncond, args.duration,
            clip_feat=clip_feat, sync_feat=sync_feat, **common)
    else:
        chunks = generate_audio_long_stream(bundle, text, uncond, args.duration, **common)

    out = out if out is not None else sys.stdout.buffer
    t0 = time.perf_counter()
    total = 0
    for ch in chunks:
        if total == 0:
            logger.info(f"first audio after {time.perf_counter() - t0:.2f}s")
        out.write(ch.pcm16[0].tobytes())
        out.flush()
        total += ch.pcm16.shape[-1]
    logger.info(
        f"streamed {total / 48000:.2f}s of audio ({total} samples) "
        f"in {time.perf_counter() - t0:.2f}s wall")
    return 0


def _continue_audio(args, foley_model, dependencies, logger) -> int:
    """Continue an existing WAV by --duration seconds (pipeline/longform.py)."""
    from foley_tpu.io.audio import write_wav
    from foley_tpu.pipeline.longform import continue_audio

    wav = _read_wav_mono(args.continue_audio)
    bundle, text, uncond = _bundle_and_text(args, foley_model, dependencies, logger)
    result = continue_audio(
        bundle, wav, text, uncond, args.duration,
        context_s=args.context_s, guidance_scale=args.guidance_scale,
        num_inference_steps=args.num_inference_steps, sampler=args.sampler,
        seed=args.seed, batch_size=args.batch_size,
    )
    write_wav(args.output, result.audio_first[0], result.sample_rate)
    logger.info(
        f"continued {args.continue_audio} by {args.duration:.2f}s "
        f"(context {args.context_s}s) -> {args.output}"
    )
    return 0


def _process_batch(args, logger) -> int:
    """CSV batch mode: rows of ``video_path,prompt`` (reference ``cli.py:126-137`` contract,
    but in-process instead of spawning subprocesses)."""
    import csv

    rows = []
    with open(args.csv_path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            rows.append((row[0].strip(), row[1].strip() if len(row) > 1 else ""))
    logger.info(f"batch: {len(rows)} rows from {args.csv_path}")
    failures = 0
    out_base, out_ext = os.path.splitext(args.output)
    for i, (video, prompt) in enumerate(rows):
        sub = argparse.Namespace(**vars(args))
        sub.csv_path = None
        sub.single_video = video or None
        sub.single_prompt = prompt
        sub.output = f"{out_base}_{i:03d}{out_ext}"
        rc = main_single(sub)
        if rc != 0:
            logger.warning(f"row {i} ({video!r}) failed with rc={rc}")
            failures += 1
    return 1 if failures else 0


def _desync_score(args, logger) -> int:
    try:
        if not args.single_video:
            print("error: --desync_score requires --single_video", file=sys.stderr)
            return 2
        import numpy as np

        from foley_tpu.models.sync_scorer import load_desync_scorer
        from foley_tpu.pipeline.video import read_video_frames

        scorer = load_desync_scorer(
            os.path.join(args.model_path or ".", "synchformer_state_dict.safetensors")
        )
        frames, _ = read_video_frames(args.single_video, target_fps=25,
                                      dir_fps=args.frames_fps)
        waveform = None
        if args.audio_input:
            # WAV provided directly (stdlib/native reader, resampled to the scorer's
            # 16 kHz) — no ffmpeg needed; the only option when --single_video is a
            # frames directory
            from foley_tpu.io.audio import read_wav

            waveform, _ = read_wav(args.audio_input, target_sr=16000)
        elif not os.path.isdir(args.single_video):
            # MJPEG+PCM AVIs (our muxer's format, io/avi.py) carry their audio track
            # readable in-process — score them with zero external tools
            from foley_tpu.io.avi import is_mjpeg_avi, read_avi

            if is_mjpeg_avi(args.single_video):
                try:
                    _, _, audio, sr = read_avi(args.single_video)
                except ValueError:
                    audio = None
                if audio is not None:
                    from foley_tpu.io.native import resample_linear

                    waveform = resample_linear(audio, sr, 16000) if sr != 16000 else audio
        if waveform is None:
            # anything else: extract the audio track at 16 kHz via ffmpeg
            import shutil
            import subprocess

            ffmpeg = shutil.which("ffmpeg")
            if ffmpeg is None:
                print("error: ffmpeg required for audio extraction "
                      "(or pass the audio as --audio_input x.wav)", file=sys.stderr)
                return 1
            raw = subprocess.run(
                [ffmpeg, "-v", "quiet", "-i", args.single_video, "-ac", "1", "-ar", "16000",
                 "-f", "f32le", "pipe:1"],
                capture_output=True, check=True,
            ).stdout
            waveform = np.frombuffer(raw, np.float32)
        offset = scorer.score(frames, waveform)
        print(f"predicted AV offset: {float(offset[0]):+.2f} s")
        return 0
    except Exception as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


def main_single(args) -> int:
    """Run one generation with a pre-built namespace (used by batch mode)."""
    saved = sys.argv
    try:
        return main(_namespace_to_argv(args))
    finally:
        sys.argv = saved


def _namespace_to_argv(ns) -> list:
    argv = []
    for key, value in vars(ns).items():
        # identity checks: `0 == False` in Python, so `value in (None, False)` would
        # silently drop explicit zero-valued flags (e.g. --seed 0) from CSV batch rows
        if value is None or value is False:
            continue
        flag = f"--{key}"
        if value is True:
            argv.append(flag)
        else:
            argv += [flag, str(value)]
    return argv


if __name__ == "__main__":
    sys.exit(main())
