"""Node-equivalent public API — the reference's six ComfyUI nodes, TPU-native.

Same public surface as reference ``nodes.py:57-683`` (INPUT_TYPES widget schemas, RETURN_TYPES,
FUNCTION, CATEGORY, NODE_CLASS_MAPPINGS) so a ComfyUI front-end — or any host graph runtime —
can drive this framework the same way it drives the reference. The classes also work
standalone (no ComfyUI import): AUDIO values are plain dicts
``{"waveform": np.ndarray [B, C, T], "sample_rate": int}``.

Mapping of reference mechanisms -> TPU-native:
- precision/quantization knobs -> param storage dtype + fp8 pytree quantization;
- TorchCompile node -> CompileConfig (AOT jit warm-up over declared shape buckets);
- BlockSwap node -> host-memory offload policy (``foley_tpu/parallel/offload.py``);
- force_offload -> phase ping-pong via ``offload_params``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.configs import XXL, PipelineConfig, get_config
from foley_tpu.core.dtypes import resolve_dtype
from foley_tpu.core.params import cast_params, param_bytes
from foley_tpu.io.convert import (
    convert_dac_state_dict,
    convert_mmdit_state_dict,
    detect_ckpt_fp8,
    detect_ckpt_major_precision,
    load_torch_state_dict,
)
from foley_tpu.io.quantize import quantize_params
from foley_tpu.models import mmdit
from foley_tpu.pipeline.generate import ModelBundle, generate_audio, select_audio_from_batch
from foley_tpu.utils.logging import get_logger

logger = get_logger()

SOLVERS = ["euler", "heun-2", "midpoint-2", "kutta-4"]


def _merge_lora_if_given(params: Dict, lora_path: str, lora_scale: float) -> Dict:
    """Fold a trained adapter into the loaded weights (``models/lora.py::merge_lora``).

    Runs after the precision cast (the merge targets the serving dtype) and before any
    quantization (quantized storage should hold the ADAPTED weights). The adapter's
    recommended scale (lora_meta.json) multiplies the widget scale."""
    if not lora_path:
        return params
    from foley_tpu.models.lora import load_lora, merge_lora

    lora, meta_scale = load_lora(lora_path)
    params = merge_lora(params, lora, scale=float(lora_scale) * meta_scale)
    logger.info(f"LoRA merged from {lora_path} (scale {float(lora_scale) * meta_scale:g})")
    return params


class HunyuanModelLoader:
    """Loads the main MMDiT checkpoint (reference ``nodes.py:57-151``)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "model_name": ("STRING", {"default": "hunyuanvideo_foley.safetensors"}),
                "precision": (["auto", "bf16", "fp16", "fp32"], {"default": "auto"}),
                "quantization": (["none", "auto", "fp8_e4m3fn", "fp8_e5m2", "int8", "int8_dynamic", "int4"], {"default": "none"}),
            },
            "optional": {
                "config": (["xxl", "xl", "tiny"], {"default": "xxl"}),
                # LoRA adapter dir (training/loop.py::export_lora): merged into the
                # weights at load — zero runtime cost, hoists/quantization see the
                # adapted weights. lora_scale=0 disables without reloading.
                "lora_path": ("STRING", {"default": ""}),
                "lora_scale": ("FLOAT", {"default": 1.0, "min": -4.0, "max": 4.0}),
            },
        }

    RETURN_TYPES = ("FOLEY_MODEL",)
    FUNCTION = "load_model"
    CATEGORY = "HunyuanVideoFoley-TPU"

    def load_model(self, model_name: str, precision: str = "auto",
                   quantization: str = "none", config: str = "xxl",
                   lora_path: str = "", lora_scale: float = 1.0):
        import os

        cfg = get_config(config)
        if os.path.isdir(model_name):
            # pre-converted orbax artifact (python -m foley_tpu.io.convert)
            return self._load_orbax(model_name, precision, quantization, cfg,
                                    lora_path=lora_path, lora_scale=lora_scale)
        sd = load_torch_state_dict(model_name)
        ckpt_fp8 = detect_ckpt_fp8(sd)
        major = detect_ckpt_major_precision(sd)
        if precision == "auto":
            precision = major
        dtype = resolve_dtype(precision)
        params = convert_mmdit_state_dict(sd, cfg.model, consume=True)
        # fp8 checkpoint tensors pass through bit-exact (reference utils.py:467-472);
        # the precision cast applies only to the non-fp8 leaves.
        from foley_tpu.core.dtypes import FP8_DTYPES

        params = cast_params(
            params, dtype, predicate=lambda path, leaf: leaf.dtype not in FP8_DTYPES
        )
        params = _merge_lora_if_given(params, lora_path, lora_scale)
        if quantization != "none":
            qmode = quantization
            if qmode == "auto":
                qmode = ckpt_fp8 or "fp8_e4m3fn"
            # int8_dynamic additionally runs dense matmuls on the native int8 MXU
            # (per-token activation quant) — an opt-in throughput mode beyond the
            # reference's storage-only quantization. int4 is 4-bit group-wise storage:
            # quarter of the bf16 weight bytes (the measured batch-1 step-time bound).
            params, counts, saved = quantize_params(params, qmode)
            logger.info(
                f"{qmode} wrap: {counts['quantized']} weights quantized, "
                f"{saved / 2**30:.2f} GiB saved"
            )
        logger.info(f"MMDiT loaded: {param_bytes(params) / 2**30:.2f} GiB resident ({precision})")
        return ({"params": params, "cfg": cfg, "dtype": dtype},)

    def _load_orbax(self, path: str, precision: str, quantization: str, cfg: PipelineConfig,
                    lora_path: str = "", lora_scale: float = 1.0):
        import os

        from foley_tpu.core.dtypes import FP8_DTYPES
        from foley_tpu.io.orbax_io import load_params

        params = load_params(path)
        if precision == "auto":
            import numpy as np

            sizes: Dict[str, int] = {}
            for leaf in jax.tree.leaves(params):
                name = str(leaf.dtype)
                key = {"bfloat16": "bf16", "float16": "fp16", "float32": "fp32"}.get(name)
                if key:
                    sizes[key] = sizes.get(key, 0) + int(np.prod(leaf.shape))
            precision = max(sizes, key=sizes.get) if sizes else "bf16"
        dtype = resolve_dtype(precision)
        params = cast_params(params, dtype, predicate=lambda p, l: l.dtype not in FP8_DTYPES)
        params = _merge_lora_if_given(params, lora_path, lora_scale)
        if quantization != "none":
            qmode = "fp8_e4m3fn" if quantization == "auto" else quantization
            params, counts, saved = quantize_params(params, qmode)
            logger.info(f"{qmode} wrap: {counts['quantized']} weights, {saved / 2**30:.2f} GiB saved")
        logger.info(f"MMDiT loaded from orbax: {param_bytes(params) / 2**30:.2f} GiB ({precision})")
        out = {"params": params, "cfg": cfg, "dtype": dtype}
        # from-scratch-trained exports carry the latent standardization the sampler must
        # invert before DAC decode (training/loop.py::export_for_inference)
        stats_file = os.path.join(path, "latent_stats.npz")
        if os.path.exists(stats_file):
            import numpy as np

            with np.load(stats_file) as z:
                out["latent_stats"] = (jnp.asarray(z["mean"]), jnp.asarray(z["std"]))
            logger.info("latent standardization stats attached (from-scratch export)")
        return (out,)

    @staticmethod
    def init_random(config: str = "tiny", precision: str = "bf16", seed: int = 0,
                    perturb: bool = False):
        """Build a randomly-initialized model bundle (tests/benchmarks, no checkpoint).

        ``perturb``: nudge the reference-faithful zero-init leaves (final layer, adaLN
        heads) so the model emits real velocity — without it the output is the initial
        noise regardless of conditioning, which hides plumbing bugs in smoke tests
        (``core/params.py::perturb_zero_leaves``)."""
        cfg = get_config(config)
        dtype = resolve_dtype(precision)
        params = mmdit.init(jax.random.PRNGKey(seed), cfg.model, dtype=dtype)
        if perturb:
            from foley_tpu.core.params import perturb_zero_leaves

            params = perturb_zero_leaves(params, jax.random.PRNGKey(seed + 1))
        return {"params": params, "cfg": cfg, "dtype": dtype}


class HunyuanDependenciesLoader:
    """Loads DAC-VAE + Synchformer + SigLIP2 + CLAP (reference ``nodes.py:156-206``).

    The reference fetches SigLIP2 (`google/siglip2-base-patch16-512`) and CLAP
    (`laion/larger_clap_general`) from the Hugging Face hub (``nodes.py:199-201``); in the
    zero-egress TPU deployment they load from local checkpoint paths/directories instead.
    Empty paths skip the encoder (the sampler then requires ``allow_unconditioned=True`` to
    run without text conditioning).
    """

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "vae_model": ("STRING", {"default": "vae_128d_48k.safetensors"}),
                "synchformer_model": ("STRING", {"default": "synchformer_state_dict.safetensors"}),
                # the reference defaults fp16 (CUDA); bf16 is the TPU-native equivalent.
                # Sets the visual encoders' ViT activation dtype — measured numerically
                # free (pooled-feature cosine 1.00000 vs fp32, ROADMAP round-5 V2A bench)
                "precision": (["fp32", "fp16", "bf16"], {"default": "bf16"}),
            },
            "optional": {
                "siglip2_model": ("STRING", {"default": ""}),
                "clap_model": ("STRING", {"default": ""}),
                "clap_tokenizer": ("STRING", {"default": ""}),
                "video_preprocess": (["device", "pil"], {
                    "default": "device",
                    "tooltip": "V2A frame resize on the TPU (fast) or via PIL (bit-parity "
                               "with the reference's torchvision pipeline; tens of "
                               "host-seconds per clip on weak hosts)"}),
            },
        }

    RETURN_TYPES = ("FOLEY_DEPS",)
    FUNCTION = "load_dependencies"
    CATEGORY = "HunyuanVideoFoley-TPU"

    def load_dependencies(self, vae_model: str, synchformer_model: Optional[str] = None,
                          precision: str = "bf16", siglip2_model: str = "",
                          clap_model: str = "", clap_tokenizer: str = "",
                          video_preprocess: str = "device"):
        from foley_tpu.configs import DACConfig

        dac_cfg = DACConfig()
        sd = load_torch_state_dict(vae_model)
        dac_params = convert_dac_state_dict(sd, dac_cfg, consume=True)
        deps: Dict[str, Any] = {"dac_params": dac_params, "dac_cfg": dac_cfg}
        if synchformer_model:
            try:
                from foley_tpu.models import synchformer as sync_mod

                deps["synchformer"] = sync_mod.load(synchformer_model)
            except (ImportError, FileNotFoundError) as e:
                logger.warning(f"Synchformer unavailable ({e}); V2A sync features disabled")
        # A given-but-broken encoder path is an error (loud), an empty path is a skip.
        if siglip2_model:
            from foley_tpu.models import siglip2 as siglip_mod

            deps["siglip2"] = siglip_mod.load(siglip2_model)
            logger.info(f"SigLIP2 loaded from {siglip2_model}")
        if clap_model:
            from foley_tpu.models import clap as clap_mod

            deps["clap"] = clap_mod.load(clap_model, tokenizer_path=clap_tokenizer or None)
            logger.info(f"CLAP loaded from {clap_model}")
        for key in ("siglip2", "synchformer"):
            if key in deps:
                deps[key].preprocess = video_preprocess
                # ViT activation dtype (features return fp32 either way); bf16/fp16 run
                # the MXU fast path — fidelity measured at cosine 1.00000 vs fp32 on the
                # real geometry (tools/profile_v2a.py --mfu, ROADMAP round-5)
                deps[key].compute_dtype = resolve_dtype(precision)
        return (deps,)


class HunyuanCompileConfig:
    """AOT warm-up config — the torch.compile node's TPU analog (reference ``nodes.py:433-607``).

    Declares the (duration, batch, text-bucket) shape buckets to pre-compile so first
    generation is not paused by XLA compilation; compile-cache misses are logged.
    """

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "durations": ("STRING", {"default": "5"}),
                "batch_sizes": ("STRING", {"default": "1"}),
                "text_buckets": ("STRING", {"default": "77"}),
            }
        }

    RETURN_TYPES = ("COMPILE_CFG",)
    FUNCTION = "make_config"
    CATEGORY = "HunyuanVideoFoley-TPU"

    def make_config(self, durations: str = "5", batch_sizes: str = "1", text_buckets: str = "77"):
        parse = lambda s: tuple(int(float(x)) for x in str(s).split(",") if str(x).strip())
        return ({
            "durations": parse(durations),
            "batch_sizes": parse(batch_sizes),
            "text_buckets": parse(text_buckets),
        },)


class HunyuanBlockSwap:
    """Host-offload knobs (reference ``nodes.py:609-631``).

    blocks_to_swap maps to the pinned-host placement of the scanned block stacks
    (``foley_tpu/parallel/offload.py``); prefetch_blocks maps to the HBM fetch window of the
    unrolled offloaded tail (``models/mmdit.py::_run_stack``: the copy of block i+window is
    gated on block i's output, so HBM holds at most window offloaded blocks — window =
    prefetch_blocks + 1, i.e. prefetch_blocks extra copies in flight, matching the
    reference's prefetch-stream depth ``hifi_foley.py:574-612``). use_non_blocking is
    accepted and logged for compatibility (all XLA copies are async until a use).
    """

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "blocks_to_swap": ("INT", {"default": 30, "min": 0, "max": 57}),
                "use_non_blocking": ("BOOLEAN", {"default": True}),
                "prefetch_blocks": ("INT", {"default": 0, "min": 0, "max": 57}),
                "block_swap_debug": ("BOOLEAN", {"default": False}),
            }
        }

    RETURN_TYPES = ("BLOCKSWAPARGS",)
    FUNCTION = "set_args"
    CATEGORY = "HunyuanVideoFoley-TPU"

    def set_args(self, blocks_to_swap=30, use_non_blocking=True, prefetch_blocks=0,
                 block_swap_debug=False):
        return ({
            "blocks_to_swap": blocks_to_swap,
            "use_non_blocking": use_non_blocking,
            "prefetch_blocks": prefetch_blocks,
            "block_swap_debug": block_swap_debug,
        },)


def _resident_params(foley_model: Dict):
    """Restore/commit the denoiser params to device memory (shared node preamble).

    Commit matters: restore_params after a force_offload yields *committed* arrays, and
    jit treats committed vs uncommitted placements as different cache keys — without the
    up-front commit, every park/restore cycle would recompile the denoise program."""
    from foley_tpu.parallel.offload import restore_params

    params = foley_model["params"]
    if foley_model.get("_offloaded"):
        params = restore_params(params)
        foley_model["params"] = params
        foley_model["_offloaded"] = False
    elif not foley_model.get("_device_committed"):
        params = restore_params(params)
        foley_model["params"] = params
        foley_model["_device_committed"] = True
    return params


class HunyuanFoleySampler:
    """The main generation node (reference ``nodes.py:211-427``)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "foley_model": ("FOLEY_MODEL",),
                "dependencies": ("FOLEY_DEPS",),
                "frame_rate": ("INT", {"default": 16, "min": 1, "max": 120}),
                # reference widget caps at 60 (nodes.py:219); ours allows long-form T2A,
                # routed through the windowed inpainting path past cfg.max_duration_s
                "duration": ("FLOAT", {"default": 5.0, "min": 1.0, "max": 600.0}),
                "prompt": ("STRING", {"default": ""}),
                "negative_prompt": ("STRING", {"default": "noisy, harsh"}),
                "cfg_scale": ("FLOAT", {"default": 4.5, "min": 1.0, "max": 10.0}),
                "steps": ("INT", {"default": 50, "min": 10, "max": 100}),
                "sampler": (SOLVERS, {"default": "euler"}),
                "batch_size": ("INT", {"default": 1, "min": 1, "max": 6}),
                "seed": ("INT", {"default": 0, "min": 0, "max": 2**63 - 1}),
                "force_offload": ("BOOLEAN", {"default": True}),
            },
            "optional": {
                "image": ("IMAGE",),
                "torch_compile_cfg": ("COMPILE_CFG",),
                "block_swap_args": ("BLOCKSWAPARGS",),
                "allow_unconditioned": ("BOOLEAN", {"default": False}),
                "progress": ("BOOLEAN", {"default": False}),
            },
        }

    RETURN_TYPES = ("AUDIO", "AUDIO")
    RETURN_NAMES = ("audio_first", "audio_batch")
    FUNCTION = "generate_audio"
    CATEGORY = "HunyuanVideoFoley-TPU"

    def generate_audio(
        self,
        foley_model: Dict,
        dependencies: Dict,
        frame_rate: int = 16,
        duration: float = 5.0,
        prompt: str = "",
        negative_prompt: str = "noisy, harsh",
        cfg_scale: float = 4.5,
        steps: int = 50,
        sampler: str = "euler",
        batch_size: int = 1,
        seed: int = 0,
        force_offload: bool = True,
        image: Optional[np.ndarray] = None,
        torch_compile_cfg: Optional[Dict] = None,
        block_swap_args: Optional[Dict] = None,
        allow_unconditioned: bool = False,
        progress: bool = False,
    ):
        params = _resident_params(foley_model)
        cfg: PipelineConfig = foley_model["cfg"]

        from foley_tpu.parallel.offload import host_memory_available

        offload_fetch = False
        block_swapped = False
        if block_swap_args and block_swap_args.get("blocks_to_swap", 0) > 0:
            from foley_tpu.parallel.offload import is_split_stack, offload_block_suffix

            # Per-block suffix split: placement is carried by the split stack structure
            # (resident prefix in HBM, per-block pinned-host trees fetched unrolled), so
            # offload_fetch stays False — the resident blocks must not pay the fetch path.
            # The split version REPLACES the stored params: keeping the unsplit copy alive
            # would double HBM and defeat the swap (idempotent re-split merges first).
            params = offload_block_suffix(params, int(block_swap_args["blocks_to_swap"]))
            foley_model["params"] = params
            block_swapped = is_split_stack(params.get("single_blocks")) or is_split_stack(
                params.get("triple_blocks")
            )
            if block_swap_args.get("block_swap_debug"):
                # the reference's BlockSwap memory report (hifi_foley.py:609-612)
                from foley_tpu.parallel.offload import log_partition_report

                log_partition_report(params)
        elif block_swap_args is not None:
            # blocks_to_swap == 0 with the node attached: bring any split stacks back to HBM
            from foley_tpu.parallel.offload import is_split_stack, merge_block_suffix

            if is_split_stack(params.get("single_blocks")) or is_split_stack(
                params.get("triple_blocks")
            ):
                params = merge_block_suffix(params)
                foley_model["params"] = params

        # --- phase 1: features ---
        from foley_tpu.utils.profiling import phase

        with phase("feature extraction"):
            text_feat, uncond_text_feat = self._encode_text(
                dependencies, prompt, negative_prompt, cfg, allow_unconditioned
            )
            clip_feat = sync_feat = None
            if image is not None:
                encode_duration = duration
                if duration > cfg.max_duration_s:
                    # long-form V2A: windows slice the FULL video's features, so encode at
                    # the plan's snapped duration (pipeline/longform.py module doc)
                    from foley_tpu.pipeline.longform import default_window_s, plan_v2a_long

                    encode_duration, _, _ = plan_v2a_long(
                        cfg, duration, window_s=default_window_s(cfg)
                    )
                clip_feat, sync_feat = self._encode_video(
                    dependencies, image, frame_rate, encode_duration, cfg
                )

        bundle = ModelBundle(
            mmdit_params=params,
            dac_params=dependencies["dac_params"],
            pipeline_cfg=cfg,
            encoders=dependencies,
            compute_dtype=foley_model.get("dtype", jnp.bfloat16),
            offload_fetch=offload_fetch,
            offload_prefetch=1 + int((block_swap_args or {}).get("prefetch_blocks", 0)),
            latent_stats=foley_model.get("latent_stats"),
            progress=progress,
        )

        # AOT warmup over the declared shape buckets (the torch.compile node's runtime role,
        # reference nodes.py:358-364,433-607): compile before the timed generation phase.
        if torch_compile_cfg:
            self._warmup_compile(foley_model, bundle, torch_compile_cfg, cfg_scale, steps, sampler)

        # --- phase 2: denoise + decode ---
        import time as _time

        t_denoise = _time.perf_counter()
        with phase(f"denoise ({steps} steps, {sampler}) + decode"):
            result = self._generate(bundle, text_feat, uncond_text_feat, duration, clip_feat,
                                    sync_feat, cfg_scale, steps, sampler, batch_size, seed)
        if block_swap_args and block_swap_args.get("block_swap_debug"):
            # per-step aggregate: the whole denoise loop is ONE jitted scan, so the
            # reference's per-block host timestamps (hifi_foley.py:855) have no analog;
            # report the aggregate step cost instead (includes the gated host fetches).
            dt = _time.perf_counter() - t_denoise
            logger.info(f"block_swap_debug: denoise+decode {dt:.2f}s "
                        f"≈ {1000.0 * dt / max(steps, 1):.1f} ms/step incl. decode")
        sr = result.sample_rate

        # force_offload: park the denoiser params in host memory until the next call
        # (the reference moves models back to CPU after the run, nodes.py:407-415).
        # Skipped when block swap already holds the big stacks in host memory.
        if force_offload and not block_swapped and host_memory_available():
            from foley_tpu.parallel.offload import offload_params

            foley_model["params"] = offload_params(params)
            foley_model["_offloaded"] = True

        return (
            {"waveform": result.audio_first, "sample_rate": sr},
            {"waveform": result.audio_batch, "sample_rate": sr},
        )

    @staticmethod
    def _generate(bundle, text_feat, uncond_text_feat, duration, clip_feat, sync_feat,
                  cfg_scale, steps, sampler, batch_size, seed):
        cfg = bundle.pipeline_cfg
        if duration > cfg.max_duration_s:
            # beyond the reference's 60 s cap: windowed flow-match inpainting keeps memory
            # bounded by the window length (pipeline/longform.py; any solver — the prefix
            # clamp is stage-aware). V2A windows slice the full video's features (encoded
            # at plan_v2a_long's duration above).
            from foley_tpu.pipeline.longform import default_window_s, generate_audio_long

            return generate_audio_long(
                bundle, text_feat, uncond_text_feat, duration,
                clip_feat=clip_feat, sync_feat=sync_feat,
                window_s=default_window_s(cfg),  # MUST match the encode path's plan above
                guidance_scale=cfg_scale, num_inference_steps=steps, sampler=sampler,
                batch_size=batch_size, seed=seed,
            )
        return generate_audio(
            bundle,
            text_feat,
            uncond_text_feat,
            duration,
            clip_feat=clip_feat,
            sync_feat=sync_feat,
            guidance_scale=cfg_scale,
            num_inference_steps=steps,
            sampler=sampler,
            batch_size=batch_size,
            seed=seed,
        )

    @staticmethod
    def _warmup_compile(foley_model: Dict, bundle: ModelBundle, compile_cfg: Dict,
                        cfg_scale: float, steps: int, sampler: str) -> None:
        """Pre-compile the declared (duration, batch, text-bucket) buckets before phase 2.

        Plays the role of the reference's torch.compile block-compilation pass inside
        ``generate_audio`` (``nodes.py:358-364,474-607``): the first run with a compile config
        attached pays the XLA compile for every declared bucket; subsequent sampler calls that
        land in a warmed bucket dispatch the cached program (zero new compiles). Warmed keys
        are remembered on the model dict so repeat calls skip the warmup generations.
        """
        import time as _time

        from foley_tpu.sampling.denoise import denoise_and_decode

        warmed = foley_model.setdefault("_warm_buckets", set())
        cfgm = bundle.pipeline_cfg.model
        use_cfg = cfg_scale > 1.0
        for d in compile_cfg.get("durations", (5,)):
            for b in compile_cfg.get("batch_sizes", (1,)):
                for tb in compile_cfg.get("text_buckets", (77,)):
                    key = (float(d), int(b), int(tb), int(steps), sampler, use_cfg)
                    if key in warmed:
                        continue
                    before = denoise_and_decode._cache_size()
                    t0 = _time.perf_counter()
                    z = jnp.zeros((1, int(tb), cfgm.condition_dim), jnp.float32)
                    generate_audio(
                        bundle, z, z, float(d), guidance_scale=cfg_scale,
                        num_inference_steps=steps, sampler=sampler, batch_size=int(b),
                        seed=0, text_bucket=int(tb),
                    )
                    missed = denoise_and_decode._cache_size() > before
                    logger.info(
                        f"compile warmup: duration={d}s batch={b} text_bucket={tb} "
                        f"steps={steps} sampler={sampler} -> "
                        f"{'compiled' if missed else 'cache hit'} "
                        f"in {_time.perf_counter() - t0:.1f}s"
                    )
                    warmed.add(key)

    # -- feature helpers -----------------------------------------------------------
    @staticmethod
    def _encode_text(deps: Dict, prompt: str, negative_prompt: str, cfg: PipelineConfig,
                     allow_unconditioned: bool = False):
        if "clap" in deps:
            from foley_tpu.models import clap as clap_mod

            feats = clap_mod.encode_text(deps["clap"], [negative_prompt, prompt])
            return feats[1:2], feats[0:1]
        # No text encoder loaded. Running unconditioned silently would degrade the default
        # node-graph path vs the reference (which always loads CLAP, nodes.py:200-201), so
        # zero text features are opt-in.
        if not allow_unconditioned:
            raise ValueError(
                "No CLAP text encoder in dependencies: pass clap_model/clap_tokenizer to "
                "HunyuanDependenciesLoader, or set allow_unconditioned=True to generate "
                "with zero text features."
            )
        ltxt = cfg.model.text_length
        z = jnp.zeros((1, ltxt, cfg.model.condition_dim), jnp.float32)
        logger.warning("CLAP unavailable; using zero text features (allow_unconditioned)")
        return z, z

    @staticmethod
    def _encode_video(deps: Dict, image: np.ndarray, frame_rate: int, duration: float,
                      cfg: PipelineConfig):
        from foley_tpu.pipeline.features import resample_frames, sync_segments

        frames = np.asarray(image)  # [T, H, W, C] in [0, 1]
        f8 = resample_frames(frames, frame_rate, duration, cfg.siglip2_fps)
        f25 = resample_frames(frames, frame_rate, duration, cfg.synchformer_fps)
        clip_feat = sync_feat = None
        sync_dev = getattr(deps.get("synchformer"), "preprocess", "pil") == "device" \
            if "synchformer" in deps else False
        preloaded = None
        if sync_dev and "siglip2" in deps:
            from foley_tpu.models import synchformer as sync_mod

            # Kick the (largest) Synchformer frame upload BEFORE SigLIP2 runs: device_put
            # dispatches asynchronously, so the tunnel-bottlenecked transfer streams while
            # the SigLIP2 ViT occupies the chip (VERDICT r2 item 5; tools/profile_v2a.py).
            preloaded = sync_mod.upload_frames_async(
                f25, target_short_side=deps["synchformer"].cfg.img_size)
        if "siglip2" in deps:
            from foley_tpu.models import siglip2 as siglip_mod

            clip_feat = siglip_mod.encode_frames(deps["siglip2"], f8)
        if "synchformer" in deps:
            from foley_tpu.models import synchformer as sync_mod

            enc = deps["synchformer"]
            if sync_dev:
                # unique frames ship once (uint8) and the overlapping segmentation is an
                # on-device gather — ~8x fewer host->device bytes than sync_segments
                sync_feat = sync_mod.encode_frames_device(enc, f25, preloaded_u8=preloaded)
            else:
                segs = sync_segments(f25)
                sync_feat = sync_mod.encode_segments(enc, segs)
        return clip_feat, sync_feat


class HunyuanFoleyContinuation:
    """Continue an existing AUDIO by ``duration`` seconds toward the prompt.

    Beyond-reference node (the reference has no continuation path): the DAC-encoded tail
    of the input audio is clamped as the first window's known prefix — the same
    flow-match inpainting the long-form windows use on each other's tails
    (``pipeline/longform.py::continue_audio``) — so the generated audio attends to and
    continues the real context. Outputs the NEW audio only; splice it after the source
    (the seam is continuous with the context's DAC reconstruction)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "foley_model": ("FOLEY_MODEL",),
                "dependencies": ("FOLEY_DEPS",),
                "audio": ("AUDIO",),
                "duration": ("FLOAT", {"default": 5.0, "min": 1.0, "max": 600.0,
                                       "tooltip": "seconds of NEW audio to generate"}),
                "prompt": ("STRING", {"default": ""}),
                "negative_prompt": ("STRING", {"default": "noisy, harsh"}),
                "context_s": ("FLOAT", {"default": 4.0, "min": 0.1, "max": 29.0,
                                        "tooltip": "seconds of the source's tail to "
                                                   "condition on (must fit the window)"}),
                "cfg_scale": ("FLOAT", {"default": 4.5, "min": 1.0, "max": 10.0}),
                "steps": ("INT", {"default": 50, "min": 10, "max": 100}),
                "sampler": (SOLVERS, {"default": "euler"}),
                "batch_size": ("INT", {"default": 1, "min": 1, "max": 6}),
                "seed": ("INT", {"default": 0, "min": 0, "max": 2**63 - 1}),
                "force_offload": ("BOOLEAN", {"default": True}),
            },
            "optional": {
                "allow_unconditioned": ("BOOLEAN", {"default": False}),
            },
        }

    RETURN_TYPES = ("AUDIO", "AUDIO")
    RETURN_NAMES = ("audio_first", "audio_batch")
    FUNCTION = "continue_audio"
    CATEGORY = "HunyuanVideoFoley-TPU"

    def continue_audio(
        self,
        foley_model: Dict,
        dependencies: Dict,
        audio: Dict,
        duration: float = 5.0,
        prompt: str = "",
        negative_prompt: str = "noisy, harsh",
        context_s: float = 4.0,
        cfg_scale: float = 4.5,
        steps: int = 50,
        sampler: str = "euler",
        batch_size: int = 1,
        seed: int = 0,
        force_offload: bool = True,
        allow_unconditioned: bool = False,
    ):
        from foley_tpu.parallel.offload import host_memory_available
        from foley_tpu.pipeline.longform import continue_audio as continue_fn

        params = _resident_params(foley_model)
        cfg: PipelineConfig = foley_model["cfg"]
        sr = int(audio["sample_rate"])
        if sr != cfg.dac.sample_rate:
            raise ValueError(
                f"continuation input must be {cfg.dac.sample_rate} Hz (got {sr}); "
                "resample first")
        wav = np.asarray(audio["waveform"], np.float32)
        if wav.ndim != 3:
            raise ValueError(f"AUDIO waveform must be [B, C, T], got {wav.shape}")
        mono = wav.mean(axis=1)[:1]  # first batch row, mono mixdown

        text_feat, uncond_text_feat = HunyuanFoleySampler._encode_text(
            dependencies, prompt, negative_prompt, cfg, allow_unconditioned
        )
        bundle = ModelBundle(
            mmdit_params=params,
            dac_params=dependencies["dac_params"],
            pipeline_cfg=cfg,
            encoders=dependencies,
            compute_dtype=foley_model.get("dtype", jnp.bfloat16),
            latent_stats=foley_model.get("latent_stats"),
        )
        result = continue_fn(
            bundle, mono, text_feat, uncond_text_feat, duration,
            context_s=context_s, guidance_scale=cfg_scale,
            num_inference_steps=steps, sampler=sampler, batch_size=batch_size, seed=seed,
        )
        if force_offload and host_memory_available():
            from foley_tpu.parallel.offload import offload_params

            foley_model["params"] = offload_params(params)
            foley_model["_offloaded"] = True
        return (
            {"waveform": result.audio_first, "sample_rate": result.sample_rate},
            {"waveform": result.audio_batch, "sample_rate": result.sample_rate},
        )


class SelectAudioFromBatch:
    """Pick one AUDIO from a batch, clamping OOB (reference ``nodes.py:636-663``)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "audio_batch": ("AUDIO",),
                "index": ("INT", {"default": 0, "min": 0, "max": 5}),
            }
        }

    RETURN_TYPES = ("AUDIO",)
    FUNCTION = "select_audio"
    CATEGORY = "HunyuanVideoFoley-TPU"

    def select_audio(self, audio_batch: Dict, index: int = 0):
        wf = np.asarray(audio_batch["waveform"])
        return ({"waveform": select_audio_from_batch(wf, index),
                 "sample_rate": audio_batch["sample_rate"]},)


NODE_CLASS_MAPPINGS = {
    "HunyuanModelLoader": HunyuanModelLoader,
    "HunyuanDependenciesLoader": HunyuanDependenciesLoader,
    "HunyuanFoleySampler": HunyuanFoleySampler,
    "HunyuanFoleyTorchCompile": HunyuanCompileConfig,
    "HunyuanBlockSwap": HunyuanBlockSwap,
    "HunyuanFoleyContinuation": HunyuanFoleyContinuation,
    "SelectAudioFromBatch": SelectAudioFromBatch,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "HunyuanModelLoader": "Hunyuan Foley Model Loader (TPU)",
    "HunyuanDependenciesLoader": "Hunyuan Foley Dependencies Loader (TPU)",
    "HunyuanFoleySampler": "Hunyuan Foley Sampler (TPU)",
    "HunyuanFoleyTorchCompile": "Hunyuan Foley Compile Warmup (TPU)",
    "HunyuanBlockSwap": "Hunyuan Foley Block Swap / Host Offload (TPU)",
    "HunyuanFoleyContinuation": "Hunyuan Foley Audio Continuation (TPU)",
    "SelectAudioFromBatch": "Select Audio From Batch",
}
