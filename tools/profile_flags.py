#!/usr/bin/env python
"""XLA flag sweep for the XXL denoise step on the real TPU.

The post-hoist op profile (ROADMAP "Round-2 measurements") shows the conv fusions running at
~60% MXU util / 0.47 HBM read util — i.e. ~6.5 ms/step of imperfect weight-stream/compute
overlap is the largest remaining single-chip gap. XLA exposes scheduler/fusion knobs via
XLA_FLAGS; this tool times the same step (XXL 5 s, bf16, CFG, euler, 10 steps) under each
candidate flag set in a fresh subprocess (flags are process-global) and reports ms/step.

Unknown flags on a given runtime fail the subprocess; those rows record "unsupported".

Usage: python tools/profile_flags.py            # sweep all candidates
       python tools/profile_flags.py <name>     # one candidate (subprocess entry)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANDIDATES = {
    "baseline": "",
    # deeper scoped-VMEM budget lets fusions keep larger weight tiles resident (v5e has
    # 128 MiB VMEM; default scoped budget is much smaller)
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    # strength-reduced dots sometimes lower MXU utilization at skinny shapes
    "no_dot_strength_red": "--xla_tpu_enable_dot_strength_reduction=false",
    # latency-hiding scheduler re-runs can find better overlap orderings
    "lhs_rerun2": "--xla_latency_hiding_scheduler_rerun=2",
}


def run_candidate() -> int:
    import jax
    import jax.numpy as jnp

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.pipeline.features import prepare_cfg_features, t2a_features
    from foley_tpu.sampling.denoise import denoise_latents, prepare_latents

    cfg = get_config("xxl")
    fm = HunyuanModelLoader.init_random("xxl", "bf16", seed=0)
    params = fm["params"]
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)
    clip_feat, sync_feat = t2a_features(params, cfg, 5.0, batch_size=1)
    features = prepare_cfg_features(params, text, text, clip_feat, sync_feat,
                                    batch_size=1, use_cfg=True, text_bucket=77)
    lat_len = cfg.latent_length(5.0)
    steps = 10

    def run(seed):
        lat = prepare_latents(jax.random.PRNGKey(seed), 1, lat_len,
                              cfg.model.audio_vae_latent_dim)
        return np.asarray(denoise_latents(
            params, lat, features, jnp.float32(4.5), cfg=cfg.model,
            diffusion=cfg.diffusion, num_steps=steps, solver="euler", use_cfg=True,
            attn_impl="xla", compute_dtype=jnp.bfloat16,
        ))

    t0 = time.perf_counter()
    ref = run(0)
    compile_s = time.perf_counter() - t0
    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(0)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    print(json.dumps({
        "step_ms": round(1e3 * walls[1] / steps, 2),
        "compile_s": round(compile_s, 1),
        "exact_vs_first_run": bool(np.array_equal(ref, out)),
    }), flush=True)
    return 0


def main():
    if len(sys.argv) > 1:
        return run_candidate()
    results = []
    for name, flags in CANDIDATES.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # each candidate compiles fresh: flag sets must not share the persistent cache
        env["FOLEY_TPU_CACHE_DIR"] = f"/tmp/foley_flags_cache_{name}"
        proc = subprocess.run([sys.executable, os.path.abspath(__file__), name],
                              env=env, capture_output=True, text=True)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            row = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            row = {"error": "unsupported or crashed",
                   "stderr_tail": proc.stderr.strip().splitlines()[-1][:200] if proc.stderr.strip() else ""}
        row["candidate"] = name
        row["flags"] = flags
        results.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
