#!/usr/bin/env python
"""Round-3 perf measurements on the real TPU (run alone — TPU processes contend).

Attention-layout A/B at the 5 s flagship shapes (VERDICT round-2 item 2a): what do the
``bhld`` transpose+pad round trips cost the Pallas fused path per call, and does the
head-first kernel beat composed-XLA attention once they're gone?

Timing: scan-chain of N iterations with a carry data dependency + host materialization
(per CLAUDE.md the tunnel under-reports without it); per-op time is the slope between a
short and a long chain, cancelling dispatch/fetch overhead.

Prints JSON lines {"measure": ..., "value_ms": ...}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time_ms(fn, x0, iters_lo=25, iters_hi=250, reps=7):
    """Per-call ms of ``fn`` via scan-chain slope between two chain lengths."""
    import jax

    def chained(n):
        f = jax.jit(lambda x: jax.lax.scan(lambda c, _: (fn(c), None), x, None, length=n)[0])
        np.asarray(f(x0))  # compile + warm

        def run():
            t0 = time.perf_counter()
            np.asarray(f(x0))
            return time.perf_counter() - t0

        walls = sorted(run() for _ in range(reps))
        return walls[reps // 2]

    lo, hi = chained(iters_lo), chained(iters_hi)
    return 1e3 * (hi - lo) / (iters_hi - iters_lo)


def main():
    import jax
    import jax.numpy as jnp

    from foley_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.configs import get_config
    from foley_tpu.ops.attention import sdpa
    from foley_tpu.ops.norms import rms_norm
    from foley_tpu.ops.rope import apply_rotary_emb, rope_table
    from foley_tpu.ops.pallas.fused_attention import (
        BLOCK_Q,
        fused_qk_attention,
        fused_qk_attention_headfirst,
    )
    from foley_tpu.pipeline.features import prepare_cfg_features, t2a_features
    from foley_tpu.sampling.denoise import denoise_latents, prepare_latents

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    cfg = get_config("xxl")
    fm = HunyuanModelLoader.init_random("xxl", "bf16", seed=0)
    params = fm["params"]
    text = jnp.zeros((1, 77, cfg.model.condition_dim), jnp.float32)
    clip_feat, sync_feat = t2a_features(params, cfg, 5.0, batch_size=1)
    features = prepare_cfg_features(params, text, text, clip_feat, sync_feat,
                                    batch_size=1, use_cfg=True, text_bucket=77)
    lat_len = cfg.latent_length(5.0)
    visual_len = int(clip_feat.shape[1])
    emit(measure="shapes", audio_len=lat_len, visual_len=visual_len)

    # ---- full denoise step, xla vs pallas_fused (re-baseline at HEAD) ----------------
    def step_ms(attn_impl, steps=12):
        def run(seed, n):
            lat = prepare_latents(jax.random.PRNGKey(seed), 1, lat_len,
                                  cfg.model.audio_vae_latent_dim)
            return np.asarray(denoise_latents(
                params, lat, features, jnp.float32(4.5), cfg=cfg.model,
                diffusion=cfg.diffusion, num_steps=n, solver="euler", use_cfg=True,
                attn_impl=attn_impl, compute_dtype=jnp.bfloat16,
            ))

        run(0, steps); run(0, 50)  # compile both lengths + warm
        def med(n, reps=5):
            walls = []
            for i in range(reps):
                t0 = time.perf_counter()
                run(i + 1, n)
                walls.append(time.perf_counter() - t0)
            return sorted(walls)[reps // 2]

        lo, hi = med(steps), med(50)
        return 1e3 * (hi - lo) / (50 - steps)

    if "--micro_only" not in sys.argv:
        for impl in ("xla", "pallas_fused"):
            emit(measure=f"denoise_step_ms_{impl}_5s", value_ms=round(step_ms(impl), 2))

    # ---- joint-attention microbench (B=2 CFG, Lq=Lk=visual+audio) --------------------
    b, h, d = 2, cfg.model.num_heads, cfg.model.head_dim
    eps = cfg.model.qk_norm_eps
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32), jnp.bfloat16)

    for name, lq, lk in (
        ("joint", visual_len + lat_len, visual_len + lat_len),
        ("single", lat_len, lat_len),
        ("cross", visual_len + lat_len, 77),
    ):
        k, v = mk(b, lk, h, d), mk(b, lk, h, d)
        w_q, w_k = jnp.ones((lq, d), jnp.float32), jnp.ones((lk, d), jnp.float32)
        cos_q, sin_q = rope_table(lq, d, cfg.model.rope_theta)
        cos_k, sin_k = rope_table(lk, d, cfg.model.rope_theta)

        def composed(q, k=k, v=v):
            qn = rms_norm(q, w_q[0], eps=eps)
            kn = rms_norm(k, w_k[0], eps=eps)
            qn = apply_rotary_emb(qn, cos_q, sin_q)
            kn = apply_rotary_emb(kn, cos_k, sin_k)
            return sdpa(qn, kn, v, impl="xla")

        def fused(q, k=k, v=v):
            return fused_qk_attention(q, k, v, w_q, w_k, cos_q, sin_q, cos_k, sin_k, eps=eps)

        x0 = mk(b, lq, h, d)
        emit(measure=f"attn_{name}_composed_xla_ms", value_ms=round(chain_time_ms(composed, x0), 3))
        emit(measure=f"attn_{name}_fused_wrapper_ms", value_ms=round(chain_time_ms(fused, x0), 3))

        # head-first kernel only (layout prep done once, outside the chain)
        rup = lambda n, m: ((n + m - 1) // m) * m
        lqp, lkp = rup(lq, BLOCK_Q), rup(lk, 128)

        def bhld(x, l, lp):
            x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, l, d)
            return jnp.pad(x, ((0, 0), (0, lp - l), (0, 0))) if lp != l else x

        kb, vb = bhld(k, lk, lkp), bhld(v, lk, lkp)
        pad_t = lambda t, l, lp: jnp.pad(t, ((0, lp - l), (0, 0))) if lp != l else t
        wqp, cqp, sqp = (pad_t(t, lq, lqp) for t in (w_q, cos_q, sin_q))
        wkp, ckp, skp = (pad_t(t, lk, lkp) for t in (w_k, cos_k, sin_k))

        def headfirst(qb, kb=kb, vb=vb):
            return fused_qk_attention_headfirst(
                qb, kb, vb, wqp, wkp, cqp, sqp, ckp, skp, lk_valid=lk, eps=eps)

        qb0 = bhld(x0, lq, lqp)
        emit(measure=f"attn_{name}_fused_headfirst_ms", value_ms=round(chain_time_ms(headfirst, qb0), 3))

        # the transposes alone: bhld in + inverse out (chained via the [B,L,H,D] carry)
        def transposes(x):
            y = bhld(x, lq, lqp)
            return jnp.transpose(y[:, :lq].reshape(b, h, lq, d), (0, 2, 1, 3))

        emit(measure=f"attn_{name}_bhld_roundtrip_ms", value_ms=round(chain_time_ms(transposes, x0), 3))

    return 0


if __name__ == "__main__":
    sys.exit(main())
