"""Time int4 dequant-matmul variants on the TPU (r4 verdict #5).

Context: int4 weight-only storage (io/quantize.py::quantize_int4, nibble-packed uint8)
measured 114 ms/step vs bf16's 34 at XXL 5 s — the in-matmul unpack chain
(shift/mask/stack-interleave/reshape) is ~3.3x, which makes quarter-size weights a
storage mode only. This probe times the candidate fixes on a representative workload —
the single-block scan's qkv GEMM (36 blocks, x [2, 250, 1536] @ w [1536, 4608], the
shape class that dominates XXL step time) — so the winner can be wired into
ops/nn.py::_match/dense with a measured justification.

Variants:
  bf16            dense bf16 weights (the headline mode; reference point)
  int8_wo         int8 weight-only, per-channel scale (dequant fused into operand read)
  int8_dyn        int8 x int8 MXU path (per-token activation quant)
  int4_cur        current packing: adjacent rows (2i, 2i+1) interleaved per byte
  int4_split      split-half packing: byte holds rows (i, i + cin/2) -> dequant is a
                  CONCAT (two fused half-matmuls), no interleave relayout
  int4_to_i8      unpack to an int8 weight ONCE per scan iteration (materialized temp),
                  then the int8 x int8 MXU path with group-batched einsum (keeps the
                  group-wise scales exact)
  int4_i8_pc      per-channel int4 (one group) unpacked to int8 per iteration, standard
                  int8_dyn epilogue (fidelity of plain per-channel int4)

Usage: python tools/profile_int4_matmul.py [--steps 50] [--iters 5]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=36)
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=1536)
    ap.add_argument("--out_mult", type=int, default=3)
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--steps", type=int, default=50, help="scan repetitions per timing run")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    L, B, T, H = args.blocks, args.batch, args.tokens, args.hidden
    O = args.out_mult * H
    G = H // args.group
    g = args.group
    rng = np.random.default_rng(0)
    w = rng.normal(size=(L, H, O)).astype(np.float32) * 0.02
    x0 = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32), jnp.bfloat16)

    # ---- quantized forms (host-side, mirroring io/quantize.py) ----
    s8 = np.maximum(np.abs(w).max(axis=1, keepdims=True) / 127.0, 1e-12)
    q8 = np.clip(np.round(w / s8), -127, 127).astype(np.int8)

    wg = w.reshape(L, G, g, O)
    s4 = np.maximum(np.abs(wg).max(axis=2, keepdims=True) / 7.0, 1e-12)  # [L, G, 1, O]
    q4 = (np.clip(np.round(wg / s4), -7, 7).reshape(L, H, O) + 8).astype(np.uint8)
    packed_cur = (q4[:, 1::2] << 4) | q4[:, 0::2]            # rows (2i, 2i+1) per byte
    packed_split = (q4[:, H // 2:] << 4) | q4[:, : H // 2]   # rows (i, i + H/2) per byte
    s4pc = np.maximum(np.abs(w).max(axis=1, keepdims=True) / 7.0, 1e-12)
    q4pc = (np.clip(np.round(w / s4pc), -7, 7) + 8).astype(np.uint8)
    packed_pc = (q4pc[:, H // 2:] << 4) | q4pc[:, : H // 2]

    def quant_act(x):
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
        return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s

    # ---- per-variant single-block body: (x, weight leaves) -> [B, T, O] ----
    def body_bf16(x, ws):
        return jnp.einsum("bti,io->bto", x, ws[0], preferred_element_type=x.dtype)

    def body_int8_wo(x, ws):
        q, s = ws
        return jnp.einsum("bti,io->bto", x, q.astype(x.dtype) * s.astype(x.dtype),
                          preferred_element_type=x.dtype)

    def body_int8_dyn(x, ws):
        q, s = ws
        xq, sx = quant_act(x)
        acc = jnp.einsum("bti,io->bto", xq, q, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * s.astype(jnp.float32)).astype(x.dtype)

    def body_int4_cur(x, ws):
        p, scale = ws  # p [H/2, O], scale [G, 1, O]
        lo = (p & 0xF).astype(jnp.int8) - 8
        hi = (p >> 4).astype(jnp.int8) - 8
        q = jnp.stack([lo, hi], axis=-2)  # [H/2, 2, O]
        deq = q.astype(x.dtype).reshape(G, g, -1) * scale.astype(x.dtype)
        return jnp.einsum("bti,io->bto", x, deq.reshape(H, -1),
                          preferred_element_type=x.dtype)

    def body_int4_split(x, ws):
        p, scale = ws
        lo = ((p & 0xF).astype(jnp.int8) - 8)   # rows [0, H/2)
        hi = ((p >> 4).astype(jnp.int8) - 8)    # rows [H/2, H)
        q = jnp.concatenate([lo, hi], axis=-2)  # [H, O] — no interleave relayout
        deq = q.astype(x.dtype).reshape(G, g, -1) * scale.astype(x.dtype)
        return jnp.einsum("bti,io->bto", x, deq.reshape(H, -1),
                          preferred_element_type=x.dtype)

    def body_int4_to_i8(x, ws):
        p, scale = ws
        lo = (p & 0xF).astype(jnp.int8) - 8
        hi = (p >> 4).astype(jnp.int8) - 8
        q = jnp.concatenate([lo, hi], axis=-2)          # int8 weight temp, per iteration
        xq, sx = quant_act(x)
        acc = jnp.einsum("btgi,gio->btgo", xq.reshape(B, T, G, g), q.reshape(G, g, -1),
                         preferred_element_type=jnp.int32)
        out = (acc.astype(jnp.float32) * scale[:, 0][None, None].astype(jnp.float32)
               ).sum(axis=2) * sx
        return out.astype(x.dtype)

    def body_int4_i8_pc(x, ws):
        p, scale = ws  # per-channel scale [1, O]
        lo = (p & 0xF).astype(jnp.int8) - 8
        hi = (p >> 4).astype(jnp.int8) - 8
        q = jnp.concatenate([lo, hi], axis=-2)
        xq, sx = quant_act(x)
        acc = jnp.einsum("bti,io->bto", xq, q, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * scale.astype(jnp.float32)).astype(x.dtype)

    variants = {
        "bf16": ((jnp.asarray(w, jnp.bfloat16),), body_bf16),
        "int8_wo": ((jnp.asarray(q8), jnp.asarray(s8)), body_int8_wo),
        "int8_dyn": ((jnp.asarray(q8), jnp.asarray(s8)), body_int8_dyn),
        "int4_cur": ((jnp.asarray(packed_cur), jnp.asarray(s4.astype(np.float32))),
                     body_int4_cur),
        "int4_split": ((jnp.asarray(packed_split), jnp.asarray(s4.astype(np.float32))),
                       body_int4_split),
        "int4_to_i8": ((jnp.asarray(packed_split), jnp.asarray(s4.astype(np.float32))),
                       body_int4_to_i8),
        "int4_i8_pc": ((jnp.asarray(packed_pc), jnp.asarray(s4pc.astype(np.float32))),
                       body_int4_i8_pc),
    }

    import functools

    @functools.partial(jax.jit, static_argnames=("name",))
    def run(x, ws, *, name):
        body = variants[name][1]

        def scan_body(carry, w_slice):
            out = body(carry, w_slice)
            # fold the output back to [B, T, H] so the scan carries a data dependency
            # (prevents dead-code elimination and mirrors a residual stream)
            return carry + out[..., :H].astype(carry.dtype), ()

        def step(carry, _):
            c, () = jax.lax.scan(scan_body, carry, ws)
            return c * (1.0 / (1.0 + jnp.float32(args.blocks)).astype(carry.dtype)), ()

        out, () = jax.lax.scan(step, x, None, length=args.steps)
        return out

    # numerics sanity: every int4 variant must match its fp32 dequant reference closely
    xref = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32), jnp.bfloat16)
    ref = np.asarray(body_bf16(xref, (jnp.asarray(w, jnp.bfloat16)[0],)), np.float32)
    for name in ("int4_cur", "int4_split", "int4_to_i8"):
        ws, body = variants[name]
        got = np.asarray(body(xref, tuple(l[0] for l in ws)), np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"sanity {name}: rel_err {err:.4f}")

    results = {}
    for name, (ws, _) in variants.items():
        np.asarray(run(x0, ws, name=name))  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            host = np.asarray(run(x0, ws, name=name))  # host materialization = true sync
            times.append(time.perf_counter() - t0)
        per_step_ms = min(times) / args.steps * 1e3
        results[name] = per_step_ms
        print(f"{name:12s} {per_step_ms:8.3f} ms/step  (min of {args.iters})")

    base = results["bf16"]
    print("\nrelative to bf16:")
    for name, ms in results.items():
        print(f"  {name:12s} {ms / base:5.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
