#!/usr/bin/env python
"""Repro + regression probe for the axon int4-dtype dispatch crash.

Round-3 finding: ANY ``jnp.int4`` array passed as a jit argument crashes this runtime's
dispatch layer — ``_array_shard_arg``'s ``device_put`` for the S4 tiled relayout
(``{0,1:T(8,128)(8,1)}``) recurses infinitely: ``RecursionError: Recursively calling jit``.
The eager ``astype(jnp.int4)`` itself succeeds; only the jit-argument path is broken. The
shipped int4 mode therefore stores nibble-packed uint8 (``io/quantize.py::quantize_int4``).

Stages (each printed before it runs so the log shows how far we got):
  1. the SHIPPED packed-uint8 dequant matmul, jitted            -> must pass
  2. the same under lax.scan over a stacked packed leaf         -> must pass
  3. jnp.int4 array as a jit argument (the broken runtime path) -> expected to CRASH;
     run with --int4-dtype to include it. If stage 3 ever passes on a runtime drop, the
     manual packing could be retired for native S4 storage.

Run on the real TPU: ``python tools/repro_int4.py [size_mb] [--int4-dtype]``.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from foley_tpu.ops.nn import dense  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    size_mb = int(args[0]) if args else 256
    n = size_mb * 1024 * 1024
    cin, cout = 1536, n // 1536
    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    qb = rng.integers(1, 16, size=(cin, cout), dtype=np.uint8)
    packed = jnp.asarray((qb[1::2] << 4) | qb[0::2])
    scale = jnp.asarray(rng.random((12, 1, cout), dtype=np.float32) + 0.5)
    x = jnp.asarray(rng.standard_normal((2, 64, cin), dtype=np.float32)).astype(jnp.bfloat16)

    print(f"[1] shipped packed-uint8 dequant matmul (int8 payload {size_mb//2} MB)...",
          flush=True)
    t0 = time.perf_counter()
    out = jax.jit(dense)(x, {"int4": packed, "scale": scale})
    out.block_until_ready()
    print(f"    ok in {time.perf_counter()-t0:.2f}s, out={out.shape} {out.dtype}", flush=True)

    print("[2] packed dequant matmul under lax.scan over a depth-4 stack...", flush=True)
    stack = {"int4": jnp.stack([packed] * 4), "scale": jnp.stack([scale] * 4)}

    @jax.jit
    def scanned(x, stack):
        def body(h, w):
            return dense(h, w)[..., :h.shape[-1]], None
        h, _ = lax.scan(body, x, stack)
        return h

    t0 = time.perf_counter()
    out = scanned(x, stack)
    out.block_until_ready()
    print(f"    ok in {time.perf_counter()-t0:.2f}s", flush=True)

    if "--int4-dtype" not in sys.argv:
        print("PACKED STAGES PASSED (skip native-int4 crash stage; --int4-dtype to run)",
              flush=True)
        return

    print("[3] jnp.int4 as a jit argument (crashes on the round-3 axon runtime)...",
          flush=True)
    q4 = jnp.asarray(qb.astype(np.int8) - 8).astype(jnp.int4)
    q4.block_until_ready()  # eager conversion itself works

    def deq(x, q4, scale):
        grouped = (scale.shape[-3], q4.shape[-2] // scale.shape[-3], q4.shape[-1])
        w = (q4.astype(x.dtype).reshape(grouped) * scale.astype(x.dtype)).reshape(q4.shape)
        return jnp.einsum("...i,io->...o", x, w, preferred_element_type=x.dtype)

    out = jax.jit(deq)(x, q4, scale)
    out.block_until_ready()
    print("    ok — native int4 jit arguments WORK on this runtime drop; the manual "
          "nibble packing in quantize_int4 could be retired", flush=True)


if __name__ == "__main__":
    main()
