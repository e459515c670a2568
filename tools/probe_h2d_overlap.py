#!/usr/bin/env python
"""Does host->device transfer overlap with device compute on this runtime?

The V2A overlap schedule (nodes._encode_video: ``upload_frames_async`` before the SigLIP2
ViT) only helps if the tunnel streams H2D bytes WHILE the chip computes. This probe answers
that directly, without the 6-minute V2A pipeline:

  A = wall(upload ~N MB uint8, blocked)
  B = wall(jitted matmul chain on device-resident data, result materialized)
  C = wall(dispatch upload async, then dispatch compute, block both)

overlap_ratio = (A + B - C) / min(A, B): 1.0 = perfect overlap, 0.0 = fully serialized.
Prints one JSON line. Run alone (TPU processes contend).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mb = int(sys.argv[sys.argv.index("--mb") + 1]) if "--mb" in sys.argv else 64
    import jax
    import jax.numpy as jnp

    host = np.random.default_rng(0).integers(0, 255, size=(mb, 1 << 20), dtype=np.uint8)
    x0 = jnp.asarray(np.random.default_rng(1).normal(size=(2048, 2048)).astype(np.float32),
                     jnp.bfloat16)

    @jax.jit
    def compute(x):
        def body(c, _):
            return jnp.tanh(c @ c) * 1.001, None
        return jax.lax.scan(body, x, None, length=24)[0]

    np.asarray(compute(x0))  # compile + warm
    jax.device_put(host[:1]).block_until_ready()  # warm the transfer path

    def med(f, reps=5):
        walls = sorted(f() for _ in range(reps))
        return walls[reps // 2]

    def t_upload():
        t0 = time.perf_counter()
        jax.device_put(host).block_until_ready()
        return time.perf_counter() - t0

    def t_compute():
        t0 = time.perf_counter()
        np.asarray(compute(x0))
        return time.perf_counter() - t0

    def t_both():
        t0 = time.perf_counter()
        up = jax.device_put(host)          # async dispatch
        y = compute(x0)                    # chip compute while bytes stream
        up.block_until_ready()
        np.asarray(y)
        return time.perf_counter() - t0

    a, b, c = med(t_upload), med(t_compute), med(t_both)
    ratio = (a + b - c) / max(min(a, b), 1e-9)
    print(json.dumps({
        "tool": "probe_h2d_overlap", "mb": mb,
        "upload_s": round(a, 3), "compute_s": round(b, 3), "both_s": round(c, 3),
        "overlap_ratio": round(ratio, 3),
        "h2d_MBps": round(mb / a, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
