"""A/B: can a hand-pipelined Pallas GEMM sweep beat XLA's scan-of-GEMMs at the XXL
single-block weight-streaming pattern?

Context (ROADMAP "MFU bookkeeping"): the XXL 5 s denoise step is weight-stream-bound —
xprof shows the big conv fusions at MXU util ~0.64 / HBM-read ~0.44, and the derived
imperfect-overlap gap is ~6.5 ms of a ~30 ms step. XLA-level levers are closed (compiler
flags fatal on this runtime, scan unroll measured worse). The one untested lever is a
Pallas kernel that keeps the activation resident in VMEM and streams the per-block weight
tiles through the automatic grid pipeline, mimicking the model's chained
x -> x @ W_b -> x dependency (single-block stack, reference ``hifi_foley.py:335-390``).

Two variants at the qkv GEMM shape ([B*T=784, 1536] x [1536, 4608], 36 blocks):

- ``xla``:    ``lax.scan`` over the stacked weights, y = x @ W_b, x' = f(y) — exactly how
              ``models/mmdit.py::_run_stack`` consumes the stacks today.
- ``pallas``: one ``pallas_call``, grid (36 blocks x 6 N-tiles), weights streamed
              [1536, 768] at a time by the automatic double-buffered pipeline while the
              activation, the next-x accumulator, and the final output stay VMEM-resident
              (constant index_map -> never re-fetched).

Both chain identically (x' = 0.01 * y[:, :H]) so the timing has a true data dependency;
sweeps are chained across repeats and the result is host-materialized (np.asarray) —
`block_until_ready` alone under-reports through the axon tunnel.

Run ALONE on the TPU (processes contend):  python tools/probe_gemm_pallas.py
"""

import json
import sys
import time

import numpy as np

M, K, N = 784, 1536, 4608  # 784 = CFG-batch-2 x 392-token single stream, 16-row aligned
BLOCKS = 36
TILE_N = 512  # 9 N-tiles; W tile [1536, 512] bf16 = 1.57 MB, double-buffered by pallas
              # (768 tiles OOM'd scoped vmem at 17.88M vs the 16M limit)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    # w_std = 1/sqrt(K) keeps y (and therefore the chained x) at unit scale through all
    # 36 blocks — a decaying chain would underflow bf16 to zeros mid-sweep
    W = jnp.asarray(rng.normal(size=(BLOCKS, K, N)) / np.sqrt(K), jnp.bfloat16)

    def chain(y):  # x' from y: thin slice; tanh bounds the chained magnitude forever
        return jnp.tanh(y[:, :K]).astype(jnp.bfloat16)

    @jax.jit
    def xla_sweep(x, W):
        def body(x, w):
            y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
            return chain(y), None
        x, _ = lax.scan(body, x, W)
        return x

    n_tiles = N // TILE_N
    head_tiles = K // TILE_N  # the first K columns of y feed the next block

    def kernel(xin_ref, w_ref, o_ref, x_ref, head_ref):
        b, j = pl.program_id(0), pl.program_id(1)

        @pl.when((b == 0) & (j == 0))
        def _():
            x_ref[:] = xin_ref[:]

        # Mosaic requires a 32-bit matmul accumulator; the bf16 downcast happens at the
        # tanh store, matching the XLA variant's bf16 preferred_element_type output
        y = jnp.dot(x_ref[:], w_ref[0], preferred_element_type=jnp.float32)

        @pl.when(j < head_tiles)
        def _():
            head_ref[:, pl.ds(j * TILE_N, TILE_N)] = jnp.tanh(y).astype(jnp.bfloat16)

        @pl.when(j == n_tiles - 1)
        def _():
            x_ref[:] = head_ref[:]

        @pl.when((b == BLOCKS - 1) & (j == n_tiles - 1))
        def _():
            o_ref[:] = head_ref[:]

    pallas_sweep = jax.jit(lambda x, W: pl.pallas_call(
        kernel,
        grid=(BLOCKS, n_tiles),
        in_specs=[
            pl.BlockSpec((M, K), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, TILE_N), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, K), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((M, K), jnp.bfloat16),   # resident activation
            pltpu.VMEM((M, K), jnp.bfloat16),   # next-x accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,  # v5e has headroom past Mosaic's 16M default
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BLOCKS * M * K * N,
            bytes_accessed=BLOCKS * K * N * 2 + 2 * M * K * 2,
            transcendentals=0,
        ),
    )(x, W))

    # numerics cross-check (same math, bf16-identical chain)
    ref = np.asarray(xla_sweep(x0, W), np.float32)
    got = np.asarray(pallas_sweep(x0, W), np.float32)
    err = float(np.abs(ref - got).max())
    denom = float(np.abs(ref).max())
    print(f"max |xla - pallas| = {err:.3e} (scale {denom:.3e})", file=sys.stderr)
    assert err <= 0.02 * max(denom, 1e-6), "variants diverge — probe invalid"

    flops = 2 * BLOCKS * M * K * N
    w_bytes = BLOCKS * K * N * 2
    INNER = 20  # sweeps per dispatch: amortizes the multi-ms axon tunnel dispatch latency

    def many(sweep):
        @jax.jit
        def f(x, W):
            def rep(x, _):
                return sweep(x, W), None
            return lax.scan(rep, x, None, length=INNER)[0]
        return f

    results = {}
    for name, fn in [("xla", many(xla_sweep)), ("pallas", many(pallas_sweep))]:
        x = x0
        fn(x, W).block_until_ready()  # compile
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            x = fn(x, W)  # chained: each dispatch depends on the previous
        np.asarray(x)  # host materialization ends the timing chain
        dt = (time.perf_counter() - t0) / (reps * INNER)
        results[name] = {
            "ms_per_sweep": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
            "weight_gbps": round(w_bytes / dt / 1e9, 1),
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    out = {
        "measure": f"gemm_sweep_{BLOCKS}x[{M}x{K}]x[{K}x{N}]_bf16",
        "compute_floor_ms": round(flops / 197e12 * 1e3, 2),
        "weight_stream_floor_ms": round(w_bytes / 819e9 * 1e3, 2),
        **results,
        "pallas_speedup": round(
            results["xla"]["ms_per_sweep"] / results["pallas"]["ms_per_sweep"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
