"""HLO-level sharding efficiency for the multi-chip denoise step.

The numerics tests (test_parallel) prove sharded == unsharded at TINY size, but a
pathological GSPMD solution — e.g. all-gathering full weight stacks every step — would
pass them while destroying multi-chip perf. This compiles (never runs) the sharded
denoise step at the XXL *per-block geometry* (hidden 1536 / 12 heads / full sequence
lengths; depth reduced to 2+2 since the per-block partitioning is depth-invariant under
``lax.scan``) on the virtual 8-device ('data'=4, 'model'=2) mesh, then asserts over the
optimized HLO:

1. TP is actually active: all-reduce/reduce-scatter collectives exist;
2. NO collective materializes a full weight stack (the classic GSPMD pathology);
3. every collective result is activation-sized (bounded), and the per-step collective
   traffic is recorded (ROADMAP "sharding HLO audit").

The reference has no analog subsystem (single-GPU torch); this guards the north-star
v5p-8 latency path (BASELINE.json).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foley_tpu.configs import XXL, MMDiTConfig, DiffusionConfig
from foley_tpu.core.params import flatten_params, unflatten_params
from foley_tpu.models import mmdit
from foley_tpu.parallel.mesh import make_mesh
from foley_tpu.parallel.sharding import partition_spec_for
from foley_tpu.sampling.denoise import DenoiseFeatures, denoise_latents

# XXL geometry, depth-reduced: per-block HLO identical to the full model's scan body.
CFG = MMDiTConfig(
    depth_triple_blocks=2, depth_single_blocks=2,
    hidden_size=XXL.model.hidden_size, num_heads=XXL.model.num_heads,
    mlp_ratio=XXL.model.mlp_ratio,
)
DIFF = DiffusionConfig()
BATCH = 4          # CFG-doubled to 8 rows = data axis 4 x 2
LATENT_LEN = 250   # 5 s

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1, "s64": 8, "u64": 8}


def _abstract_sharded_params(mesh):
    shapes = jax.eval_shape(
        lambda k: mmdit.init(k, CFG, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    flat = flatten_params(shapes)
    out = {}
    for path, leaf in flat.items():
        sh = jax.sharding.NamedSharding(mesh, partition_spec_for(path, leaf))
        out[path] = jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sh)
    return unflatten_params(out), {p: l.shape for p, l in flat.items() if l.ndim >= 3}


def _collective_results(hlo_text):
    """Yield (op_name, dtype, shape_tuple) for every collective result in optimized HLO."""
    pat = re.compile(
        r"=\s*\(?([a-z0-9]+)\[([0-9,]*)\][^=]*?"
        r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)\("
    )
    for m in pat.finditer(hlo_text):
        dtype, dims, op = m.group(1), m.group(2), m.group(3)
        shape = tuple(int(d) for d in dims.split(",") if d) if dims else ()
        yield op, dtype, shape


@pytest.fixture(scope="module")
def compiled_hlo():
    mesh = make_mesh(data=4, model=2)
    params, stacked_weight_shapes = _abstract_sharded_params(mesh)

    data_sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def arg(shape, sharding, dtype=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    latents = arg((BATCH, LATENT_LEN, CFG.audio_vae_latent_dim), data_sh)
    feats = DenoiseFeatures(
        cond=arg((2 * BATCH, CFG.text_length, CFG.condition_dim), data_sh),
        clip_feat=arg((2 * BATCH, CFG.clip_length, CFG.clip_dim), data_sh),
        sync_feat=arg((2 * BATCH, CFG.sync_length, CFG.sync_feat_dim), data_sh),
    )
    gs = arg((), repl)

    lowered = jax.jit(
        denoise_latents,
        static_argnames=("cfg", "diffusion", "num_steps", "solver", "use_cfg",
                         "attn_impl", "compute_dtype"),
    ).lower(
        params, latents, feats, gs,
        cfg=CFG, diffusion=DIFF, num_steps=2, solver="euler", use_cfg=True,
        attn_impl="xla", compute_dtype=jnp.bfloat16,
    )
    compiled = lowered.compile()
    return compiled.as_text(), stacked_weight_shapes


def test_tp_collectives_present(compiled_hlo):
    hlo, _ = compiled_hlo
    ops = [op for op, _, _ in _collective_results(hlo)]
    assert any(op in ("all-reduce", "reduce-scatter") for op in ops), (
        f"no TP reduction collectives found (ops: {sorted(set(ops))})"
    )


def test_no_weight_stack_allgather(compiled_hlo):
    """The GSPMD pathology this file exists for: a collective whose RESULT is a full
    (unsharded) stacked weight tensor means the partitioner decided to all-gather weights
    instead of reducing activations."""
    hlo, stacked_shapes = compiled_hlo
    weight_shapes = set(stacked_shapes.values())
    bad = [
        (op, dtype, shape)
        for op, dtype, shape in _collective_results(hlo)
        if shape in weight_shapes
    ]
    assert not bad, f"collectives materialize full weight stacks: {bad[:5]}"


def test_collective_results_are_activation_sized(compiled_hlo):
    """Byte cap: every collective result must be activation-sized. The largest legitimate
    result is the joint-attention activation [2B, L_text+L_clip+L_audio, hidden] bf16
    (~9.6 MB here); the smallest depth-2 weight stack is ~27 MB. Cap in between."""
    hlo, _ = compiled_hlo
    cap = 16 * 1024 * 1024
    total = 0
    oversized = []
    for op, dtype, shape in _collective_results(hlo):
        nbytes = int(np.prod(shape or (1,))) * _DTYPE_BYTES.get(dtype, 4)
        total += nbytes
        if nbytes > cap:
            oversized.append((op, dtype, shape, nbytes))
    assert not oversized, f"oversized collective results: {oversized[:5]}"
    # record for the ROADMAP audit table (pytest -s shows it)
    print(f"\ncollective traffic (2-step program, depth-2 stacks): {total / 1e6:.1f} MB")
