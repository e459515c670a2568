"""Parameter / activation sharding rules for the MMDiT.

Megatron-style tensor parallelism expressed as GSPMD annotations: column-parallel for
qkv/up-projections (shard the out-features axis on 'model'), row-parallel for output
projections/down-projections (shard the in-features axis); XLA inserts the all-reduces over
ICI. Stacked block params carry a leading depth axis (scanned), always unsharded.

Layouts (see foley_tpu/ops/nn.py): dense [in, out] (stacked: [depth, in, out]);
conv [K, in, out] (stacked: [depth, K, in, out]).
"""

from __future__ import annotations

import re
from typing import Dict, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from foley_tpu.core.params import flatten_params, unflatten_params
from foley_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path-regex, kind) in priority order; kind in {col, row, replicate}.
# col = shard out-features (last axis) on 'model'; row = shard in-features on 'model'.
MMDIT_PARAM_RULES: Tuple[Tuple[str, str], ...] = (
    # triple blocks
    (r"audio_self_attn_qkv|v_cond_attn_qkv|text_cross_kv|audio_cross_q\.|v_cond_cross_q\.", "col"),
    (r"audio_self_proj|v_cond_self_proj|audio_cross_proj|v_cond_cross_proj", "row"),
    (r"(audio_mlp|v_cond_mlp)\.fc1", "col"),
    (r"(audio_mlp|v_cond_mlp)\.fc2", "row"),
    (r"(audio_mod|v_cond_mod|modulation)\.", "col"),
    # single blocks
    (r"linear_qkv", "col"),
    (r"linear1\.", "row"),
    (r"linear2\.(w1|w3)", "col"),
    (r"linear2\.w2", "row"),
    # sync conditioning MLP
    (r"sync_in\.conv_mlp\.(w1|w3)", "col"),
    (r"sync_in\.conv_mlp\.w2", "row"),
    # everything else (embedders, norms, final layer, empties): replicated
    (r".*", "replicate"),
)


def partition_spec_for(path: str, leaf, rules: Sequence[Tuple[str, str]] = MMDIT_PARAM_RULES) -> P:
    """Resolve a leaf's PartitionSpec from the rule table.

    Biases of column-parallel layers shard with the out-features; row-parallel biases
    replicate (they are added after the all-reduce).
    """
    kind = "replicate"
    for pattern, k in rules:
        if re.search(pattern, path):
            kind = k
            break
    ndim = leaf.ndim
    is_bias = path.endswith(".b") or path.endswith(".bias")
    if kind == "replicate" or ndim == 0:
        return P()
    if is_bias:
        if kind != "col":
            return P()  # row-parallel biases are added after the all-reduce: replicate
        # bias [out] -> P(model); stacked bias [depth, out] -> P(None, model)
        return P(*([None] * (ndim - 1)), MODEL_AXIS)
    if ndim == 1:
        return P()
    # weight tensors: shard out axis (last) for col, in axis (second-to-last) for row
    spec = [None] * ndim
    if kind == "col":
        spec[-1] = MODEL_AXIS
    else:
        spec[-2] = MODEL_AXIS
    return P(*spec)


def shard_params(params: Dict, mesh: Mesh, rules=MMDIT_PARAM_RULES) -> Dict:
    """Place a param pytree onto the mesh per the rule table (materializes shards)."""
    flat = flatten_params(params)
    out = {}
    for path, leaf in flat.items():
        spec = partition_spec_for(path, leaf, rules)
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return unflatten_params(out)


def param_shardings(params: Dict, mesh: Mesh, rules=MMDIT_PARAM_RULES) -> Dict:
    """Pytree of NamedShardings (for jit in_shardings / out_shardings)."""
    flat = flatten_params(params)
    out = {path: NamedSharding(mesh, partition_spec_for(path, leaf, rules)) for path, leaf in flat.items()}
    return unflatten_params(out)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the (CFG-doubled) batch axis on 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
