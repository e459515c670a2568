"""LoRA (low-rank adaptation) for the MMDiT denoiser — parameter-efficient fine-tuning.

Beyond-reference capability (the reference ships inference nodes only; its training
machinery is dormant — SURVEY.md §2.5/§5.4). LoRA is the standard ecosystem mechanism for
cheap fine-tunes, and on TPU it is what makes XXL fine-tuning fit a single 16 GiB chip:
the 9.5 GiB bf16 base stays frozen (no optimizer state), and only the low-rank factors
(rank 16 ≈ 60 MB fp32 at XXL) train — Adam moments included, the trainable footprint is
~3 orders of magnitude below full fine-tuning.

Design (TPU-native, matching the scan-stacked parameter layout of ``models/mmdit.py``):

- A LoRA tree mirrors the ``triple_blocks`` / ``single_blocks`` subtrees of the MMDiT
  param pytree. Every targeted dense leaf dict ``{"w": [in, out], ...}`` gets a factor
  pair ``{"a": [in, r], "b": [r, out]}``; conv leaves (``w [K, in, out]``) get per-tap
  pairs ``{"a": [K, in, r], "b": [K, r, out]}`` — a k-tap conv is k stacked dense maps.
  Block stacking adds the same leading [L] axis as the base stacks, so the factors ride
  the SAME ``lax.scan`` over blocks that the base weights do (no per-block Python
  unrolling, one compiled block body), and ``a @ b`` batches every leading axis so one
  merge expression serves both leaf kinds.
- Training applies LoRA *unmerged* inside the scan body: each iteration materializes ONE
  block's effective ``w + scale * a @ b`` (a ~200 MB scan temp at XXL, freed per
  iteration) — never a second full weight stack. Gradients flow through the merge to the
  stacked factors; the base is a frozen closure constant (``training/train.py``).
- Inference uses :func:`merge_lora` at load time (one-time, leaf-wise) and then runs the
  unmodified fast path — the denoise hoists (``precompute_text_kv`` /
  ``precompute_triple_mods``) read block weights directly, so runtime (unmerged) LoRA is
  deliberately NOT wired into the hoisted inference path (``mmdit.apply`` asserts).

Init follows the standard recipe (Hu et al. 2021): ``a`` Kaiming-uniform over fan-in
(torch ``nn.Linear`` default — the same scheme the base weights use), ``b`` zeros, so the
adapted model starts EXACTLY equal to the base model.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

#: Leaves adapted by default: every attention projection and MLP map in both block
#: families — dense AND conv (the single-stream ``linear1`` k=3 conv and the ``linear2``
#: ConvMLP convs carry two-thirds of the network depth's MLP/output path; r4 verdict #4).
#: A k-tap conv is k stacked dense maps, so conv leaves get PER-TAP factor pairs over the
#: channel dims (``a [.., K, in, r]``/``b [.., K, r, out]`` — ``jnp.matmul`` batches the
#: leading axes, so the same merge expression serves both leaf kinds). The adaLN
#: modulation heads (``audio_mod``/``v_cond_mod``/``modulation``) are excluded — they are
#: zero-init in the reference (``modulate_layers.py:11-13``), so a low-rank delta there is
#: not an *adaptation* of a pretrained map but a rank-crippled from-scratch matrix; pass
#: explicit ``targets`` to include them anyway.
DEFAULT_TARGETS: Set[str] = {
    # triple-stream blocks
    "audio_self_attn_qkv", "audio_self_proj",
    "v_cond_attn_qkv", "v_cond_self_proj",
    "audio_cross_q", "v_cond_cross_q", "text_cross_kv",
    "audio_cross_proj", "v_cond_cross_proj",
    "fc1", "fc2",  # audio_mlp / v_cond_mlp
    # single-stream blocks
    "linear_qkv",
    "linear1",   # k=3 conv following attention
    "linear2",   # ConvMLP (adapts its w1/w2/w3 conv leaves)
}


def _is_dense_leaf(v) -> bool:
    return isinstance(v, dict) and "w" in v and getattr(v["w"], "ndim", 0) in (2, 3)


def _is_conv_leaf(v) -> bool:
    # stacked conv inside a block subtree: w [L, K, in, out] (ops/nn.py::init_conv1d + the
    # converter's [L] block stacking)
    return isinstance(v, dict) and "w" in v and getattr(v["w"], "ndim", 0) == 4


def _init_subtree(key, subtree: Dict, rank: int, targets: Set[str], dtype,
                  adapt_all: bool = False) -> Dict:
    """LoRA factors for one block-family subtree (leaves carry the stacked [L] axis).
    Per-leaf keys are folded from the path name — deterministic and sibling-independent.
    ``adapt_all``: a targeted non-leaf name (e.g. ``linear2``) adapts every factorable
    leaf underneath it."""
    import zlib

    out: Dict = {}
    for name in sorted(subtree):
        v = subtree[name]
        leaf_key = jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)
        targeted = adapt_all or name in targets
        if _is_dense_leaf(v) and targeted:
            w = v["w"]
            if w.ndim != 3:  # [L, in, out] — block subtrees are always stacked
                raise ValueError(f"expected stacked dense at {name}, got {w.shape}")
            depth, fan_in, fan_out = w.shape
            limit = 1.0 / float(np.sqrt(fan_in))
            out[name] = {
                "a": jax.random.uniform(leaf_key, (depth, fan_in, rank), dtype, -limit, limit),
                "b": jnp.zeros((depth, rank, fan_out), dtype),
            }
        elif _is_conv_leaf(v) and targeted:
            # per-tap factors: delta[l, k] = a[l, k] @ b[l, k], the k-stacked-dense view
            # of a conv. Kaiming limit uses the conv's true fan_in = K * in (matching the
            # base init, ops/nn.py:302-303).
            depth, ksz, fan_in_c, fan_out = v["w"].shape
            limit = 1.0 / float(np.sqrt(fan_in_c * ksz))
            out[name] = {
                "a": jax.random.uniform(
                    leaf_key, (depth, ksz, fan_in_c, rank), dtype, -limit, limit),
                "b": jnp.zeros((depth, ksz, rank, fan_out), dtype),
            }
        elif isinstance(v, dict) and not _is_dense_leaf(v) and not _is_conv_leaf(v):
            sub = _init_subtree(leaf_key, v, rank, targets, dtype, adapt_all=targeted)
            if sub:
                out[name] = sub
    return out


def init_lora(
    key,
    params: Dict,
    rank: int = 16,
    targets: Optional[Iterable[str]] = None,
    dtype=jnp.float32,
) -> Dict:
    """A fresh LoRA tree for ``params`` (an ``mmdit.init`` pytree): ``a`` Kaiming-uniform,
    ``b`` zeros ⇒ the adapted model initially equals the base exactly (tested)."""
    tset = DEFAULT_TARGETS if targets is None else set(targets)
    kt, ks = jax.random.split(key)
    lora = {
        "triple_blocks": _init_subtree(kt, params["triple_blocks"], rank, tset, dtype),
        "single_blocks": _init_subtree(ks, params["single_blocks"], rank, tset, dtype),
    }
    if not jax.tree.leaves(lora):
        raise ValueError(f"no LoRA targets matched in params (targets={sorted(tset)})")
    return lora


def merge_block_lora(block_params: Dict, block_lora: Dict, scale) -> Dict:
    """``w + scale * a @ b`` on every factored leaf; non-factored leaves pass through
    untouched (no copies). Works on a single block ([in, out] leaves, inside the block
    scan) and on full stacks ([L, in, out] leaves — ``jnp.matmul`` batches the leading
    axis), which is what :func:`merge_lora` uses."""
    out = dict(block_params)
    for name, lv in block_lora.items():
        if "a" in lv and "b" in lv:
            leaf = dict(block_params[name])
            if "w" not in leaf:
                raise ValueError(
                    f"cannot merge LoRA into '{name}': leaf has no dense 'w' (quantized "
                    "storage?) — merge BEFORE quantization (the loader does; see "
                    "_merge_lora_if_given), and train over an unquantized base")
            delta = (lv["a"] @ lv["b"]).astype(leaf["w"].dtype)
            leaf["w"] = leaf["w"] + jnp.asarray(scale, leaf["w"].dtype) * delta
            out[name] = leaf
        else:
            out[name] = merge_block_lora(block_params[name], lv, scale)
    return out


def merge_lora(params: Dict, lora: Dict, scale: float = 1.0) -> Dict:
    """The inference-time merge: a params tree with LoRA folded into the targeted
    weights. One-time and leaf-wise (peak extra memory = one merged leaf stack); the
    result runs the unmodified fast path, hoists included."""
    merged = dict(params)
    for fam in ("triple_blocks", "single_blocks"):
        if fam in lora and lora[fam]:
            merged[fam] = merge_block_lora(params[fam], lora[fam], scale)
    return merged


def save_lora(path: str, lora: Dict, rank: int, scale: float = 1.0) -> str:
    """Persist an adapter (orbax layout + meta.json carrying rank/recommended scale)."""
    from foley_tpu.io.orbax_io import save_params

    save_params(path, lora)
    with open(os.path.join(path, "lora_meta.json"), "w") as f:
        json.dump({"rank": int(rank), "scale": float(scale)}, f)
    return path


def load_lora(path: str) -> tuple[Dict, float]:
    """Load an adapter saved by :func:`save_lora`; returns ``(lora_tree, scale)``."""
    from foley_tpu.io.orbax_io import load_params

    lora = load_params(path)
    scale = 1.0
    meta_path = os.path.join(path, "lora_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            scale = float(json.load(f).get("scale", 1.0))
    return lora, scale
