"""fp8 weight-only quantization of parameter pytrees.

Mirrors the reference's ``_wrap_fp8_inplace`` policy (``utils.py:296-485``): weights are stored
in fp8 (e4m3fn or e5m2) and upcast to the activation dtype at use (every op in
``foley_tpu/ops/nn.py`` does this automatically); biases stay high precision; a deny-list keeps
precision-sensitive layers unquantized. The deny substrings are translated from the reference's
torch module names (``utils.py:298-310``) to our param paths.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from foley_tpu.core.dtypes import resolve_dtype
from foley_tpu.core.params import flatten_params, unflatten_params

# Reference deny-list (utils.py:298-310), adapted to pytree paths: biases are separate 'b'
# leaves here (never quantized); norm weights live under *_norm/.../weight.
FP8_DENY_SUBSTRINGS = (
    "norm",             # all LayerNorm/RMSNorm/qk-norm weights
    "final_layer",      # output projection stays high precision
    "visual_proj",      # early visual projection
    "audio_cross_q",    # cross-attn queries/projections (audio & v_cond)
    "v_cond_cross_q",
    "audio_cross_proj",
    "v_cond_cross_proj",
    "empty_clip_feat",  # learned condition embeddings
    "empty_sync_feat",
    "sync_pos_emb",
)


def quantize_int8(
    params: Dict,
    deny_substrings: Tuple[str, ...] = FP8_DENY_SUBSTRINGS,
    dynamic: bool = False,
    on_host: bool = False,
    consume: bool = False,
) -> Tuple[Dict, Dict[str, int], int]:
    """int8 weight-only quantization with per-output-channel scales.

    Beyond the reference's fp8 storage mode: v5e-native int8 with per-channel scales
    (typically better fidelity than e4m3 within a scale group). A quantized 'w' leaf becomes
    ``{"int8": int8 weights, "scale": fp32 broadcastable per-channel scale}``; every op in
    ``foley_tpu/ops/nn.py`` dequantizes at use (`_match`) and XLA fuses the scale multiply
    into the matmul operand read. Same deny-list as fp8. Halves weight HBM traffic vs bf16.

    ``dynamic=True`` stores the weight under the ``"int8_dyn"`` key instead (treedef-static
    marker) so dense matmuls run the int8xint8 MXU path: activations are quantized per-token at use and the
    contraction accumulates in int32 on the native int8 systolic array (2x bf16 peak on
    v5e), with the (token-scale x channel-scale) dequant fused into the epilogue
    (``ops/nn.py::dense``). Numerics deviate from the reference's bf16 compute — strictly an
    opt-in throughput mode; convs fall back to weight-only dequant.

    ``on_host=True`` runs the quantization math in numpy (device quantization materializes
    fp32 temporaries of the biggest stacked leaves — several GiB of transient HBM, OOM when
    the full XXL is resident). ``consume=True`` drops each source leaf as it is quantized so
    device peak never holds both the bf16 model and its int8 copy (destructive: the input
    tree is cleared).
    """
    import numpy as np

    flat = flatten_params(params)
    if consume:
        params.clear()  # flat now holds the only refs; leaves free as we null them out
    out, counts, saved = {}, {"quantized": 0, "skipped": 0}, 0
    for path in list(flat):
        leaf = flat[path]
        is_weight = path.endswith(".w") or path.endswith(".weight")
        denied = any(s in path for s in deny_substrings) or not is_weight
        if denied or not jnp.issubdtype(leaf.dtype, jnp.floating):
            out[path] = leaf
            counts["skipped"] += 1
            continue
        # scale per output channel (last axis), kept per-depth/per-tap for stacked leaves
        axes = tuple(range(1 if leaf.ndim >= 3 else 0, leaf.ndim - 1))
        if on_host:
            w32 = np.asarray(leaf, dtype=np.float32)
            if consume:
                flat[path] = None
            scale_h = np.maximum(np.max(np.abs(w32), axis=axes, keepdims=True) / 127.0, 1e-12)
            q_h = np.clip(np.round(w32 / scale_h), -127, 127).astype(np.int8)
            q = jnp.asarray(q_h)
            scale = jnp.asarray(scale_h.astype(np.float32))
        else:
            w32 = leaf.astype(jnp.float32)
            scale = jnp.max(jnp.abs(w32), axis=axes, keepdims=True) / 127.0
            scale = jnp.maximum(scale, 1e-12)
            q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
            if consume:
                flat[path] = None
        saved += int(leaf.size) * (leaf.dtype.itemsize - 1) - int(scale.size) * 4
        # the key encodes the mode (treedef-static, no scalar leaf to break stacked scans):
        # "int8" = weight-only dequant-at-use; "int8_dyn" = int8xint8 MXU activation path
        out[path + (".int8_dyn" if dynamic else ".int8")] = q
        out[path + ".scale"] = scale
        counts["quantized"] += 1
    return unflatten_params(out), counts, saved


def quantize_int4(
    params: Dict,
    deny_substrings: Tuple[str, ...] = FP8_DENY_SUBSTRINGS,
    group_size: int = 128,
    consume: bool = False,
) -> Tuple[Dict, Dict[str, int], int]:
    """int4 weight-only quantization with group-wise (input-axis) x per-channel scales.

    Beyond the reference's fp8 mode: 4-bit symmetric weights (q in [-7, 7]) with a separate
    fp32 scale per ``group_size`` input channels per output channel — the group-wise scales
    recover most of the fidelity plain per-channel int4 loses. A quantized 'w' leaf becomes
    ``{"int4": packed uint8 [..., in/2, out], "scale": [..., n_groups, 1, out]}`` with
    SPLIT-HALF packing: byte ``i`` holds input row ``i`` in the low nibble and row
    ``i + in/2`` in the high nibble (biased +8), so the dequant is a CONCATENATE along the
    input axis — no interleave. The previous adjacent-pair packing (rows 2i/2i+1 per byte)
    needed a ``stack``+reshape interleave that XLA lowered as a full relayout of the
    dequantized weights every step: 2.35x bf16 step time vs split-half's 1.06x, measured
    on the XXL single-block qkv scan (``tools/profile_int4_matmul.py``, r4 verdict #5).
    The nibble packing is done HOST-SIDE on purpose — ``jnp.int4`` arrays crash this axon
    runtime's dispatch layer (``device_put`` for the S4 tiled-relayout recurses infinitely:
    ``RecursionError: Recursively calling jit``; standalone repro ``tools/repro_int4.py``),
    so the 4-bit storage never touches the int4 dtype. ``ops/nn.py::_match`` unpacks with a
    shift/mask/concat chain that XLA fuses into the consuming matmul's operand read.
    Weights whose input axis is not divisible by ``group_size`` use ONE group (plain
    per-channel); odd input axes stay unquantized. Quarters weight HBM traffic vs bf16 —
    the measured bf16 batch-1 bound (ROADMAP post-hoist profile). Opt-in storage mode; same
    deny-list as fp8.

    Quantization math always runs host-side in numpy (the device-side fp32 temporaries of
    the big stacked leaves OOM a resident XXL, as measured for int8);
    ``consume``: as in ``quantize_int8`` (destructive source, peak stays ~1x).
    """
    import numpy as np

    flat = flatten_params(params)
    if consume:
        params.clear()
    out, counts, saved = {}, {"quantized": 0, "skipped": 0}, 0
    for path in list(flat):
        leaf = flat[path]
        is_weight = path.endswith(".w") or path.endswith(".weight")
        denied = any(s in path for s in deny_substrings) or not is_weight
        if (denied or not jnp.issubdtype(leaf.dtype, jnp.floating) or leaf.ndim < 2
                or leaf.shape[-2] % 2):
            out[path] = leaf
            counts["skipped"] += 1
            continue
        cin = leaf.shape[-2]
        g = group_size if cin % group_size == 0 else cin
        n_groups = cin // g
        grouped_shape = leaf.shape[:-2] + (n_groups, g, leaf.shape[-1])
        w32 = np.asarray(leaf, dtype=np.float32).reshape(grouped_shape)
        if consume:
            flat[path] = None
        scale = np.maximum(np.max(np.abs(w32), axis=-2, keepdims=True) / 7.0, 1e-12)
        # bias to [1, 15]; split-half packing: byte i = (row i+cin/2) << 4 | row i
        qb = (np.clip(np.round(w32 / scale), -7, 7).reshape(leaf.shape) + 8).astype(np.uint8)
        packed = (qb[..., cin // 2:, :] << 4) | qb[..., : cin // 2, :]
        q4 = jnp.asarray(packed)
        scale_j = jnp.asarray(scale.astype(np.float32))
        saved += int(leaf.size) * leaf.dtype.itemsize - int(packed.size) \
            - int(scale_j.size) * 4
        out[path + ".int4"] = q4
        out[path + ".scale"] = scale_j
        counts["quantized"] += 1
    return unflatten_params(out), counts, saved


def quantize_fp8(
    params: Dict,
    quantization: str = "fp8_e4m3fn",
    deny_substrings: Tuple[str, ...] = FP8_DENY_SUBSTRINGS,
) -> Tuple[Dict, Dict[str, int], int]:
    """Quantize weight leaves ('w') to fp8 storage. Returns (params, counts, bytes_saved)."""
    qdtype = resolve_dtype(quantization)
    flat = flatten_params(params)
    out, counts, saved = {}, {"quantized": 0, "skipped": 0}, 0
    for path, leaf in flat.items():
        is_weight = path.endswith(".w") or path.endswith(".weight")
        denied = any(s in path for s in deny_substrings) or not is_weight
        # only quantize float weights; b/bias leaves are not '.w' so they're skipped
        if denied or not jnp.issubdtype(leaf.dtype, jnp.floating) or "norm" in path:
            out[path] = leaf
            counts["skipped"] += 1
            continue
        saved += int(leaf.size) * (leaf.dtype.itemsize - 1)
        out[path] = leaf.astype(qdtype)
        counts["quantized"] += 1
    return unflatten_params(out), counts, saved


def quantize_params(
    params: Dict,
    mode: str,
    *,
    on_host: bool = False,
    consume: bool = False,
) -> Tuple[Dict, Dict[str, int], int]:
    """THE storage-mode dispatch: fp8_e4m3fn / fp8_e5m2 / int8 / int8_dynamic / int4.

    Every entrypoint (model loaders, CLI random-init, profilers) goes through here so the
    per-mode kwargs (consume/on_host semantics, dynamic marker) cannot drift between
    sites. ``on_host``/``consume`` are honored where the mode supports them (int4's math
    is always host-side; fp8's lazy astype needs neither). Returns
    ``(params, counts, bytes_saved)`` like the per-mode functions."""
    if mode.startswith("fp8"):
        return quantize_fp8(params, mode)
    if mode == "int4":
        return quantize_int4(params, consume=consume)
    if mode in ("int8", "int8_dynamic"):
        return quantize_int8(params, dynamic=mode == "int8_dynamic",
                             on_host=on_host, consume=consume)
    raise ValueError(f"unknown quantization mode {mode!r}; known: "
                     "fp8_e4m3fn, fp8_e5m2, int8, int8_dynamic, int4")
