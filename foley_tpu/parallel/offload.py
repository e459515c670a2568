"""Host-memory offload — the TPU-native analog of the reference's block swap.

The reference frees VRAM by parking the last N transformer blocks on CPU and streaming them
in per-forward with CUDA streams/events (``hifi_foley.py:545-612, 720-731, 818-835``), and by
ping-ponging encoder vs denoiser residency between phases (``nodes.py:278-415``). On TPU the
equivalent mechanism is XLA memory kinds: params placed with ``memory_kind='pinned_host'``
live in host RAM and XLA schedules the HBM transfers. This module provides:

- ``offload_params`` / ``restore_params``: whole-tree placement (the ping-pong analog);
- ``offload_block_suffix``: park the *last N stacked blocks* of each scan stack in host memory
  (the block-swap analog) by splitting the stacked leaves.

The MMDiT scan bodies fetch each block's params with ``jax.device_put(..., Space.Device)``
(a no-op for HBM-resident params), so offloaded stacks stream per-iteration. Status on
hardware: a host-resident param feeding a jitted matmul works on the axon TPU runtime, but
the full XXL offloaded 36-block scan hits a TPU backend INTERNAL error through the axon
tunnel — re-validate on a standard TPU runtime (tracked in ROADMAP.md).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from foley_tpu.utils.logging import get_logger

logger = get_logger()


def host_memory_available() -> bool:
    """True if the backend supports the pinned_host memory kind (TPU does; CPU may not)."""
    try:
        dev = jax.devices()[0]
        kinds = {m.kind for m in dev.addressable_memories()}
        return "pinned_host" in kinds
    except Exception:
        return False


def _put(tree: Dict, memory_kind: str) -> Dict:
    space = jax.memory.Space.Host if memory_kind == "pinned_host" else jax.memory.Space.Device
    return jax.tree.map(lambda x: jax.device_put(x, space), tree)


def offload_params(params: Dict) -> Dict:
    """Move a param tree to host memory (phase ping-pong: encoders off while denoising)."""
    if not host_memory_available():
        logger.info("pinned_host memory kind unavailable; offload is a no-op on this backend")
        return params
    return _put(params, "pinned_host")


def restore_params(params: Dict) -> Dict:
    """Move a param tree back to device HBM."""
    if not host_memory_available():
        return params
    return _put(params, "device")


def is_split_stack(stack) -> bool:
    """True for a placement-split block stack produced by ``offload_block_suffix``."""
    return isinstance(stack, dict) and "resident" in stack and "offloaded" in stack


def _stack_depth(stack: Dict) -> int:
    return jax.tree.leaves(stack)[0].shape[0]


def _slice_stack(stack: Dict, start: int, stop: int) -> Dict:
    return jax.tree.map(lambda l: l[start:stop], stack)


def merge_block_suffix(params: Dict) -> Dict:
    """Undo ``offload_block_suffix``: restack the per-block host trees onto the device-resident
    prefix (so a different blocks_to_swap can be applied on the next call)."""
    out = dict(params)
    for key in ("triple_blocks", "single_blocks"):
        stack = params.get(key)
        if not is_split_stack(stack):
            continue
        tail = jax.tree.map(
            lambda *ls: jnp.stack(ls, axis=0), *[_put(b, "device") for b in stack["offloaded"]]
        )
        if _stack_depth(stack["resident"]):
            out[key] = jax.tree.map(
                lambda r, t: jnp.concatenate([r, t], axis=0), stack["resident"], tail
            )
        else:
            out[key] = tail
    return out


def offload_block_suffix(params: Dict, blocks_to_swap: int, segment_size: int = 8) -> Dict:
    """Park the last ``blocks_to_swap`` of the combined (triple+single) block stacks in host
    memory with per-block granularity, mirroring the reference's partition policy (swap the
    *last* N of all 54 blocks, ``hifi_foley.py:574-604``).

    A swapped stack becomes ``{"resident": stacked[:keep] (HBM), "offloaded": [block, ...]}``
    where each list entry is ONE block's params as separate pinned-host buffers; the MMDiT
    forward scans the resident stack normally and applies each offloaded block unrolled with
    an explicit HBM fetch (``models/mmdit.py::_run_stack``) — per-block copy-start/copy-done
    pairs XLA can schedule ahead of use (the reference's prefetch-stream design,
    ``hifi_foley.py:574-612``). Scanning over host-resident stacked operands — whole-stack or
    segmented — crashes the axon runtime's compiler (measured; ROADMAP.md), so the offloaded
    tail is unrolled instead.
    """
    del segment_size  # kept for API compat; the offloaded tail is per-block (unrolled)
    if blocks_to_swap <= 0 or not host_memory_available():
        return params
    params = merge_block_suffix(params)  # idempotent re-application with a new N

    n_triple = _stack_depth(params["triple_blocks"])
    n_single = _stack_depth(params["single_blocks"])
    total = n_triple + n_single
    blocks_to_swap = min(blocks_to_swap, total)
    # reference block order is [triple(18); single(36)]: the swap suffix eats the single
    # stack from the back first, then the triple stack
    swap_single = min(blocks_to_swap, n_single)
    swap_triple = min(blocks_to_swap - swap_single, n_triple)

    def split(stack, keep, n):
        blocks = [
            _put(jax.tree.map(lambda l: l[i], stack), "pinned_host") for i in range(keep, n)
        ]
        return {"resident": _slice_stack(stack, 0, keep), "offloaded": blocks}

    out = dict(params)
    if swap_single:
        out["single_blocks"] = split(params["single_blocks"], n_single - swap_single, n_single)
    if swap_triple:
        out["triple_blocks"] = split(params["triple_blocks"], n_triple - swap_triple, n_triple)
    logger.info(
        f"host-offloaded block suffix: {swap_triple}/{n_triple} triple + "
        f"{swap_single}/{n_single} single blocks (per-block, unrolled fetch)"
    )
    return out
