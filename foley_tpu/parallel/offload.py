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
import numpy as np

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


def partition_report(params: Dict) -> Dict[str, float]:
    """Host-vs-HBM placement report in MB for the block stacks (the reference's
    BlockSwap memory report, ``hifi_foley.py:609-612``: "Blocks on CPU: X MB / GPU: Y MB").

    Returns {"host_mb", "device_mb", "host_blocks", "device_blocks"}.
    """
    def tree_mb(tree) -> float:
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)) / 1e6

    host_mb = device_mb = 0.0
    host_blocks = device_blocks = 0
    for key in ("triple_blocks", "single_blocks"):
        stack = params.get(key)
        if stack is None:
            continue
        if is_split_stack(stack):
            resident = stack["resident"]
            n_res = _stack_depth(resident) if jax.tree.leaves(resident) else 0
            device_mb += tree_mb(resident)
            device_blocks += n_res
            for block in stack["offloaded"]:
                host_mb += tree_mb(block)
            host_blocks += len(stack["offloaded"])
        else:
            device_mb += tree_mb(stack)
            device_blocks += _stack_depth(stack)
    return {"host_mb": host_mb, "device_mb": device_mb,
            "host_blocks": host_blocks, "device_blocks": device_blocks}


def log_partition_report(params: Dict) -> Dict[str, float]:
    rep = partition_report(params)
    logger.info("--- BlockSwap memory report ---")
    logger.info(f"Blocks in pinned host RAM: {rep['host_blocks']} ({rep['host_mb']:.2f} MB)")
    logger.info(f"Blocks in device HBM:      {rep['device_blocks']} ({rep['device_mb']:.2f} MB)")
    logger.info("-------------------------------")
    return rep


def _put(tree: Dict, memory_kind: str) -> Dict:
    """Move a param tree between memory spaces INCREMENTALLY: one leaf at a time, blocking
    on each copy and deleting the source buffer before the next.

    A whole-tree ``jax.tree.map(device_put)`` keeps every source leaf alive until the map
    returns — on this runtime (lazy deallocation through the tunnel) that transiently
    DOUBLES the tree's footprint, which RESOURCE_EXHAUSTs a 16 GiB chip when committing the
    9.8 GiB XXL stack (the CLI's ``_device_committed`` path OOMed at every XXL duration
    while the commit-free direct path ran fine). Incremental move bounds the transient to
    one leaf (~340 MB max for the stacked block trees)."""
    space = jax.memory.Space.Host if memory_kind == "pinned_host" else jax.memory.Space.Device

    def move(x):
        y = jax.device_put(x, space)
        if isinstance(y, jax.Array) and y is not x:
            y.block_until_ready()
            if isinstance(x, jax.Array) and not x.is_deleted():
                x.delete()
        return y

    return jax.tree.map(move, tree)


def offload_params(params: Dict) -> Dict:
    """Move a param tree to host memory (phase ping-pong: encoders off while denoising).

    NOTE: the source tree's buffers are deleted as the move progresses (see ``_put``) —
    callers must replace their reference with the returned tree."""
    if not host_memory_available():
        logger.info("pinned_host memory kind unavailable; offload is a no-op on this backend")
        return params
    return _put(params, "pinned_host")


def restore_params(params: Dict) -> Dict:
    """Move a param tree back to device HBM (incremental; see ``_put``)."""
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


def _retarget_stack(stack, target_keep: int):
    """Re-split one block stack to ``target_keep`` device-resident blocks, INCREMENTALLY.

    HBM-bounded by construction (a naive merge-then-resplit transiently holds the old split
    AND a full restacked copy — ~15 GiB for XXL, the measured RESOURCE_EXHAUSTED at
    blocks_to_swap=54):
    - growing the swap moves only the leaving blocks device->host and re-slices the resident
      prefix (transient: old resident + kept copy);
    - shrinking the swap restacks THROUGH HOST numpy (pull resident + returning host blocks,
      one ``np.concatenate``, one device_put) — device peak is just old resident + new
      resident, never two full models.
    """
    if is_split_stack(stack):
        resident, offloaded = stack["resident"], stack["offloaded"]
        cur_keep = _stack_depth(resident) if jax.tree.leaves(resident) else 0
    else:
        resident, offloaded = stack, []
        cur_keep = _stack_depth(stack)
    n = cur_keep + len(offloaded)
    target_keep = max(0, min(target_keep, n))

    if target_keep == cur_keep:
        pass
    elif target_keep < cur_keep:  # grow swap: peel blocks off the resident suffix to host
        moved = [
            _put(jax.tree.map(lambda l: l[i], resident), "pinned_host")
            for i in range(target_keep, cur_keep)
        ]
        resident = _slice_stack(resident, 0, target_keep)
        offloaded = moved + offloaded
    else:  # shrink swap: restack returning blocks through host (device peak = old + new resident)
        back = offloaded[: target_keep - cur_keep]
        offloaded = offloaded[target_keep - cur_keep:]
        host_back = [jax.tree.map(np.asarray, b) for b in back]
        tail = jax.tree.map(lambda *ls: np.stack(ls, axis=0), *host_back)
        if cur_keep:
            host_res = jax.tree.map(np.asarray, resident)
            merged = jax.tree.map(lambda r, t: np.concatenate([r, t], axis=0), host_res, tail)
        else:
            merged = tail
        # np.asarray keeps jax dtypes (bfloat16 via ml_dtypes), so one put restores exactly
        resident = jax.tree.map(
            lambda h: jax.device_put(jnp.asarray(h), jax.memory.Space.Device), merged
        )

    if not offloaded:
        return resident
    return {"resident": resident, "offloaded": offloaded}


def merge_block_suffix(params: Dict) -> Dict:
    """Undo ``offload_block_suffix``: bring every offloaded block back to device HBM
    (restacked through host — see ``_retarget_stack`` for the memory bound)."""
    out = dict(params)
    for key in ("triple_blocks", "single_blocks"):
        stack = params.get(key)
        if is_split_stack(stack):
            n = _stack_depth(stack["resident"]) if jax.tree.leaves(stack["resident"]) else 0
            out[key] = _retarget_stack(stack, n + len(stack["offloaded"]))
    return out


def offload_block_suffix(params: Dict, blocks_to_swap: int, segment_size: int = 8) -> Dict:
    """Park the last ``blocks_to_swap`` of the combined (triple+single) block stacks in host
    memory with per-block granularity, mirroring the reference's partition policy (swap the
    *last* N of all 54 blocks, ``hifi_foley.py:574-604``).

    A swapped stack becomes ``{"resident": stacked[:keep] (HBM), "offloaded": [block, ...]}``
    where each list entry is ONE block's params as separate pinned-host buffers; the MMDiT
    forward scans the resident stack normally and applies each offloaded block unrolled with
    an explicit HBM fetch gated behind the previous block's compute
    (``models/mmdit.py::_run_stack`` ``prefetch_depth``) — bounding device residency to a
    small fetch window, the reference's prefetch-stream design (``hifi_foley.py:574-612``).
    Scanning over host-resident stacked operands — whole-stack or segmented — crashes the
    axon runtime's compiler (measured; ROADMAP.md), so the offloaded tail is unrolled instead.

    Re-application with a different N is INCREMENTAL (only the delta blocks move between
    HBM and host), so any transition's device peak stays bounded by the larger residency.
    """
    del segment_size  # kept for API compat; the offloaded tail is per-block (unrolled)
    if not host_memory_available():
        return params
    if blocks_to_swap <= 0:
        return merge_block_suffix(params)

    def depth(stack):
        if is_split_stack(stack):
            res = stack["resident"]
            keep = _stack_depth(res) if jax.tree.leaves(res) else 0
            return keep + len(stack["offloaded"])
        return _stack_depth(stack)

    n_triple = depth(params["triple_blocks"])
    n_single = depth(params["single_blocks"])
    blocks_to_swap = min(blocks_to_swap, n_triple + n_single)
    # reference block order is [triple(18); single(36)]: the swap suffix eats the single
    # stack from the back first, then the triple stack
    swap_single = min(blocks_to_swap, n_single)
    swap_triple = min(blocks_to_swap - swap_single, n_triple)

    out = dict(params)
    out["single_blocks"] = _retarget_stack(params["single_blocks"], n_single - swap_single)
    out["triple_blocks"] = _retarget_stack(params["triple_blocks"], n_triple - swap_triple)
    logger.info(
        f"host-offloaded block suffix: {swap_triple}/{n_triple} triple + "
        f"{swap_single}/{n_single} single blocks (per-block, unrolled gated fetch)"
    )
    return out
