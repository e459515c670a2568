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


def offload_block_suffix(params: Dict, blocks_to_swap: int) -> Dict:
    """Park the last ``blocks_to_swap`` of the combined (triple+single) block stacks in host
    memory, mirroring the reference's partition policy (swap the *last* N of all 54 blocks,
    ``hifi_foley.py:574-604``). The stacked leaves are split so the device slice stays in HBM.

    Note: inside jit, scans over host-resident params trigger XLA-managed streaming; this is
    the memory/latency trade the reference exposes as the BlockSwap node.
    """
    if blocks_to_swap <= 0 or not host_memory_available():
        return params
    def _depth(p):  # int8-quantized weights store {"int8": q, "scale": s} in place of 'w'
        leaf = p["w"]
        return (leaf["int8"] if isinstance(leaf, dict) else leaf).shape[0]

    n_triple = _depth(params["triple_blocks"]["audio_mod"])
    n_single = _depth(params["single_blocks"]["modulation"])
    total = n_triple + n_single
    blocks_to_swap = min(blocks_to_swap, total)

    # Scanned stacks are single leaves, so placement is per-stack: swap the single-block stack
    # first (it holds the back of the reference's block order), then the triple stack. Coarser
    # than the reference's per-block control but achieves the same HBM floor, and XLA streams
    # per-iteration scan slices from host memory automatically.
    out = dict(params)
    out["single_blocks"] = _put(params["single_blocks"], "pinned_host")
    if blocks_to_swap > n_single:
        out["triple_blocks"] = _put(params["triple_blocks"], "pinned_host")
    logger.info(f"host-offloaded block stacks (blocks_to_swap={blocks_to_swap}/{total})")
    return out
