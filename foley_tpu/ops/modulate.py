"""adaLN modulation primitives (reference ``modulate_layers.py:18-41``).

``modulate``: x * (1 + scale) + shift; ``apply_gate``: x * gate. Per-batch 2-D
modulation vectors broadcast over the sequence axis; per-token 3-D vectors apply directly
(the single-stream blocks modulate per-token, reference ``hifi_foley.py:364-368``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _bcast(m: Optional[jnp.ndarray], x: jnp.ndarray) -> Optional[jnp.ndarray]:
    if m is not None and x.ndim == 3 and m.ndim == 2:
        return m[:, None, :]
    return m


def modulate(
    x: jnp.ndarray,
    shift: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    shift = _bcast(shift, x)
    scale = _bcast(scale, x)
    if scale is None and shift is None:
        return x
    if shift is None:
        return x * (1 + scale)
    if scale is None:
        return x + shift
    return x * (1 + scale) + shift


def modulate_ref(
    x: jnp.ndarray,
    shift: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The reference ``modulate()`` helper's EXACT semantics (modulate_layers.py:19-30).

    When x is 3-D, the reference keeps shift/scale only if they are per-batch 2-D
    (``shift.unsqueeze(1) if shift.ndim == 2 else None``) — per-token 3-D modulation is
    silently DROPPED. This matters: in every shipped config (add_sync_feat_to_audio=True)
    the final layer's vec is per-token, so the reference's final adaLN modulation is a
    no-op and its checkpoints were trained that way. Use this at the call sites that map
    to reference ``modulate()`` calls (TwoStreamCABlock, FinalLayer1D); the single-stream
    blocks inline their per-token math (hifi_foley.py:368-388) and use ``modulate``.
    Divergence found by tests/test_reference_oracle_mmdit.py (round 3).
    """
    if x.ndim == 3:
        shift = shift if shift is not None and shift.ndim == 2 else None
        scale = scale if scale is not None and scale.ndim == 2 else None
    return modulate(x, shift, scale)


def apply_gate(x: jnp.ndarray, gate: Optional[jnp.ndarray] = None, tanh: bool = False) -> jnp.ndarray:
    if gate is None:
        return x
    gate = _bcast(gate, x)
    if tanh:
        return x * jnp.tanh(gate)
    return x * gate
