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


def apply_gate(x: jnp.ndarray, gate: Optional[jnp.ndarray] = None, tanh: bool = False) -> jnp.ndarray:
    if gate is None:
        return x
    gate = _bcast(gate, x)
    if tanh:
        return x * jnp.tanh(gate)
    return x * gate
