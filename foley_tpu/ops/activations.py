"""Activations: gelu(tanh), silu, SwiGLU combine, and the DAC Snake activation.

Snake (reference ``dac_vae/nn/layers.py:18-24``): ``x + (alpha + 1e-9)^-1 * sin(alpha*x)^2``
with a per-channel learnable ``alpha``. The reference jit-scripts it for a 1.4x speedup; on
TPU, XLA fuses the elementwise chain into neighboring convs automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x)


_ACTIVATIONS = {"gelu": gelu, "gelu_tanh": gelu_tanh, "silu": silu, "relu": relu}


def get_activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation {name!r}; known: {sorted(_ACTIVATIONS)}") from None


def swiglu(x_gate: jnp.ndarray, x_lin: jnp.ndarray) -> jnp.ndarray:
    """silu(w1 x) * (w3 x) combine (reference ``activation_layers.py:17-44``)."""
    return jax.nn.silu(x_gate) * x_lin


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation, channel-last: x [..., C], alpha [C]."""
    s = jnp.sin(alpha * x)
    return x + s * s / (alpha + 1e-9)
