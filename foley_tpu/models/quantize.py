"""Residual vector quantization — the DAC codec's discrete branch, JAX port.

The foley pipeline instantiates DAC with ``continuous=True`` so RVQ never runs at inference
(reference ``utils.py:32-44``), but the discrete branch is a vendored capability of the codec
(``dac_vae/nn/quantize.py``) and is provided for full parity: ViT-VQGAN-style factorized,
L2-normalized codebooks with straight-through estimation, residual stack of 9 x 1024 x 8.

Channel-last: latents [B, T, D]. The straight-through trick is expressed with
``jax.lax.stop_gradient`` so the whole quantizer is differentiable under ``jax.grad``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.ops.nn import dense


@dataclasses.dataclass(frozen=True)
class RVQConfig:
    input_dim: int = 128
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8


class RVQOutput(NamedTuple):
    z_q: jnp.ndarray               # [B, T, D] quantized continuous representation
    codes: jnp.ndarray             # [B, N, T] codebook indices
    latents: jnp.ndarray           # [B, T, N*dim] projected pre-quantization latents
    commitment_loss: jnp.ndarray   # scalar
    codebook_loss: jnp.ndarray     # scalar


def init(key, cfg: RVQConfig, dtype=jnp.float32) -> Dict:
    quantizers = []
    for k in jax.random.split(key, cfg.n_codebooks):
        k1, k2, k3 = jax.random.split(k, 3)
        lim_in = 1.0 / np.sqrt(cfg.input_dim)
        lim_out = 1.0 / np.sqrt(cfg.codebook_dim)
        quantizers.append({
            # 1x1 WNConv1d in/out projections == dense [in, out] with weight norm folded
            "in_proj": {"w": jax.random.uniform(k1, (cfg.input_dim, cfg.codebook_dim), dtype, -lim_in, lim_in),
                        "b": jnp.zeros((cfg.codebook_dim,), dtype)},
            "out_proj": {"w": jax.random.uniform(k2, (cfg.codebook_dim, cfg.input_dim), dtype, -lim_out, lim_out),
                         "b": jnp.zeros((cfg.input_dim,), dtype)},
            "codebook": jax.random.normal(k3, (cfg.codebook_size, cfg.codebook_dim), dtype),
        })
    return {"quantizers": quantizers}


def _l2n(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def vector_quantize(q: Dict, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One factorized VQ stage (reference ``quantize.py:34-94``). z: [B, T, D].

    Returns (z_q, commitment_loss [B], codebook_loss [B], indices [B, T], z_e [B, T, dim]).
    """
    z_e = dense(z, q["in_proj"]["w"], q["in_proj"]["b"])      # [B, T, dim]
    enc = _l2n(z_e)
    cb = _l2n(q["codebook"])
    # squared euclidean on normalized vectors == 2 - 2 cos-sim; argmin distance
    dist = (
        jnp.sum(enc * enc, axis=-1, keepdims=True)
        - 2.0 * jnp.einsum("btd,nd->btn", enc, cb)
        + jnp.sum(cb * cb, axis=-1)[None, None, :]
    )
    indices = jnp.argmin(dist, axis=-1)                       # [B, T]
    z_q = q["codebook"][indices]                              # [B, T, dim]
    commitment = jnp.mean(jnp.square(z_e - jax.lax.stop_gradient(z_q)), axis=(1, 2))
    codebook = jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(z_e)), axis=(1, 2))
    z_q = z_e + jax.lax.stop_gradient(z_q - z_e)              # straight-through
    z_q = dense(z_q, q["out_proj"]["w"], q["out_proj"]["b"])  # [B, T, D]
    return z_q, commitment, codebook, indices, z_e


def apply(params: Dict, z: jnp.ndarray, cfg: RVQConfig,
          n_quantizers: Optional[int] = None) -> RVQOutput:
    """Residual quantization (reference ``quantize.py:127-198``, eval path). z: [B, T, D]."""
    n = n_quantizers if n_quantizers is not None else cfg.n_codebooks
    z_q = jnp.zeros_like(z)
    residual = z
    commitment = jnp.zeros((), jnp.float32)
    codebook = jnp.zeros((), jnp.float32)
    codes, latents = [], []
    for i, q in enumerate(params["quantizers"]):
        if i >= n:
            break
        z_q_i, c_i, cb_i, idx_i, z_e_i = vector_quantize(q, residual)
        z_q = z_q + z_q_i
        residual = residual - z_q_i
        commitment = commitment + jnp.mean(c_i)
        codebook = codebook + jnp.mean(cb_i)
        codes.append(idx_i)
        latents.append(z_e_i)
    return RVQOutput(
        z_q=z_q,
        codes=jnp.stack(codes, axis=1),
        latents=jnp.concatenate(latents, axis=-1),
        commitment_loss=commitment,
        codebook_loss=codebook,
    )


def from_codes(params: Dict, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, N, T] -> continuous z_q [B, T, D] (reference ``quantize.py:200-220``)."""
    z_q = None
    for i in range(codes.shape[1]):
        q = params["quantizers"][i]
        z_p = q["codebook"][codes[:, i]]                      # [B, T, dim]
        z_q_i = dense(z_p, q["out_proj"]["w"], q["out_proj"]["b"])
        z_q = z_q_i if z_q is None else z_q + z_q_i
    return z_q


def from_latents(params: Dict, latents: jnp.ndarray, cfg: RVQConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """latents [B, T, N*dim] -> (z_q [B, T, D], codes [B, N, T]) (reference :222-255)."""
    dims = np.cumsum([0] + [cfg.codebook_dim] * cfg.n_codebooks)
    n = int(np.max(np.where(dims <= latents.shape[-1])[0]))
    z_q = None
    codes = []
    for i in range(n):
        q = params["quantizers"][i]
        z_e = latents[..., dims[i]:dims[i + 1]]
        enc, cb = _l2n(z_e), _l2n(q["codebook"])
        dist = (
            jnp.sum(enc * enc, axis=-1, keepdims=True)
            - 2.0 * jnp.einsum("btd,nd->btn", enc, cb)
            + jnp.sum(cb * cb, axis=-1)[None, None, :]
        )
        idx = jnp.argmin(dist, axis=-1)
        codes.append(idx)
        z_q_i = dense(q["codebook"][idx], q["out_proj"]["w"], q["out_proj"]["b"])
        z_q = z_q_i if z_q is None else z_q + z_q_i
    return z_q, jnp.stack(codes, axis=1)
