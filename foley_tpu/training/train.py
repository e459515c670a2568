"""Flow-matching training step (velocity prediction) with mesh sharding.

The reference ships dormant training machinery only (gradient-checkpoint hooks hardcoded off,
``hifi_foley.py:406-413``; DAC losses/discriminators unused — SURVEY.md §2.5). This module
makes training a first-class capability, TPU-native: a jitted, sharding-annotated train step
over the ('data', 'model') mesh with rematerialized block scans.

Objective (matching the reference's diffusion_config: flow / linear path / velocity
prediction, ``configs/hunyuanvideo-foley-xxl.yaml:41-44``): with data latents x1, noise x0,
sigma ~ U(0, 1): x_sigma = (1-sigma) * x1 + sigma * x0, target velocity = x0 - x1 (the
direction of increasing sigma; the sampler integrates sigma 1 -> 0 with v flipped by dt<0).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from foley_tpu.configs import MMDiTConfig
from foley_tpu.models import mmdit


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def flow_match_loss(
    params: Dict,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: MMDiTConfig,
    compute_dtype=jnp.bfloat16,
    num_train_timesteps: int = 1000,
    lora: Optional[Dict] = None,
    lora_scale: float = 1.0,
) -> jnp.ndarray:
    """MSE between predicted and target velocity on the linear flow path."""
    x1 = batch["latents"].astype(jnp.float32)          # [B, T, C] data latents
    k_noise, k_t = jax.random.split(key)
    x0 = jax.random.normal(k_noise, x1.shape, jnp.float32)
    sigma = jax.random.uniform(k_t, (x1.shape[0],), jnp.float32)
    x_sigma = (1.0 - sigma)[:, None, None] * x1 + sigma[:, None, None] * x0
    target_v = x0 - x1
    t = sigma * num_train_timesteps
    pred_v = mmdit.apply(
        params,
        x_sigma.astype(compute_dtype),
        t,
        batch["cond"].astype(compute_dtype),
        batch["clip_feat"].astype(compute_dtype),
        batch["sync_feat"].astype(compute_dtype),
        cfg,
        remat=True,
        lora=lora,
        lora_scale=lora_scale,
    ).astype(jnp.float32)
    return jnp.mean(jnp.square(pred_v - target_v))


def make_train_step(
    cfg: MMDiTConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
    compute_dtype=jnp.bfloat16,
):
    """Build (init_state, train_step). train_step is pure and jit/pjit-ready."""
    if optimizer is None:
        optimizer = optax.adamw(1e-4, b1=0.9, b2=0.95, weight_decay=0.01)

    def init_state(params: Dict) -> TrainState:
        return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))

    def train_step(state: TrainState, batch: Dict, key: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(flow_match_loss)(
            state.params, batch, key, cfg, compute_dtype
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_state, train_step


class LoraTrainState(NamedTuple):
    """LoRA fine-tuning state: ONLY the low-rank factors train (the frozen base params
    are a closure constant of the step — no gradients, no optimizer moments for them).
    At XXL this is the difference between fine-tuning fitting a 16 GiB chip or not:
    9.5 GiB frozen bf16 base + ~60 MB of rank-16 factors + their Adam moments, vs
    ~38 GiB of fp32 params+moments for a full fine-tune."""

    lora: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_lora_train_step(
    cfg: MMDiTConfig,
    base_params: Dict,
    lora_scale: float = 1.0,
    optimizer: Optional[optax.GradientTransformation] = None,
    compute_dtype=jnp.bfloat16,
):
    """Build (init_state, train_step) for LoRA fine-tuning over a frozen base.

    The step differentiates ``flow_match_loss`` w.r.t. the LoRA tree only; the per-block
    ``w + scale * a @ b`` merge happens inside the block scan (``models/lora.py`` module
    doc), so peak memory adds one block's effective weights, never a second stack.
    Weight decay deliberately defaults OFF (decaying factors of a *delta* pulls the
    adapter toward the base, which is a prior choice, not a default)."""
    if optimizer is None:
        optimizer = optax.adam(1e-4, b1=0.9, b2=0.95)

    def init_state(lora: Dict) -> LoraTrainState:
        return LoraTrainState(
            lora=lora, opt_state=optimizer.init(lora), step=jnp.zeros((), jnp.int32))

    def loss_fn(lora: Dict, batch: Dict, key: jax.Array) -> jnp.ndarray:
        return flow_match_loss(
            base_params, batch, key, cfg, compute_dtype,
            lora=lora, lora_scale=lora_scale,
        )

    def train_step(
        state: LoraTrainState, batch: Dict, key: jax.Array
    ) -> Tuple[LoraTrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(state.lora, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        return LoraTrainState(lora, opt_state, state.step + 1), loss

    return init_state, train_step
