"""Training loop driver with orbax checkpoint/resume.

The reference has no training checkpoints or resume at all (SURVEY.md §5.4). This driver
completes the training capability: a deterministic step-keyed PRNG schedule, periodic orbax
saves of the full ``TrainState`` (params + optimizer state + step), and exact resume — a run
interrupted at step k and resumed continues bit-identically to an uninterrupted run.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from foley_tpu.configs import MMDiTConfig
from foley_tpu.training.train import (
    LoraTrainState,
    TrainState,
    make_lora_train_step,
    make_train_step,
)
from foley_tpu.utils.logging import get_logger

logger = get_logger()


def _state_to_tree(state: TrainState) -> Dict:
    return {"params": state.params, "opt_state": state.opt_state, "step": state.step}


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    from foley_tpu.io.orbax_io import save_params

    path = os.path.join(ckpt_dir, f"step_{int(state.step):08d}")
    save_params(path, _state_to_tree(state))
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def restore_checkpoint(path: str, template_state: TrainState) -> TrainState:
    from foley_tpu.io.orbax_io import load_params

    tree = load_params(path, template=_state_to_tree(template_state))
    return TrainState(params=tree["params"], opt_state=tree["opt_state"], step=tree["step"])


def train(
    init_params: Dict,
    data_iter: Iterator[Dict],
    cfg: MMDiTConfig,
    num_steps: int,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 1000,
    log_every: int = 100,
    seed: int = 0,
    compute_dtype=jnp.float32,
    resume: bool = True,
    optimizer=None,
    metrics_fn: Optional[Callable[[int, float], None]] = None,
) -> TrainState:
    """Run the flow-matching training loop.

    ``data_iter`` yields batches for ``flow_match_loss`` ({latents, cond, clip_feat,
    sync_feat}). Per-step PRNG keys are folded from (seed, step), so resume is exact.
    """
    init_state, train_step = make_train_step(cfg, optimizer=optimizer, compute_dtype=compute_dtype)
    state = init_state(init_params)

    if resume and ckpt_dir:
        latest = latest_checkpoint(ckpt_dir)
        if latest:
            state = restore_checkpoint(latest, state)
            logger.info(f"resumed from {latest} at step {int(state.step)}")

    jitted = jax.jit(train_step)
    base_key = jax.random.PRNGKey(seed)
    start = int(state.step)
    for step in range(start, num_steps):
        batch = next(data_iter)
        key = jax.random.fold_in(base_key, step)
        state, loss = jitted(state, batch, key)
        if log_every and (step + 1) % log_every == 0:
            loss_v = float(loss)
            logger.info(f"step {step + 1}/{num_steps}: loss {loss_v:.5f}")
            if metrics_fn:
                metrics_fn(step + 1, loss_v)
        if ckpt_dir and ckpt_every and (step + 1) % ckpt_every == 0:
            save_checkpoint(ckpt_dir, state)
    if ckpt_dir:
        save_checkpoint(ckpt_dir, state)
    return state


def train_lora(
    base_params: Dict,
    lora_init: Dict,
    data_iter: Iterator[Dict],
    cfg: MMDiTConfig,
    num_steps: int,
    lora_scale: float = 1.0,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 1000,
    log_every: int = 100,
    seed: int = 0,
    compute_dtype=jnp.float32,
    resume: bool = True,
    optimizer=None,
    metrics_fn: Optional[Callable[[int, float], None]] = None,
) -> LoraTrainState:
    """LoRA fine-tuning loop over a frozen ``base_params`` (``make_lora_train_step``).

    Same contract as :func:`train` — step-keyed PRNG, periodic orbax saves of the LoRA
    state (factors + optimizer moments + step; the frozen base is NOT checkpointed:
    resume passes the same ``base_params``), exact resume. Checkpoints are tiny (the
    point of LoRA) so ``ckpt_every`` can be aggressive."""
    init_state, train_step = make_lora_train_step(
        cfg, base_params, lora_scale=lora_scale, optimizer=optimizer,
        compute_dtype=compute_dtype)
    state = init_state(lora_init)

    def to_tree(s: LoraTrainState) -> Dict:
        return {"lora": s.lora, "opt_state": s.opt_state, "step": s.step}

    if resume and ckpt_dir:
        latest = latest_checkpoint(ckpt_dir)
        if latest:
            from foley_tpu.io.orbax_io import load_params

            tree = load_params(latest, template=to_tree(state))
            state = LoraTrainState(tree["lora"], tree["opt_state"], tree["step"])
            logger.info(f"resumed LoRA from {latest} at step {int(state.step)}")

    jitted = jax.jit(train_step)
    base_key = jax.random.PRNGKey(seed)
    for step in range(int(state.step), num_steps):
        batch = next(data_iter)
        key = jax.random.fold_in(base_key, step)
        state, loss = jitted(state, batch, key)
        if log_every and (step + 1) % log_every == 0:
            loss_v = float(loss)
            logger.info(f"lora step {step + 1}/{num_steps}: loss {loss_v:.5f}")
            if metrics_fn:
                metrics_fn(step + 1, loss_v)
        if ckpt_dir and ckpt_every and (step + 1) % ckpt_every == 0:
            from foley_tpu.io.orbax_io import save_params

            save_params(os.path.join(ckpt_dir, f"step_{int(state.step):08d}"), to_tree(state))
    if ckpt_dir:
        from foley_tpu.io.orbax_io import save_params

        save_params(os.path.join(ckpt_dir, f"step_{int(state.step):08d}"), to_tree(state))
    return state


def export_lora(state: LoraTrainState, path: str, rank: int, scale: float = 1.0) -> str:
    """Save the trained adapter alone (``models/lora.py::save_lora`` layout) — the
    shareable artifact; the loader merges it over any compatible base at load time
    (``HunyuanModelLoader`` lora_path / CLI ``--lora``)."""
    from foley_tpu.models.lora import save_lora

    save_lora(path, state.lora, rank=rank, scale=scale)
    logger.info(f"exported LoRA adapter (step {int(state.step)}) to {path}")
    return path


def export_for_inference(state: TrainState, path: str, latent_stats=None) -> str:
    """Save ONLY the fine-tuned params in the layout ``HunyuanModelLoader`` loads
    (an orbax params dir, same as ``python -m foley_tpu.io.convert`` produces) — the
    train->deploy handoff: training checkpoints carry optimizer state and step for resume;
    the sampler wants the bare pytree.

    ``latent_stats=(mean[C], std[C])`` MUST be passed when the model was trained on
    standardized latents (from-scratch training, ``data.py::latent_stats_from_shards``):
    it is persisted alongside the params and the loader re-attaches it so the sampler
    un-standardizes before DAC decode. Omit for fine-tunes in the raw DAC latent space."""
    import numpy as np

    from foley_tpu.io.orbax_io import save_params

    save_params(path, state.params)
    if latent_stats is not None:
        mean, std = latent_stats
        np.savez(os.path.join(path, "latent_stats.npz"),
                 mean=np.asarray(mean, np.float32), std=np.asarray(std, np.float32))
    logger.info(f"exported inference params (step {int(state.step)}) to {path}"
                + (" with latent stats" if latent_stats is not None else ""))
    return path
