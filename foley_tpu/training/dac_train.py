"""DAC codec training: assembled generator/discriminator steps.

The reference vendors the DAC training artifacts but never wires them (SURVEY.md §2.5 —
discriminators and losses are dormant). Here they compose into working train steps:

- generator step: VAE encode (sample) -> decode -> L1 + multi-scale STFT + mel losses +
  KL (continuous branch) + LSGAN adversarial + feature matching, all through ``jax.grad``;
- discriminator step: LSGAN real/fake loss over the MPD/MSD/MRD pyramids.

Loss weights follow the published DAC recipe (mel 15, adv 1, fm 2, plus kl 1e-4 here for
the VAE branch). Both steps are jit/pjit-ready pure functions.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from foley_tpu.configs import DACConfig
from foley_tpu.models import dac_discriminator, dac_losses, dac_vae
from foley_tpu.models.dac_discriminator import DiscriminatorConfig


class DACTrainState(NamedTuple):
    gen_params: Dict
    disc_params: Dict
    gen_opt: optax.OptState
    disc_opt: optax.OptState
    step: jnp.ndarray


class LossWeights(NamedTuple):
    waveform_l1: float = 1.0
    stft: float = 1.0
    mel: float = 15.0
    adv: float = 1.0
    feature_matching: float = 2.0
    kl: float = 1e-4


def make_dac_train_steps(
    cfg: DACConfig,
    disc_cfg: DiscriminatorConfig = None,
    weights: LossWeights = LossWeights(),
    gen_lr: float = 1e-4,
    disc_lr: float = 1e-4,
    stft_windows=(2048, 512),
    mel_cfg=((150, 2048), (80, 512)),
):
    disc_cfg = disc_cfg or DiscriminatorConfig(sample_rate=cfg.sample_rate)
    gen_tx = optax.adamw(gen_lr, b1=0.8, b2=0.99)
    disc_tx = optax.adamw(disc_lr, b1=0.8, b2=0.99)

    def init_state(gen_params: Dict, disc_params: Dict) -> DACTrainState:
        return DACTrainState(
            gen_params, disc_params,
            gen_tx.init(gen_params), disc_tx.init(disc_params),
            jnp.zeros((), jnp.int32),
        )

    def _reconstruct(gen_params, audio, key):
        posterior = dac_vae.encode(gen_params, audio, cfg)
        z = posterior.sample(key)
        recon = dac_vae.decode(gen_params, z, cfg)
        # decoder output length equals input length for hop-aligned inputs
        return recon, posterior

    def gen_loss_fn(gen_params, disc_params, audio, key):
        recon, posterior = _reconstruct(gen_params, audio, key)
        x, y = recon[..., 0], audio[..., 0]
        losses = {
            "l1": dac_losses.l1_loss(x, y),
            "stft": dac_losses.multiscale_stft_loss(x, y, window_lengths=stft_windows),
            "mel": dac_losses.mel_spectrogram_loss(
                x, y, sample_rate=cfg.sample_rate,
                n_mels=[m for m, _ in mel_cfg], window_lengths=[w for _, w in mel_cfg],
            ),
            "kl": jnp.mean(posterior.kl()),
        }
        fake_fmaps = dac_discriminator.apply(disc_params, recon, disc_cfg)
        real_fmaps = dac_discriminator.apply(disc_params, audio, disc_cfg)
        losses["adv"] = dac_losses.generator_adv_loss(fake_fmaps)
        losses["fm"] = dac_losses.feature_matching_loss(real_fmaps, fake_fmaps)
        total = (
            weights.waveform_l1 * losses["l1"]
            + weights.stft * losses["stft"]
            + weights.mel * losses["mel"]
            + weights.kl * losses["kl"]
            + weights.adv * losses["adv"]
            + weights.feature_matching * losses["fm"]
        )
        return total, losses

    def disc_loss_fn(disc_params, gen_params, audio, key):
        recon, _ = _reconstruct(gen_params, audio, key)
        recon = jax.lax.stop_gradient(recon)
        real = dac_discriminator.apply(disc_params, audio, disc_cfg)
        fake = dac_discriminator.apply(disc_params, recon, disc_cfg)
        return dac_losses.discriminator_loss(real, fake)

    def train_step(state: DACTrainState, audio: jnp.ndarray, key) -> Tuple[DACTrainState, Dict]:
        """audio: [B, T, 1] hop-aligned waveforms. Runs D update then G update."""
        k_d, k_g = jax.random.split(key)
        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
            state.disc_params, state.gen_params, audio, k_d
        )
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        (g_loss, parts), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params, disc_params, audio, k_g
        )
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics = {"g_total": g_loss, "d_total": d_loss, **parts}
        return DACTrainState(gen_params, disc_params, gen_opt, disc_opt, state.step + 1), metrics

    return init_state, train_step
