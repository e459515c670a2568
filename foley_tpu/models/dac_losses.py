"""DAC training losses — JAX equivalents of the codec's vendored loss suite.

Reference ``dac_vae/nn/loss.py``: L1 waveform loss, SI-SDR, multi-scale STFT loss
(log-magnitude + magnitude L1 over window sizes), mel-spectrogram loss, and the HiFi-GAN-style
adversarial + feature-matching losses. Training-only in the reference (SURVEY.md §2.5);
provided here as pure functions for the training capability.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from foley_tpu.ops.audio_dsp import hann_window, mel_filterbank_slaney


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def sisdr_loss(x: jnp.ndarray, y: jnp.ndarray, zero_mean: bool = True,
               clip_min: float = None, eps: float = 1e-8) -> jnp.ndarray:
    """Negative scale-invariant SDR (reference ``loss.py:51-140``). x=estimate, y=reference,
    shapes [..., T]. Returns the mean negative SI-SDR in dB (lower is better)."""
    if zero_mean:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
        y = y - jnp.mean(y, axis=-1, keepdims=True)
    dot = jnp.sum(x * y, axis=-1, keepdims=True)
    s_ref_energy = jnp.sum(y * y, axis=-1, keepdims=True) + eps
    proj = dot * y / s_ref_energy
    noise = x - proj
    ratio = (jnp.sum(proj * proj, axis=-1) + eps) / (jnp.sum(noise * noise, axis=-1) + eps)
    sdr = 10.0 * jnp.log10(ratio)
    if clip_min is not None:
        sdr = jnp.maximum(sdr, clip_min)
    return -jnp.mean(sdr)


def _stft_mag(x: jnp.ndarray, window_length: int, hop: int) -> jnp.ndarray:
    """Magnitude STFT [..., freq, frames] (hann window, centered)."""
    window = hann_window(window_length)
    pad = window_length // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = xp.shape[-1]
    n_frames = 1 + (t - window_length) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(window_length)[None, :]
    frames = xp[..., idx] * window
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.swapaxes(jnp.abs(spec), -1, -2)


def multiscale_stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    window_lengths: Sequence[int] = (2048, 512),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
    pow: float = 2.0,
) -> jnp.ndarray:
    """Multi-scale STFT loss (reference ``loss.py:142-228``): for each window,
    L1 on log10(mag^pow) + L1 on mag, hop = window/4."""
    loss = jnp.zeros(())
    for w in window_lengths:
        mx = _stft_mag(x, w, w // 4)
        my = _stft_mag(y, w, w // 4)
        loss = loss + log_weight * l1_loss(
            jnp.log10(jnp.maximum(mx, clamp_eps) ** pow),
            jnp.log10(jnp.maximum(my, clamp_eps) ** pow),
        )
        loss = loss + mag_weight * l1_loss(mx, my)
    return loss


def mel_spectrogram_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    sample_rate: int = 48000,
    n_mels: Sequence[int] = (150, 80),
    window_lengths: Sequence[int] = (2048, 512),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
    pow: float = 2.0,
) -> jnp.ndarray:
    """Mel-spectrogram loss (reference ``loss.py:231-368``).

    audiotools' ``mel_spectrogram`` applies a librosa-slaney mel basis to the *magnitude*
    STFT (not the power spectrum) — pinned vs the reference's literal loss code in
    tests/test_reference_oracle_gan.py."""
    loss = jnp.zeros(())
    for mels, w in zip(n_mels, window_lengths):
        mx = _stft_mag(x, w, w // 4)
        my = _stft_mag(y, w, w // 4)
        fb = mel_filterbank_slaney(w // 2 + 1, mels, sample_rate)
        mel_x = jnp.einsum("...ft,fm->...mt", mx, fb)
        mel_y = jnp.einsum("...ft,fm->...mt", my, fb)
        loss = loss + log_weight * l1_loss(
            jnp.log10(jnp.maximum(mel_x, clamp_eps) ** pow),
            jnp.log10(jnp.maximum(mel_y, clamp_eps) ** pow),
        )
        loss = loss + mag_weight * l1_loss(mel_x, mel_y)
    return loss


# ---------------------------------------------------------------------------------
# GAN losses (HiFi-GAN style, reference GANLoss in loss.py)
# ---------------------------------------------------------------------------------

def discriminator_loss(real_fmaps: List[List[jnp.ndarray]],
                       fake_fmaps: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """LSGAN discriminator loss over the final logits of each sub-discriminator."""
    loss = jnp.zeros(())
    for real, fake in zip(real_fmaps, fake_fmaps):
        loss = loss + jnp.mean(jnp.square(1.0 - real[-1])) + jnp.mean(jnp.square(fake[-1]))
    return loss


def generator_adv_loss(fake_fmaps: List[List[jnp.ndarray]]) -> jnp.ndarray:
    loss = jnp.zeros(())
    for fake in fake_fmaps:
        loss = loss + jnp.mean(jnp.square(1.0 - fake[-1]))
    return loss


def feature_matching_loss(real_fmaps: List[List[jnp.ndarray]],
                          fake_fmaps: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """L1 between real/fake intermediate feature maps (all but the final logits)."""
    loss = jnp.zeros(())
    for real, fake in zip(real_fmaps, fake_fmaps):
        for r, f in zip(real[:-1], fake[:-1]):
            loss = loss + l1_loss(f, jax.lax.stop_gradient(r))
    return loss
