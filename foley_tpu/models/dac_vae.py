"""Continuous DAC-VAE audio codec — TPU-native functional implementation.

Parity target: the reference's vendored Descript audio codec in continuous-VAE mode
(``models/dac_vae/model/dac.py``), instantiated with encoder_dim 128, rates [2,3,4,5,8],
latent 128, decoder_dim 2048, rates [8,5,4,3,2], 48 kHz (``utils.py:32-44``). The decode path
is the audio hot path: post_quant_conv -> WNConv1d k7 -> 5x DecoderBlock (Snake ->
WNConvTranspose1d k=2s -> 3 dilated ResidualUnits) -> Snake -> WNConv1d k7 -> tanh
(``dac.py:98-149``), total upsample x960 => 48k samples/s.

TPU-first differences:
- channel-last [B, T, C] throughout (weights in [K, in, out]);
- torch ``weight_norm`` parametrizations are folded into plain conv weights at load time
  (``fold_weight_norm``) — the hot path runs bare convs the MXU can tile;
- decode runs in fp32 (the reference moves DAC to fp32 for decode, ``nodes.py:398``),
  under one ``jit`` so XLA fuses all Snake activations into the surrounding convs.

The encoder + diagonal-Gaussian posterior are implemented for round-trip tests and encode
parity (``dac.py:236-278``, ``nn/vae_utils.py:24-91``); inference uses decode only.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from foley_tpu.configs import DACConfig
from foley_tpu.ops.activations import snake
from foley_tpu.ops.nn import conv1d, conv_transpose1d


# ---------------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------------

def _init_conv(key, in_dim, out_dim, k, dtype, bias=True):
    # Fan-in-scaled init (the reference uses trunc_normal(0.02) everywhere, dac.py:22-25,
    # which attenuates the signal to ~1e-8 through the ~20-conv decode stack; He-style
    # scaling keeps random-weight smoke runs audible. Checkpoint loads overwrite this.)
    std = (2.0 / (in_dim * k)) ** 0.5
    p = {"w": std * jax.random.truncated_normal(key, -2.0, 2.0, (k, in_dim, out_dim), jnp.float32).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def _init_residual_unit(key, dim, dilation, dtype) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "alpha1": jnp.ones((dim,), dtype),
        "conv1": _init_conv(k1, dim, dim, 7, dtype),
        "alpha2": jnp.ones((dim,), dtype),
        "conv2": _init_conv(k2, dim, dim, 1, dtype),
    }


def _init_decoder_block(key, in_dim, out_dim, stride, dtype) -> Dict:
    keys = jax.random.split(key, 4)
    return {
        "alpha": jnp.ones((in_dim,), dtype),
        "conv_t": _init_conv(keys[0], in_dim, out_dim, 2 * stride, dtype),
        "res": [_init_residual_unit(keys[i + 1], out_dim, d, dtype) for i, d in enumerate((1, 3, 9))],
    }


def _init_encoder_block(key, out_dim, stride, dtype) -> Dict:
    keys = jax.random.split(key, 4)
    return {
        "res": [_init_residual_unit(keys[i], out_dim // 2, d, dtype) for i, d in enumerate((1, 3, 9))],
        "alpha": jnp.ones((out_dim // 2,), dtype),
        "conv_d": _init_conv(keys[3], out_dim // 2, out_dim, 2 * stride, dtype),
    }


def init(key, cfg: DACConfig, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 32))
    d = cfg.decoder_dim
    decoder: Dict = {"conv_in": _init_conv(next(keys), cfg.latent_dim, d, 7, dtype), "blocks": []}
    out_dim = d
    for i, stride in enumerate(cfg.decoder_rates):
        in_dim, out_dim = d // (2 ** i), d // (2 ** (i + 1))
        decoder["blocks"].append(_init_decoder_block(next(keys), in_dim, out_dim, stride, dtype))
    decoder["alpha_out"] = jnp.ones((out_dim,), dtype)
    decoder["conv_out"] = _init_conv(next(keys), out_dim, 1, 7, dtype)

    e = cfg.encoder_dim
    encoder: Dict = {"conv_in": _init_conv(next(keys), 1, e, 7, dtype), "blocks": []}
    dim = e
    for stride in cfg.encoder_rates:
        dim *= 2
        encoder["blocks"].append(_init_encoder_block(next(keys), dim, stride, dtype))
    encoder["alpha_out"] = jnp.ones((dim,), dtype)
    encoder["conv_out"] = _init_conv(next(keys), dim, cfg.latent_dim, 3, dtype)

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _init_conv(next(keys), cfg.latent_dim, 2 * cfg.latent_dim, 1, dtype),
        "post_quant_conv": _init_conv(next(keys), cfg.latent_dim, cfg.latent_dim, 1, dtype),
    }


# ---------------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------------

def _residual_unit(p: Dict, x: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """Snake -> conv k7 dilated -> Snake -> conv k1, residual add (reference dac.py:28-44).

    With pad=(7-1)*dilation//2 the branch preserves length, so the reference's residual
    center-crop is a no-op here.
    """
    pad = ((7 - 1) * dilation) // 2
    y = snake(x, p["alpha1"])
    y = conv1d(y, p["conv1"]["w"], p["conv1"].get("b"), padding=pad, dilation=dilation)
    y = snake(y, p["alpha2"])
    y = conv1d(y, p["conv2"]["w"], p["conv2"].get("b"))
    return x + y


def _decoder_block(p: Dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    x = snake(x, p["alpha"])
    x = conv_transpose1d(
        x, p["conv_t"]["w"], p["conv_t"].get("b"),
        stride=stride, padding=math.ceil(stride / 2), output_padding=stride % 2,
    )
    for unit, dilation in zip(p["res"], (1, 3, 9)):
        x = _residual_unit(unit, x, dilation)
    return x


def decode(params: Dict, z: jnp.ndarray, cfg: DACConfig) -> jnp.ndarray:
    """Latents [B, T, latent_dim] -> waveform [B, T*hop, 1] (fp32 hot path)."""
    x = z.astype(jnp.float32)
    p = params["post_quant_conv"]
    x = conv1d(x, p["w"], p.get("b"))
    dec = params["decoder"]
    x = conv1d(x, dec["conv_in"]["w"], dec["conv_in"].get("b"), padding=3)
    for block, stride in zip(dec["blocks"], cfg.decoder_rates):
        x = _decoder_block(block, x, stride)
    x = snake(x, dec["alpha_out"])
    x = conv1d(x, dec["conv_out"]["w"], dec["conv_out"].get("b"), padding=3)
    return jnp.tanh(x)


# Decoder receptive field in latent frames: conv_in k7 contributes +-3; each block's
# transposed conv +-~2 and dilated residual stack +-39 samples at its own resolution,
# divided back by the cumulative upsample (rates [8,5,4,3,2] -> +-4.9, +-1.0, +-0.24, ...);
# total ~+-12 latent frames. 32 gives a 2.6x safety margin for ~3% extra decode work.
_DECODE_OVERLAP = 32


def decode_chunked(
    params: Dict,
    z: jnp.ndarray,
    cfg: DACConfig,
    chunk_frames: int,
    overlap_frames: int = _DECODE_OVERLAP,
) -> jnp.ndarray:
    """``decode`` in time chunks: same output, ~``chunk/T`` of the HLO-temp footprint.

    Long-form motivation: at 60 s (T=3000 latent frames) a single full-length decode
    materializes four ~1.37 GiB fp32 intermediates ([1, 2.88M, 64] tile-padded 2x because
    C=64 < the 128-lane tile) and OOMs a 16 GiB chip by ~340 MB next to the XXL bf16
    weights. The reference solves the same problem with windowed CodecMixin inference
    (``dac_vae/model/base.py:178-244``, overlap-trim over chunks); this is the TPU version:
    interior windows run under ``lax.map`` so XLA allocates ONE window's temps and reuses
    them sequentially.

    Exactness (not an approximation): every kept output sample sees >= ``overlap_frames``
    latent frames of true context on each interior side, and head/tail windows start/end at
    the true sequence edges so the per-layer conv zero-padding there matches the full
    decode's. ``overlap_frames`` (32) >> the decoder's ~12-frame receptive field
    (test_dac::test_decode_chunked_exact).
    """
    B, T, D = z.shape
    ov = overlap_frames
    n = max(1, -(-T // chunk_frames))
    if n >= 2 and T - (n - 1) * chunk_frames < ov:
        n -= 1  # merge a too-short tail into the last window so interior slices stay in range
    if n == 1 or T <= chunk_frames + ov:
        return decode(params, z, cfg)
    hop = cfg.hop_length
    tail_frames = T - (n - 1) * chunk_frames

    head = decode(params, z[:, : chunk_frames + ov], cfg)[:, : chunk_frames * hop]
    parts = [head]
    if n > 2:
        win = chunk_frames + 2 * ov
        starts = jnp.arange(1, n - 1, dtype=jnp.int32) * chunk_frames - ov

        def one_window(start):
            w = jax.lax.dynamic_slice_in_dim(z, start, win, axis=1)
            y = decode(params, w, cfg)
            return jax.lax.dynamic_slice_in_dim(y, ov * hop, chunk_frames * hop, axis=1)

        mid = jax.lax.map(one_window, starts)  # [n-2, B, chunk*hop, 1]
        parts.append(jnp.moveaxis(mid, 0, 1).reshape(B, (n - 2) * chunk_frames * hop, 1))
    tail = decode(params, z[:, T - (tail_frames + ov):], cfg)[:, ov * hop:]
    parts.append(tail)
    return jnp.concatenate(parts, axis=1)


def _encoder_block(p: Dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    for unit, dilation in zip(p["res"], (1, 3, 9)):
        x = _residual_unit(unit, x, dilation)
    x = snake(x, p["alpha"])
    return conv1d(
        x, p["conv_d"]["w"], p["conv_d"].get("b"),
        stride=stride, padding=math.ceil(stride / 2),
    )


class GaussianPosterior(NamedTuple):
    """Diagonal Gaussian over latents (reference ``nn/vae_utils.py:24-91``)."""

    mean: jnp.ndarray
    logvar: jnp.ndarray

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self):
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + jnp.exp(self.logvar) - 1.0 - self.logvar, axis=(1, 2)
        )


def encode(params: Dict, audio: jnp.ndarray, cfg: DACConfig) -> GaussianPosterior:
    """Waveform [B, T, 1] -> posterior over latents [B, T/hop, latent_dim]."""
    x = audio.astype(jnp.float32)
    enc = params["encoder"]
    x = conv1d(x, enc["conv_in"]["w"], enc["conv_in"].get("b"), padding=3)
    for block, stride in zip(enc["blocks"], cfg.encoder_rates):
        x = _encoder_block(block, x, stride)
    x = snake(x, enc["alpha_out"])
    x = conv1d(x, enc["conv_out"]["w"], enc["conv_out"].get("b"), padding=1)
    q = params["quant_conv"]
    moments = conv1d(x, q["w"], q.get("b"))
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return GaussianPosterior(mean, logvar)


def preprocess(audio: jnp.ndarray, cfg: DACConfig) -> jnp.ndarray:
    """Right-pad to a hop multiple (reference dac.py:225-234). audio: [B, T, 1]."""
    length = audio.shape[1]
    right = math.ceil(length / cfg.hop_length) * cfg.hop_length - length
    if right:
        audio = jnp.pad(audio, ((0, 0), (0, right), (0, 0)))
    return audio
