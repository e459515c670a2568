"""Codec file I/O + chunked compress/decompress — the CodecMixin/DACFile equivalent.

Reference ``dac_vae/model/base.py``: receptive-field/delay computation and chunked
compress/decompress of arbitrarily long audio into ``.dac`` artifacts. The foley inference
path never uses it (``_audiotools_stubs.py`` note), but it is part of the codec's capability
surface. TPU-native re-design: fixed-size hop-aligned chunks (static shapes => one XLA
compilation, chunks batched through the encoder/decoder on the MXU) instead of the
reference's python-loop-with-delay-trimming; artifacts are ``.npz`` with the same metadata
(sample rate, chunk layout, original length).

For the continuous VAE branch the artifact stores mean latents; for the discrete branch it
stores RVQ codes (int16).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from foley_tpu.configs import DACConfig
from foley_tpu.models import dac_vae


@dataclasses.dataclass
class DACFile:
    """In-memory codec artifact (reference ``base.py`` DACFile)."""

    payload: np.ndarray          # latents [n_chunks, T_lat, D] or codes [n_chunks, N, T_lat]
    is_codes: bool
    sample_rate: int
    original_length: int         # samples
    chunk_samples: int

    def save(self, path: str) -> str:
        np.savez(
            path,
            payload=self.payload,
            is_codes=self.is_codes,
            sample_rate=self.sample_rate,
            original_length=self.original_length,
            chunk_samples=self.chunk_samples,
        )
        return path

    @classmethod
    def load(cls, path: str) -> "DACFile":
        z = np.load(path)
        return cls(
            payload=z["payload"],
            is_codes=bool(z["is_codes"]),
            sample_rate=int(z["sample_rate"]),
            original_length=int(z["original_length"]),
            chunk_samples=int(z["chunk_samples"]),
        )


def codec_delay(cfg: DACConfig) -> int:
    """Latency of the encode->decode round trip in samples.

    All convs here use symmetric same-length padding and the transposed convs invert the
    strides exactly, so the round trip is hop-aligned with zero structural delay — unlike
    the reference, whose unpadded chunk-border handling makes it compute a per-layer
    receptive-field delay (``base.py:18-120``)."""
    return 0


def compress(
    params: Dict,
    audio: np.ndarray,
    cfg: DACConfig,
    win_duration_s: float = 5.0,
    key=None,
) -> DACFile:
    """audio [T] or [T, 1] float -> chunked latent artifact.

    Chunks are hop-aligned and fixed-size (last chunk zero-padded), so every chunk reuses one
    compiled encoder executable and the batch dimension feeds the MXU.
    """
    wav = np.asarray(audio, np.float32).reshape(-1)
    original = wav.shape[0]
    chunk = int(win_duration_s * cfg.sample_rate)
    chunk = int(math.ceil(chunk / cfg.hop_length) * cfg.hop_length)
    n_chunks = max(1, math.ceil(original / chunk))
    padded = np.zeros((n_chunks * chunk,), np.float32)
    padded[:original] = wav
    batch = jnp.asarray(padded.reshape(n_chunks, chunk, 1))
    posterior = dac_vae.encode(params, batch, cfg)
    latents = np.asarray(posterior.mode())  # deterministic artifact
    return DACFile(
        payload=latents,
        is_codes=False,
        sample_rate=cfg.sample_rate,
        original_length=original,
        chunk_samples=chunk,
    )


def decompress(params: Dict, artifact: DACFile, cfg: DACConfig) -> np.ndarray:
    """Artifact -> waveform [original_length] float32."""
    if artifact.is_codes:
        from foley_tpu.models import quantize
        from foley_tpu.models.quantize import RVQConfig

        z = quantize.from_codes(params["rvq"], jnp.asarray(artifact.payload))
        audio = dac_vae.decode(params, z, cfg)
    else:
        audio = dac_vae.decode(params, jnp.asarray(artifact.payload), cfg)
    wav = np.asarray(audio)[..., 0].reshape(-1)
    return wav[: artifact.original_length]
