"""Audio DSP: STFT + mel spectrogram with torchaudio-compatible numerics.

The reference builds Synchformer's audio-branch input with
``torchaudio.transforms.MelSpectrogram(sr=16000, win_length=400, hop_length=160, n_fft=1024,
n_mels=128)`` (reference ``synchformer.py:349-355``) followed by log + AST normalization
(``synchformer.py:294-317``). torchaudio isn't available here; this module reimplements the
same math (hann window, centered reflect-pad STFT, power spectrum, HTK-scale triangular mel
filterbank with no normalization) in JAX so it runs on-TPU and is jit-fusable with the AST
encoder. Spectral parity is unit-tested against a direct numpy DFT.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window(periodic=True))."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 * (1.0 - jnp.cos(2.0 * math.pi * n / win_length))


def stft_power(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 400,
    center: bool = True,
) -> jnp.ndarray:
    """Power spectrogram |STFT|^2. x: [..., T] -> [..., n_fft//2+1, frames].

    torchaudio semantics: window zero-padded symmetrically to n_fft; center=True reflect-pads
    the signal by n_fft//2; frame count = 1 + T//hop.
    """
    window = hann_window(win_length)
    pad_left = (n_fft - win_length) // 2
    window = jnp.pad(window, (pad_left, n_fft - win_length - pad_left))

    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")

    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]          # [frames, n_fft]
    frames = x[..., idx] * window                                # [..., frames, n_fft]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)                # [..., frames, n_fft//2+1]
    power = jnp.abs(spec) ** 2
    return jnp.swapaxes(power, -1, -2)                           # [..., freq, frames]


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int = 513,
    n_mels: int = 128,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> jnp.ndarray:
    """[n_freqs, n_mels] HTK triangular filterbank, no normalization (torchaudio defaults)."""
    f_max = f_max or sample_rate / 2.0
    freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(mel_pts)
    # triangle slopes (torchaudio functional._create_triangular_filterbank)
    f_diff = f_pts[1:] - f_pts[:-1]                         # [n_mels+1]
    slopes = f_pts[None, :] - freqs[:, None]                # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return jnp.asarray(fb, jnp.float32)


def _hz_to_mel_slaney(f):
    """librosa hz_to_mel(htk=False): linear below 1 kHz, log-spaced above."""
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep, f / f_sp)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


def mel_filterbank_slaney_np(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """[n_freqs, n_mels] Slaney-scale, Slaney-normalized filterbank (librosa.filters.mel
    defaults: htk=False, norm='slaney').

    audiotools' ``AudioSignal.mel_spectrogram`` — which the reference's DAC
    ``MelSpectrogramLoss`` (``dac_vae/nn/loss.py:231-328``) is built on — constructs its mel
    basis with ``librosa.filters.mel`` at these defaults. librosa/audiotools are absent in
    this image; this numpy transcription of the librosa formula is the shared assumption the
    literal-reference GAN oracle (tests/test_reference_oracle_gan.py) documents as its
    audiotools boundary."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    fftfreqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_f = _mel_to_hz_slaney(
        np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2)
    )
    fdiff = np.diff(mel_f)                                  # [n_mels+1]
    ramps = mel_f[:, None] - fftfreqs[None, :]              # [n_mels+2, n_freqs]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))     # [n_mels, n_freqs]
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])  # slaney area normalization
    weights = weights * enorm[:, None]
    return weights.T.astype(np.float32)                     # [n_freqs, n_mels]


@functools.lru_cache(maxsize=8)
def mel_filterbank_slaney(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> jnp.ndarray:
    return jnp.asarray(mel_filterbank_slaney_np(n_freqs, n_mels, sample_rate, f_min, f_max))


def mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 400,
    n_mels: int = 128,
) -> jnp.ndarray:
    """x: [..., T] waveform -> [..., n_mels, frames] power mel spectrogram."""
    power = stft_power(x, n_fft, hop_length, win_length)     # [..., freq, frames]
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate)
    return jnp.einsum("...ft,fm->...mt", power, fb)


def sync_audio_spectrogram(x: jnp.ndarray, max_spec_t: int = 66) -> jnp.ndarray:
    """The full Synchformer audio preprocessing (reference ``synchformer.py:294-317``):
    mel -> log(x + 1e-6) -> pad/truncate time to 66 -> AST normalize ((x - mean)/(2*std)).
    x: [..., T] 16 kHz waveform -> [..., 128, 66]."""
    mel = mel_spectrogram(x)
    logmel = jnp.log(mel + 1e-6)
    t = logmel.shape[-1]
    if t < max_spec_t:
        logmel = jnp.pad(logmel, [(0, 0)] * (logmel.ndim - 1) + [(0, max_spec_t - t)])
    elif t > max_spec_t:
        logmel = logmel[..., :max_spec_t]
    mean, std = -4.2677393, 4.5689974
    return (logmel - mean) / (2 * std)


def segment_audio(x: jnp.ndarray, segment_size: int = 10240, step_size: int = 5120) -> jnp.ndarray:
    """[B, T] 16 kHz waveform -> [B, S, segment_size] windows, stride step_size
    (reference ``synchformer.py:299-306``)."""
    t = x.shape[-1]
    num = (t - segment_size) // step_size + 1
    starts = jnp.arange(max(num, 1)) * step_size
    idx = starts[:, None] + jnp.arange(segment_size)[None, :]
    return x[..., idx]


def _sinc_resample_kernel(old_sr: int, new_sr: int, zeros: int, rolloff: float):
    """Polyphase windowed-sinc kernel bank, julius ``ResampleFrac`` construction: one
    length-(2*width + old_sr) FIR per output phase, Hann^2 (= cos^2) windowed sinc at
    cutoff ``min(old, new) * rolloff``, scaled by cutoff/old_sr. Returns
    (kernel [new_sr, K] float32, width)."""
    sr = min(new_sr, old_sr) * rolloff
    width = math.ceil(zeros * old_sr / sr)
    idx = np.arange(-width, width + old_sr, dtype=np.float64)
    kernels = []
    for i in range(new_sr):
        t = np.clip((-i / new_sr + idx / old_sr) * sr, -zeros, zeros) * np.pi
        window = np.cos(t / zeros / 2) ** 2
        kernels.append(np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * window)
    return np.stack(kernels).astype(np.float32) * np.float32(sr / old_sr), width


def resample_poly(
    x: jnp.ndarray, orig_sr: int, target_sr: int, zeros: int = 24, rolloff: float = 0.945
) -> jnp.ndarray:
    """Polyphase sinc resampling of ``x [..., T]`` from ``orig_sr`` to ``target_sr``.

    Transcribes julius ``resample_frac`` (the backend of audiotools
    ``AudioSignal.resample``, which the reference's MSD uses for its rate>1 branch,
    ``dac_vae/model/discriminator.py:95-118``): zero-pad (width, width + old_sr), one
    strided conv per output phase (stride = reduced old_sr), interleave phases, trim to
    ``int(target_sr * T / orig_sr)`` samples. julius isn't installable in this image, so
    this is a from-the-paper reimplementation validated by property tests
    (tests/test_dac_training.py::test_resample_poly_properties: bandlimited tones
    reconstruct; above-Nyquist content is rejected) rather than a literal-code oracle
    pin."""
    old_sr = int(orig_sr)
    new_sr = int(target_sr)
    g = math.gcd(old_sr, new_sr)
    old_sr //= g
    new_sr //= g
    if old_sr == new_sr:
        return x
    length = x.shape[-1]
    kernel, width = _sinc_resample_kernel(old_sr, new_sr, zeros, rolloff)
    lead = x.shape[:-1]
    xp = jnp.pad(x.reshape((-1, 1, length)), ((0, 0), (0, 0), (width, width + old_sr)))
    # [B, new_sr phases, T'] — one dot-general, all phases share the strided input windows
    ys = jax.lax.conv_general_dilated(
        xp.astype(jnp.float32), jnp.asarray(kernel)[:, None, :],
        window_strides=(old_sr,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = jnp.swapaxes(ys, 1, 2).reshape((ys.shape[0], -1))  # interleave phases in time
    return y[..., : int(new_sr * length / old_sr)].reshape(lead + (-1,)).astype(x.dtype)
