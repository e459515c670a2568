"""DAC GAN discriminators — JAX port of the codec's training adversaries.

Reference ``dac_vae/model/discriminator.py``: multi-period (MPD, periods [2,3,5,7,11]),
multi-scale (MSD), and multi-resolution complex-STFT (MRD, ffts [2048,1024,512], 5 frequency
bands) discriminators, each returning its feature-map pyramid for feature matching. Training
only (SURVEY.md §2.5). Channel-last convs; LeakyReLU(0.1) after every weight-normed conv
except the posts; inputs are DC-removed and peak-normalized to 0.8.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foley_tpu.ops.audio_dsp import hann_window
from foley_tpu.ops.nn import conv1d, conv2d

BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


def _init_conv2d(key, cin, cout, kh, kw, dtype=jnp.float32):
    fan_in = cin * kh * kw
    lim = 1.0 / np.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -lim, lim),
            "b": jax.random.uniform(k2, (cout,), dtype, -lim, lim)}


def _init_conv1d(key, cin, cout, k, groups=1, dtype=jnp.float32):
    fan_in = (cin // groups) * k
    lim = 1.0 / np.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (k, cin // groups, cout), dtype, -lim, lim),
            "b": jax.random.uniform(k2, (cout,), dtype, -lim, lim)}


# ---------------------------------------------------------------------------------
# MPD
# ---------------------------------------------------------------------------------

_MPD_CHANNELS = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]


def init_mpd(key, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, len(_MPD_CHANNELS) + 1)
    convs = [_init_conv2d(k, cin, cout, 5, 1, dtype) for k, (cin, cout) in zip(keys, _MPD_CHANNELS)]
    return {"convs": convs, "post": _init_conv2d(keys[-1], 1024, 1, 3, 1, dtype)}


def apply_mpd(params: Dict, x: jnp.ndarray, period: int) -> List[jnp.ndarray]:
    """x: [B, T, 1] -> feature maps. Reshapes to [B, T/p, p, 1] then 2-D convs with
    (stride 3, 1) over the length axis (reference ``discriminator.py:27-62``). ``period``
    is static (kept out of the param tree so jax.grad sees only float leaves)."""
    t = x.shape[1]
    pad = period - t % period
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
    b = x.shape[0]
    x = x.reshape(b, -1, period, 1)  # [B, L, P, C]
    fmap = []
    for i, conv in enumerate(params["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        x = _leaky(conv2d(x, conv["w"], conv["b"], stride=stride, padding=(2, 0)))
        fmap.append(x)
    x = conv2d(x, params["post"]["w"], params["post"]["b"], padding=(1, 0))
    fmap.append(x)
    return fmap


# ---------------------------------------------------------------------------------
# MSD
# ---------------------------------------------------------------------------------

_MSD_SPECS = [  # (cin, cout, k, stride, groups, pad)
    (1, 16, 15, 1, 1, 7),
    (16, 64, 41, 4, 4, 20),
    (64, 256, 41, 4, 16, 20),
    (256, 1024, 41, 4, 64, 20),
    (1024, 1024, 41, 4, 256, 20),
    (1024, 1024, 5, 1, 1, 2),
]


def init_msd(key, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, len(_MSD_SPECS) + 1)
    convs = [_init_conv1d(k, cin, cout, ksz, groups, dtype)
             for k, (cin, cout, ksz, _, groups, _) in zip(keys, _MSD_SPECS)]
    return {"convs": convs, "post": _init_conv1d(keys[-1], 1024, 1, 3, dtype=dtype)}


def apply_msd(params: Dict, x: jnp.ndarray, rate: int = 1) -> List[jnp.ndarray]:
    """x: [B, T, 1]. rate>1 downsamples with the same polyphase windowed-sinc filter the
    reference applies (``discriminator.py:95-118`` resamples via audiotools -> julius;
    ``ops/audio_dsp.py::resample_poly`` is the transcription). ``rate`` is static."""
    if rate > 1:
        from foley_tpu.ops.audio_dsp import resample_poly

        x = resample_poly(x[..., 0], rate, 1)[..., None]
    fmap = []
    for conv, (_, _, _, stride, groups, pad) in zip(params["convs"], _MSD_SPECS):
        x = _leaky(conv1d(x, conv["w"], conv["b"], stride=stride, padding=pad, groups=groups))
        fmap.append(x)
    x = conv1d(x, params["post"]["w"], params["post"]["b"], padding=1)
    fmap.append(x)
    return fmap


# ---------------------------------------------------------------------------------
# MRD
# ---------------------------------------------------------------------------------

def mrd_band_indices(window_length: int, bands: Sequence = BANDS):
    n_fft_bins = window_length // 2 + 1
    return [(int(b0 * n_fft_bins), int(b1 * n_fft_bins)) for b0, b1 in bands]


def init_mrd(key, dtype=jnp.float32, bands: Sequence = BANDS) -> Dict:
    ch = 32
    keys = jax.random.split(key, len(bands) * 5 + 1)
    band_convs = []
    ki = 0
    for _ in bands:
        convs = [
            _init_conv2d(keys[ki + 0], 2, ch, 3, 9, dtype),
            _init_conv2d(keys[ki + 1], ch, ch, 3, 9, dtype),
            _init_conv2d(keys[ki + 2], ch, ch, 3, 9, dtype),
            _init_conv2d(keys[ki + 3], ch, ch, 3, 9, dtype),
            _init_conv2d(keys[ki + 4], ch, ch, 3, 3, dtype),
        ]
        ki += 5
        band_convs.append(convs)
    return {"band_convs": band_convs, "post": _init_conv2d(keys[-1], ch, 1, 3, 3, dtype)}


def _complex_spectrogram(x: jnp.ndarray, window_length: int) -> jnp.ndarray:
    """[B, T] -> [B, frames, freq, 2] (real/imag channels-last), hop = window/4.

    MRD builds its STFT through audiotools with ``match_stride=True``
    (reference ``discriminator.py:126-131,149-156``): reflect-pad by
    ``((w-h)//2, (w-h)//2 + ceil(T/h)*h - T)``, then a *centered* torch.stft (a further w/2
    reflect pad on the already-padded signal — two-stage reflect, NOT one fused pad), then
    drop the first/last two frames so exactly ``ceil(T/h)`` frames remain. Pinned against
    the reference code in tests/test_reference_oracle_gan.py."""
    w = window_length
    hop = w // 4
    t = x.shape[-1]
    right_pad = -(-t // hop) * hop - t
    p1 = (w - hop) // 2
    xp = jnp.pad(x, ((0, 0), (p1, p1 + right_pad)), mode="reflect")
    xp = jnp.pad(xp, ((0, 0), (w // 2, w // 2)), mode="reflect")
    window = hann_window(w)
    n_frames = 1 + (xp.shape[-1] - w) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(w)[None, :]
    frames = xp[:, idx] * window
    spec = jnp.fft.rfft(frames, axis=-1)[:, 2:-2]  # [B, frames, freq], match_stride trim
    return jnp.stack([spec.real, spec.imag], axis=-1)


def apply_mrd(params: Dict, x: jnp.ndarray, window_length: int,
              bands: Sequence = BANDS) -> List[jnp.ndarray]:
    """x: [B, T, 1] -> feature maps over 5 frequency bands + merged post conv
    (reference ``discriminator.py:101-172``). ``window_length``/``bands`` are static."""
    spec = _complex_spectrogram(x[..., 0], window_length)  # [B, t, f, 2]
    fmap = []
    outs = []
    for (b0, b1), convs in zip(mrd_band_indices(window_length, bands), params["band_convs"]):
        band = spec[:, :, b0:b1, :]  # [B, t, f_band, 2] (NHWC with C=2)
        for i, conv in enumerate(convs):
            if i == 0:
                band = _leaky(conv2d(band, conv["w"], conv["b"], padding=(1, 4)))
            elif i < 4:
                band = _leaky(conv2d(band, conv["w"], conv["b"], stride=(1, 2), padding=(1, 4)))
            else:
                band = _leaky(conv2d(band, conv["w"], conv["b"], padding=(1, 1)))
            fmap.append(band)
        outs.append(band)
    merged = jnp.concatenate(outs, axis=2)  # concat along frequency
    out = conv2d(merged, params["post"]["w"], params["post"]["b"], padding=(1, 1))
    fmap.append(out)
    return fmap


# ---------------------------------------------------------------------------------
# Combined discriminator
# ---------------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    rates: Tuple[int, ...] = ()
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512)
    sample_rate: int = 48000


def init(key, cfg: DiscriminatorConfig, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, len(cfg.periods) + len(cfg.rates) + len(cfg.fft_sizes)))
    return {
        "mpd": [init_mpd(next(keys), dtype) for _ in cfg.periods],
        "msd": [init_msd(next(keys), dtype) for _ in cfg.rates],
        "mrd": [init_mrd(next(keys), dtype) for _ in cfg.fft_sizes],
    }


def preprocess(y: jnp.ndarray) -> jnp.ndarray:
    """DC removal + 0.8 peak normalization (reference ``discriminator.py:207-212``)."""
    y = y - jnp.mean(y, axis=1, keepdims=True)
    peak = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    return 0.8 * y / (peak + 1e-9)


def apply(params: Dict, x: jnp.ndarray,
          cfg: DiscriminatorConfig = DiscriminatorConfig()) -> List[List[jnp.ndarray]]:
    """x: [B, T, 1] waveform -> list of per-discriminator feature-map pyramids.
    ``cfg`` supplies the static periods/rates/fft sizes matching ``init``."""
    x = preprocess(x)
    fmaps = [apply_mpd(p, x, period) for p, period in zip(params["mpd"], cfg.periods)]
    fmaps += [apply_msd(p, x, rate) for p, rate in zip(params["msd"], cfg.rates)]
    fmaps += [apply_mrd(p, x, w) for p, w in zip(params["mrd"], cfg.fft_sizes)]
    return fmaps
