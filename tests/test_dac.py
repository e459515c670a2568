"""DAC-VAE tests: shape/upsample contracts, a golden DecoderBlock check against a torch
transcription of the reference geometry, and encode/decode round trips (tiny config)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from foley_tpu.configs import TINY, DACConfig
from foley_tpu.models import dac_vae

CFG = TINY.dac  # tiny dims, real rates (hop 960)


@pytest.fixture(scope="module")
def params():
    return dac_vae.init(jax.random.PRNGKey(0), CFG)


def test_decode_shape_and_range(params):
    T = 25
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, T, CFG.latent_dim)).astype(np.float32))
    audio = dac_vae.decode(params, z, CFG)
    assert audio.shape == (2, T * CFG.hop_length, 1)
    a = np.asarray(audio)
    assert np.all(np.isfinite(a)) and np.all(np.abs(a) <= 1.0)  # tanh output


@pytest.mark.parametrize(
    "T,chunk",
    [
        (200, 48),   # head + interiors + tail, uneven tail (200 = 4*48 + 8 < ov -> merged)
        (96, 48),    # n == 2: head + tail only
        (150, 48),   # interior windows present, tail 6 < ov merged into last window
        (40, 48),    # T <= chunk: falls back to full decode
        (113, 37),   # prime-ish sizes
    ],
)
def test_decode_chunked_exact(params, T, chunk):
    """Chunked decode is bit-level-close to full decode (overlap >> receptive field)."""
    b = 2 if T == 150 else 1  # one case exercises the batched reshape path
    z = jnp.asarray(np.random.default_rng(1).normal(size=(b, T, CFG.latent_dim)).astype(np.float32))
    full = np.asarray(dac_vae.decode(params, z, CFG))
    chunked = np.asarray(dac_vae.decode_chunked(params, z, CFG, chunk, overlap_frames=16))
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, atol=1e-5, rtol=1e-5)


def test_encode_shape(params):
    T = 2 * CFG.hop_length
    audio = jnp.asarray(np.random.default_rng(1).normal(size=(1, T, 1)).astype(np.float32) * 0.1)
    post = dac_vae.encode(params, audio, CFG)
    assert post.mean.shape == (1, 2, CFG.latent_dim)
    assert post.logvar.shape == (1, 2, CFG.latent_dim)
    z = post.sample(jax.random.PRNGKey(0))
    assert z.shape == post.mean.shape


def test_roundtrip_lengths(params):
    """encode(decode(z)) preserves the latent frame count (hop-aligned)."""
    z = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, CFG.latent_dim)).astype(np.float32))
    audio = dac_vae.decode(params, z, CFG)
    post = dac_vae.encode(params, audio, CFG)
    assert post.mean.shape[1] == 4


def test_preprocess_pads_to_hop(params):
    audio = jnp.zeros((1, CFG.hop_length + 7, 1))
    padded = dac_vae.preprocess(audio, CFG)
    assert padded.shape[1] == 2 * CFG.hop_length


class TorchDecoderBlock(torch.nn.Module):
    """Transcription of the reference DecoderBlock geometry (dac.py:98-117) with weight norm
    pre-folded, for golden comparison."""

    def __init__(self, in_dim, out_dim, stride):
        super().__init__()
        self.stride = stride
        self.alpha = torch.nn.Parameter(torch.rand(1, in_dim, 1) + 0.5)
        self.conv_t = torch.nn.ConvTranspose1d(
            in_dim, out_dim, 2 * stride, stride=stride,
            padding=math.ceil(stride / 2), output_padding=stride % 2,
        )
        self.res = torch.nn.ModuleList()
        for d in (1, 3, 9):
            unit = torch.nn.ModuleDict(
                dict(
                    conv1=torch.nn.Conv1d(out_dim, out_dim, 7, dilation=d, padding=((7 - 1) * d) // 2),
                    conv2=torch.nn.Conv1d(out_dim, out_dim, 1),
                )
            )
            unit.alpha1 = torch.nn.Parameter(torch.rand(1, out_dim, 1) + 0.5)
            unit.alpha2 = torch.nn.Parameter(torch.rand(1, out_dim, 1) + 0.5)
            self.res.append(unit)

    @staticmethod
    def snake(x, alpha):
        return x + (alpha + 1e-9).reciprocal() * torch.sin(alpha * x).pow(2)

    def forward(self, x):
        x = self.snake(x, self.alpha)
        x = self.conv_t(x)
        for unit in self.res:
            y = self.snake(x, unit.alpha1)
            y = unit.conv1(y)
            y = self.snake(y, unit.alpha2)
            y = unit.conv2(y)
            x = x + y
        return x


@pytest.mark.parametrize("stride", [8, 2])
def test_decoder_block_matches_torch(stride):
    torch.manual_seed(0)
    in_dim, out_dim, T = 8, 4, 11
    tb = TorchDecoderBlock(in_dim, out_dim, stride)
    x = torch.randn(1, in_dim, T)
    with torch.no_grad():
        expected = tb(x)

    def j(t):
        return jnp.asarray(t.detach().numpy())

    jp = {
        "alpha": j(tb.alpha)[0, :, 0],
        "conv_t": {"w": j(tb.conv_t.weight.permute(2, 0, 1)), "b": j(tb.conv_t.bias)},
        "res": [
            {
                "alpha1": j(u.alpha1)[0, :, 0],
                "conv1": {"w": j(u.conv1.weight.permute(2, 1, 0)), "b": j(u.conv1.bias)},
                "alpha2": j(u.alpha2)[0, :, 0],
                "conv2": {"w": j(u.conv2.weight.permute(2, 1, 0)), "b": j(u.conv2.bias)},
            }
            for u in tb.res
        ],
    }
    got = dac_vae._decoder_block(jp, j(x.transpose(1, 2)), stride)
    np.testing.assert_allclose(
        np.asarray(got), expected.transpose(1, 2).numpy(), atol=1e-4, rtol=1e-4
    )


def test_gaussian_posterior_kl_closed_form():
    mean = jnp.zeros((1, 3, 4))
    logvar = jnp.zeros((1, 3, 4))
    post = dac_vae.GaussianPosterior(mean, logvar)
    np.testing.assert_allclose(np.asarray(post.kl()), 0.0, atol=1e-6)
    post2 = dac_vae.GaussianPosterior(jnp.ones((1, 1, 1)), jnp.zeros((1, 1, 1)))
    np.testing.assert_allclose(np.asarray(post2.kl()), 0.5, atol=1e-6)
