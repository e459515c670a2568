"""DAC discrete branch + training artifacts: RVQ (vs torch transcription), losses
(closed forms + torch cross-checks), discriminators (shape/grad), codec chunk round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from foley_tpu.configs import TINY
from foley_tpu.models import dac_codec, dac_discriminator, dac_losses, dac_vae, quantize
from foley_tpu.models.quantize import RVQConfig

RVQ_TINY = RVQConfig(input_dim=16, n_codebooks=3, codebook_size=32, codebook_dim=4)


# ---------------------------------------------------------------------------------
# RVQ
# ---------------------------------------------------------------------------------

def _torch_vq(in_w, in_b, out_w, out_b, codebook, z):
    """Transcription of reference VectorQuantize.forward (quantize.py:34-94), channels-first."""
    z_e = F.conv1d(z, in_w, in_b)
    enc = z_e.permute(0, 2, 1).reshape(-1, z_e.shape[1])
    encn = F.normalize(enc)
    cbn = F.normalize(codebook)
    dist = encn.pow(2).sum(1, keepdim=True) - 2 * encn @ cbn.t() + cbn.pow(2).sum(1, keepdim=True).t()
    indices = (-dist).max(1)[1].reshape(z.shape[0], -1)
    z_q = F.embedding(indices, codebook).transpose(1, 2)
    z_q_st = z_e + (z_q - z_e).detach()
    out = F.conv1d(z_q_st, out_w, out_b)
    return out, indices


def test_vector_quantize_matches_torch():
    torch.manual_seed(0)
    cfg = RVQ_TINY
    in_w = torch.randn(cfg.codebook_dim, cfg.input_dim, 1)
    in_b = torch.randn(cfg.codebook_dim)
    out_w = torch.randn(cfg.input_dim, cfg.codebook_dim, 1)
    out_b = torch.randn(cfg.input_dim)
    codebook = torch.randn(cfg.codebook_size, cfg.codebook_dim)
    z = torch.randn(2, cfg.input_dim, 7)

    with torch.no_grad():
        ref, ref_idx = _torch_vq(in_w, in_b, out_w, out_b, codebook, z)

    q = {
        "in_proj": {"w": jnp.asarray(in_w[:, :, 0].numpy().T.copy()), "b": jnp.asarray(in_b.numpy())},
        "out_proj": {"w": jnp.asarray(out_w[:, :, 0].numpy().T.copy()), "b": jnp.asarray(out_b.numpy())},
        "codebook": jnp.asarray(codebook.numpy()),
    }
    z_q, _, _, idx, _ = quantize.vector_quantize(q, jnp.asarray(z.transpose(1, 2).numpy()))
    np.testing.assert_array_equal(np.asarray(idx), ref_idx.numpy())
    np.testing.assert_allclose(np.asarray(z_q), ref.transpose(1, 2).numpy(), atol=1e-4, rtol=1e-4)


def test_rvq_shapes_and_residual_convergence():
    params = quantize.init(jax.random.PRNGKey(0), RVQ_TINY)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, RVQ_TINY.input_dim)).astype(np.float32))
    out = quantize.apply(params, z, RVQ_TINY)
    assert out.z_q.shape == z.shape
    assert out.codes.shape == (2, RVQ_TINY.n_codebooks, 9)
    assert out.latents.shape == (2, 9, RVQ_TINY.n_codebooks * RVQ_TINY.codebook_dim)
    assert np.isfinite(float(out.commitment_loss))
    # from_codes reconstructs z_q exactly
    z_q2 = quantize.from_codes(params, out.codes)
    np.testing.assert_allclose(np.asarray(z_q2), np.asarray(out.z_q), atol=1e-5)
    # from_latents round-trips codes
    _, codes2 = quantize.from_latents(params, out.latents, RVQ_TINY)
    np.testing.assert_array_equal(np.asarray(codes2), np.asarray(out.codes))


def test_rvq_straight_through_gradients():
    params = quantize.init(jax.random.PRNGKey(0), RVQ_TINY)

    def loss(z):
        return jnp.sum(quantize.apply(params, z, RVQ_TINY).z_q)

    g = jax.grad(loss)(jnp.ones((1, 4, RVQ_TINY.input_dim)))
    assert np.any(np.asarray(g) != 0)  # gradient flows through the quantizer


# ---------------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------------

def test_sisdr_closed_form():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(1, 1000)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(1, 1000)).astype(np.float32))
    x = y + 0.1 * noise
    # perfect estimate -> very high SDR (very negative loss)
    assert float(dac_losses.sisdr_loss(y, y)) < -60
    # scale invariance: scaling the estimate must not change the loss
    base = float(dac_losses.sisdr_loss(x, y))
    scaled = float(dac_losses.sisdr_loss(3.0 * x, y))
    np.testing.assert_allclose(base, scaled, atol=1e-3)
    assert 15 < -base < 30  # ~20 dB SNR regime


def test_stft_and_mel_losses_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4096)).astype(np.float32))
    assert float(dac_losses.multiscale_stft_loss(x, x)) == 0.0
    assert float(dac_losses.mel_spectrogram_loss(x, x)) == 0.0
    y = x + 0.1
    assert float(dac_losses.multiscale_stft_loss(x, y)) > 0


def test_gan_losses():
    real = [[jnp.ones((1, 4, 2)), jnp.ones((1, 2, 1))]]
    fake = [[jnp.zeros((1, 4, 2)), jnp.zeros((1, 2, 1))]]
    d = float(dac_losses.discriminator_loss(real, fake))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)  # real=1, fake=0 is the optimum
    g = float(dac_losses.generator_adv_loss(fake))
    np.testing.assert_allclose(g, 1.0, atol=1e-6)
    fm = float(dac_losses.feature_matching_loss(real, fake))
    np.testing.assert_allclose(fm, 1.0, atol=1e-6)  # L1 over the single non-final map


# ---------------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------------

def test_discriminator_shapes_and_grads():
    cfg = dac_discriminator.DiscriminatorConfig(
        periods=(2, 3), rates=(1,), fft_sizes=(512,), sample_rate=16000
    )
    params = dac_discriminator.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4000, 1)).astype(np.float32) * 0.1)
    fmaps = dac_discriminator.apply(params, x, cfg)
    assert len(fmaps) == 4  # 2 MPD + 1 MSD + 1 MRD
    for pyramid in fmaps:
        assert len(pyramid) >= 5
        for fm in pyramid:
            assert np.all(np.isfinite(np.asarray(fm)))

    def gen_loss(xx):
        return dac_losses.generator_adv_loss(dac_discriminator.apply(params, xx, cfg))

    g = jax.grad(gen_loss)(x)
    assert np.any(np.asarray(g) != 0)


# ---------------------------------------------------------------------------------
# Codec chunked IO
# ---------------------------------------------------------------------------------

def test_compress_decompress_roundtrip(tmp_path):
    cfg = TINY.dac
    params = dac_vae.init(jax.random.PRNGKey(0), cfg)
    t = int(0.8 * cfg.sample_rate)
    audio = np.random.default_rng(0).normal(size=(t,)).astype(np.float32) * 0.1
    artifact = dac_codec.compress(params, audio, cfg, win_duration_s=0.5)
    assert artifact.original_length == t
    path = str(tmp_path / "a.dac.npz")
    artifact.save(path)
    loaded = dac_codec.DACFile.load(path)
    wav = dac_codec.decompress(params, loaded, cfg)
    assert wav.shape == (t,)
    assert np.all(np.isfinite(wav))


def test_dac_gan_train_step_runs_and_improves():
    """Assembled G/D train steps on the tiny codec: finite losses, both updated, recon
    losses trend down over a few steps on a fixed batch."""
    from foley_tpu.models.dac_discriminator import DiscriminatorConfig
    from foley_tpu.training.dac_train import make_dac_train_steps

    cfg = TINY.dac
    disc_cfg = DiscriminatorConfig(periods=(2,), rates=(), fft_sizes=(512,),
                                   sample_rate=cfg.sample_rate)
    init_state, train_step = make_dac_train_steps(
        cfg, disc_cfg, gen_lr=1e-3, disc_lr=1e-3,
        stft_windows=(512,), mel_cfg=((40, 512),),
    )
    gen_params = dac_vae.init(jax.random.PRNGKey(0), cfg)
    disc_params = dac_discriminator.init(jax.random.PRNGKey(1), disc_cfg)
    state = init_state(gen_params, disc_params)

    t = 2 * cfg.hop_length
    audio = jnp.asarray(
        0.3 * np.sin(2 * np.pi * 220 * np.arange(t) / cfg.sample_rate)
    ).reshape(1, t, 1).astype(jnp.float32)

    step = jax.jit(train_step)
    first_mel = None
    for i in range(4):
        state, metrics = step(state, audio, jax.random.PRNGKey(10 + i))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)
        if first_mel is None:
            first_mel = float(metrics["mel"])
    assert int(state.step) == 4
    assert float(metrics["mel"]) < first_mel  # recon improving on the fixed batch


def test_resample_poly_properties():
    """Polyphase sinc resampling (ops/audio_dsp.py::resample_poly, the julius/audiotools
    transcription the MSD rate branch uses): bandlimited tones survive downsampling
    near-exactly, above-Nyquist content is rejected, shapes/dtypes/identity hold. julius
    isn't installable here, so properties stand in for a literal-code pin (PARITY note)."""
    from foley_tpu.ops.audio_dsp import resample_poly

    sr, dur = 8000, 1.0
    t = np.arange(int(sr * dur)) / sr

    # identity: same rate returns the input untouched
    x = jnp.asarray(np.sin(2 * np.pi * 440 * t), jnp.float32)
    assert resample_poly(x, sr, sr) is x

    # a 300 Hz tone downsampled 4x (new Nyquist 1 kHz) matches the analytic tone
    y = np.asarray(resample_poly(x[None].repeat(2, 0), 4, 1))
    assert y.shape == (2, len(t) // 4)
    t4 = np.arange(y.shape[1]) * 4 / sr
    ref = np.sin(2 * np.pi * 440 * t4)
    core = slice(100, -100)  # edge transients excluded (zero-padded boundaries)
    assert np.abs(y[0][core] - ref[core]).max() < 2e-3
    np.testing.assert_array_equal(y[0], y[1])  # batch dim is independent

    # above-Nyquist content is filtered out, not aliased: 1.8 kHz tone, 4x down (Nyq 1 kHz)
    hi = jnp.asarray(np.sin(2 * np.pi * 1800 * t), jnp.float32)
    z = np.asarray(resample_poly(hi, 4, 1))
    assert np.abs(z[core]).max() < 2e-2, np.abs(z[core]).max()

    # leading dims preserved; works under jit (static rates)
    import jax as _jax

    batched = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 4000)), jnp.float32)
    out = _jax.jit(lambda a: resample_poly(a, 2, 1))(batched)
    assert out.shape == (2, 3, 2000)


def test_msd_rate_uses_polyphase_downsampling():
    """apply_msd(rate>1) feeds the convs the polyphase-downsampled signal: identical to
    resampling first and running rate=1 (the reference's MSD semantics,
    discriminator.py:95-118)."""
    from foley_tpu.ops.audio_dsp import resample_poly

    params = dac_discriminator.init_msd(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4096, 1)), jnp.float32)
    fmaps_rate = dac_discriminator.apply_msd(params, x, rate=2)
    pre = resample_poly(x[..., 0], 2, 1)[..., None]
    fmaps_pre = dac_discriminator.apply_msd(params, pre, rate=1)
    assert len(fmaps_rate) == len(fmaps_pre)
    for a, b in zip(fmaps_rate, fmaps_pre):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
