"""Golden tests: our GAN training stack vs the reference's LITERAL discriminator/loss code.

Imports the reference's actual ``dac_vae/model/discriminator.py`` (MPD/MSD/MRD + combined
``Discriminator``) and ``dac_vae/nn/loss.py`` (L1/SISDR/MultiScaleSTFT/Mel/GAN losses) from
/root/reference via tests/reference_oracle, which supplies a *functional*
``audiotools.AudioSignal`` stub (stft with match_stride pad/trim, magnitude-mel with a
librosa-slaney basis — the documented audiotools shared-assumption boundary; audiotools
itself is absent in this image). Every line of discriminator conv math and loss arithmetic
executed here is the reference's own code.

Documented divergences NOT covered (PARITY.md "Known intentional divergences"):
MSD rate>1 — the oracle pins rate=1 (the reference's only default rate); the rate>1 branch
uses our julius-transcribed ``ops/audio_dsp.py::resample_poly``, property-tested in
test_dac_training (julius itself isn't installable here, so no literal pin is possible).
"""

import numpy as np
import torch

import jax.numpy as jnp

from foley_tpu.io.convert import convert_discriminator_state_dict
from foley_tpu.models import dac_discriminator as disc
from foley_tpu.models import dac_losses
from tests.reference_oracle import import_reference, install_stubs

install_stubs()
disc_mod = import_reference("hunyuanvideo_foley.models.dac_vae.model.discriminator")
loss_mod = import_reference("hunyuanvideo_foley.models.dac_vae.nn.loss")

SR = 48000
CFG = disc.DiscriminatorConfig(periods=(2, 3), rates=(1,), fft_sizes=(512,), sample_rate=SR)


def _build_reference_discriminator():
    torch.manual_seed(3)
    model = disc_mod.Discriminator(
        rates=list(CFG.rates),
        periods=list(CFG.periods),
        fft_sizes=list(CFG.fft_sizes),
        sample_rate=SR,
    ).eval()
    params = convert_discriminator_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, CFG, strict=True
    )
    return model, params


def _audio(seed: int, t: int = 2048, b: int = 1) -> torch.Tensor:
    return 0.5 * torch.randn(b, 1, t, generator=torch.Generator().manual_seed(seed))


def _close(got: np.ndarray, ref: np.ndarray, rtol=2e-4):
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(
        got, ref, rtol=rtol, atol=rtol * (np.abs(ref).max() + 1e-9)
    )


def _ref_layouts_to_ours(fmap: torch.Tensor) -> np.ndarray:
    """torch NC... -> channel-last: [B,C,T]->[B,T,C], [B,C,H,W]->[B,H,W,C]."""
    x = fmap.detach().numpy()
    if x.ndim == 3:
        return np.transpose(x, (0, 2, 1))
    return np.transpose(x, (0, 2, 3, 1))


def test_discriminator_fmaps_match_literal_reference():
    """Every feature map of every sub-discriminator (2 MPD + 1 MSD rate=1 + 1 MRD 512),
    including preprocess (DC removal + 0.8 peak norm), the MPD period fold, and the MRD
    match_stride complex spectrogram + band splits (discriminator.py:27-216)."""
    model, params = _build_reference_discriminator()
    x = _audio(0)
    with torch.no_grad():
        ref_fmaps = model(x)
    got_fmaps = disc.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)), CFG)
    assert len(got_fmaps) == len(ref_fmaps) == 4
    for got_pyramid, ref_pyramid in zip(got_fmaps, ref_fmaps):
        assert len(got_pyramid) == len(ref_pyramid)
        for got, ref in zip(got_pyramid, ref_pyramid):
            _close(np.asarray(got), _ref_layouts_to_ours(ref))


def test_gan_losses_match_literal_reference():
    """GANLoss.discriminator_loss / generator_loss (LSGAN final-logit terms + L1 feature
    matching over all non-final maps, loss.py:330-368)."""
    model, params = _build_reference_discriminator()
    fake_t, real_t = _audio(1), _audio(2)
    gan = loss_mod.GANLoss(model)
    Sig = loss_mod.AudioSignal
    with torch.no_grad():
        ref_d = gan.discriminator_loss(Sig(fake_t.clone(), SR), Sig(real_t.clone(), SR))
        ref_g, ref_feat = gan.generator_loss(Sig(fake_t.clone(), SR), Sig(real_t.clone(), SR))

    fake = jnp.asarray(fake_t.numpy().transpose(0, 2, 1))
    real = jnp.asarray(real_t.numpy().transpose(0, 2, 1))
    fake_fmaps = disc.apply(params, fake, CFG)
    real_fmaps = disc.apply(params, real, CFG)
    np.testing.assert_allclose(
        float(dac_losses.discriminator_loss(real_fmaps, fake_fmaps)), float(ref_d), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(dac_losses.generator_adv_loss(fake_fmaps)), float(ref_g), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(dac_losses.feature_matching_loss(real_fmaps, fake_fmaps)), float(ref_feat),
        rtol=1e-4,
    )


def test_l1_and_sisdr_losses_match_literal_reference():
    """L1Loss (audio_data attribute) and SISDRLoss (scale-invariant, zero-mean, eps terms;
    loss.py:11-139). NOTE the reference's argument order: forward(x, y) reads x as the
    REFERENCE signal and y as the estimate (loss.py:94-98), despite its docstring."""
    x_t, y_t = _audio(4, t=1500), _audio(5, t=1500)
    Sig = loss_mod.AudioSignal
    with torch.no_grad():
        ref_l1 = loss_mod.L1Loss()(Sig(x_t, SR), Sig(y_t, SR))
        ref_sisdr = loss_mod.SISDRLoss()(Sig(x_t, SR), Sig(y_t, SR))
    x = jnp.asarray(x_t.numpy()[:, 0])
    y = jnp.asarray(y_t.numpy()[:, 0])
    np.testing.assert_allclose(float(dac_losses.l1_loss(x, y)), float(ref_l1), rtol=1e-5)
    # ours is sisdr_loss(estimates, references) == reference forward(references, estimates)
    np.testing.assert_allclose(
        float(dac_losses.sisdr_loss(y, x)), float(ref_sisdr), rtol=1e-4
    )


def test_multiscale_stft_loss_matches_literal_reference():
    """MultiScaleSTFTLoss at defaults (windows [2048,512], hop w/4, log10(mag^2) + mag L1
    terms; loss.py:142-228) through the centered-stft AudioSignal path."""
    x_t, y_t = _audio(6, t=4096), _audio(7, t=4096)
    Sig = loss_mod.AudioSignal
    with torch.no_grad():
        ref = loss_mod.MultiScaleSTFTLoss()(Sig(x_t, SR), Sig(y_t, SR))
    got = dac_losses.multiscale_stft_loss(
        jnp.asarray(x_t.numpy()[:, 0]), jnp.asarray(y_t.numpy()[:, 0])
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


def test_mel_spectrogram_loss_matches_literal_reference():
    """MelSpectrogramLoss at defaults (n_mels [150,80], windows [2048,512]; loss.py:231-328):
    magnitude-mel with the librosa-slaney basis — the oracle that caught our earlier
    sqrt(power-mel)+HTK transcription divergence."""
    x_t, y_t = _audio(8, t=4096), _audio(9, t=4096)
    Sig = loss_mod.AudioSignal
    with torch.no_grad():
        ref = loss_mod.MelSpectrogramLoss()(Sig(x_t, SR), Sig(y_t, SR))
    got = dac_losses.mel_spectrogram_loss(
        jnp.asarray(x_t.numpy()[:, 0]), jnp.asarray(y_t.numpy()[:, 0]), sample_rate=SR
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


def test_discriminator_converter_consumes_every_literal_key():
    model, _ = _build_reference_discriminator()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    convert_discriminator_state_dict(sd, CFG, strict=True, consume=True)
    assert sd == {}, f"unconverted literal keys: {sorted(sd)[:10]}"
