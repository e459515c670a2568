"""The full switching-user journey: reference-keyed safetensors checkpoints on disk ->
standalone library API (load_model / feature_process / denoise_process) -> audio."""

import os

import jax
import numpy as np
import pytest

import foley_tpu
from foley_tpu.configs import TINY
from tests.test_io import _synthetic_mmdit_sd


def _save_dac_sd(path):
    """Tiny DAC checkpoint with reference keys (reuses the builder from test_io)."""
    from tests.test_io import test_convert_dac_decoder_matches_plain_weights  # noqa: F401
    # Build the same synthetic dict inline (the test fn doesn't return it).
    import math

    import torch

    from safetensors.numpy import save_file

    def _wn(prefix, conv, sd):
        import torch.nn.utils.parametrizations as P

        wn = P.weight_norm(conv)
        sd[f"{prefix}.weight_g"] = wn.parametrizations.weight.original0.detach().numpy()
        sd[f"{prefix}.weight_v"] = wn.parametrizations.weight.original1.detach().numpy()
        if conv.bias is not None:
            sd[f"{prefix}.bias"] = conv.bias.detach().numpy()

    torch.manual_seed(0)
    cfg = TINY.dac
    sd = {}
    d = cfg.decoder_dim
    _wn("decoder.model.0", torch.nn.Conv1d(cfg.latent_dim, d, 7, padding=3), sd)
    out_dim = d
    for i, s in enumerate(cfg.decoder_rates):
        in_dim, out_dim = d // 2 ** i, d // 2 ** (i + 1)
        b = f"decoder.model.{i+1}.block"
        sd[f"{b}.0.alpha"] = np.ones((1, in_dim, 1), np.float32)
        _wn(f"{b}.1", torch.nn.ConvTranspose1d(in_dim, out_dim, 2 * s, stride=s), sd)
        for jj, dil in zip((2, 3, 4), (1, 3, 9)):
            sd[f"{b}.{jj}.block.0.alpha"] = np.ones((1, out_dim, 1), np.float32)
            _wn(f"{b}.{jj}.block.1", torch.nn.Conv1d(out_dim, out_dim, 7, dilation=dil, padding=3 * dil), sd)
            sd[f"{b}.{jj}.block.2.alpha"] = np.ones((1, out_dim, 1), np.float32)
            _wn(f"{b}.{jj}.block.3", torch.nn.Conv1d(out_dim, out_dim, 1), sd)
    n = len(cfg.decoder_rates)
    sd[f"decoder.model.{n+1}.alpha"] = np.ones((1, out_dim, 1), np.float32)
    _wn(f"decoder.model.{n+2}", torch.nn.Conv1d(out_dim, 1, 7, padding=3), sd)
    e = cfg.encoder_dim
    _wn("encoder.block.0", torch.nn.Conv1d(1, e, 7, padding=3), sd)
    dim = e
    for i, s in enumerate(cfg.encoder_rates):
        dim *= 2
        b = f"encoder.block.{i+1}.block"
        for jj, dil in zip((0, 1, 2), (1, 3, 9)):
            sd[f"{b}.{jj}.block.0.alpha"] = np.ones((1, dim // 2, 1), np.float32)
            _wn(f"{b}.{jj}.block.1", torch.nn.Conv1d(dim // 2, dim // 2, 7, dilation=dil, padding=3 * dil), sd)
            sd[f"{b}.{jj}.block.2.alpha"] = np.ones((1, dim // 2, 1), np.float32)
            _wn(f"{b}.{jj}.block.3", torch.nn.Conv1d(dim // 2, dim // 2, 1), sd)
        sd[f"{b}.3.alpha"] = np.ones((1, dim // 2, 1), np.float32)
        _wn(f"{b}.4", torch.nn.Conv1d(dim // 2, dim, 2 * s, stride=s, padding=math.ceil(s / 2)), sd)
    n = len(cfg.encoder_rates)
    sd[f"encoder.block.{n+1}.alpha"] = np.ones((1, dim, 1), np.float32)
    _wn(f"encoder.block.{n+2}", torch.nn.Conv1d(dim, cfg.latent_dim, 3, padding=1), sd)
    qc = torch.nn.Conv1d(cfg.latent_dim, 2 * cfg.latent_dim, 1)
    sd["quant_conv.weight"], sd["quant_conv.bias"] = qc.weight.detach().numpy(), qc.bias.detach().numpy()
    pc = torch.nn.Conv1d(cfg.latent_dim, cfg.latent_dim, 1)
    sd["post_quant_conv.weight"], sd["post_quant_conv.bias"] = pc.weight.detach().numpy(), pc.bias.detach().numpy()
    save_file(sd, path)


def test_standalone_library_journey(tmp_path):
    from safetensors.numpy import save_file

    model_dir = str(tmp_path)
    save_file(_synthetic_mmdit_sd(TINY.model),
              os.path.join(model_dir, "hunyuanvideo_foley.safetensors"))
    _save_dac_sd(os.path.join(model_dir, "vae_128d_48k.safetensors"))

    manager = foley_tpu.load_model(model_dir, config="tiny", precision="fp32",
                                   enable_offload=False)
    assert manager.loaded == []  # lazy

    # T2A: no CLAP checkpoint in this environment -> zero text features stand in
    import jax.numpy as jnp

    ltxt = TINY.model.text_length
    z = jnp.zeros((1, ltxt, TINY.model.condition_dim), jnp.float32)
    text_feats = {"text_feat": z, "uncond_text_feat": z}

    audio, sr = foley_tpu.denoise_process(
        {}, text_feats, audio_len_in_s=1.0, model_dict=manager,
        guidance_scale=4.5, num_inference_steps=2, batch_size=1, sampler="euler", seed=0,
    )
    assert sr == 48000
    assert audio.shape == (1, 1, 48000)
    assert np.all(np.isfinite(audio))
    assert set(manager.loaded) >= {"foley", "dac"}
    manager.release_inference_models()
    assert manager.loaded == []
