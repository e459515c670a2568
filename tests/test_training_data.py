"""Training data pipeline: WAV datasets, latent shards, batch assembly, device prefetch."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foley_tpu.io.audio import read_wav, write_wav


def _write_corpus(root, rng, n=3, sr=48000, seconds=0.4):
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        t = rng.standard_normal(int(sr * seconds)).astype(np.float32) * 0.3
        write_wav(os.path.join(root, f"clip_{i}.wav"), t, sr)


def test_read_wav_formats_and_resample(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4800) * 0.25).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 24000)
    got, sr = read_wav(p)
    assert sr == 24000 and got.shape == x.shape
    np.testing.assert_allclose(got, x, atol=2 / 32768)  # PCM16 quantization
    up, sr2 = read_wav(p, target_sr=48000)
    assert sr2 == 48000 and up.shape == (9600,)


def test_audio_folder_dataset_crops_and_loops(tmp_path):
    from foley_tpu.training.data import AudioFolderDataset, batch_items

    rng = np.random.default_rng(1)
    _write_corpus(str(tmp_path), rng, n=3, seconds=0.2)  # files shorter than the clip
    ds = AudioFolderDataset(str(tmp_path), clip_seconds=0.5, sample_rate=48000, seed=0)
    it = iter(ds)
    items = [next(it) for _ in range(5)]
    for item in items:
        assert item["audio"].shape == (24000,)
        assert np.abs(item["audio"]).max() > 0
    batches = batch_items(iter(items), 2, keys=("audio",))
    b = next(batches)
    assert b["audio"].shape == (2, 24000)


def test_encode_corpus_shards_and_flow_match_batches(tmp_path):
    from foley_tpu.configs import TINY
    from foley_tpu.models import dac_vae, mmdit
    from foley_tpu.training.data import (
        AudioFolderDataset,
        NpzShardDataset,
        encode_corpus,
        flow_match_batches,
    )

    rng = np.random.default_rng(2)
    corpus = str(tmp_path / "wavs")
    _write_corpus(corpus, rng, n=2, seconds=0.5)
    ds = AudioFolderDataset(corpus, clip_seconds=0.5, sample_rate=TINY.dac.sample_rate, seed=0)

    dac_params = dac_vae.init(jax.random.PRNGKey(0), TINY.dac)
    shard_dir = str(tmp_path / "shards")
    shards = encode_corpus(dac_params, TINY.dac, ds, shard_dir, num_clips=5, batch_size=2,
                           shard_size=3)
    assert len(shards) >= 2 and all(os.path.exists(s) for s in shards)

    lat_ds = NpzShardDataset(shard_dir, seed=0)
    probe = next(iter(lat_ds))
    lat_len = probe["latents"].shape[0]
    assert lat_len == TINY.latent_length(0.5)

    mmdit_params = mmdit.init(jax.random.PRNGKey(1), TINY.model)
    batches = flow_match_batches(iter(lat_ds), mmdit_params, TINY, batch_size=2,
                                 text_bucket=8)
    b = next(batches)
    assert b["latents"].shape == (2, lat_len, TINY.model.audio_vae_latent_dim)
    assert b["cond"].shape == (2, 8, TINY.model.condition_dim)
    clip_len, sync_len = TINY.t2a_lengths(lat_len / TINY.model.audio_frame_rate)
    assert b["clip_feat"].shape == (2, clip_len, TINY.model.clip_dim)
    assert b["sync_feat"].shape == (2, sync_len, TINY.model.sync_feat_dim)
    # the empty sequences come from the model's learned embeddings (zero-INITIALIZED like the
    # reference's nn.Parameter(torch.zeros(...)), so only the broadcast geometry is asserted)
    assert np.all(b["clip_feat"] == b["clip_feat"][:1, :1])

    # corpus latent standardization (from-scratch training; latent-diffusion scale recipe):
    # streamed per-channel stats match direct computation over all shards, and the
    # standardized batch stream is ~zero-mean/unit-std per channel
    from foley_tpu.training.data import latent_stats_from_shards

    mean, std = latent_stats_from_shards(shard_dir)
    all_lat = np.concatenate([np.load(s)["latents"] for s in shards]).reshape(
        -1, TINY.model.audio_vae_latent_dim)
    np.testing.assert_allclose(mean, all_lat.mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(std, all_lat.std(0), rtol=1e-4, atol=1e-6)

    norm_batches = flow_match_batches(iter(NpzShardDataset(shard_dir, seed=0)), mmdit_params,
                                      TINY, batch_size=5, text_bucket=8,
                                      latent_stats=(mean, std))
    nb = next(norm_batches)["latents"].reshape(-1, TINY.model.audio_vae_latent_dim)
    assert np.abs(nb.mean(0)).max() < 0.5 and np.abs(nb.std(0) - 1.0).max() < 0.5


def _write_av_corpus(root, rng, n_clips=2, seconds=1.0, fps=16, size=40, sr=48000):
    """Per-clip frames dir + wav: clip_0 with a sibling wav, clip_1 with the wav inside."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    for c in range(n_clips):
        d = os.path.join(root, f"clip_{c}")
        os.makedirs(d, exist_ok=True)
        for f in range(int(seconds * fps)):
            arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"f_{f:04d}.png"))
        wav = (rng.standard_normal(int(sr * seconds)) * 0.3).astype(np.float32)
        path = os.path.join(d, "audio.wav") if c % 2 else d + ".wav"
        write_wav(path, wav, sr)


def _tiny_video_encoders():
    """Dimension-matched tiny SigLIP2 + Synchformer (the test_v2a fixture recipe)."""
    import torch
    from transformers import SiglipVisionConfig as HFC, SiglipVisionModel

    from foley_tpu.configs import SynchformerConfig
    from foley_tpu.models import siglip2, synchformer

    sig_cfg = siglip2.SiglipVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=8,
    )
    torch.manual_seed(0)
    hf = SiglipVisionModel(HFC(
        hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=8,
    ))
    sig_params = siglip2.convert_hf_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, sig_cfg
    )
    sync_cfg = SynchformerConfig(
        img_size=32, patch_size=8, temporal_patch_size=2, num_frames=16,
        embed_dim=16, depth=1, num_heads=2,
    )
    return {
        "siglip2": siglip2.Siglip2Encoder(sig_params, sig_cfg),
        "synchformer": synchformer.SynchformerEncoder(
            synchformer.init(jax.random.PRNGKey(2), sync_cfg), sync_cfg
        ),
    }


def test_av_corpus_to_v2a_batches(tmp_path):
    """Frames-dir AV pairs -> encoder-feature shards -> V2A flow-match batches with CFG
    visual dropout -> one finite loss eval (the V2A fine-tuning data path)."""
    from foley_tpu.configs import TINY
    from foley_tpu.models import dac_vae, mmdit
    from foley_tpu.training.data import (
        AVFolderDataset,
        NpzShardDataset,
        encode_av_corpus,
        flow_match_batches,
        list_av_clips,
    )

    rng = np.random.default_rng(4)
    corpus = str(tmp_path / "av")
    _write_av_corpus(corpus, rng, n_clips=2, seconds=1.0, fps=16, sr=TINY.dac.sample_rate)
    assert len(list_av_clips(corpus)) == 2  # both wav layouts (sibling + inside) found

    clip_s = 0.5
    ds = AVFolderDataset(corpus, clip_seconds=clip_s, sample_rate=TINY.dac.sample_rate,
                         frames_fps=16, seed=0)
    item = next(iter(ds))
    assert item["audio"].shape == (int(clip_s * TINY.dac.sample_rate),)
    assert item["frames"].shape == (8, 40, 40, 3)  # 0.5 s @ 16 fps
    assert item["frames"].dtype == np.float32 and item["frames"].max() <= 1.0

    deps = _tiny_video_encoders()
    dac_params = dac_vae.init(jax.random.PRNGKey(0), TINY.dac)
    shard_dir = str(tmp_path / "av_shards")
    shards = encode_av_corpus(dac_params, TINY.dac, deps, TINY, ds, shard_dir,
                              num_clips=3, clip_seconds=clip_s, shard_size=2)
    assert len(shards) == 2

    sh_ds = NpzShardDataset(shard_dir, seed=0)
    probe = next(iter(sh_ds))
    assert set(probe) == {"latents", "clip_feat", "sync_feat"}
    lat_len = probe["latents"].shape[0]
    assert lat_len == TINY.latent_length(clip_s)
    assert probe["clip_feat"].shape[-1] == TINY.model.clip_dim
    assert probe["sync_feat"].shape[-1] == TINY.model.sync_feat_dim

    mmdit_params = mmdit.init(jax.random.PRNGKey(1), TINY.model)
    batches = flow_match_batches(iter(sh_ds), mmdit_params, TINY, batch_size=2,
                                 text_bucket=8)
    b = next(batches)
    assert b["clip_feat"].shape == (2,) + probe["clip_feat"].shape
    assert b["sync_feat"].shape == (2,) + probe["sync_feat"].shape
    # real features, not the learned empties: rows differ across the batch
    assert not np.array_equal(b["clip_feat"][0], b["clip_feat"][1])

    # CFG visual dropout at p=1: every row becomes the learned empty sequences at the SAME
    # lengths (the exact contrast branch the sampler uses at inference)
    drop_batches = flow_match_batches(iter(NpzShardDataset(shard_dir, seed=0)), mmdit_params,
                                      TINY, batch_size=2, text_bucket=8, drop_visual_p=1.0,
                                      drop_rng=np.random.default_rng(0))
    db = next(drop_batches)
    empty_clip = np.asarray(mmdit.get_empty_clip_sequence(mmdit_params, 2,
                                                          db["clip_feat"].shape[1]))
    np.testing.assert_array_equal(db["clip_feat"], empty_clip.astype(np.float32))

    # the batch drives the training loss directly
    from foley_tpu.training.train import flow_match_loss

    loss = flow_match_loss(mmdit_params, {k: jnp.asarray(v) for k, v in b.items()},
                           jax.random.PRNGKey(0), TINY.model, compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))


def test_prefetch_loader_matches_source_and_propagates_errors():
    from foley_tpu.training.data import PrefetchLoader

    src = [{"x": np.full((2, 3), float(i))} for i in range(5)]
    out = list(PrefetchLoader(iter(src), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), src[i]["x"])

    def bad():
        yield {"x": np.zeros(2)}
        raise ValueError("loader boom")

    it = PrefetchLoader(bad(), depth=1)
    next(it)
    with pytest.raises(ValueError, match="loader boom"):
        next(it)


def test_train_loop_runs_on_pipeline_batches(tmp_path):
    """End-to-end: WAVs -> DAC latent shards -> flow-match batches -> 2 train steps."""
    from foley_tpu.configs import TINY
    from foley_tpu.models import dac_vae, mmdit
    from foley_tpu.training import loop
    from foley_tpu.training.data import (
        AudioFolderDataset,
        NpzShardDataset,
        PrefetchLoader,
        encode_corpus,
        flow_match_batches,
    )

    rng = np.random.default_rng(3)
    corpus = str(tmp_path / "wavs")
    _write_corpus(corpus, rng, n=2, seconds=0.5)
    dac_params = dac_vae.init(jax.random.PRNGKey(0), TINY.dac)
    shard_dir = str(tmp_path / "shards")
    encode_corpus(
        dac_params, TINY.dac,
        AudioFolderDataset(corpus, 0.5, TINY.dac.sample_rate, seed=0),
        shard_dir, num_clips=4, batch_size=2,
    )
    params = mmdit.init(jax.random.PRNGKey(1), TINY.model)
    batches = PrefetchLoader(
        flow_match_batches(iter(NpzShardDataset(shard_dir)), params, TINY, batch_size=2,
                           text_bucket=8),
        depth=2,
    )
    state = loop.train(params, iter(batches), TINY.model, num_steps=2, log_every=0,
                       ckpt_dir=None)
    batches.close()
    assert int(state.step) == 2
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(state.params))

    # train -> deploy handoff: exported params load through the sampler's orbax loader path
    # and generate (the fine-tuned-checkpoint capability the reference lacks)
    from foley_tpu.api.nodes import HunyuanModelLoader
    from foley_tpu.pipeline.generate import ModelBundle, generate_audio

    export_dir = str(tmp_path / "deploy")
    loop.export_for_inference(state, export_dir)
    (fm,) = HunyuanModelLoader().load_model(export_dir, precision="fp32", config="tiny")
    bundle = ModelBundle(mmdit_params=fm["params"], dac_params=dac_params,
                         pipeline_cfg=TINY, compute_dtype=jnp.float32)
    text = jnp.zeros((1, 8, TINY.model.condition_dim), jnp.float32)
    res = generate_audio(bundle, text, text, 0.5, num_inference_steps=2, batch_size=1, seed=0)
    assert np.isfinite(res.audio_batch).all()

    # from-scratch exports persist the latent standardization, the loader re-attaches it,
    # and the sampler un-standardizes (z*std + mean) before DAC decode — exactly
    dim = TINY.model.audio_vae_latent_dim
    mean = np.linspace(-1.0, 1.0, dim).astype(np.float32)
    std = np.linspace(0.5, 2.0, dim).astype(np.float32)
    export_std = str(tmp_path / "deploy_std")
    loop.export_for_inference(state, export_std, latent_stats=(mean, std))
    (fm_s,) = HunyuanModelLoader().load_model(export_std, precision="fp32", config="tiny")
    np.testing.assert_array_equal(np.asarray(fm_s["latent_stats"][0]), mean)
    bundle_s = bundle._replace(latent_stats=fm_s["latent_stats"])
    res_s = generate_audio(bundle_s, text, text, 0.5, num_inference_steps=2, batch_size=1,
                           seed=0, return_latents=True)
    # final latents are reported in model space (identical ODE), audio decodes the raw space
    res_l = generate_audio(bundle, text, text, 0.5, num_inference_steps=2, batch_size=1,
                           seed=0, return_latents=True)
    np.testing.assert_array_equal(res_s.latents, res_l.latents)
    from foley_tpu.models import dac_vae as dac_mod

    manual = dac_mod.decode(dac_params, jnp.asarray(res_s.latents * std + mean), TINY.dac)
    n = res_s.audio_batch.shape[-1]
    # fused-program vs eager decode reorder fp32 ops, and the random-init decoder is
    # hard-saturated (tanh of huge pre-activations), so isolated zero-crossing samples can
    # land on opposite signs; the latent-level equality above is the exact check — here
    # assert near-total sample agreement instead of bit-equality
    diff = np.abs(res_s.audio_batch[:, 0, :] - np.asarray(manual)[:, :n, 0])
    assert np.mean(diff < 2e-3) > 0.995 and np.median(diff) < 1e-5
    assert np.abs(res_s.audio_batch - res_l.audio_batch).max() > 1e-6
