"""Full node-graph test: Loader -> DependenciesLoader -> Sampler driven from on-disk
checkpoint files, with SigLIP2 + CLAP loaded through the DependenciesLoader like the
reference graph does (reference nodes.py:170-206), plus the sampler-level compile warmup."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foley_tpu.api.nodes import (
    HunyuanCompileConfig,
    HunyuanDependenciesLoader,
    HunyuanFoleySampler,
    HunyuanModelLoader,
)
from foley_tpu.configs import TINY

from helpers import (
    save_dac_checkpoint,
    save_tiny_clap_checkpoint,
    save_tiny_siglip2_checkpoint,
)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("graph_ckpts")
    save_dac_checkpoint(str(root / "vae_128d_48k.safetensors"), TINY.dac)
    save_tiny_clap_checkpoint(str(root / "clap"), hidden=TINY.model.condition_dim, heads=2)
    save_tiny_siglip2_checkpoint(str(root / "siglip2"), hidden=TINY.model.clip_dim, heads=2)
    return root


def test_deps_loader_loads_siglip2_and_clap(ckpt_dir):
    (deps,) = HunyuanDependenciesLoader().load_dependencies(
        str(ckpt_dir / "vae_128d_48k.safetensors"),
        synchformer_model=None,
        siglip2_model=str(ckpt_dir / "siglip2"),
        clap_model=str(ckpt_dir / "clap"),
    )
    assert "dac_params" in deps and "siglip2" in deps and "clap" in deps
    # config inference picked up the tiny dims
    assert deps["clap"].cfg.hidden_size == TINY.model.condition_dim
    assert deps["siglip2"].cfg.hidden_size == TINY.model.clip_dim
    # text encoding through the loaded CLAP is non-zero and prompt-dependent
    feats = deps["clap"].encode(["glass shattering", "footsteps on ice"])
    arr = np.asarray(feats)
    assert np.abs(arr).max() > 0
    assert np.abs(arr[0] - arr[1]).max() > 0


def test_full_graph_text_conditioning(ckpt_dir):
    """Loader->DepsLoader->Sampler end to end; text conditioning must be non-zero and reach
    the output (final layer re-initialized nonzero — at DiT zero-init conditioning can't
    affect the output by construction)."""
    foley_model = HunyuanModelLoader.init_random("tiny", "fp32", 0)
    params = dict(foley_model["params"])
    rng = np.random.default_rng(9)

    def reinit(d, *path):
        node = d
        for p in path[:-1]:
            node[p] = dict(node[p])
            node = node[p]
        leaf = node[path[-1]]
        node[path[-1]] = jnp.asarray(rng.normal(size=leaf.shape).astype(np.float32) * 0.05)

    # Zero-init adaLN gates block every block's contribution at init (the DiT init
    # contract), so text cross-attention can't reach the output; open the gates.
    reinit(params, "final_layer", "linear", "w")
    reinit(params, "triple_blocks", "audio_mod", "w")
    foley_model = dict(foley_model, params=params)

    (deps,) = HunyuanDependenciesLoader().load_dependencies(
        str(ckpt_dir / "vae_128d_48k.safetensors"),
        synchformer_model=None,
        siglip2_model=str(ckpt_dir / "siglip2"),
        clap_model=str(ckpt_dir / "clap"),
    )
    kw = dict(duration=1.0, negative_prompt="noisy harsh", cfg_scale=4.5, steps=2,
              sampler="euler", batch_size=1, seed=0)
    sampler = HunyuanFoleySampler()
    a, _ = sampler.generate_audio(foley_model, deps, prompt="glass shattering", **kw)
    b, _ = sampler.generate_audio(foley_model, deps, prompt="footsteps on ice", **kw)
    wa, wb = np.asarray(a["waveform"]), np.asarray(b["waveform"])
    assert wa.shape == (1, 1, 48000) and np.isfinite(wa).all()
    assert np.abs(wa - wb).max() > 0  # prompt actually conditions the audio


def test_sampler_without_clap_requires_optin(ckpt_dir):
    foley_model = HunyuanModelLoader.init_random("tiny", "fp32", 0)
    (deps,) = HunyuanDependenciesLoader().load_dependencies(
        str(ckpt_dir / "vae_128d_48k.safetensors"), synchformer_model=None,
    )
    kw = dict(duration=1.0, prompt="x", steps=2, batch_size=1, seed=0)
    with pytest.raises(ValueError, match="allow_unconditioned"):
        HunyuanFoleySampler().generate_audio(foley_model, deps, **kw)
    a, _ = HunyuanFoleySampler().generate_audio(
        foley_model, deps, allow_unconditioned=True, **kw
    )
    assert np.asarray(a["waveform"]).shape == (1, 1, 48000)


def test_compile_warmup_precompiles_buckets(ckpt_dir):
    """With a compile config attached, warmup compiles the declared buckets so the sampler's
    own generation adds zero new XLA compiles (reference nodes.py:433-607's role)."""
    from foley_tpu.sampling.denoise import denoise_and_decode

    foley_model = HunyuanModelLoader.init_random("tiny", "fp32", 1)
    (deps,) = HunyuanDependenciesLoader().load_dependencies(
        str(ckpt_dir / "vae_128d_48k.safetensors"), synchformer_model=None,
        clap_model=str(ckpt_dir / "clap"),
    )
    (compile_cfg,) = HunyuanCompileConfig().make_config(
        durations="1", batch_sizes="2", text_buckets="77"
    )
    kw = dict(duration=1.0, prompt="glass shattering", cfg_scale=4.5, steps=2,
              sampler="euler", batch_size=2, seed=0)

    sampler = HunyuanFoleySampler()
    # Warmup happens inside the first sampler call; measure compiles of the generation that
    # follows it by calling again (warmed keys are remembered on the model dict).
    sampler.generate_audio(foley_model, deps, torch_compile_cfg=compile_cfg, **kw)
    assert foley_model["_warm_buckets"]  # warmup ran and was recorded

    before = denoise_and_decode._cache_size()
    sampler.generate_audio(foley_model, deps, torch_compile_cfg=compile_cfg, **kw)
    assert denoise_and_decode._cache_size() == before  # zero new compiles after warmup
