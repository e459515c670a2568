"""Aux subsystem tests: config YAML parsing, AttributeDict, offload manager, orbax
round-trip, profiling reports, node schemas, package surface."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foley_tpu.configs import XL, XXL, config_from_yaml, get_config
from foley_tpu.utils.config_utils import AttributeDict, load_yaml, merge_dicts

YAML_DIR = os.path.join(os.path.dirname(__file__), "..", "foley_tpu", "configs", "yaml")


def test_yaml_configs_match_presets():
    assert config_from_yaml(os.path.join(YAML_DIR, "hunyuanvideo-foley-xxl.yaml")).model == XXL.model
    assert config_from_yaml(os.path.join(YAML_DIR, "hunyuanvideo-foley-xl.yaml")).model == XL.model


def test_attribute_dict():
    d = AttributeDict({"a": {"b": [1, {"c": 2}]}, "x-y": 3})
    assert d.a.b[1].c == 2
    assert d.x_y == 3
    assert d.get("missing", "dflt") == "dflt"
    assert "a" in d and len(d) == 2
    assert d.to_dict() == {"a": {"b": [1, {"c": 2}]}, "x-y": 3}
    with pytest.raises(AttributeError):
        _ = d.nope


def test_merge_dicts():
    assert merge_dicts({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}, "d": 4}) == {
        "a": {"b": 9, "c": 2}, "d": 4,
    }


def test_offload_manager_lazy_and_release():
    from foley_tpu.pipeline.manager import OffloadModelManager

    calls = {"n": 0}

    def loader():
        calls["n"] += 1
        return {"w": jnp.ones((4,))}

    m = OffloadModelManager(policy="drop")
    m.register("foley", loader)
    assert calls["n"] == 0
    _ = m.foley
    assert calls["n"] == 1
    _ = m.foley  # cached
    assert calls["n"] == 1
    m.release_inference_models()
    assert m.loaded == []
    _ = m.foley  # drop policy -> reload
    assert calls["n"] == 2
    with pytest.raises(KeyError):
        m.get("unknown")


def test_orbax_roundtrip(tmp_path):
    from foley_tpu.io.orbax_io import load_params, save_params

    params = {"a": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
              "b": jnp.ones((4,), jnp.bfloat16)}
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = load_params(path, template=params)
    assert restored["b"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(restored["a"]["w"]), np.asarray(params["a"]["w"]))


def test_param_report():
    from foley_tpu.utils.profiling import log_param_report

    report = log_param_report("test", {"mod": {"w": jnp.zeros((1024, 1024), jnp.float32)}})
    assert abs(report["mod"] - 4.0) < 1e-6  # 4 MiB
    assert report["__total__"] == report["mod"]


def test_node_schemas_complete():
    from foley_tpu.api.nodes import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

    assert set(NODE_CLASS_MAPPINGS) == {
        "HunyuanModelLoader", "HunyuanDependenciesLoader", "HunyuanFoleySampler",
        "HunyuanFoleyTorchCompile", "HunyuanBlockSwap", "HunyuanFoleyContinuation",
        "SelectAudioFromBatch",
    }
    assert set(NODE_DISPLAY_NAME_MAPPINGS) == set(NODE_CLASS_MAPPINGS)
    for name, cls in NODE_CLASS_MAPPINGS.items():
        schema = cls.INPUT_TYPES()
        assert "required" in schema, name
        assert isinstance(cls.RETURN_TYPES, tuple) and hasattr(cls, "FUNCTION")
        assert callable(getattr(cls, cls.FUNCTION))


def test_sampler_schema_matches_reference_contract():
    """Widget schema parity with reference nodes.py:213-237."""
    from foley_tpu.api.nodes import HunyuanFoleySampler

    req = HunyuanFoleySampler.INPUT_TYPES()["required"]
    assert req["negative_prompt"][1]["default"] == "noisy, harsh"
    assert req["cfg_scale"][1]["default"] == 4.5
    assert req["steps"][1]["default"] == 50
    assert req["sampler"][0] == ["euler", "heun-2", "midpoint-2", "kutta-4"]
    assert req["batch_size"][1]["max"] == 6
    assert req["duration"][1] ["min"] == 1.0


def test_package_surface():
    import foley_tpu

    assert callable(foley_tpu.load_model)
    assert callable(foley_tpu.denoise_process)
    assert callable(foley_tpu.feature_process)
    assert callable(foley_tpu.merge_audio_video)
    assert foley_tpu.AttributeDict is AttributeDict
    assert "HunyuanFoleySampler" in foley_tpu.NODE_CLASS_MAPPINGS


def test_compile_tracker():
    from foley_tpu.utils.profiling import CompileTracker

    tracker = CompileTracker()
    f = tracker.wrap("square", jax.jit(lambda x: x * x))
    f(jnp.ones((2,)))
    f(jnp.ones((2,)))      # cache hit
    f(jnp.ones((3,)))      # new bucket
    assert tracker.compiles.get("square", 0) >= 1


def test_spectral_correlation_metric():
    from foley_tpu.utils.metrics import snr_db, spectral_correlation

    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, 48000)
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    assert spectral_correlation(x, x) == pytest.approx(1.0, abs=1e-6)
    noisy = x + 0.01 * rng.normal(size=x.shape).astype(np.float32)
    assert spectral_correlation(x, noisy) > 0.99
    other = np.sin(2 * np.pi * 523 * t).astype(np.float32)
    assert spectral_correlation(x, other) < 0.9
    # sine power 0.5 over noise power 1e-4 -> 10*log10(5000) = 37.0 dB
    assert snr_db(noisy, x) == pytest.approx(37.0, abs=1.0)


def test_orbax_sharded_restore(tmp_path):
    """Restore directly onto mesh shardings (multi-chip checkpoint load path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from foley_tpu.io.orbax_io import load_params, save_params
    from foley_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    params = {"w": jnp.arange(32, dtype=jnp.float32).reshape(4, 8)}
    path = str(tmp_path / "ck")
    save_params(path, params)
    shardings = {"w": NamedSharding(mesh, P(None, "model"))}
    restored = load_params(path, template=params, shardings=shardings)
    assert restored["w"].sharding == shardings["w"]
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(params["w"]))


@pytest.mark.skipif(not os.path.exists("/root/reference/configs"), reason="reference not mounted")
def test_reference_yamls_parse_to_presets():
    """The reference repo's own YAML configs parse to our presets exactly."""
    assert config_from_yaml("/root/reference/configs/hunyuanvideo-foley-xxl.yaml").model == XXL.model
    assert config_from_yaml("/root/reference/configs/hunyuanvideo-foley-xl.yaml").model == XL.model


def test_block_suffix_offload_exact_and_per_block():
    """Per-block suffix split: output must equal the unsplit forward bit-for-bit structure
    (same sums, placement only), granularity must be per-block, and re-application with a
    different N must merge first (idempotent)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from foley_tpu.configs import TINY
    from foley_tpu.models import mmdit
    from foley_tpu.parallel.offload import (
        host_memory_available,
        is_split_stack,
        merge_block_suffix,
        offload_block_suffix,
    )

    if not host_memory_available():
        import pytest

        pytest.skip("no pinned_host memory kind on this backend")

    cfg = TINY.model  # 2 triple + 4 single blocks
    params = mmdit.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.normal(size=(1, 20, cfg.audio_vae_latent_dim)).astype(np.float32)),
        jnp.asarray([500.0], jnp.float32),
        jnp.asarray(rng.normal(size=(1, 8, cfg.condition_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 4, cfg.clip_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 8, cfg.sync_feat_dim)).astype(np.float32)),
    )
    ref = np.asarray(mmdit.apply(params, *args, cfg))

    # swap 3 of 6 blocks (suffix: all 3 from the single stack)
    split = offload_block_suffix(params, 3)
    assert is_split_stack(split["single_blocks"])
    assert not is_split_stack(split["triple_blocks"])
    res = split["single_blocks"]["resident"]
    assert jax.tree.leaves(res)[0].shape[0] == 1  # per-block granularity: keep 1 of 4
    assert len(split["single_blocks"]["offloaded"]) == 3  # one host tree per swapped block
    got = np.asarray(mmdit.apply(split, *args, cfg))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # swap more than the single stack: triple tail splits too
    split_all = offload_block_suffix(split, 5)  # re-apply on split input (merges first)
    assert is_split_stack(split_all["triple_blocks"])
    got_all = np.asarray(mmdit.apply(split_all, *args, cfg))
    np.testing.assert_allclose(got_all, ref, atol=1e-5, rtol=1e-5)

    # the gated fetch window (_run_stack prefetch_depth) is numerics-neutral at any depth:
    # serial (1 = default), double-buffered, wider than the tail
    for depth in (2, 3, 99):
        got_d = np.asarray(mmdit.apply(split_all, *args, cfg, offload_prefetch=depth))
        np.testing.assert_allclose(got_d, ref, atol=1e-5, rtol=1e-5)

    # incremental SHRINK while staying split (5 -> 2: returning blocks restack through host)
    split_back = offload_block_suffix(split_all, 2)
    assert is_split_stack(split_back["single_blocks"])
    assert not is_split_stack(split_back["triple_blocks"])
    assert len(split_back["single_blocks"]["offloaded"]) == 2
    assert jax.tree.leaves(split_back["single_blocks"]["resident"])[0].shape[0] == 2
    got_b = np.asarray(mmdit.apply(split_back, *args, cfg))
    np.testing.assert_allclose(got_b, ref, atol=1e-5, rtol=1e-5)

    # merge restores the plain stacked layout and the same numbers
    merged = merge_block_suffix(split_all)
    assert not is_split_stack(merged["single_blocks"])
    assert jax.tree.leaves(merged["single_blocks"])[0].shape[0] == 4
    got_m = np.asarray(mmdit.apply(merged, *args, cfg))
    np.testing.assert_allclose(got_m, ref, atol=1e-5, rtol=1e-5)


def test_sampler_block_swap_end_to_end():
    """Sampler node with block_swap_args produces finite audio; the split placement PERSISTS
    on the model (keeping an unsplit copy alive would double HBM and defeat the swap) and
    blocks_to_swap=0 merges the stacks back."""
    import jax.numpy as jnp
    import numpy as np

    from foley_tpu.api.nodes import HunyuanBlockSwap, HunyuanFoleySampler, HunyuanModelLoader
    from foley_tpu.configs import TINY
    from foley_tpu.models import dac_vae
    from foley_tpu.parallel.offload import is_split_stack

    foley_model = HunyuanModelLoader.init_random("tiny", "fp32", 0)
    deps = {"dac_params": dac_vae.init(jax.random.PRNGKey(1), TINY.dac), "dac_cfg": TINY.dac}
    (bs_args,) = HunyuanBlockSwap().set_args(blocks_to_swap=3)
    kw = dict(duration=1.0, prompt="x", steps=2, batch_size=1, seed=0,
              allow_unconditioned=True, force_offload=False)
    first, _ = HunyuanFoleySampler().generate_audio(
        foley_model, deps, block_swap_args=bs_args, **kw
    )
    wf = np.asarray(first["waveform"])
    assert wf.shape == (1, 1, 48000) and np.isfinite(wf).all()
    assert is_split_stack(foley_model["params"].get("single_blocks"))

    # blocks_to_swap=0 with the node attached merges the stacks back into HBM
    (zero_args,) = HunyuanBlockSwap().set_args(blocks_to_swap=0)
    first2, _ = HunyuanFoleySampler().generate_audio(
        foley_model, deps, block_swap_args=zero_args, **kw
    )
    assert not is_split_stack(foley_model["params"].get("single_blocks"))
    np.testing.assert_allclose(np.asarray(first2["waveform"]), wf, atol=1e-5)


def test_namespace_argv_roundtrips_zero_values():
    """CSV-batch argv rebuild must keep explicit zero-valued flags (0 == False in Python
    made the old `value in (None, False)` check drop them)."""
    from foley_tpu.cli import _namespace_to_argv, build_parser

    p = build_parser()
    args = p.parse_args(["--seed", "0", "--guidance_scale", "0.0",
                         "--single_prompt", "x", "--merge_video"])
    argv = _namespace_to_argv(args)
    assert "--seed" in argv and "--guidance_scale" in argv and "--merge_video" in argv
    again = p.parse_args(argv)
    assert again.seed == 0 and again.guidance_scale == 0.0 and again.merge_video is True
    assert again.single_video is None  # None-valued flags stay omitted


def test_partition_report_bytes():
    """block_swap_debug's memory report: MB split between host and HBM per placement."""
    from foley_tpu.configs import TINY
    from foley_tpu.models import mmdit
    from foley_tpu.parallel.offload import (
        host_memory_available, offload_block_suffix, partition_report,
    )

    params = mmdit.init(jax.random.PRNGKey(0), TINY.model, dtype=jnp.float32)
    rep = partition_report(params)
    assert rep["host_blocks"] == 0 and rep["host_mb"] == 0.0
    assert rep["device_blocks"] == TINY.model.depth_triple_blocks + TINY.model.depth_single_blocks
    assert rep["device_mb"] > 0

    if not host_memory_available():
        pytest.skip("no pinned_host memory kind on this backend")
    swapped = offload_block_suffix(params, 3)
    rep2 = partition_report(swapped)
    assert rep2["host_blocks"] == 3
    assert rep2["device_blocks"] == rep["device_blocks"] - 3
    assert rep2["host_mb"] > 0
    np.testing.assert_allclose(rep2["host_mb"] + rep2["device_mb"],
                               rep["device_mb"], rtol=1e-6)


def test_bench_probe_outage_vs_hard_failure(monkeypatch):
    """bench.accelerator_reachable rides out the axon outage signature (probe hang /
    UNAVAILABLE backend-init) but fails FAST on a hard env failure (broken jax import)."""
    import subprocess
    import sys
    import time as time_mod

    sys.path.insert(0, ".")
    import bench

    calls = {"n": 0}

    class R:
        def __init__(self, rc, err):
            self.returncode, self.stderr = rc, err

    monkeypatch.setattr(time_mod, "sleep", lambda s: None)

    def hard_fail(*a, **k):
        calls["n"] += 1
        return R(1, b"ImportError: No module named jax")

    monkeypatch.setattr(subprocess, "run", hard_fail)
    assert bench.accelerator_reachable(timeout_s=1, retry_budget_s=300) is False
    assert calls["n"] == 1  # no retries burned on a non-outage failure

    calls["n"] = 0

    def outage(*a, **k):
        calls["n"] += 1
        if calls["n"] >= 3:
            return R(0, b"")
        return R(1, b"Unable to initialize backend 'axon': UNAVAILABLE: ...")

    monkeypatch.setattr(subprocess, "run", outage)
    assert bench.accelerator_reachable(timeout_s=1, retry_budget_s=300) is True
    assert calls["n"] == 3  # retried through the outage, succeeded when service returned


def test_perturb_zero_leaves():
    """perturb_zero_leaves replaces exactly the all-zero float leaves (the reference's
    zero-init output layers), is deterministic, and leaves everything else bit-identical —
    the guard that keeps fidelity/plumbing measurements non-vacuous (round-3 verdict)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from foley_tpu.core.params import perturb_zero_leaves

    params = {
        "final": {"w": jnp.zeros((4, 3), jnp.bfloat16), "b": jnp.zeros((3,), jnp.float32)},
        "live": {"w": jnp.ones((2, 2), jnp.float32)},
        "ids": {"idx": jnp.zeros((5,), jnp.int32)},  # non-float zeros stay untouched
    }
    out = perturb_zero_leaves(params, jax.random.PRNGKey(0))
    assert np.any(np.asarray(out["final"]["w"])) and out["final"]["w"].dtype == jnp.bfloat16
    assert np.any(np.asarray(out["final"]["b"]))
    assert np.abs(np.asarray(out["final"]["b"])).max() < 0.2  # small-scale perturbation
    np.testing.assert_array_equal(np.asarray(out["live"]["w"]), np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(out["ids"]["idx"]), np.zeros(5))
    out2 = perturb_zero_leaves(params, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out["final"]["w"]), np.asarray(out2["final"]["w"]))
    assert np.any(np.asarray(out["final"]["w"]) !=
                  np.asarray(perturb_zero_leaves(params, jax.random.PRNGKey(1))["final"]["w"]))


def test_bench_mode_plumbing():
    """bench.py --mode variants build and run at tiny on CPU: quantized bundles flow
    through the same generate_audio path as the headline bf16 measurement."""
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    for mode in ("bf16", "int4"):
        elapsed, result = bench.run_once("tiny", 1.0, steps=2, batch_size=1, mode=mode)
        assert elapsed > 0
        assert result.audio_first.shape[-1] == 48000

    try:
        bench.run_once("tiny", 1.0, steps=2, batch_size=1, mode="bogus")
    except ValueError as e:
        assert "bogus" in str(e)
    else:
        raise AssertionError("unknown mode must raise")


def test_continuation_node_end_to_end():
    """HunyuanFoleyContinuation: extends an AUDIO dict, returns the NEW audio only,
    respects force_offload parking, and rejects wrong sample rates."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from foley_tpu.api.nodes import HunyuanFoleyContinuation, HunyuanModelLoader
    from foley_tpu.configs import TINY
    from foley_tpu.models import dac_vae

    foley_model = HunyuanModelLoader.init_random("tiny", "fp32", 0)
    deps = {"dac_params": dac_vae.init(jax.random.PRNGKey(1), TINY.dac), "dac_cfg": TINY.dac}
    rng = np.random.default_rng(3)
    src = {"waveform": np.clip(rng.normal(scale=0.1, size=(1, 1, 48000)), -1, 1)
           .astype(np.float32), "sample_rate": 48000}
    node = HunyuanFoleyContinuation()
    kw = dict(duration=1.0, prompt="more", context_s=0.5, steps=2, batch_size=2, seed=1,
              allow_unconditioned=True)
    first, batch = node.continue_audio(foley_model, deps, src, force_offload=True, **kw)
    assert np.asarray(first["waveform"]).shape == (1, 1, 48000)
    assert np.asarray(batch["waveform"]).shape == (2, 1, 48000)
    assert np.isfinite(np.asarray(batch["waveform"])).all()
    assert foley_model["_offloaded"]  # force_offload parked the params

    # a second call restores parked params and reproduces the result (same seed)
    first2, _ = node.continue_audio(foley_model, deps, src, force_offload=False, **kw)
    np.testing.assert_array_equal(np.asarray(first2["waveform"]),
                                  np.asarray(first["waveform"]))

    with pytest.raises(ValueError, match="48000"):
        node.continue_audio(foley_model, deps,
                            {"waveform": src["waveform"], "sample_rate": 44100}, **kw)


def test_block_swap_composes_with_quantized_storage():
    """Quantized stacks offload like bf16 ones: the suffix split and the per-iteration
    fetch walk the quantized leaf dicts ({int4, scale} / {int8, scale}, every array
    stacked [L, ...]) generically, so the memory modes COMPOSE — int4 blocks stream 4x
    fewer host->HBM bytes per step than bf16 offload (quarter weights)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from foley_tpu.configs import TINY
    from foley_tpu.io.quantize import quantize_int4, quantize_int8
    from foley_tpu.models import mmdit
    from foley_tpu.parallel.offload import (
        host_memory_available,
        is_split_stack,
        offload_block_suffix,
        partition_report,
    )

    if not host_memory_available():
        import pytest

        pytest.skip("no pinned_host memory kind on this backend")

    cfg = TINY.model
    params = mmdit.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.normal(size=(1, 20, cfg.audio_vae_latent_dim)).astype(np.float32)),
        jnp.asarray([500.0], jnp.float32),
        jnp.asarray(rng.normal(size=(1, 8, cfg.condition_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 4, cfg.clip_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 8, cfg.sync_feat_dim)).astype(np.float32)),
    )
    for quantize in (lambda p: quantize_int4(p, group_size=16),
                     lambda p: quantize_int8(p)):
        q, counts, _ = quantize(mmdit.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
        assert counts["quantized"] > 0
        ref = np.asarray(mmdit.apply(q, *args, cfg))
        split = offload_block_suffix(q, 3)
        assert is_split_stack(split["single_blocks"])
        rep = partition_report(split)
        assert rep["host_blocks"] == 3 and rep["host_mb"] > 0
        got = np.asarray(mmdit.apply(split, *args, cfg))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
