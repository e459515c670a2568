"""ComfyUI adapter: torch-tensor boundary conversions + workflow-JSON compatibility."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import comfyui_adapter
from foley_tpu.configs import TINY
from foley_tpu.models import dac_vae


def test_mappings_match_reference_names():
    assert set(comfyui_adapter.NODE_CLASS_MAPPINGS) == {
        "HunyuanModelLoader", "HunyuanDependenciesLoader", "HunyuanFoleySampler",
        "HunyuanFoleyTorchCompile", "HunyuanBlockSwap", "HunyuanFoleyContinuation",
        "SelectAudioFromBatch",
    }


OUR_WORKFLOW = os.path.join(os.path.dirname(__file__), "..", "example_workflows",
                            "HunyuanVideoFoleyExample.json")
REF_WORKFLOW = "/root/reference/example_workflows/HunyuanVideoFoleyExample.json"


def test_example_workflow_is_litegraph_and_nodes_resolve():
    from comfyui_adapter.workflow import load_workflow, map_widgets

    graph = load_workflow(OUR_WORKFLOW)
    # real litegraph export shape (same top-level schema as the reference's export)
    assert {"nodes", "links", "version", "last_node_id", "config", "extra"} <= set(graph)
    foley_nodes = 0
    for node in graph["nodes"]:
        if node["type"] not in comfyui_adapter.NODE_CLASS_MAPPINGS:
            continue  # external UI nodes (PreviewAudio)
        foley_nodes += 1
        cls = comfyui_adapter.NODE_CLASS_MAPPINGS[node["type"]]
        schema = cls.INPUT_TYPES()
        known = set(schema.get("required", {})) | set(schema.get("optional", {}))
        for slot in node.get("inputs", []):
            assert slot["name"] in known, (node["type"], slot["name"])
        for key in map_widgets(cls, node.get("widgets_values")):
            assert key in known, (node["type"], key)
    assert foley_nodes == 6


@pytest.fixture(scope="module")
def graph_ckpts(tmp_path_factory):
    """Tiny on-disk checkpoints for executing workflow JSONs end to end."""
    import jax.numpy as jnp

    from foley_tpu.io.orbax_io import save_params
    from foley_tpu.models import mmdit
    from helpers import save_dac_checkpoint, save_tiny_clap_checkpoint

    root = tmp_path_factory.mktemp("wf_ckpts")
    params = mmdit.init(jax.random.PRNGKey(0), TINY.model, dtype=jnp.float32)
    save_params(str(root / "mmdit_orbax"), params)
    save_dac_checkpoint(str(root / "vae_128d_48k.safetensors"), TINY.dac)
    save_tiny_clap_checkpoint(str(root / "clap"), hidden=TINY.model.condition_dim, heads=2)
    return root


def _foley_overrides(root):
    return {
        "loader": {"model_name": str(root / "mmdit_orbax"), "precision": "fp32",
                   "quantization": "none", "config": "tiny"},
        "deps": {"vae_model": str(root / "vae_128d_48k.safetensors"),
                 "synchformer_model": None, "siglip2_model": "",
                 "clap_model": str(root / "clap")},
        "compile": {"durations": "1", "batch_sizes": "1", "text_buckets": "77"},
        "blockswap": {"blocks_to_swap": 0},
        "sampler": {"duration": 1.0, "steps": 2, "batch_size": 1},
    }


def _ids_by_type(graph):
    return {n["type"]: n["id"] for n in graph["nodes"]}


def test_our_workflow_executes(graph_ckpts):
    from comfyui_adapter.workflow import execute_workflow, load_workflow

    graph = load_workflow(OUR_WORKFLOW)
    ids = _ids_by_type(graph)
    ov = _foley_overrides(graph_ckpts)
    captured = {}

    def preview(node, inputs):
        captured[node["id"]] = inputs["audio"]
        return ()

    results = execute_workflow(
        graph,
        overrides={ids["HunyuanModelLoader"]: ov["loader"],
                   ids["HunyuanDependenciesLoader"]: ov["deps"],
                   ids["HunyuanFoleyTorchCompile"]: ov["compile"],
                   ids["HunyuanBlockSwap"]: ov["blockswap"],
                   ids["HunyuanFoleySampler"]: dict(ov["sampler"], batch_size=2)},
        external={"PreviewAudio": preview},
    )
    first = results[ids["HunyuanFoleySampler"]][0]
    assert isinstance(first["waveform"], torch.Tensor)
    assert first["waveform"].shape == (1, 1, 48000)
    picked = results[ids["SelectAudioFromBatch"]][0]
    assert picked["waveform"].shape == (1, 1, 48000)
    assert len(captured) == 2  # both PreviewAudio nodes received audio


def test_reference_workflow_executes(graph_ckpts):
    """The reference repo's OWN litegraph export runs through the adapter unchanged
    (checkpoint paths/sizes overridden to tiny; VHS video nodes stubbed)."""
    from comfyui_adapter.workflow import execute_workflow, load_workflow

    graph = load_workflow(REF_WORKFLOW)
    ids = _ids_by_type(graph)
    ov = _foley_overrides(graph_ckpts)
    captured = {"previews": 0, "combined": None}

    def load_video(node, inputs):
        frames = torch.rand(16, 32, 32, 3)  # IMAGE, frame_count, audio, video_info
        return (frames, frames.shape[0], None, {"source_fps": 16})

    def preview(node, inputs):
        captured["previews"] += 1
        return ()

    def combine(node, inputs):
        captured["combined"] = inputs.get("audio")
        return ("out.mp4",)

    results = execute_workflow(
        graph,
        overrides={ids["HunyuanModelLoader"]: ov["loader"],
                   ids["HunyuanDependenciesLoader"]: ov["deps"],
                   ids["HunyuanFoleyTorchCompile"]: ov["compile"],
                   ids["HunyuanBlockSwap"]: ov["blockswap"],
                   ids["HunyuanFoleySampler"]: ov["sampler"]},
        external={"VHS_LoadVideoPath": load_video, "PreviewAudio": preview,
                  "VHS_VideoCombine": combine},
    )
    first, batch = results[ids["HunyuanFoleySampler"]]
    assert isinstance(first["waveform"], torch.Tensor)
    assert first["waveform"].shape == (1, 1, 48000)
    assert np.isfinite(first["waveform"].numpy()).all()
    assert captured["previews"] == 2
    assert captured["combined"] is not None


def test_sampler_accepts_torch_image_and_returns_torch_audio():
    from foley_tpu.api.nodes import HunyuanModelLoader

    foley_model = HunyuanModelLoader.init_random("tiny", "fp32", 0)
    deps = {"dac_params": dac_vae.init(jax.random.PRNGKey(1), TINY.dac), "dac_cfg": TINY.dac}
    image = torch.rand(8, 16, 16, 3)  # ComfyUI IMAGE layout (no encoders -> frames unused)
    sampler = comfyui_adapter.NODE_CLASS_MAPPINGS["HunyuanFoleySampler"]()
    first, batch = sampler.generate_audio(
        foley_model, deps, duration=1.0, prompt="x", steps=2, batch_size=2, seed=0,
        image=image, allow_unconditioned=True,
    )
    assert isinstance(first["waveform"], torch.Tensor)
    assert first["waveform"].shape == (1, 1, 48000)
    assert batch["waveform"].shape == (2, 1, 48000)

    select = comfyui_adapter.NODE_CLASS_MAPPINGS["SelectAudioFromBatch"]()
    (picked,) = select.select_audio(batch, index=1)
    assert isinstance(picked["waveform"], torch.Tensor)
    torch.testing.assert_close(picked["waveform"], batch["waveform"][1:2])
