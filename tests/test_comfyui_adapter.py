"""ComfyUI adapter: torch-tensor boundary conversions + workflow-JSON compatibility."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

import comfyui_adapter
from foley_tpu.configs import TINY
from foley_tpu.models import dac_vae


def test_mappings_match_reference_names():
    assert set(comfyui_adapter.NODE_CLASS_MAPPINGS) == {
        "HunyuanModelLoader", "HunyuanDependenciesLoader", "HunyuanFoleySampler",
        "HunyuanFoleyTorchCompile", "HunyuanBlockSwap", "SelectAudioFromBatch",
    }


def test_example_workflow_nodes_resolve():
    path = os.path.join(os.path.dirname(__file__), "..", "example_workflows",
                        "HunyuanVideoFoleyExample.json")
    graph = json.load(open(path))
    for node in graph["nodes"]:
        assert node["type"] in comfyui_adapter.NODE_CLASS_MAPPINGS, node["type"]
        cls = comfyui_adapter.NODE_CLASS_MAPPINGS[node["type"]]
        schema = cls.INPUT_TYPES()
        known = set(schema.get("required", {})) | set(schema.get("optional", {}))
        for key in node["inputs"]:
            assert key in known, (node["type"], key)


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
