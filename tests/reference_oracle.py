"""Import the reference's LITERAL torch code as a golden oracle.

The transcription goldens (test_mmdit_full_golden, test_dac, test_scheduler) pin our JAX
code against hand-written torch math; if a transcription misreads the reference, both sides
are consistently wrong. This module lets tests import the reference's *actual* modules from
``/root/reference`` by installing ~20-line ``sys.modules`` stubs for the four dependencies
missing in this image (``comfy``, ``diffusers``, ``loguru``, ``audiotools`` + ``argbind``).
Only dependency *shims* are stubbed — every line of model/scheduler math executed by the
oracle tests is the reference's own code.

Reference import surfaces covered (see each file's imports):
- ``hunyuanvideo_foley/models/hifi_foley.py:7-17`` (comfy, loguru, diffusers)
- ``hunyuanvideo_foley/utils/schedulers/scheduling_flow_match_discrete.py:8-10`` (diffusers)
- ``hunyuanvideo_foley/models/dac_vae/{__init__,model/discriminator,utils/__init__}``
  (audiotools, argbind; dac.py itself falls back to the reference's own
  ``_audiotools_stubs`` when audiotools is absent)
"""

from __future__ import annotations

import functools
import importlib
import inspect
import sys
import types

import torch

REF_ROOT = "/root/reference"


def _mk_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


class _AttrDict(dict):
    """Minimal stand-in for diffusers' FrozenDict: attribute access over init kwargs."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:  # pragma: no cover - mirrors AttributeError contract
            raise AttributeError(name) from exc


def _register_to_config(init):
    """Stub of ``diffusers.configuration_utils.register_to_config``.

    Captures the bound init arguments (with defaults applied) into ``self._internal_dict``
    so the reference code's ``self.config.<field>`` reads work.
    """

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        object.__setattr__(self, "_internal_dict", _AttrDict(cfg))
        init(self, *args, **kwargs)

    return wrapper


class _ConfigMixin:
    @property
    def config(self):
        return self._internal_dict


class _ModelMixin(torch.nn.Module):
    pass


class _SchedulerMixin:
    pass


class _BaseOutput:
    pass


class _NullLogger:
    def _log(self, *a, **k):
        pass

    info = debug = warning = error = success = trace = _log


class _ProgressBar:
    def __init__(self, total=0):
        self.total = total

    def update(self, *a, **k):
        pass

    def update_absolute(self, *a, **k):
        pass


def install_stubs() -> None:
    """Install sys.modules stubs for comfy/diffusers/loguru/audiotools/argbind (idempotent)."""
    if "diffusers" in sys.modules and not getattr(sys.modules["diffusers"], "_foley_tpu_stub", False):
        raise RuntimeError("real diffusers present; oracle stubs would shadow it")
    if "diffusers" in sys.modules:
        return

    logger = _NullLogger()

    diffusers = _mk_module("diffusers", _foley_tpu_stub=True)
    diffusers.models = _mk_module("diffusers.models", ModelMixin=_ModelMixin)
    diffusers.configuration_utils = _mk_module(
        "diffusers.configuration_utils",
        ConfigMixin=_ConfigMixin,
        register_to_config=_register_to_config,
    )
    diffusers.utils = _mk_module(
        "diffusers.utils",
        BaseOutput=_BaseOutput,
        logging=types.SimpleNamespace(get_logger=lambda *_a, **_k: logger),
    )
    diffusers.schedulers = _mk_module(
        "diffusers.schedulers",
        DDPMScheduler=type("DDPMScheduler", (), {}),
        EulerDiscreteScheduler=type("EulerDiscreteScheduler", (), {}),
    )
    diffusers.schedulers.scheduling_utils = _mk_module(
        "diffusers.schedulers.scheduling_utils", SchedulerMixin=_SchedulerMixin
    )

    comfy = _mk_module("comfy")
    comfy.model_management = _mk_module(
        "comfy.model_management",
        get_torch_device=lambda: torch.device("cpu"),
        unet_offload_device=lambda: torch.device("cpu"),
        soft_empty_cache=lambda *a, **k: None,
    )
    comfy.utils = _mk_module("comfy.utils", ProgressBar=_ProgressBar)

    _mk_module("loguru", logger=logger)

    class _BaseModel(torch.nn.Module):
        INTERN = []
        EXTERN = []

    audiotools = _mk_module(
        "audiotools",
        AudioSignal=type("AudioSignal", (), {}),
        STFTParams=type("STFTParams", (), {"__init__": lambda self, **k: None}),
    )
    audiotools.ml = _mk_module(
        "audiotools.ml", BaseModel=_BaseModel, Accelerator=type("Accelerator", (), {})
    )

    def _bind(*_a, **_k):
        def deco(fn):
            return fn

        return deco

    _mk_module("argbind", bind=_bind)


def import_reference(module_name: str):
    """Import ``module_name`` (e.g. 'hunyuanvideo_foley.models.hifi_foley') from /root/reference."""
    install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(module_name)


def make_model_config(**model_kwargs):
    """Build the nested ``model_config.model_config.model_kwargs`` object hifi_foley expects
    (``hifi_foley.py:402``)."""
    return types.SimpleNamespace(
        model_config=types.SimpleNamespace(model_kwargs=dict(model_kwargs))
    )
