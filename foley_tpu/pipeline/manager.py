"""Lazy model manager with explicit phase release — the OffloadModelManager analog.

The reference's ``OffloadModelManager``/``OffloadModelDict`` (``model_utils.py:17-487``) lazily
loads each of the five models on first property access and exposes
``release_feature_models()`` / ``release_inference_models()`` to drop them from GPU between
the two pipeline phases. The TPU-native equivalent keeps loader thunks and moves params
between device HBM and pinned host memory (or simply deletes them for a cold release) —
placement is a ``jax.device_put``, not a module ``.to()`` walk.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from foley_tpu.parallel.offload import host_memory_available, offload_params, restore_params
from foley_tpu.utils.logging import get_logger

logger = get_logger()

FEATURE_MODELS = ("clap", "siglip2", "synchformer")
INFERENCE_MODELS = ("foley", "dac")


class OffloadModelManager:
    """Lazily-loaded model registry with phase-based residency control.

    Register loader thunks once; access via attributes (``manager.foley``); release a phase's
    models with ``release_feature_models()`` / ``release_inference_models()``.
    ``policy``: 'host' parks params in pinned host memory (fast re-activation, the reference's
    offload-device behavior); 'drop' deletes them (reload on next access).
    """

    def __init__(self, policy: str = "host"):
        assert policy in ("host", "drop")
        self.policy = policy if host_memory_available() or policy == "drop" else "drop"
        self._loaders: Dict[str, Callable[[], Any]] = {}
        self._live: Dict[str, Any] = {}
        self._offloaded: Dict[str, Any] = {}

    def register(self, name: str, loader: Callable[[], Any]) -> None:
        self._loaders[name] = loader

    def __getattr__(self, name: str):
        if name.startswith("_") or name in ("policy",):
            raise AttributeError(name)
        return self.get(name)

    def get(self, name: str):
        if name in self._live:
            return self._live[name]
        if name in self._offloaded:
            logger.info(f"restoring {name} to device")
            obj = self._offloaded.pop(name)
            obj = _map_params(obj, restore_params)
            self._live[name] = obj
            return obj
        if name not in self._loaders:
            raise KeyError(f"No model {name!r} registered; have {sorted(self._loaders)}")
        logger.info(f"lazy-loading {name}")
        obj = self._loaders[name]()
        self._live[name] = obj
        return obj

    def release(self, *names: str) -> None:
        for name in names:
            if name not in self._live:
                continue
            obj = self._live.pop(name)
            if self.policy == "host":
                self._offloaded[name] = _map_params(obj, offload_params)
                logger.info(f"offloaded {name} to host memory")
            else:
                del obj
                logger.info(f"dropped {name} (will reload on next access)")

    def release_feature_models(self) -> None:
        """Free the condition encoders before denoising (reference model_utils phase flip)."""
        self.release(*FEATURE_MODELS)

    def release_inference_models(self) -> None:
        """Free the denoiser/codec before feature extraction."""
        self.release(*INFERENCE_MODELS)

    @property
    def loaded(self):
        return sorted(self._live)


def _map_params(obj: Any, fn: Callable) -> Any:
    """Apply ``fn`` to the params of a model object (dict pytree, or objects with .params)."""
    if isinstance(obj, dict):
        return fn(obj)
    if hasattr(obj, "params"):
        obj.params = fn(obj.params)
        return obj
    return obj
