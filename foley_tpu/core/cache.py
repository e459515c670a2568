"""Persistent XLA compilation cache setup.

The reference's torch.compile costs ~2 minutes on every fresh process (``nodes.py:436``) and
only amortizes within a session. JAX can persist compiled executables across processes; this
enables it once per process (default dir overridable via FOLEY_TPU_CACHE_DIR), so the XXL
denoise program compiles once per machine, not once per restart.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache. Returns the cache dir."""
    global _enabled
    import jax

    cache_dir = cache_dir or os.environ.get(
        "FOLEY_TPU_CACHE_DIR", os.path.expanduser("~/.cache/foley_tpu/xla")
    )
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    return cache_dir
