"""Persistent XLA compilation cache setup.

The reference's torch.compile costs ~2 minutes on every fresh process (``nodes.py:436``) and
only amortizes within a session. JAX can persist compiled executables across processes; this
enables it once per process (default dir overridable via FOLEY_TPU_CACHE_DIR), so the XXL
denoise program compiles once per machine, not once per restart.
"""

from __future__ import annotations

import hashlib
import os

_enabled = False
_active_dir: str | None = None


def _machine_tag() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU AOT executables embed the COMPILE machine's features; loading one on a host
    with different features is only warned about ("could lead to execution errors such as
    SIGILL") and has produced real segfaults here when a cache directory outlived a VM
    migration (cpu_aot_loader feature-mismatch warnings, then SIGSEGV inside
    backend_compile_and_load). Namespacing the cache dir by the feature set makes a
    migrated host start a fresh CPU cache instead of loading the old machine's code."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split(":", 1)[1].split())).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    return "unknown"


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache.

    Returns the ACTIVE cache dir: the first caller's choice wins for the process (the
    jax cache config is global and not re-pointed), so a later call with a different
    path gets the directory actually in use, never an uncreated path."""
    global _enabled, _active_dir
    import jax

    cache_dir = cache_dir or os.path.join(
        os.environ.get("FOLEY_TPU_CACHE_DIR", os.path.expanduser("~/.cache/foley_tpu/xla")),
        _machine_tag(),
    )
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
        _active_dir = cache_dir
    return _active_dir
