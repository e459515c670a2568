"""Tracing / profiling / observability.

The reference's surface (SURVEY.md §5.1): loguru phase banners, per-block BlockSwap debug
timing, an ASCII compile-progress tracker keyed on input-signature hashes (``nodes.py:497-568``),
and model-size reports. TPU-native equivalents here:

- ``phase(...)``: wall-clock phase banners (feature extraction / denoise / decode);
- ``trace(...)``: JAX profiler traces viewable in TensorBoard/XProf;
- ``CompileTracker``: logs XLA compile-cache misses per shape bucket — the analog of the
  reference's per-(block, signature) compile progress bar, built on jax's compilation cache
  hooks rather than blake2s hashes of tensor metadata;
- ``log_param_report``: param count / bytes per top-level module (analog of
  ``params_count`` ``hifi_foley.py:938-965`` and the fp8 GiB-saved report).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax

from foley_tpu.core.params import param_bytes, param_count
from foley_tpu.utils.logging import get_logger

logger = get_logger()


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Phase banner + wall-clock timing (reference phase banners nodes.py:280,355,394)."""
    logger.info(f"=== {name} ===")
    t0 = time.perf_counter()
    yield
    logger.info(f"=== {name} done in {time.perf_counter() - t0:.2f}s ===")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/foley_tpu_trace") -> Iterator[None]:
    """JAX profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {log_dir}")


class CompileTracker:
    """Counts jit compilations (cache misses) per tagged callable.

    Usage: wrap jitted fns with ``tracker.wrap(name, fn)``; each distinct input shape bucket
    triggers one compile, which is logged with its trace time — the signal the reference
    surfaces as its compile progress bar.
    """

    def __init__(self):
        self.compiles: Dict[str, int] = {}

    def wrap(self, name: str, jitted_fn):
        def wrapped(*args, **kwargs):
            before = jitted_fn._cache_size() if hasattr(jitted_fn, "_cache_size") else None
            t0 = time.perf_counter()
            out = jitted_fn(*args, **kwargs)
            if before is not None:
                after = jitted_fn._cache_size()
                if after > before:
                    self.compiles[name] = self.compiles.get(name, 0) + 1
                    logger.info(
                        f"compiled {name} (bucket #{self.compiles[name]}) "
                        f"in {time.perf_counter() - t0:.1f}s"
                    )
            return out

        return wrapped


def log_param_report(name: str, params: Dict) -> Dict[str, float]:
    """Log and return {submodule: MiB} + totals (analog of get_module_memory_mb reports)."""
    report = {}
    for key, sub in params.items():
        mib = param_bytes(sub) / 2**20 if isinstance(sub, dict) else (
            sub.size * sub.dtype.itemsize / 2**20
        )
        report[key] = mib
    total_mb = param_bytes(params) / 2**20
    logger.info(
        f"{name}: {param_count(params) / 1e6:.1f}M params, {total_mb:.1f} MiB "
        f"({', '.join(f'{k}={v:.0f}MiB' for k, v in sorted(report.items(), key=lambda kv: -kv[1])[:5])})"
    )
    report["__total__"] = total_mb
    return report
