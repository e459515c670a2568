"""Test configuration: run everything on a local CPU backend with 8 virtual devices.

Note: in the axon environment JAX_PLATFORMS=cpu alone does NOT stop the TPU plugin from
becoming the default backend — ``jax.config.update('jax_platforms', 'cpu')`` is required to
pin tests to local CPU. Multi-chip sharding is validated on the 8-device virtual mesh
(the reference has no distributed precedent to copy — SURVEY.md §4); real-TPU behavior is
exercised by ``bench.py`` and the driver's compile checks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _ensure_map_count_headroom(minimum: int = 262144) -> None:
    """Raise vm.max_map_count when it is at the 65530 default and we can (root).

    The full suite JIT-compiles hundreds of XLA:CPU executables in ONE process; memory
    mappings grow past 65k before the alphabetical tail, and a failed mmap inside LLVM's
    JIT is a hard SIGSEGV, not an exception (observed three times at
    test_training_data's train-step compile — the last big compile of the run)."""
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            current = int(f.read())
        if current >= minimum:
            return
        with open(path, "w") as f:
            f.write(str(minimum))
    except (OSError, PermissionError):
        import warnings

        warnings.warn(
            f"vm.max_map_count is {current} and could not be raised (need root); the full "
            f"suite may exhaust memory mappings and SIGSEGV late in the run — run "
            f"`sysctl -w vm.max_map_count={minimum}` or split the suite into several "
            f"pytest processes",
            stacklevel=1,
        )


_ensure_map_count_headroom()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
