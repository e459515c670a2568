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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
