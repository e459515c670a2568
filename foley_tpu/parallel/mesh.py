"""Device mesh construction.

The reference is strictly single-device (SURVEY.md §2.9: no torch.distributed anywhere);
scaling here is new capability, TPU-native: a 2-D ('data', 'model') mesh over ICI, with the
CFG-doubled batch sharded on 'data' and attention-head/MLP dimensions sharded on 'model'.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    Defaults: all available devices on the data axis (CFG batch is 2B, so data parallelism is
    the free win); pass ``model`` > 1 for tensor parallelism on big configs / low latency.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and model is None:
        data, model = n, 1
    elif data is None:
        assert n % model == 0, (n, model)
        data = n // model
    elif model is None:
        assert n % data == 0, (n, data)
        model = n // data
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
