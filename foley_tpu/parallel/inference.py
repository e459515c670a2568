"""Multi-chip inference: shard the generation bundle over a ('data', 'model') mesh.

The north-star deployment is a v5p-8 slice (BASELINE.json): the CFG-doubled batch rides the
'data' axis and attention-head/MLP dimensions ride 'model' (Megatron col/row rules from
``parallel/sharding.py``), with XLA inserting the ICI collectives. The single-chip
``denoise_latents``/``generate_audio`` path is reused unchanged — sharding is carried by the
input arrays, so the same jitted program scales from 1 chip to a slice.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from foley_tpu.parallel.mesh import DATA_AXIS, make_mesh
from foley_tpu.parallel.sharding import batch_sharding, shard_params
from foley_tpu.pipeline.generate import ModelBundle
from foley_tpu.utils.logging import get_logger

logger = get_logger()


def shard_bundle(bundle: ModelBundle, mesh: Optional[Mesh] = None) -> ModelBundle:
    """Place MMDiT params per the TP rules and replicate the DAC decoder over the mesh."""
    mesh = mesh or make_mesh()
    replicated = NamedSharding(mesh, P())
    dac_params = jax.tree.map(lambda x: jax.device_put(x, replicated), bundle.dac_params)
    mmdit_params = shard_params(bundle.mmdit_params, mesh)
    logger.info(f"bundle sharded over mesh {dict(mesh.shape)}")
    return bundle._replace(mmdit_params=mmdit_params, dac_params=dac_params)


def sharded_generate(bundle: ModelBundle, mesh: Mesh, *args, **kwargs):
    """``generate_audio`` with the initial latents and CFG features sharded on 'data'.

    The CFG pair (2B rows) must be divisible by the data-axis size. All other arguments
    match ``pipeline.generate.generate_audio``.
    """
    from foley_tpu.pipeline import generate as gen

    # generate_audio builds latents/features internally from host inputs; under a mesh
    # context, jit propagates the param shardings and partitions the batch automatically
    # via the computation-follows-sharding rule. We only need the mesh active.
    with mesh:
        return gen.generate_audio(bundle, *args, **kwargs)
