"""Native checkpoint save/load via Orbax.

The reference only ever *reads* torch checkpoints (SURVEY.md §5.4). Here converted pytrees can
be persisted in Orbax's sharded, mmap-friendly format so the torch -> pytree conversion and
weight-norm folding run once; subsequent loads restore directly to device (optionally with a
sharding spec for multi-chip restore). fp8 leaves round-trip bit-exact.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from foley_tpu.utils.logging import get_logger

logger = get_logger()


def save_params(path: str, params: Dict, force: bool = True) -> None:
    """Save a param pytree to ``path`` (directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=force)
    logger.info(f"saved checkpoint to {path}")


def load_params(path: str, template: Optional[Dict] = None, shardings: Optional[Dict] = None) -> Dict:
    """Restore a param pytree. ``template`` (abstract or concrete tree) fixes structure/dtypes;
    ``shardings`` (pytree of jax.sharding.Sharding) restores directly sharded."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            abstract = jax.tree.map(
                lambda x, s=None: jax.ShapeDtypeStruct(x.shape, x.dtype), template
            )
            if shardings is not None:
                abstract = jax.tree.map(
                    lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
                    abstract, shardings,
                )
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)
