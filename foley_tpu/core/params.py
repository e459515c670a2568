"""Parameter pytree utilities: flatten/stack/cast.

Models in foley-tpu are functional: ``init(key, cfg) -> params`` (nested dict of jnp arrays)
and ``apply(params, ...) -> outputs``. Repeated blocks store their params *stacked* along a
leading depth axis so the block stack runs as one ``jax.lax.scan`` — the HLO is O(1) in depth
and compiles once, replacing the reference's 54 sequential eager nn.Modules
(``hifi_foley.py:818-910``).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict


def flatten_params(params: Dict, sep: str = ".") -> Dict[str, jnp.ndarray]:
    return {sep.join(map(str, k)): v for k, v in flatten_dict(params).items()}


def unflatten_params(flat: Dict[str, jnp.ndarray], sep: str = ".") -> Dict:
    return unflatten_dict({tuple(k.split(sep)): v for k, v in flat.items()})


def cast_params(
    params: Dict,
    dtype,
    predicate: Optional[Callable[[str, jnp.ndarray], bool]] = None,
) -> Dict:
    """Cast float leaves to ``dtype``; ``predicate(path, leaf)`` can exempt leaves."""
    flat = flatten_params(params)
    out = {}
    for path, leaf in flat.items():
        if jnp.issubdtype(leaf.dtype, jnp.floating) and (predicate is None or predicate(path, leaf)):
            out[path] = leaf.astype(dtype)
        else:
            out[path] = leaf
    return unflatten_params(out)


def stack_params(per_block: List[Dict]) -> Dict:
    """Stack a list of identical-structure param trees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_block)


def unstack_params(stacked: Dict, depth: int) -> List[Dict]:
    return [jax.tree.map(lambda x, i=i: x[i], stacked) for i in range(depth)]


def perturb_zero_leaves(params: Dict, key: jax.Array, scale: float = 0.02) -> Dict:
    """Replace every all-zero float leaf with small random values (for tests/benchmarks).

    The reference zero-initializes the output layers (its ``hifi_foley.py`` FinalLayer and
    the adaLN modulation tails), so a randomly-initialized model emits exactly zero velocity
    and any fidelity comparison through it is vacuous — the denoised latents equal the
    initial noise in EVERY numerics mode. Fidelity/plumbing tests must run through a
    non-trivial model: this perturbs exactly the zero-init leaves, leaving trained or
    already-random leaves untouched. Deterministic given ``key`` and the tree structure.
    """
    import numpy as np

    def _is_zero(l) -> bool:
        # device leaves: reduce on-device and fetch ONE bool — never the leaf itself
        # (an XXL tree is ~10 GiB; host round-trips through the TPU tunnel are the cost)
        if isinstance(l, np.ndarray):
            return not np.any(l)
        return not bool(jnp.any(l))

    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, max(len(leaves), 1))
    leaves = [
        jax.random.normal(k, l.shape, l.dtype) * scale
        if jnp.issubdtype(l.dtype, jnp.floating) and _is_zero(l) else l
        for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, leaves)


def param_count(params: Dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def param_bytes(params: Dict) -> int:
    return sum(int(x.size) * x.dtype.itemsize for x in jax.tree.leaves(params))
