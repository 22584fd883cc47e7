"""Parameter sharding rules: the sharded speaker-softmax.

The x-vector trunk is ~4-6 M params (replicate it); the one axis worth
sharding is the classification kernel [embed_dim, num_speakers] for large
speaker counts (SURVEY.md §2.5 "sharded-softmax"). Columns are sharded over
the mesh's "model" axis; under jit the SPMD partitioner computes local
logits per shard and inserts the cross-shard collectives for logsumexp /
target-logit gathers automatically.

Config knob: ``model_parallel`` (int, default 1) — the mesh becomes
(data, model) and these rules activate.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path-substring, PartitionSpec) — first match wins; default is replicated.
DEFAULT_RULES: List[Tuple[str, P]] = [
    ("softmax/output_kernel", P(None, MODEL_AXIS)),
    ("softmax/output_bias", P(MODEL_AXIS)),
]


def sharding_for_path(path: str, mesh: Mesh, rules=None) -> NamedSharding:
    if MODEL_AXIS in mesh.axis_names:
        for sub, spec in rules or DEFAULT_RULES:
            if sub in path:
                return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, rules=None):
    """device_put every param with its rule-matched sharding."""
    def _key_str(k):
        if hasattr(k, "key"):
            return str(k.key)
        if hasattr(k, "idx"):
            return str(k.idx)
        return str(k)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    leaves = []
    for path, leaf in flat:
        name = "/".join(_key_str(k) for k in path)
        leaves.append(jax.device_put(leaf, sharding_for_path(name, mesh, rules)))
    return jax.tree.unflatten(treedef, leaves)
