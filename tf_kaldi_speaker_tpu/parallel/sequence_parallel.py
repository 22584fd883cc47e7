"""Sequence parallelism: shard one utterance's time axis across the mesh.

SURVEY.md §5: statistics pooling is associative, so genuine SP is cheap —
each device runs the frame-level TDNN on its time-chunk (chunks overlap by
the conv receptive field, so no halo exchange is needed at runtime) and the
pooled sufficient statistics are combined with one psum; the utterance-level
layers then run replicated. Embeds one very long utterance EXACTLY with
L/n_devices memory and compute per chip.

This complements the host-side streamed accumulation
(extract/extractor.py:embed_long_exact) — same math, device-parallel
instead of sequential.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.pooling import VAR2STD_EPSILON
from ..models.tdnn import TDNN_TOTAL_CONTEXT, TDNNFrames, TDNNTail
from .mesh import DATA_AXIS


def sp_embed(
    variables: Dict[str, Any],
    config: Dict[str, Any],
    feature: np.ndarray,
    mesh: Mesh,
    node: str = "tdnn6_dense",
) -> np.ndarray:
    """Embed one [L, D] utterance with the time axis sharded over the mesh.

    ``variables`` is the TDNN subtree ({"params": ..., "batch_stats": ...},
    i.e. state.params["network"]["tdnn"] / the extractor's tdnn vars).
    """
    n = mesh.shape[DATA_AXIS]
    ctx = TDNN_TOTAL_CONTEXT
    L, D = feature.shape
    frames = TDNNFrames(config=config)
    tail = TDNNTail(config=config)

    # Valid frame-level positions: L - ctx. Give each device an equal chunk
    # of positions; chunk i covers input rows [i*step, i*step + chunk + ctx).
    positions = L - ctx
    step = int(np.ceil(positions / n))
    chunk_in = step + ctx
    chunks = np.zeros((n, chunk_in, D), feature.dtype)
    valid = np.zeros((n,), np.int32)
    for i in range(n):
        s = i * step
        e = min(s + chunk_in, L)
        chunks[i, : e - s] = feature[s:e]
        valid[i] = max(min(step, positions - s), 0)

    spec_in = P(DATA_AXIS)
    rep = P()

    @jax.jit
    def run(chunks, valid):
        def per_device(chunks_l, valid_l):
            h = frames.apply(variables, chunks_l, False)  # [1, step, W]
            w = h.shape[-1]
            idx = jnp.arange(h.shape[1])[None, :, None]
            m = (idx < valid_l[:, None, None]).astype(h.dtype)
            s1 = jnp.sum(h * m, axis=(0, 1))
            s2 = jnp.sum(jnp.square(h) * m, axis=(0, 1))
            cnt = jnp.sum(m[:, :, 0])
            # Combine sufficient statistics across the time shards.
            s1 = jax.lax.psum(s1, DATA_AXIS)
            s2 = jax.lax.psum(s2, DATA_AXIS)
            cnt = jax.lax.psum(cnt, DATA_AXIS)
            return s1[None], s2[None], cnt[None]

        s1, s2, cnt = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(spec_in, spec_in),
            out_specs=(spec_in, spec_in, spec_in),
        )(chunks, valid)
        s1, s2, cnt = s1[0], s2[0], cnt[0]
        mean = s1 / cnt
        var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
        std = jnp.sqrt(jnp.where(var <= VAR2STD_EPSILON, VAR2STD_EPSILON, var))
        pooled = jnp.concatenate([mean, std])[None, :]
        endpoints = tail.apply(variables, pooled, False)
        return endpoints[node][0]

    return np.asarray(run(jnp.asarray(chunks), jnp.asarray(valid)))
