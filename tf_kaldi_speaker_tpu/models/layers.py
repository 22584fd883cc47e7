"""Shared neural building blocks (flax) and math helpers (jnp).

Functional counterparts of reference model/common.py:7-265 — PReLU,
l2 re-scaling, pairwise distance/cosine matrices, dense(+bn)(+act) blocks,
and head split/merge — implemented for [B, L, D] time-major batches with
static shapes.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

VAR2STD_EPSILON = 1e-12

# TF's tf.layers defaults are glorot_uniform kernels + zero bias; we keep
# that so configs reproduce the reference's training dynamics.
kernel_init = nn.initializers.glorot_uniform()


class PReLU(nn.Module):
    """Parametric ReLU with per-channel alpha (reference common.py:27-42)."""

    shared: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size = 1 if self.shared else x.shape[-1]
        alpha = self.param("alpha", nn.initializers.constant(0.01), (size,))
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def get_relu(params: Dict[str, Any]) -> Callable:
    """Activation selected by ``network_relu_type`` (relu/prelu/lrelu).

    PReLU introduces parameters, so callers instantiate it per use site via
    the returned factory: f(name) -> callable.
    """
    kind = params.get("network_relu_type", "relu")
    if kind == "prelu":
        return lambda name: PReLU(name=name)
    if kind == "lrelu":
        return lambda name: (lambda x: nn.leaky_relu(x))
    return lambda name: (lambda x: nn.relu(x))


# tf.layers.batch_normalization default (the reference never overrides it);
# flax's default is 1e-5, which would shift every BN output vs real TF.
TF_BN_EPSILON = 1e-3


def l2_scaling(x: jnp.ndarray, scaling_factor: float, epsilon: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the last axis then scale (common.py:45-58)."""
    square_sum = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(square_sum, epsilon)) * scaling_factor
    return x * inv


def pairwise_euc_distances(embeddings: jnp.ndarray, squared: bool = False) -> jnp.ndarray:
    """All-pairs (squared) euclidean distances (common.py:61-94)."""
    dot = embeddings @ embeddings.T
    sq = jnp.diagonal(dot)
    d = sq[:, None] - 2.0 * dot + sq[None, :]
    d = jnp.maximum(d, 0.0)
    if not squared:
        mask = (d == 0.0).astype(d.dtype)
        d = jnp.sqrt(d + mask * 1e-16) * (1.0 - mask)
    return d


def pairwise_cos_similarity(embeddings: jnp.ndarray, epsilon: float = 1e-12) -> jnp.ndarray:
    """All-pairs cosine similarity, clipped to [-1, 1] (common.py:97-110)."""
    dot = embeddings @ embeddings.T
    sq = jnp.sum(jnp.square(embeddings), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, epsilon))
    return jnp.clip(dot * (inv @ inv.T), -1.0, 1.0)


class DenseBlock(nn.Module):
    """dense [+ bn] [+ activation], recording endpoints by name.

    Covers the reference's dense/dense_relu/dense_bn_relu/dense_tanh
    (common.py:113-223). ``activation``: None | "relu" | "tanh".
    """

    features: int
    activation: Optional[str] = "relu"
    use_bn: bool = False
    bn_momentum: float = 0.99
    relu_factory: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, endpoints: Dict[str, jnp.ndarray], train: bool = False):
        name = self.name or "dense"
        x = nn.Dense(self.features, kernel_init=kernel_init, name="affine")(x)
        endpoints[f"{name}_dense"] = x
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                epsilon=TF_BN_EPSILON, name="bn"
            )(x)
            endpoints[f"{name}_bn"] = x
        if self.activation == "relu":
            act = (self.relu_factory or get_relu({}))(f"{name}_prelu")
            x = act(x)
            endpoints[f"{name}_relu"] = x
        elif self.activation == "tanh":
            x = jnp.tanh(x)
            endpoints[f"{name}_tanh"] = x
        return x


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, L, C] -> [B, H, L, C/H] (common.py:244-253)."""
    b, l, c = x.shape
    assert c % num_heads == 0
    return x.reshape(b, l, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def combine_last_two_dimensions(x: jnp.ndarray) -> jnp.ndarray:
    """[..., a, b] -> [..., a*b] (common.py:256-265)."""
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])
