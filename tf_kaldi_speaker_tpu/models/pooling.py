"""Pooling zoo: statistics / multi-head self-attention / (Ghost)NetVLAD.

Behavioral spec: reference model/pooling.py:9-277 and the masked variant
model/multitask_v1/pooling.py:9-40. All poolings here are *masked* — a
frame-validity mask [B, L] makes padded batches exact; mask=None means all
frames are valid and reproduces the unmasked reference numerics.

TPU notes: every op is a large batched matmul/reduction (MXU/VPU friendly);
variance uses the two-pass (x-mean)^2 form like the reference, with the same
VAR2STD_EPSILON flooring to keep sqrt gradients finite.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    TF_BN_EPSILON,
    VAR2STD_EPSILON,
    DenseBlock,
    combine_last_two_dimensions,
    get_relu,
    kernel_init,
    split_heads,
)


def masked_moments(features: jnp.ndarray, mask: Optional[jnp.ndarray]):
    """Mean and variance over the time axis, ignoring masked frames.

    Args:
        features: [B, L, D].
        mask: [B, L] float/bool validity mask, or None (= all valid).
    Returns:
        (mean [B, D], variance [B, D])
    """
    if mask is None:
        mean = jnp.mean(features, axis=1)
        var = jnp.mean(jnp.square(features - mean[:, None, :]), axis=1)
        return mean, var
    m = mask.astype(features.dtype)[:, :, None]
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    mean = jnp.sum(features * m, axis=1) / denom
    var = jnp.sum(jnp.square(features - mean[:, None, :]) * m, axis=1) / denom
    return mean, var


def floor_sqrt(variance: jnp.ndarray) -> jnp.ndarray:
    """sqrt with the reference's epsilon flooring (pooling.py:28-30)."""
    floored = jnp.where(variance <= VAR2STD_EPSILON, VAR2STD_EPSILON, variance)
    return jnp.sqrt(floored)


class StatisticsPooling(nn.Module):
    """[mean ‖ stddev] pooling (reference pooling.py:9-34, masked v2 :9-40)."""

    config: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        endpoints: Dict[str, jnp.ndarray],
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if (self.config or {}).get("use_fused_pooling", False):
            # Single-pass fused Pallas kernel (ops/pooling_pallas.py): one HBM
            # read instead of two. Uses E[x²]-E[x]² (vs the reference's
            # two-pass form) — equal in exact arithmetic.
            from ..ops.pooling_pallas import masked_stats_pooling

            if mask is None:
                mask = jnp.ones(features.shape[:2], features.dtype)
            return masked_stats_pooling(features, mask)
        mean, var = masked_moments(features, mask)
        return jnp.concatenate([mean, floor_sqrt(var)], axis=1)


class SelfAttentionPooling(nn.Module):
    """Multi-head attentive statistics pooling (reference pooling.py:37-192).

    Key/value are tapped from ``endpoints`` by config name; a learned query
    per head attends over time; output is weighted mean ‖ weighted stddev.
    The head-diversity penalty ‖W Wᵀ - I‖² lands in
    ``endpoints["attention_penalty"]`` (the trainer adds it to the loss, the
    reference used a TF collection named "PENALTY").
    """

    config: Dict[str, Any]

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        endpoints: Dict[str, jnp.ndarray],
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        relu_factory = get_relu(cfg)
        bn_momentum = cfg.get("batchnorm_momentum", 0.99)

        value = endpoints[cfg["att_value_input"]]
        key = endpoints[cfg["att_key_input"]]

        def stack(x, num_nodes_list, last_type, prefix):
            # Intermediate layers are affine+bn+relu; the last layer's type is
            # configurable: 0 affine, 1 +relu, 2 affine+bn+relu, 3 affine+tanh.
            for idx, n in enumerate(num_nodes_list[:-1]):
                x = DenseBlock(
                    n, "relu", use_bn=True, bn_momentum=bn_momentum,
                    relu_factory=relu_factory, name=f"{prefix}{idx}",
                )(x, endpoints, train)
            last = len(num_nodes_list) - 1
            act, bn = {0: (None, False), 1: ("relu", False), 2: ("relu", True), 3: ("tanh", False)}[last_type]
            return DenseBlock(
                num_nodes_list[-1], act, use_bn=bn, bn_momentum=bn_momentum,
                relu_factory=relu_factory, name=f"{prefix}{last}",
            )(x, endpoints, train)

        key = stack(key, list(cfg["att_key_num_nodes"]), cfg["att_key_network_type"], "att_key")
        if len(cfg.get("att_value_num_nodes", [])) > 0:
            value = stack(
                value, list(cfg["att_value_num_nodes"]), cfg["att_value_network_type"], "att_value"
            )

        n_heads = cfg["att_num_heads"]
        split_key = cfg.get("att_split_key", False)
        assert value.shape[2] % n_heads == 0
        value = split_heads(value, n_heads)  # [B, H, L, dv]
        if split_key:
            assert key.shape[2] % n_heads == 0
            key = split_heads(key, n_heads)  # [B, H, L, dk]
        else:
            key = key[:, None, :, :]  # [B, 1, L, dk]
        dk = key.shape[-1]

        query = self.param(
            "query", nn.initializers.truncated_normal(stddev=0.1), (n_heads, dk)
        )
        if split_key:
            logits = jnp.einsum("bhld,hd->blh", key, query)
        else:
            logits = jnp.einsum("bmld,hd->blh", key, query)
        if cfg.get("att_use_scale", False):
            logits = logits * (1.0 / jnp.sqrt(jnp.float32(dk)))
        if mask is not None:
            logits = jnp.where(mask[:, :, None] > 0, logits, -1e30)
        weights = nn.softmax(logits.transpose(0, 2, 1), axis=-1)  # [B, H, L]
        endpoints["attention_weights"] = weights

        att_mean = jnp.einsum("bhld,bhl->bhd", value, weights)
        att_var = jnp.einsum(
            "bhld,bhl->bhd", jnp.square(value - att_mean[:, :, None, :]), weights
        )
        att_mean = combine_last_two_dimensions(att_mean)
        att_stddev = floor_sqrt(combine_last_two_dimensions(att_var))
        att = jnp.concatenate([att_mean, att_stddev], axis=1)
        endpoints["att_output_before_nonlinear"] = att

        if cfg.get("att_apply_nonlinear", False):
            att = nn.BatchNorm(
                use_running_average=not train, momentum=bn_momentum,
                epsilon=TF_BN_EPSILON, name="att_post_bn"
            )(att)
            endpoints["att_post_bn"] = att
            att = relu_factory("att_post_prelu")(att)
            endpoints["att_post_relu"] = att

        gram = jnp.einsum("bhl,bkl->bhk", weights, weights) - jnp.eye(n_heads)
        penalty = cfg.get("att_penalty_term", 0.0) * (
            jnp.sum(jnp.square(gram)) / features.shape[0]
        )
        endpoints["attention_penalty"] = penalty
        return att


class GhostVLAD(nn.Module):
    """NetVLAD / GhostVLAD aggregation (reference pooling.py:195-277)."""

    config: Dict[str, Any]

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        endpoints: Dict[str, jnp.ndarray],
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        relu_factory = get_relu(cfg)
        bn_momentum = cfg.get("batchnorm_momentum", 0.99)
        num_centers = cfg["vlad_num_centers"]
        num_ghosts = cfg.get("vlad_num_ghosts", 0)

        value = endpoints[cfg["vlad_value_input"]]
        key = endpoints[cfg["vlad_key_input"]]
        for idx, n in enumerate(cfg.get("vlad_value_num_nodes", [])):
            value = DenseBlock(
                n, "relu", use_bn=True, bn_momentum=bn_momentum,
                relu_factory=relu_factory, name=f"vlad_value{idx}",
            )(value, endpoints, train)
        for idx, n in enumerate(cfg.get("vlad_key_num_nodes", [])):
            key = DenseBlock(
                n, "relu", use_bn=True, bn_momentum=bn_momentum,
                relu_factory=relu_factory, name=f"vlad_key{idx}",
            )(key, endpoints, train)

        logits = nn.Dense(
            num_centers + num_ghosts, kernel_init=kernel_init, name="vlad_weight_affine"
        )(key)
        if mask is not None:
            # Masked frames contribute to no cluster.
            assign = nn.softmax(logits, axis=-1) * mask.astype(logits.dtype)[:, :, None]
        else:
            assign = nn.softmax(logits, axis=-1)  # [B, L, C+G]
        endpoints["vlad_weights"] = assign

        clusters = self.param(
            "vlad_centers",
            nn.initializers.glorot_uniform(),
            (num_centers + num_ghosts, value.shape[-1]),
        )
        # residual aggregation: sum_l a[b,l,c] * (v[b,l,:] - mu[c,:])
        # = (aᵀ v)[b,c,:] - (sum_l a)[b,c,None] * mu  — two matmuls, no
        # [B, L, C, D] intermediate (the reference materializes it).
        av = jnp.einsum("blc,bld->bcd", assign, value)
        asum = jnp.sum(assign, axis=1)
        cluster_res = av - asum[:, :, None] * clusters[None, :, :]
        if num_ghosts > 0:
            cluster_res = cluster_res[:, :num_centers, :]
        cluster_res = cluster_res / jnp.maximum(
            jnp.linalg.norm(cluster_res, axis=-1, keepdims=True), 1e-12
        )
        output = cluster_res.reshape(cluster_res.shape[0], -1)
        if cfg.get("vlad_final_l2_norm", False):
            output = output / jnp.maximum(
                jnp.linalg.norm(output, axis=-1, keepdims=True), 1e-12
            )
        endpoints["vlad_value"] = value
        endpoints["vlad_key"] = logits
        endpoints["vlad_centers_value"] = clusters
        return output


POOLING_REGISTRY = {
    "statistics_pooling": StatisticsPooling,
    "self_attention": SelfAttentionPooling,
    "ghost_vlad": GhostVLAD,
}
