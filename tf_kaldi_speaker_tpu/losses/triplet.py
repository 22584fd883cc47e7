"""Triplet-family losses: semi-hard euclidean, angular (all/hard), GE2E-style.

Behavioral spec: reference model/loss.py:358-705. All are pure functions of
(features, labels) plus static config — no trainable state (the generalized
variant with centers lives in losses/head.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.layers import l2_scaling, pairwise_cos_similarity, pairwise_euc_distances
from .margin import asoftmax_phi, sparse_softmax_xent

EPS = 1e-12


def semihard_triplet_loss(
    features: jnp.ndarray, labels: jnp.ndarray, margin: float, squared: bool = False
) -> Tuple[jnp.ndarray, Dict]:
    """FaceNet semi-hard negative mining triplet loss (loss.py:358-498).

    For each positive pair (a, p) pick the smallest negative distance
    greater than d(a, p); if none exists use the largest negative distance.
    """
    b = features.shape[0]
    d = pairwise_euc_distances(features, squared)  # [B, B]
    adj = labels[:, None] == labels[None, :]
    adj_not = ~adj

    # For triplet (x, i): valid negatives y with d(x, y) > d(x, i).
    # mask3[i, x, y] = (label(x) != label(y)) and d(x, y) > d(x, i)
    mask3 = adj_not[None, :, :] & (d[None, :, :] > d.T[:, :, None])
    mask3f = mask3.astype(d.dtype)
    has_semihard = (jnp.sum(mask3f, axis=2) > 0.0).T  # [x, i]

    def _masked_min(data, mask, axis):
        amax = jnp.max(data, axis=axis, keepdims=True)
        return jnp.min((data - amax) * mask, axis=axis, keepdims=True) + amax

    def _masked_max(data, mask, axis):
        amin = jnp.min(data, axis=axis, keepdims=True)
        return jnp.max((data - amin) * mask, axis=axis, keepdims=True) + amin

    # negatives_outside[x, i]: min d(x, y) over semi-hard negatives of (x, i).
    negatives_outside = _masked_min(d[None, :, :], mask3f, axis=2)[:, :, 0].T
    # negatives_inside[x]: max negative distance (fallback).
    negatives_inside = _masked_max(d, adj_not.astype(d.dtype), axis=1)
    semi_hard = jnp.where(has_semihard, negatives_outside, negatives_inside)

    loss_mat = margin + d - semi_hard
    mask_pos = adj.astype(d.dtype) - jnp.eye(b, dtype=d.dtype)
    num_pos = jnp.maximum(jnp.sum(mask_pos), 1e-16)
    loss = jnp.sum(jnp.maximum(loss_mat * mask_pos, 0.0)) / num_pos
    return loss, {"loss": loss, "labels": labels}


def _positive_transform(pairwise_cos: jnp.ndarray, loss_type: str, margin: float):
    """d_p transform per loss flavor (loss.py:537-560)."""
    if loss_type == "asoftmax":
        return asoftmax_phi(pairwise_cos, int(margin))
    if loss_type == "additive_margin_softmax":
        return pairwise_cos - margin
    if loss_type == "additive_angular_margin_softmax":
        shifted = pairwise_cos * jnp.cos(margin) - jnp.sqrt(
            jnp.maximum(1.0 - pairwise_cos**2, 0.0)
        ) * jnp.sin(margin)
        return jnp.where(pairwise_cos <= jnp.cos(jnp.pi - margin), -shifted - 2.0, shifted)
    raise ValueError(loss_type)


def angular_triplet_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float,
    triplet_type: str = "all",
    loss_type: str = "additive_margin_softmax",
) -> Tuple[jnp.ndarray, Dict]:
    """Online-mined angular triplet loss, "all" or "hard" (loss.py:501-634)."""
    assert triplet_type in ("all", "hard")
    b = features.shape[0]
    eps = 1e-12
    cos = pairwise_cos_similarity(features)
    eye = jnp.eye(b, dtype=bool)
    # The self-similarity is identically 1 — constant in `features` — but
    # computing it numerically makes the arc-margin sqrt(1-cos²) emit
    # inf/NaN gradients at cosθ=1. Pin the diagonal to the constant (TF
    # reaches the same zero gradient only by luck of clip_by_value
    # rounding; golden tests assert gradient parity).
    cos = jnp.where(eye, 1.0, cos)
    d_p = _positive_transform(cos, loss_type, margin)
    d_n = cos
    label_eq = labels[None, :] == labels[:, None]

    if triplet_type == "all":
        # triplet (i, j, k): anchor i, positive j, negative k
        tri = d_n[:, None, :] - d_p[:, :, None]
        distinct = (~eye)[:, :, None] & (~eye)[:, None, :] & (~eye)[None, :, :]
        valid = label_eq[:, :, None] & (~label_eq)[:, None, :]
        mask = (distinct & valid).astype(tri.dtype)
        tri = jnp.maximum(mask * tri, 0.0)
        num_positive = jnp.sum((tri > eps).astype(tri.dtype))
        loss = jnp.sum(tri) / (num_positive + 1e-16)
    else:
        mask_ap = ((~eye) & label_eq).astype(cos.dtype)
        max_ap = jnp.max(d_p, axis=1, keepdims=True)
        ap = d_p * mask_ap + max_ap * (1.0 - mask_ap)
        hardest_positive = jnp.min(ap, axis=1, keepdims=True)

        mask_an = (~label_eq).astype(cos.dtype)
        min_ap = jnp.min(d_p, axis=1, keepdims=True)
        an = d_n * mask_an + min_ap * (1.0 - mask_an)
        hardest_negative = jnp.max(an, axis=1, keepdims=True)

        loss = jnp.mean(jnp.maximum(hardest_negative - hardest_positive, 0.0))
    return loss, {"loss": loss, "labels": labels}


def e2e_valid_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    num_speakers: int,
    num_segments_per_speaker: int,
    scale: float = 20.0,
) -> Tuple[jnp.ndarray, Dict]:
    """Softmax generalized end-to-end loss for validation (loss.py:637-705).

    Requires features ordered speaker-major: [s1 s1 .. s2 s2 ..]. The
    similarity against a speaker's own center excludes the sample itself.
    """
    n = num_speakers * num_segments_per_speaker
    dim = features.shape[1]
    # Tolerate device-padding: rows beyond n_spk × n_seg (added to make the
    # batch divisible by the mesh) are dropped before the grouped reshape.
    features = features[:n]
    features = l2_scaling(features, 1.0)
    grouped = features.reshape(num_speakers, num_segments_per_speaker, dim)
    center = l2_scaling(jnp.mean(grouped, axis=1), 1.0)
    center_ex = l2_scaling(
        (jnp.sum(grouped, axis=1, keepdims=True) - grouped).reshape(n, dim), 1.0
    )
    similarity = features @ center.T  # [n, num_speakers]
    similarity_ex = jnp.sum(features * center_ex, axis=1)
    own = jnp.repeat(jnp.arange(num_speakers), num_segments_per_speaker)
    mask = jax.nn.one_hot(own, num_speakers, dtype=features.dtype)
    similarity = similarity * (1.0 - mask) + similarity_ex[:, None] * mask
    loss = sparse_softmax_xent(scale * similarity, own)
    return loss, {"loss": loss, "labels": labels}
