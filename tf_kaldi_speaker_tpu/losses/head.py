"""LossHead: the trainable classification head + loss dispatch (flax).

Maps the reference's loss functions (model/loss.py), which create TF
variables under the "softmax" scope, onto one flax module:

- ``output_kernel`` [D, C]  — the softmax/margin weight matrix (the
  reference's "output/kernel"; same variable across all softmax-family
  losses so fine-tuning between them works).
- ``output_bias``           — plain softmax only.
- ``ring_r``                — ring-loss trainable radius (aux).
- generalized-angular-triplet centers: either the kernel itself
  ("learnable") or a non-trainable moving average in the ``loss_stats``
  collection ("average"), updated on the fly like BN stats.

Margins can be overridden at call time (``margin_override``) — the trainer
uses that to neutralize margins during validation (trainer.py:260-303).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import margin as M
from . import triplet as T

EPS = 1e-12

LOSS_NAMES = (
    "softmax",
    "asoftmax",
    "additive_margin_softmax",
    "additive_angular_margin_softmax",
    "semihard_triplet_loss",
    "angular_triplet_loss",
    "generalized_angular_triplet_loss",
    "e2e_valid_loss",
)

# Losses whose value depends on the whole batch structure (pair/triplet
# mining, per-speaker centroids): a padded row cannot be weighted out, so
# the trainers refuse padded batches for these (batch size must divide the
# device count).
STRUCTURAL_LOSSES = (
    "semihard_triplet_loss",
    "angular_triplet_loss",
    "generalized_angular_triplet_loss",
    "e2e_valid_loss",
)


class LossHead(nn.Module):
    loss_func: str
    num_outputs: int
    config: Dict[str, Any]

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        labels: jnp.ndarray,
        step=0,
        train: bool = False,
        margin_override: Optional[float] = None,
        aux_enabled: bool = True,
        sample_weight: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        # sample_weight [B]: row validity (0 = padded for device-count
        # alignment). Honored by the per-row-decomposable softmax family;
        # batch-structural losses (triplet/e2e/generalized) cannot weight
        # rows out, so the trainers REFUSE padded end2end batches (the
        # batch size must divide the device count; Trainer.valid raises).
        cfg = self.config
        name = self.loss_func
        if name not in LOSS_NAMES:
            raise NotImplementedError("Not implement %s loss" % name)
        dim = features.shape[-1]
        endpoints: Dict[str, jnp.ndarray] = {}

        def anneal(prefix: str):
            return M.margin_annealing_lambda(
                step,
                float(cfg[f"{prefix}_lambda_min"]),
                float(cfg[f"{prefix}_lambda_base"]),
                float(cfg[f"{prefix}_lambda_gamma"]),
                float(cfg[f"{prefix}_lambda_power"]),
            )

        needs_kernel = name in (
            "softmax",
            "asoftmax",
            "additive_margin_softmax",
            "additive_angular_margin_softmax",
            "generalized_angular_triplet_loss",
        )
        kernel = None
        if needs_kernel:
            kernel = self.param(
                "output_kernel", nn.initializers.glorot_uniform(), (dim, self.num_outputs)
            )
            endpoints["softmax_w"] = kernel

        if name == "softmax":
            bias = self.param("output_bias", nn.initializers.zeros, (self.num_outputs,))
            loss, ep = M.softmax_loss(features, labels, kernel, bias, sample_weight)
        elif name == "asoftmax":
            m = int(margin_override if margin_override is not None else cfg["asoftmax_m"])
            loss, ep = M.asoftmax_loss(
                features, labels, kernel, m, anneal("asoftmax"), sample_weight)
        elif name == "additive_margin_softmax":
            m = float(margin_override if margin_override is not None else cfg["amsoftmax_m"])
            loss, ep = M.amsoftmax_loss(
                features, labels, kernel, m, anneal("amsoftmax"), sample_weight)
        elif name == "additive_angular_margin_softmax":
            m = float(margin_override if margin_override is not None else cfg["arcsoftmax_m"])
            loss, ep = M.arcsoftmax_loss(
                features, labels, kernel, m, anneal("arcsoftmax"), sample_weight)
        elif name == "semihard_triplet_loss":
            loss, ep = T.semihard_triplet_loss(
                features, labels, float(cfg["margin"]), cfg.get("triplet_loss_squared", False)
            )
        elif name == "angular_triplet_loss":
            loss, ep = T.angular_triplet_loss(
                features, labels, float(cfg["margin"]), cfg["triplet_type"], cfg["loss_type"]
            )
        elif name == "e2e_valid_loss":
            loss, ep = T.e2e_valid_loss(
                features,
                labels,
                cfg["num_valid_speakers_per_batch"],
                cfg["num_valid_segments_per_speaker"],
            )
        else:  # generalized_angular_triplet_loss
            loss, ep = self._generalized_triplet(features, labels, kernel, train)
        endpoints.update(ep)

        if aux_enabled:
            # Per-row aux terms honor sample_weight like the main losses:
            # device-padding rows (weight 0) must never bias ring/MHE
            # (the reference never pads, so weighted means are the faithful
            # extension of loss.py:1003-1034).
            def _row_mean(per_row):
                if sample_weight is None:
                    return jnp.mean(per_row)
                return jnp.sum(sample_weight * per_row) / jnp.maximum(
                    jnp.sum(sample_weight), 1.0
                )

            for aux_name in cfg.get("aux_loss_func", []):
                if aux_name == "ring_loss":
                    r = self.param(
                        "ring_r",
                        nn.initializers.constant(float(cfg["ring_loss_init"])),
                        (),
                    )
                    ring = float(cfg["ring_loss_lambda"]) * _row_mean(
                        jnp.square(jnp.linalg.norm(features, axis=1) - r)
                    )
                    loss = loss + ring
                    endpoints["ring_loss_r"] = r
                    endpoints["ring_loss"] = ring
                elif aux_name == "mhe_loss":
                    # Minimum hyperspherical energy over the softmax weights
                    # (loss.py:1017-1034).
                    w_norm = kernel / jnp.maximum(
                        jnp.linalg.norm(kernel, axis=0, keepdims=True), EPS
                    )
                    sel_w = w_norm.T[labels]  # [B, D]
                    mhe = float(cfg["mhe_lambda"]) / (
                        _row_mean(jnp.mean(2.0 - 2.0 * sel_w @ w_norm, axis=1))
                        + 1e-6
                    )
                    loss = loss + mhe
                    endpoints["mhe_loss"] = mhe
                else:
                    raise NotImplementedError("Unsupported aux loss %s" % aux_name)

        endpoints["loss"] = loss
        endpoints["labels"] = labels
        return loss, endpoints

    def _generalized_triplet(self, features, labels, kernel, train):
        """Angular triplet against class centers (loss.py:708-901), "raw" mode."""
        cfg = self.config
        assert cfg["triplet_center"] in ("learnable", "average")
        assert cfg.get("loss_compute", "raw") == "raw"
        num_outputs = self.num_outputs
        margin = float(cfg["margin"])
        target_margin = float(cfg["target_margin"])
        topn = int(cfg["triplet_topn"])
        eps = 1e-12

        feats_norm = features / jnp.maximum(
            jnp.linalg.norm(features, axis=1, keepdims=True), EPS
        )

        if cfg["triplet_center"] == "average":
            centers = self.variable(
                "loss_stats",
                "triplet_centers",
                lambda: jnp.asarray(kernel),
            )
            w = centers.value
            if train:
                decay = 1.0 - float(cfg["triplet_center_momentum"])
                sel_w = w.T[labels]
                delta = (sel_w - features) * decay
                scatter = jnp.zeros_like(w.T).at[labels].add(delta)
                # NOTE: repeated labels accumulate, matching tf.scatter_nd.
                # TF registers Assign as NotDifferentiable, so the reference
                # leaks NO gradient from the loss through the center update
                # back into `features` (loss.py:783-787); mirror that.
                w = jax.lax.stop_gradient(w - scatter.T)
                centers.value = w
        else:
            w = kernel

        w_norm = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), EPS)

        # Squared euclidean distances to each (normalized) center.
        dist = (
            jnp.sum(jnp.square(feats_norm), axis=1, keepdims=True)
            - 2.0 * feats_norm @ w_norm
            + jnp.sum(jnp.square(w_norm), axis=0, keepdims=True)
        )
        target_dist = jnp.take_along_axis(dist, labels[:, None], axis=1)[:, 0]
        onehot = jax.nn.one_hot(labels, num_outputs, dtype=dist.dtype)
        # Push the own-class distance out of the nontarget minimum search.
        new_dist = dist * (1 - onehot) + (jnp.max(dist, axis=1, keepdims=True) + dist) * onehot
        target_mask = (target_dist > target_margin).astype(dist.dtype)

        if topn == 1:
            nontarget = jnp.min(new_dist, axis=1)
            tri = jnp.maximum(margin + target_dist - nontarget, 1e-16)
            tri = target_mask * tri
            loss_t = jnp.sum(tri) / (jnp.sum((tri > eps).astype(tri.dtype)) + eps)
        elif topn == 0:
            tri = jnp.maximum(margin + target_dist[:, None] - new_dist, 1e-16)
            tri = tri * (1 - onehot) * target_mask[:, None]
            loss_t = jnp.sum(tri) / (jnp.sum((tri > eps).astype(tri.dtype)) + eps)
        else:
            neg, _ = jax.lax.top_k(-new_dist, topn)
            tri = jnp.maximum(margin + target_dist[:, None] + neg, 1e-16)
            tri = target_mask[:, None] * tri
            loss_t = jnp.sum(tri) / (jnp.sum((tri > eps).astype(tri.dtype)) + eps)

        center_loss = jnp.sum(target_mask * target_dist) / (jnp.sum(target_mask) + eps)
        between = 2.0 - 2.0 * w_norm.T @ w_norm
        between_loss = -jnp.sum((1.0 - jnp.eye(num_outputs)) * between) / (
            num_outputs * (num_outputs - 1)
        )
        weight_loss = jnp.linalg.norm(w)

        loss = (
            float(cfg["triplet_loss_weight"]) * loss_t
            + float(cfg["center_loss_weight"]) * center_loss
            + float(cfg["between_loss_weight"]) * between_loss
            + float(cfg.get("l2_loss_weight", 0.0)) * weight_loss
        )
        return loss, {
            "average_centers": w,
            "triplet_loss": loss_t,
            "center_loss": center_loss,
            "between_loss": between_loss,
            "l2_loss": weight_loss,
        }
