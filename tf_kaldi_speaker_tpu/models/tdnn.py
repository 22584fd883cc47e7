"""TDNN x-vector network (flax), with the endpoints-dict tap mechanism.

Behavioral spec: reference model/tdnn.py:8-191 — five frame-level layers
(conv k=5, conv k=5, conv k=7, dense, dense→pooling width), each
affine + BN + ReLU (bn-then-relu order, VALID convs, no dilation), a
pluggable pooling layer, then two utterance-level dense layers. Every
intermediate activation is recorded in ``endpoints`` under the reference's
names so configs can pick ``embedding_node`` and attention taps unchanged.

TPU notes: convs are 1-D ``nn.Conv`` on [B, L, D] (lowered to MXU-tiled
convolutions by XLA) instead of the reference's conv2d-with-dummy-height;
all shapes static per length bucket.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import TF_BN_EPSILON, get_relu, kernel_init, l2_scaling
from .pooling import POOLING_REGISTRY

# Frames of left+right context consumed by the VALID convolutions
# (k5 + k5 + k7 -> 4 + 4 + 6 frames shorter).
TDNN_TOTAL_CONTEXT = 14


class TDNN(nn.Module):
    """x-vector TDNN; returns (last_layer_output, endpoints)."""

    config: Dict[str, Any]

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        train: bool = False,
        mask: Optional[jnp.ndarray] = None,
        aux_features: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.config
        relu_factory = get_relu(cfg)
        bn_momentum = cfg.get("batchnorm_momentum", 0.99)
        endpoints: Dict[str, jnp.ndarray] = {}

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=bn_momentum,
                epsilon=TF_BN_EPSILON, name=name
            )

        if aux_features:
            # Multi-input support (reference model/trainer_mi.py): aux streams
            # are exposed as endpoints (usable as attention/vlad taps via
            # e.g. att_key_input="aux_bnf") and optionally concatenated onto
            # the input along the feature axis (``aux_concat_input`` config).
            for aux_name, aux in aux_features.items():
                endpoints[f"aux_{aux_name}"] = aux
            concat = cfg.get("aux_concat_input", [])
            if concat:
                features = jnp.concatenate(
                    [features] + [aux_features[n] for n in concat], axis=-1
                )

        x = features  # [B, L, D]
        width = cfg.get("tdnn_layer_size", 512)

        # Frame-level layers 1-3: VALID 1-D convs, widths 5/5/7.
        for i, ksize in ((1, 5), (2, 5), (3, 7)):
            x = nn.Conv(
                width, (ksize,), padding="VALID", kernel_init=kernel_init,
                name=f"tdnn{i}_conv",
            )(x)
            endpoints[f"tdnn{i}_conv"] = x
            x = bn(f"tdnn{i}_bn")(x)
            endpoints[f"tdnn{i}_bn"] = x
            x = relu_factory(f"tdnn{i}_prelu")(x)
            endpoints[f"tdnn{i}_relu"] = x

        if mask is not None:
            # VALID convs shrink the time axis; a frame survives iff its full
            # receptive field was valid — for contiguous-chunk masks the
            # centered crop is exact.
            mask = mask[:, TDNN_TOTAL_CONTEXT:]

        # Frame-level layers 4-5: position-wise dense.
        x = nn.Dense(width, kernel_init=kernel_init, name="tdnn4_dense")(x)
        endpoints["tdnn4_dense"] = x
        x = bn("tdnn4_bn")(x)
        endpoints["tdnn4_bn"] = x
        x = relu_factory("tdnn4_prelu")(x)
        endpoints["tdnn4_relu"] = x

        pool_width = cfg.get("num_nodes_pooling_layer", 1500)
        x = nn.Dense(pool_width, kernel_init=kernel_init, name="tdnn5_dense")(x)
        endpoints["tdnn5_dense"] = x
        x = bn("tdnn5_bn")(x)
        endpoints["tdnn5_bn"] = x
        x = relu_factory("tdnn5_prelu")(x)
        endpoints["tdnn5_relu"] = x

        pooling_type = cfg["pooling_type"]
        if pooling_type not in POOLING_REGISTRY:
            raise NotImplementedError("Not implement %s pooling" % pooling_type)
        pool_cls = POOLING_REGISTRY[pooling_type]
        x = pool_cls(config=cfg, name=pooling_type)(x, endpoints, mask=mask, train=train)
        endpoints["pooling"] = x

        # Utterance-level layers.
        x = nn.Dense(width, kernel_init=kernel_init, name="tdnn6_dense")(x)
        endpoints["tdnn6_dense"] = x
        x = bn("tdnn6_bn")(x)
        endpoints["tdnn6_bn"] = x
        x = relu_factory("tdnn6_prelu")(x)
        endpoints["tdnn6_relu"] = x

        x = nn.Dense(
            cfg.get("num_nodes_last_layer", 512), kernel_init=kernel_init,
            name="tdnn7_dense",
        )(x)
        endpoints["tdnn7_dense"] = x
        if not cfg.get("last_layer_no_bn", False):
            x = bn("tdnn7_bn")(x)
            endpoints["tdnn7_bn"] = x
        if not cfg.get("last_layer_linear", False):
            x = relu_factory("tdnn7_prelu")(x)
            endpoints["tdnn7_relu"] = x
        return x, endpoints


class TDNNFrames(nn.Module):
    """Frame-level half of the TDNN (layers 1-5), same param names.

    Used by the exact long-utterance extraction path: apply to overlapping
    chunks and accumulate pooled sufficient statistics — statistics pooling
    is associative, so the result equals one giant forward (SURVEY.md §5
    "chunked scan for very long utterances"). Apply with the SAME variables
    as the full TDNN (extra params are ignored by flax).
    """

    config: Dict[str, Any]

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        relu_factory = get_relu(cfg)
        bn_momentum = cfg.get("batchnorm_momentum", 0.99)
        width = cfg.get("tdnn_layer_size", 512)
        x = features
        for i, ksize in ((1, 5), (2, 5), (3, 7)):
            x = nn.Conv(width, (ksize,), padding="VALID", kernel_init=kernel_init,
                        name=f"tdnn{i}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum, epsilon=TF_BN_EPSILON,
                             name=f"tdnn{i}_bn")(x)
            x = relu_factory(f"tdnn{i}_prelu")(x)
        x = nn.Dense(width, kernel_init=kernel_init, name="tdnn4_dense")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum, epsilon=TF_BN_EPSILON,
                         name="tdnn4_bn")(x)
        x = relu_factory("tdnn4_prelu")(x)
        x = nn.Dense(cfg.get("num_nodes_pooling_layer", 1500), kernel_init=kernel_init,
                     name="tdnn5_dense")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum, epsilon=TF_BN_EPSILON,
                         name="tdnn5_bn")(x)
        x = relu_factory("tdnn5_prelu")(x)
        return x


class TDNNTail(nn.Module):
    """Utterance-level half of the TDNN (pooled stats -> embeddings).

    Input is the pooled [mean ‖ stddev] vector; returns the endpoints dict
    of the utterance-level layers (tdnn6_dense, ..., output).
    """

    config: Dict[str, Any]

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        relu_factory = get_relu(cfg)
        bn_momentum = cfg.get("batchnorm_momentum", 0.99)
        width = cfg.get("tdnn_layer_size", 512)
        endpoints: Dict[str, jnp.ndarray] = {"pooling": pooled}
        x = nn.Dense(width, kernel_init=kernel_init, name="tdnn6_dense")(pooled)
        endpoints["tdnn6_dense"] = x
        x = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum, epsilon=TF_BN_EPSILON,
                         name="tdnn6_bn")(x)
        endpoints["tdnn6_bn"] = x
        x = relu_factory("tdnn6_prelu")(x)
        endpoints["tdnn6_relu"] = x
        x = nn.Dense(cfg.get("num_nodes_last_layer", 512), kernel_init=kernel_init,
                     name="tdnn7_dense")(x)
        endpoints["tdnn7_dense"] = x
        if not cfg.get("last_layer_no_bn", False):
            x = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum, epsilon=TF_BN_EPSILON,
                             name="tdnn7_bn")(x)
            endpoints["tdnn7_bn"] = x
        if not cfg.get("last_layer_linear", False):
            x = relu_factory("tdnn7_prelu")(x)
            endpoints["tdnn7_relu"] = x
        endpoints["output"] = x
        if cfg.get("feature_norm", False):
            endpoints["output"] = l2_scaling(x, cfg["feature_scaling_factor"])
        return endpoints


class EntireNetwork(nn.Module):
    """Network + optional post-hoc feature L2 re-scaling.

    Parity with reference trainer.py:168-188 (entire_network): the final
    output lands in ``endpoints["output"]``; when ``feature_norm`` is set the
    output is l2-scaled by ``feature_scaling_factor`` before the loss.
    """

    config: Dict[str, Any]
    network_type: str = "tdnn"

    @nn.compact
    def __call__(self, features, train=False, mask=None, aux_features=None):
        if self.network_type == "tdnn":
            out, endpoints = TDNN(config=self.config, name="tdnn")(
                features, train=train, mask=mask, aux_features=aux_features
            )
        elif self.network_type == "ecapa_tdnn":
            from .ecapa import ECAPA

            out, endpoints = ECAPA(config=self.config, name="ecapa")(
                features, train=train, mask=mask, aux_features=aux_features
            )
        elif self.network_type == "resnet34":
            from .resnet import ResNet34

            out, endpoints = ResNet34(config=self.config, name="resnet")(
                features, train=train, mask=mask, aux_features=aux_features
            )
        else:
            raise NotImplementedError("Not implement %s network" % self.network_type)
        endpoints["output"] = out
        if self.config.get("feature_norm", False):
            out = l2_scaling(out, self.config["feature_scaling_factor"])
            endpoints["output"] = out
        return out, endpoints
