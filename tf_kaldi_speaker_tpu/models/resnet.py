"""ResNet34 speaker encoder ("r-vector", beyond-reference model family).

The 2-D ResNet over the time x frequency plane of Zeinali et al.'s BUT
systems — alongside ECAPA the other dominant modern x-vector trunk. The
reference framework is TDNN-only (reference model/tdnn.py); like
``models/ecapa.py`` this plugs a second architecture into the
``network_type`` dispatch while reusing the pooling registry, losses,
trainer and extractor unchanged.

TPU-first notes:
- features [B, L, F] become an image [B, L, F, 1]; all convs are 3x3 2-D
  convs with explicit (1,1) padding (MXU-tiled by XLA), time and frequency
  downsampled 8x by the stride-2 stage entries;
- padded eval batches stay exact: padding frames are zero, every block
  output is re-zeroed under the (stride-downsampled) frame mask, so a
  padded forward equals SAME-padding of the unpadded signal; statistics
  pooling is masked (the bucketed-extractor invariant, tested);
- the channel axis after the trunk is frequency x channels flattened to a
  static [B, L/8, F'*C] for the shared pooling layers.

Config keys (defaults = the common 34-layer half-width r-vector):
  network_type: "resnet34"
  resnet_base_channels (32) — stage widths are x1/x2/x4/x8
  resnet_layers ([3, 4, 6, 3])
  resnet_embedding_dim (256; falls back to num_nodes_last_layer)
  pooling_type — any registered pooling ("statistics_pooling", ...)
Embedding node: "resnet_embedding" (pre-BN: "resnet_embedding_dense").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import kernel_init
from .pooling import POOLING_REGISTRY


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (ResNet v1 basic)."""

    channels: int
    stride: int
    bn_momentum: float

    @nn.compact
    def __call__(self, x, mask_out, train: bool):
        s = (self.stride, self.stride)
        # Explicit (1,1) padding: SAME with stride 2 pads asymmetrically
        # depending on input parity, which would misalign the padded vs
        # unpadded eval forward (the extractor invariant). (1,1) keeps
        # output i centered on input 2i for every length.
        h = nn.Conv(self.channels, (3, 3), strides=s,
                    padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=kernel_init, name="conv1")(x)
        h = nn.relu(nn.BatchNorm(momentum=self.bn_momentum, name="bn1")(
            h, use_running_average=not train))
        # Re-zero padding frames before the second conv: BN shifts them off
        # zero and the 3x3 would leak that into valid boundary frames.
        h = h * mask_out[:, :, None, None]
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=kernel_init, name="conv2")(h)
        h = nn.BatchNorm(momentum=self.bn_momentum, name="bn2")(
            h, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), strides=s, padding="VALID",
                        use_bias=False, kernel_init=kernel_init,
                        name="proj")(x)
            x = nn.BatchNorm(momentum=self.bn_momentum, name="proj_bn")(
                x, use_running_average=not train)
        return nn.relu(h + x)


class ResNet34(nn.Module):
    """r-vector trunk + pooling + embedding. Returns (embedding, endpoints)."""

    config: Dict[str, Any]

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        train: bool = False,
        mask: Optional[jnp.ndarray] = None,
        aux_features=None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.config
        if aux_features:
            features = jnp.concatenate(
                [features] + [aux_features[k] for k in sorted(aux_features)],
                axis=-1,
            )
        base = int(cfg.get("resnet_base_channels", 32))
        layers = list(cfg.get("resnet_layers", [3, 4, 6, 3]))
        emb_dim = int(cfg.get("resnet_embedding_dim",
                              cfg.get("num_nodes_last_layer", 256)))
        bn_mom = float(cfg.get("batchnorm_momentum", 0.99))
        endpoints: Dict[str, jnp.ndarray] = {}

        B, L, F = features.shape
        if mask is None:
            mask = jnp.ones((B, L), features.dtype)
        mask = mask.astype(features.dtype)

        x = features[:, :, :, None] * mask[:, :, None, None]
        x = nn.Conv(base, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=kernel_init, name="stem")(x)
        x = nn.relu(nn.BatchNorm(momentum=bn_mom, name="stem_bn")(
            x, use_running_average=not train))
        x = x * mask[:, :, None, None]
        endpoints["resnet_stem"] = x

        for stage, (n_blocks, stride) in enumerate(
            zip(layers, (1, 2, 2, 2)), start=1
        ):
            ch = base * (2 ** (stage - 1))
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                if s != 1:
                    # Stride-2 output frame i is centered on input frame 2i
                    # (explicit (1,1) padding); frame i is real iff 2i is.
                    mask = mask[:, ::2]
                x = BasicBlock(
                    channels=ch, stride=s, bn_momentum=bn_mom,
                    name="stage%d_block%d" % (stage, b),
                )(x, mask, train)
                # Re-zero padding frames after the residual add (BN/shortcut
                # made them nonzero; the next conv must not see them).
                x = x * mask[:, :, None, None]
            endpoints["resnet_stage%d" % stage] = x

        # [B, L', F', C] -> [B, L', F'*C] for the shared pooling layers.
        b_, l_, f_, c_ = x.shape
        x = x.reshape(b_, l_, f_ * c_)
        endpoints["resnet_frames"] = x

        pooling_type = cfg.get("pooling_type", "statistics_pooling")
        if pooling_type not in POOLING_REGISTRY:
            raise NotImplementedError("Not implement %s pooling" % pooling_type)
        pooled = POOLING_REGISTRY[pooling_type](config=cfg, name=pooling_type)(
            x, endpoints, mask=mask, train=train
        )
        endpoints["pooling"] = pooled

        emb = nn.Dense(emb_dim, kernel_init=kernel_init, name="embedding")(pooled)
        endpoints["resnet_embedding_dense"] = emb
        emb = nn.BatchNorm(momentum=bn_mom, name="embedding_bn")(
            emb, use_running_average=not train)
        endpoints["resnet_embedding"] = emb
        return emb, endpoints
