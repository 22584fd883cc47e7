"""ECAPA-TDNN speaker encoder (beyond-reference model family).

Emphasized Channel Attention, Propagation and Aggregation TDNN
(Desplanques et al., Interspeech 2020): SE-Res2Net blocks with increasing
dilation, multi-layer feature aggregation, and channel- and
context-dependent attentive statistics pooling. The reference framework is
TDNN-only; this exercises the ``network_type`` dispatch with a modern
architecture that reaches materially lower EERs on VoxCeleb.

TPU-first notes:
- all convs run on [B, L, C] with SAME zero padding; since padded
  extraction batches are zero-filled and the attentive pooling is masked,
  a padded forward equals the unpadded forward exactly in eval mode (the
  same invariant the bucketed extractor relies on for the TDNN);
- Res2Net's hierarchical groups are a static Python loop over ``scale``
  channel slices (no ragged ops);
- everything is matmul/conv shaped for the MXU; SE and attention are tiny
  bottleneck matmuls XLA fuses.

Config keys (defaults = the 512-channel ECAPA of the paper):
  network_type: "ecapa_tdnn"
  ecapa_channels (512), ecapa_mfa_channels (1536), ecapa_res2net_scale (8),
  ecapa_se_bottleneck (128), ecapa_att_bottleneck (128),
  ecapa_embedding_dim (192; falls back to num_nodes_last_layer)
Embedding node: "ecapa_embedding" (pre-BN: "ecapa_embedding_dense").
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from .layers import kernel_init
from .pooling import VAR2STD_EPSILON, floor_sqrt, masked_moments


def _masked_mean_std(x, mask):
    """Masked per-channel mean/std over time. x [B,L,C], mask [B,L]."""
    mean, var = masked_moments(x, mask)
    return mean, floor_sqrt(var)


class SERes2NetBlock(nn.Module):
    """1x1 conv -> Res2Net dilated conv -> 1x1 conv -> SE, residual."""

    channels: int
    kernel: int
    dilation: int
    scale: int
    se_bottleneck: int
    bn_momentum: float

    @nn.compact
    def __call__(self, x, mask, train: bool):
        C = self.channels
        residual = x
        m = mask[:, :, None]
        h = nn.Conv(C, (1,), kernel_init=kernel_init, name="conv_in")(x)
        h = nn.relu(nn.BatchNorm(momentum=self.bn_momentum, name="bn_in")(
            h, use_running_average=not train))
        # Re-zero padding frames before every dilated conv: conv bias / BN
        # shift makes them nonzero, and the k>1 SAME conv would leak that
        # into valid boundary frames (breaking padded == unpadded exactness).
        h = h * m

        # Res2Net: split channels into `scale` groups; group i (i>=2) conv's
        # (its slice + previous group's output) hierarchy.
        w = C // self.scale
        groups = [h[..., i * w : (i + 1) * w] for i in range(self.scale)]
        outs = [groups[0]]
        prev = None
        for i in range(1, self.scale):
            g = groups[i] if prev is None else groups[i] + prev
            g = nn.Conv(
                w, (self.kernel,), kernel_dilation=(self.dilation,),
                padding="SAME", kernel_init=kernel_init, name="res2_conv%d" % i,
            )(g)
            g = nn.relu(nn.BatchNorm(momentum=self.bn_momentum,
                                     name="res2_bn%d" % i)(
                g, use_running_average=not train))
            g = g * m
            outs.append(g)
            prev = g
        h = jnp.concatenate(outs, axis=-1)

        h = nn.Conv(C, (1,), kernel_init=kernel_init, name="conv_out")(h)
        h = nn.relu(nn.BatchNorm(momentum=self.bn_momentum, name="bn_out")(
            h, use_running_average=not train))

        # Squeeze-excitation over masked time mean.
        m = mask[:, :, None]
        s = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-6)
        s = nn.relu(nn.Dense(self.se_bottleneck, kernel_init=kernel_init,
                             name="se_down")(s))
        s = nn.sigmoid(nn.Dense(C, kernel_init=kernel_init, name="se_up")(s))
        h = h * s[:, None, :]
        return h + residual


class AttentiveStatsPooling(nn.Module):
    """Channel- and context-dependent attentive statistics (ECAPA §3.2)."""

    bottleneck: int
    bn_momentum: float

    @nn.compact
    def __call__(self, x, mask, train: bool):
        B, L, C = x.shape
        mean, std = _masked_mean_std(x, mask)
        ctx = jnp.concatenate(
            [x, jnp.broadcast_to(mean[:, None, :], (B, L, C)),
             jnp.broadcast_to(std[:, None, :], (B, L, C))], axis=-1
        )
        a = nn.tanh(nn.Conv(self.bottleneck, (1,), kernel_init=kernel_init,
                            name="att_bottleneck")(ctx))
        a = nn.Conv(C, (1,), kernel_init=kernel_init, name="att_scores")(a)
        a = jnp.where(mask[:, :, None] > 0, a, -1e30)
        a = nn.softmax(a, axis=1)
        mu = jnp.sum(a * x, axis=1)
        var = jnp.sum(a * jnp.square(x), axis=1) - jnp.square(mu)
        sg = jnp.sqrt(jnp.maximum(var, VAR2STD_EPSILON))
        return jnp.concatenate([mu, sg], axis=1)


class ECAPA(nn.Module):
    """ECAPA-TDNN encoder. Returns (embedding, endpoints)."""

    config: Dict[str, Any]

    @nn.compact
    def __call__(self, features, train: bool = False, mask=None, aux_features=None):
        cfg = self.config
        if aux_features:
            features = jnp.concatenate(
                [features] + [aux_features[k] for k in sorted(aux_features)], axis=-1
            )
        C = int(cfg.get("ecapa_channels", 512))
        mfa = int(cfg.get("ecapa_mfa_channels", 1536))
        scale = int(cfg.get("ecapa_res2net_scale", 8))
        se_bn = int(cfg.get("ecapa_se_bottleneck", 128))
        att_bn = int(cfg.get("ecapa_att_bottleneck", 128))
        emb_dim = int(cfg.get("ecapa_embedding_dim",
                              cfg.get("num_nodes_last_layer", 192)))
        bn_mom = float(cfg.get("batchnorm_momentum", 0.99))
        endpoints: Dict[str, jnp.ndarray] = {}

        B, L, _ = features.shape
        if mask is None:
            mask = jnp.ones((B, L), features.dtype)
        mask = mask.astype(features.dtype)

        x = nn.Conv(C, (5,), padding="SAME", kernel_init=kernel_init,
                    name="conv1")(features)
        x = nn.relu(nn.BatchNorm(momentum=bn_mom, name="bn1")(
            x, use_running_average=not train))
        x = x * mask[:, :, None]
        endpoints["ecapa_conv1"] = x

        block_outs = []
        for i, dil in enumerate((2, 3, 4), start=1):
            x = SERes2NetBlock(
                channels=C, kernel=3, dilation=dil, scale=scale,
                se_bottleneck=se_bn, bn_momentum=bn_mom, name="block%d" % i,
            )(x, mask, train)
            x = x * mask[:, :, None]
            endpoints["ecapa_block%d" % i] = x
            block_outs.append(x)

        h = jnp.concatenate(block_outs, axis=-1)
        h = nn.relu(nn.Conv(mfa, (1,), kernel_init=kernel_init, name="mfa")(h))
        h = h * mask[:, :, None]
        endpoints["ecapa_mfa"] = h

        pooled = AttentiveStatsPooling(
            bottleneck=att_bn, bn_momentum=bn_mom, name="asp"
        )(h, mask, train)
        pooled = nn.BatchNorm(momentum=bn_mom, name="asp_bn")(
            pooled, use_running_average=not train)
        endpoints["ecapa_pooling"] = pooled

        emb = nn.Dense(emb_dim, kernel_init=kernel_init, name="embedding")(pooled)
        endpoints["ecapa_embedding_dense"] = emb
        emb = nn.BatchNorm(momentum=bn_mom, name="embedding_bn")(
            emb, use_running_average=not train)
        endpoints["ecapa_embedding"] = emb
        return emb, endpoints
