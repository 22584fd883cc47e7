"""Multitask speaker+phone model: shared trunk, two branch encoders, two heads.

Behavioral spec: reference model/multitask_v1/tdnn.py + base_v1.py —
- speaker encoder = x-vector TDNN (conv5/conv5/conv7/dense/dense→1500,
  bn+relu each), context-sliced to the un-expanded frames
  (tdnn.py:135-140), masked statistics pooling, dense6, speaker embedding
  layer ``zs_dense`` (+ optional bn/relu);
- phone encoder = config-driven TDNN (``phone_kernel_size/layer_size/
  dilation_size``, WITH dilation) sharing the first ``num_shared_layers``
  with the speaker encoder (tdnn.py:244-278), phone embedding ``zp_dense``;
- joint loss = spk_loss_weight·L_spk + phn_loss_weight·L_phn
  (base_v1.py:446-447), phone loss on a [B, K] random frame subset.

TPU difference: the shared prefix is computed ONCE and fed to both branches
(the reference re-runs it under variable-scope reuse — double compute); all
gathers are rectangular [B, K] takes, not ragged gather_nd.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses import LossHead
from ..models.layers import TF_BN_EPSILON, kernel_init
from ..models.pooling import floor_sqrt, masked_moments
from ..utils.params import ParamsPlain, remove_params_prefix

# Speaker-encoder trunk spec: (kind, width, kernel, dilation) per layer.
SPEAKER_LAYERS = (
    ("conv", 512, 5, 1),
    ("conv", 512, 5, 1),
    ("conv", 512, 7, 1),
    ("dense", 512, 1, 1),
    ("dense", None, 1, 1),  # width = num_nodes_pooling_layer
)
SPEAKER_LEFT_CONTEXT = 7
SPEAKER_RIGHT_CONTEXT = 7


def _relu(cfg):
    kind = cfg.get("network_relu_type", "relu")
    if kind == "lrelu":
        return nn.leaky_relu
    return nn.relu


class MultitaskModel(nn.Module):
    """setup()-style module so speaker/phone/predict paths share params."""

    config: Dict[str, Any]
    num_speakers: int
    num_phones: int

    def setup(self):
        cfg = self.config
        width = cfg.get("tdnn_layer_size", 512)
        pool_width = cfg.get("num_nodes_pooling_layer", 1500)
        bn_kw = dict(momentum=cfg.get("batchnorm_momentum", 0.99),
                     epsilon=TF_BN_EPSILON)

        # ---- speaker trunk (scope names match the reference's "encoder")
        spk_layers = []
        for i, (kind, w, k, d) in enumerate(SPEAKER_LAYERS):
            w = pool_width if w is None else (width if w == 512 else w)
            name = ("conv%d" % (i + 1)) if kind == "conv" else ("dense%d" % (i + 1))
            if kind == "conv":
                layer = nn.Conv(w, (k,), padding="VALID", kernel_init=kernel_init, name=name)
            else:
                layer = nn.Dense(w, kernel_init=kernel_init, name=name)
            spk_layers.append(layer)
        self.spk_layers = spk_layers
        self.spk_bns = [nn.BatchNorm(name="bn%d" % (i + 1), **bn_kw) for i in range(5)]

        self.dense6 = nn.Dense(width, kernel_init=kernel_init, name="dense6")
        self.bn6 = nn.BatchNorm(name="bn6", **bn_kw)
        self.zs_dense = nn.Dense(
            cfg.get("speaker_dim", 512), kernel_init=kernel_init, name="zs_dense"
        )
        self.zs_bn = nn.BatchNorm(name="zs_bn", **bn_kw)

        # ---- phone branch (unshared part)
        self.num_shared = int(cfg.get("num_shared_layers", 0))
        pk = list(cfg["phone_kernel_size"])
        pl = list(cfg["phone_layer_size"])
        pd = list(cfg.get("phone_dilation_size", [1] * len(pk)))
        assert self.num_shared < len(pk)
        for i in range(self.num_shared):
            kind, w, k, d = SPEAKER_LAYERS[i]
            assert pk[i] == k and pd[i] == d, (
                "shared layer %d spec mismatch: speaker (k=%d,d=%d) vs phone (k=%d,d=%d)"
                % (i, k, d, pk[i], pd[i])
            )
        self.phone_spec = list(zip(pk, pl, pd))
        phn_layers, phn_bns = [], []
        for i in range(self.num_shared, len(pk)):
            if pk[i] > 1:
                layer = nn.Conv(
                    pl[i], (pk[i],), padding="VALID", kernel_dilation=(pd[i],),
                    kernel_init=kernel_init, name="phn_conv%d" % (i + 1),
                )
            else:
                layer = nn.Dense(pl[i], kernel_init=kernel_init, name="phn_dense%d" % (i + 1))
            phn_layers.append(layer)
            phn_bns.append(nn.BatchNorm(name="phn_bn%d" % (i + 1), **bn_kw))
        self.phn_layers = phn_layers
        self.phn_bns = phn_bns
        self.zp_dense = nn.Dense(
            cfg.get("phone_dim", 512), kernel_init=kernel_init, name="zp_dense"
        )
        self.zp_bn = nn.BatchNorm(name="zp_bn", **bn_kw)

        # ---- loss heads
        spk_cfg = remove_params_prefix(ParamsPlain(**cfg), "spk").dict
        phn_cfg = remove_params_prefix(ParamsPlain(**cfg), "phn").dict
        self.spk_head = LossHead(
            loss_func=cfg.get("spk_loss_type", "softmax"),
            num_outputs=self.num_speakers, config=spk_cfg, name="spk_softmax",
        )
        self.phn_head = LossHead(
            loss_func=cfg.get("phn_loss_type", "softmax"),
            num_outputs=self.num_phones, config=phn_cfg, name="phn_softmax",
        )

    # ------------------------------------------------------------------
    def _shared_prefix(self, x, train, endpoints):
        relu = _relu(self.config)
        for i in range(self.num_shared):
            x = self.spk_layers[i](x)
            x = self.spk_bns[i](x, use_running_average=not train)
            x = relu(x)
            endpoints["shared%d" % (i + 1)] = x
        return x

    def _speaker_branch(self, x, feat_length, train, endpoints):
        cfg = self.config
        relu = _relu(cfg)
        lc = int(cfg["phone_left_context"])
        rc = int(cfg["phone_right_context"])
        for i in range(self.num_shared, 5):
            x = self.spk_layers[i](x)
            name = "conv%d" % (i + 1) if SPEAKER_LAYERS[i][0] == "conv" else "dense%d" % (i + 1)
            endpoints[name] = x
            x = self.spk_bns[i](x, use_running_average=not train)
            endpoints["bn%d" % (i + 1)] = x
            x = relu(x)
            endpoints["relu%d" % (i + 1)] = x

        # Context slicing (tdnn.py:135-140): the input was expanded by the
        # (larger) phone context; trim to the un-expanded frames.
        if lc < SPEAKER_LEFT_CONTEXT or rc < SPEAKER_RIGHT_CONTEXT:
            raise NotImplementedError("phone context must dominate the speaker context")
        x = x[:, lc - SPEAKER_LEFT_CONTEXT : x.shape[1] - (rc - SPEAKER_RIGHT_CONTEXT), :]

        # Masked statistics pooling (multitask_v1/pooling.py:9-40).
        mask = (
            jnp.arange(x.shape[1])[None, :] < feat_length[:, None]
        ).astype(x.dtype)
        mean, var = masked_moments(x, mask)
        pooled = jnp.concatenate([mean, floor_sqrt(var)], axis=1)
        endpoints["pooling"] = pooled

        x = self.dense6(pooled)
        endpoints["dense6"] = x
        x = self.bn6(x, use_running_average=not train)
        endpoints["bn6"] = x
        x = relu(x)
        endpoints["relu6"] = x

        mu = self.zs_dense(x)
        endpoints["zs_mu_dense"] = mu
        if not cfg.get("spk_last_layer_no_bn", False):
            mu = self.zs_bn(mu, use_running_average=not train)
            endpoints["zs_mu_bn"] = mu
        if not cfg.get("spk_last_layer_linear", False):
            mu = relu(mu)
            endpoints["zs_mu_relu"] = mu
        return mu

    def _phone_branch(self, x, train, endpoints):
        cfg = self.config
        relu = _relu(cfg)
        for idx, i in enumerate(range(self.num_shared, len(self.phone_spec))):
            x = self.phn_layers[idx](x)
            k = self.phone_spec[i][0]
            name = "phn_conv%d" % (i + 1) if k > 1 else "phn_dense%d" % (i + 1)
            endpoints[name] = x
            x = self.phn_bns[idx](x, use_running_average=not train)
            endpoints["phn_bn%d" % (i + 1)] = x
            x = relu(x)
            endpoints["phn_relu%d" % (i + 1)] = x
        mu = self.zp_dense(x)
        endpoints["zp_mu_dense"] = mu
        mu = self.zp_bn(mu, use_running_average=not train)
        endpoints["zp_mu_bn"] = mu
        mu = relu(mu)
        endpoints["zp_mu_relu"] = mu
        return mu

    # ------------------------------------------------------------------
    def __call__(
        self,
        features,            # [B, L+lc+rc, D]
        spk_labels,          # [B]
        phn_labels,          # [B, L]
        feat_length,         # [B]
        phn_mask_idx,        # [B, K] frame indices for the phone loss, or
                             # None = all frames masked by feat_length
                             # (reference num_frames_per_utt == -1,
                             # common.py:43-55 + base_v1.py:419-447)
        step=0,
        train: bool = False,
        spk_margin_override=None,
        aux_enabled: bool = True,
        sample_weight=None,  # [B] row validity (0 = device-padding row)
    ):
        cfg = self.config
        endpoints: Dict[str, jnp.ndarray] = {}
        shared = self._shared_prefix(features, train, endpoints)
        mu_zs = self._speaker_branch(shared, feat_length, train, endpoints)
        mu_zp = self._phone_branch(shared, train, endpoints)
        assert mu_zp.shape[1] == phn_labels.shape[1], (
            "phone branch length %d != labels length %d — check phone contexts"
            % (mu_zp.shape[1], phn_labels.shape[1])
        )
        endpoints["mu_zs"] = mu_zs
        endpoints["mu_zp"] = mu_zp
        endpoints["output"] = mu_zs

        spk_loss, spk_ep = self.spk_head(
            mu_zs, spk_labels, step=step, train=train,
            margin_override=spk_margin_override, aux_enabled=aux_enabled,
            sample_weight=sample_weight,
        )
        endpoints.update({"spk_" + k: v for k, v in spk_ep.items()})

        if phn_mask_idx is None:
            # All-frames phone loss: every frame enters, weighted by the
            # per-utterance validity mask (and the row weight, if any) —
            # the rectangular equivalent of the reference's ragged
            # all-valid-frames gather for num_frames_per_utt == -1.
            b, l = phn_labels.shape
            zp_sub = mu_zp.reshape(b * l, -1)
            lab_sub = phn_labels.reshape(b * l)
            fw = (jnp.arange(l)[None, :] < feat_length[:, None]).astype(jnp.float32)
            if sample_weight is not None:
                fw = fw * sample_weight[:, None]
            phn_w = fw.reshape(b * l)
        else:
            # Gather the sampled phone frames: [B, K, D] -> [B*K, D].
            b, k = phn_mask_idx.shape
            zp_sub = jnp.take_along_axis(mu_zp, phn_mask_idx[:, :, None], axis=1)
            zp_sub = zp_sub.reshape(b * k, -1)
            lab_sub = jnp.take_along_axis(phn_labels, phn_mask_idx, axis=1).reshape(b * k)
            phn_w = (
                None if sample_weight is None
                else jnp.repeat(sample_weight, k)
            )
        endpoints["mu_zp_subset"] = zp_sub
        endpoints["phn_labels_subset"] = lab_sub
        if phn_w is not None:
            endpoints["phn_weight_subset"] = phn_w
        phn_loss, phn_ep = self.phn_head(
            zp_sub, lab_sub, step=step, train=train, aux_enabled=aux_enabled,
            sample_weight=phn_w,
        )
        endpoints.update({"phn_" + k2: v for k2, v in phn_ep.items()})

        loss = (
            float(cfg.get("spk_loss_weight", 1.0)) * spk_loss
            + float(cfg.get("phn_loss_weight", 1.0)) * phn_loss
        )
        endpoints["spk_loss"] = spk_loss
        endpoints["phn_loss"] = phn_loss
        return loss, endpoints

    def predict_speaker(self, features, feat_length):
        """Speaker embedding for [B, L+lc+rc, D] inputs (eval mode)."""
        endpoints: Dict[str, jnp.ndarray] = {}
        shared = self._shared_prefix(features, False, endpoints)
        self._speaker_branch(shared, feat_length, False, endpoints)
        node = self.config.get("embedding_node", "zs_mu_dense")
        return endpoints[node]

    def predict_phone(self, features):
        """Per-frame phone log-posteriors [B, L, num_phones] (eval mode).

        Equivalent of the reference's "log-output" node
        (compute_loglike.py:54-105): log-softmax of the phone head logits.
        """
        endpoints: Dict[str, jnp.ndarray] = {}
        shared = self._shared_prefix(features, False, endpoints)
        mu_zp = self._phone_branch(shared, False, endpoints)
        b, l, d = mu_zp.shape
        flat = mu_zp.reshape(b * l, d)
        dummy = jnp.zeros((b * l,), jnp.int32)
        _, ep = self.phn_head(flat, dummy, step=0, train=False, aux_enabled=False)
        logits = ep["logits"]
        return jax.nn.log_softmax(logits, axis=-1).reshape(b, l, -1)
