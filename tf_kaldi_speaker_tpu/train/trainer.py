"""The TPU trainer: one pjit'd train step over a data-parallel mesh.

Replaces the reference's feed_dict Trainer (model/trainer.py, 928 LoC of
TF1 session management). Same public surface — build("train"/"valid"/
"predict"), train(), valid(), predict(), train_tune_lr(), partial-restore
fine-tuning — but the execution model is TPU-native:

- The whole step (forward + margin loss + regularization + grads + optax
  update + BN stat update) is ONE jitted function; the global batch is
  sharded over the mesh's "data" axis, parameters are replicated, and XLA
  inserts the gradient psum / cross-replica BN reductions automatically.
- λ-annealed margins take the step as a traced scalar (the reference fed a
  global_step placeholder).
- Validation margin neutralization (trainer.py:260-303) is an argument
  (margin_override / e2e loss swap), not graph surgery.
- Checkpointing is flax msgpack + a TF-style pointer file
  (train/checkpoints.py) so best/last selection works like make_checkpoint.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data import DataOutOfRange, KaldiDataRandomQueue, KaldiDataSeqQueue
from ..losses import LossHead
from ..losses.head import STRUCTURAL_LOSSES
from ..models import EntireNetwork
from ..parallel.mesh import DATA_AXIS, make_mesh
from . import checkpoints

log = logging.getLogger("tfks.trainer")

VALID_MARGIN_NEUTRAL = {
    # loss_type -> margin value that disables the margin at validation time
    "asoftmax": 1,
    "additive_margin_softmax": 0.0,
    "additive_angular_margin_softmax": 0.0,
}


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    loss_stats: Any
    opt_state: Any
    step: jnp.ndarray


class XVectorModel(nn.Module):
    """Network + loss head in one module (one param tree, one apply)."""

    config: Dict[str, Any]
    loss_func: str
    num_outputs: int

    @nn.compact
    def __call__(
        self,
        features,
        labels,
        step=0,
        train: bool = False,
        margin_override=None,
        aux_enabled: bool = True,
        mask=None,
        loss_func_override: Optional[str] = None,
        aux_features=None,
        sample_weight=None,
    ):
        out, endpoints = EntireNetwork(
            config=self.config, network_type=self.config.get("network_type", "tdnn"),
            name="network",
        )(features, train=train, mask=mask, aux_features=aux_features)
        loss_func = loss_func_override or self.loss_func
        loss, ep = LossHead(
            loss_func=loss_func, num_outputs=self.num_outputs, config=self.config,
            name="softmax",
        )(out, labels, step=step, train=train, margin_override=margin_override,
          aux_enabled=aux_enabled, sample_weight=sample_weight)
        endpoints.update(ep)
        return loss, endpoints


def l2_regularization(params, weight_scale: float, output_scale: float):
    """TF-style kernel L2: scale * ||w||²/2 over conv/dense kernels and VLAD
    centers; the loss-head output kernel uses ``output_weight_l2_regularizer``
    when configured (reference loss.py:27-28, tdnn.py kernel_regularizer)."""
    total = 0.0
    for path, w in traverse_util.flatten_dict(params).items():
        leaf = path[-1]
        if leaf == "output_kernel":
            total += 0.5 * output_scale * jnp.sum(jnp.square(w))
        elif leaf in ("kernel", "vlad_centers"):
            total += 0.5 * weight_scale * jnp.sum(jnp.square(w))
    return total


def _scale_by_tf1_adam(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """tf.train.AdamOptimizer semantics (reference trainer.py:345-347,
    default hyperparameters): update = sqrt(1-b2^t)/(1-b1^t) * m_t /
    (sqrt(v_t) + eps) — the bias correction is folded into the step size
    and epsilon sits OUTSIDE the v bias correction. optax.scale_by_adam
    puts eps inside the corrected denominator (m_hat/(sqrt(v_hat)+eps)),
    which diverges for near-zero second moments; the TF-golden train-step
    test pins this exact form."""

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.nu, grads
        )
        t = count.astype(jnp.float32)
        c = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        upd = jax.tree.map(lambda m, v: c * m / (jnp.sqrt(v) + eps), mu, nu)
        return upd, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Dict[str, Any]) -> optax.GradientTransformation:
    """sgd / momentum / adam (reference trainer.py:328-347), without the LR
    scale — the per-step learning rate is applied in the train step so the
    epoch driver can change it without rebuilding anything."""
    name = cfg.get("optimizer", "sgd")
    chain = []
    if cfg.get("clip_gradient", False):
        chain.append(optax.clip_by_global_norm(float(cfg["clip_gradient_norm"])))
    if name == "sgd":
        if "momentum" in cfg:
            raise ValueError(
                "Using sgd as the optimizer and you should not specify the momentum."
            )
    elif name == "momentum":
        chain.append(
            optax.trace(decay=float(cfg["momentum"]), nesterov=cfg.get("use_nesterov", False))
        )
    elif name == "adam":
        chain.append(_scale_by_tf1_adam(
            eps=float(cfg.get("adam_epsilon", 1e-8))))
    else:
        raise ValueError("Optimizer %s is not supported" % name)
    return optax.chain(*chain) if chain else optax.identity()


def freeze_mask(params, noupdate_var_list: Optional[List[str]]):
    """1/0 pytree: 0 where the param path contains any listed substring
    (reference set_trainable_variables semantics, trainer.py:728-773)."""
    if not noupdate_var_list:
        return None
    flat = {}
    for path, w in traverse_util.flatten_dict(params).items():
        name = "/".join(path)
        frozen = any(sub in name for sub in noupdate_var_list)
        flat[path] = jnp.zeros((), w.dtype) if frozen else jnp.ones((), w.dtype)
    return traverse_util.unflatten_dict(flat)


def _revert_frozen_stats(new_stats, old_stats, noupdate_var_list):
    """Keep BN statistics of frozen layers unchanged (the reference drops
    their update ops, trainer.py:379-403)."""
    if not noupdate_var_list:
        return new_stats
    new_flat = traverse_util.flatten_dict(new_stats)
    old_flat = traverse_util.flatten_dict(old_stats)
    for path in new_flat:
        name = "/".join(path)
        if any(sub in name for sub in noupdate_var_list):
            new_flat[path] = old_flat[path]
    return traverse_util.unflatten_dict(new_flat)


class Trainer:
    """Owns model assembly, the jitted steps, and the checkpoint store."""

    def __init__(
        self,
        params,
        model_dir: str,
        dim: Optional[int] = None,
        num_speakers: Optional[int] = None,
        mesh=None,
        single_cpu: bool = False,
    ):
        from ..utils.jax_cache import enable_persistent_cache

        enable_persistent_cache(params.dict.get("compilation_cache_dir"))
        self.params = params
        self.model = model_dir  # <exp>/nnet
        os.makedirs(model_dir, exist_ok=True)
        self.dim = dim
        self.num_speakers = num_speakers
        if mesh is None:
            mesh = make_mesh(model_parallel=int(params.dict.get("model_parallel", 1)))
        self.mesh = mesh
        self.rep = NamedSharding(self.mesh, P())
        self.bsh = NamedSharding(self.mesh, P(DATA_AXIS))

        self.network_model: Optional[XVectorModel] = None
        self.state: Optional[TrainState] = None
        self.tx = None
        self.loss_type: Optional[str] = None
        self.noupdate_var_list: Optional[List[str]] = None
        self._train_step = None
        self._valid_step = None
        self._predict_fns: Dict[str, Any] = {}
        self._device_pool = None
        self._trace_active = False
        self._stop_requested = False
        self._stop_acknowledged = False
        # Multi-host: groups between collective stop polls (see
        # _should_stop; 1 = poll every group). ~4 keeps the async dispatch
        # pipeline overlapped while bounding the stop latency to K*4 steps.
        self._stop_poll_every = int(params.dict.get("stop_poll_groups", 4))
        self.is_built = False

    # ------------------------------------------------------------------
    # Build
    # ------------------------------------------------------------------
    def build(
        self,
        mode: str,
        dim: Optional[int] = None,
        loss_type: Optional[str] = None,
        num_speakers: Optional[int] = None,
        noupdate_var_list: Optional[List[str]] = None,
    ) -> None:
        assert mode in ("train", "valid", "predict")
        if dim is not None:
            self.dim = dim
        if num_speakers is not None:
            self.num_speakers = num_speakers
        if loss_type is not None:
            self.loss_type = loss_type
        if self.loss_type is None:
            self.loss_type = self.params.dict.get("loss_func", "softmax")
        self.noupdate_var_list = noupdate_var_list

        if self.network_model is None:
            self.network_model = XVectorModel(
                config=self.params.dict,
                loss_func=self.loss_type,
                num_outputs=self.num_speakers or 1,
            )

        if mode == "predict":
            self._build_predict()
            return
        if self.state is None:
            self._init_state()
        if mode == "train":
            self._build_train()
        else:
            self._build_valid()
        self.is_built = True

    def _sample_batch(self):
        b = max(2, self.mesh.shape[DATA_AXIS])
        feats = jnp.zeros((b, 64, self.dim), jnp.float32)
        labels = jnp.zeros((b,), jnp.int32)
        return feats, labels

    def _init_state(self) -> None:
        feats, labels = self._sample_batch()
        variables = self.network_model.init(
            jax.random.PRNGKey(int(self.params.dict.get("seed", 0))),
            feats, labels, 0, True,
        )
        self.tx = make_optimizer(self.params.dict)
        # Apply the sharding rules (sharded speaker-softmax when the mesh has
        # a model axis); the optimizer state inherits the param shardings
        # because its init is elementwise over the placed params.
        from ..parallel.sharding_rules import shard_params

        params = shard_params(variables["params"], self.mesh)
        state = TrainState(
            params=params,
            batch_stats=jax.device_put(variables.get("batch_stats", {}), self.rep),
            loss_stats=jax.device_put(variables.get("loss_stats", {}), self.rep),
            opt_state=self.tx.init(params),
            step=jax.device_put(jnp.zeros((), jnp.int32), self.rep),
        )
        self.state = state

    def _variables(self, state: TrainState) -> Dict[str, Any]:
        v = {"params": state.params, "batch_stats": state.batch_stats}
        if state.loss_stats:
            v["loss_stats"] = state.loss_stats
        return v

    def _build_train(self) -> None:
        cfg = self.params.dict
        wreg = float(cfg.get("weight_l2_regularizer", 0.0))
        out_wreg = float(cfg.get("output_weight_l2_regularizer", wreg))
        tx = self.tx if self.tx is not None else make_optimizer(cfg)
        self.tx = tx
        mask = freeze_mask(self.state.params, self.noupdate_var_list)
        noupdate = self.noupdate_var_list
        # compute_dtype="bfloat16": run forward/backward in the TPU-native
        # activation format (params/optimizer/BN stats stay f32; grads flow
        # back in f32 through the cast). ~12% faster on v5e, opt-in since it
        # changes numerics vs the f32 reference.
        bf16 = cfg.get("compute_dtype", "float32") == "bfloat16"

        def step_fn(state: TrainState, features, labels, lr, weights=None):
            # weights [B] (0 = row padded for device-count alignment): the
            # softmax-family losses weight padded rows out (CLAUDE.md rule:
            # padding must never bias losses); batch-structural losses are
            # refused padded batches host-side before we get here.
            def loss_fn(params):
                mutable = ["batch_stats"] + (["loss_stats"] if state.loss_stats else [])
                p = (
                    jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
                    if bf16 else params
                )
                feats = features.astype(jnp.bfloat16) if bf16 else features
                (loss, endpoints), updates = self.network_model.apply(
                    {"params": p, "batch_stats": state.batch_stats,
                     **({"loss_stats": state.loss_stats} if state.loss_stats else {})},
                    feats, labels, state.step, True, mutable=mutable,
                    sample_weight=weights,
                )
                loss = loss.astype(jnp.float32)
                if bf16:
                    updates = jax.tree.map(lambda x: x.astype(jnp.float32), updates)
                reg = l2_regularization(params, wreg, out_wreg)
                penalty = endpoints.get("attention_penalty", 0.0)
                total = loss + reg + penalty
                logits = endpoints.get("logits")
                if logits is None:
                    acc = jnp.float32(0.0)
                elif weights is None:
                    acc = jnp.mean(
                        (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
                    )
                else:
                    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
                    acc = jnp.sum(weights * correct) / jnp.maximum(
                        jnp.sum(weights), 1.0
                    )
                return total, (loss, reg, penalty, acc, updates)

            grads, (loss, reg, penalty, acc, updates) = jax.grad(loss_fn, has_aux=True)(
                state.params
            )
            if mask is not None:
                # Zero frozen-variable grads BEFORE the optimizer chain: the
                # reference computes gradients over trainable vars only
                # (trainer.py:401), so clip_by_global_norm's norm and the
                # Adam/momentum slots must not see frozen gradients.
                grads = jax.tree.map(lambda g, m: g * m, grads, mask)
            upd, opt_state = tx.update(grads, state.opt_state, state.params)
            if mask is not None:
                upd = jax.tree.map(lambda u, m: u * m, upd, mask)
            upd = jax.tree.map(lambda u: -lr * u, upd)
            params = optax.apply_updates(state.params, upd)
            new_bs = _revert_frozen_stats(
                updates.get("batch_stats", state.batch_stats), state.batch_stats, noupdate
            )
            new_state = state.replace(
                params=params,
                batch_stats=new_bs,
                loss_stats=updates.get("loss_stats", state.loss_stats),
                opt_state=opt_state,
                step=state.step + 1,
            )
            metrics = {
                "loss": loss,
                "regularization_loss": reg,
                "penalty_loss": penalty,
                "accuracy": acc,
                "total_loss": loss + reg + penalty,
            }
            return new_state, metrics

        # State shardings are inherited from the placed arrays (replicated
        # trunk, rule-sharded softmax kernel); only the batch is pinned.
        self._train_step = jax.jit(
            step_fn,
            in_shardings=(None, self.bsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )
        # Weighted variant, compiled only by runs whose batch size does not
        # divide the device count (padded rows carry weight 0).
        self._train_step_w = jax.jit(
            lambda state, features, labels, weights, lr: step_fn(
                state, features, labels, lr, weights
            ),
            in_shardings=(None, self.bsh, self.bsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )

        def step_fn_raw(state, codes, headers, labels, lr, weights=None):
            # Decode-on-device: dequantize the compressed ark codes on the
            # VPU (ops/cm_dequant_pallas.py) fused into the train step.
            from ..ops.cm_dequant_pallas import cm_dequantize

            features = cm_dequantize(codes, headers)
            return step_fn(state, features, labels, lr, weights)

        self._train_step_raw = jax.jit(
            step_fn_raw,
            in_shardings=(None, self.bsh, self.bsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )
        self._train_step_raw_w = jax.jit(
            lambda state, codes, headers, labels, weights, lr: step_fn_raw(
                state, codes, headers, labels, lr, weights
            ),
            in_shardings=(None, self.bsh, self.bsh, self.bsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )

        # Grouped K-step dispatch: batches stacked on a leading axis, ONE
        # program launch runs K = steps_per_dispatch steps via lax.scan.
        # Through a high-latency host link (dev tunnel, remote hosts) the
        # per-step RPC dominates the ~3.5 ms device step; one dispatch +
        # one stacked transfer per K steps amortizes it (measured 2.7x
        # loader-fed throughput at K=8). Metrics come back group-meaned.
        # gsh: [K, B, ...] arrays, batch axis 1 on the data mesh axis.
        self.gsh = NamedSharding(self.mesh, P(None, DATA_AXIS))

        def scan_steps(inner, state, stacked, lr):
            def body(s, xs):
                return inner(s, *xs, lr)

            state, ms = jax.lax.scan(body, state, stacked)
            return state, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

        self._train_step_multi = jax.jit(
            lambda state, features, labels, lr: scan_steps(
                step_fn, state, (features, labels), lr
            ),
            in_shardings=(None, self.gsh, self.gsh, self.rep),
            donate_argnums=(0,),
        )
        self._train_step_raw_multi = jax.jit(
            lambda state, codes, headers, labels, lr: scan_steps(
                step_fn_raw, state, (codes, headers, labels), lr
            ),
            in_shardings=(None, self.gsh, self.gsh, self.gsh, self.rep),
            donate_argnums=(0,),
        )
        # Weighted grouped variants (padded batches): weights ride the scan
        # as a broadcast [K, B] alongside the stacked batches.
        self._train_step_multi_w = jax.jit(
            lambda state, features, labels, weights, lr: scan_steps(
                lambda s, f, l, w, lr_: step_fn(s, f, l, lr_, w),
                state, (features, labels, weights), lr
            ),
            in_shardings=(None, self.gsh, self.gsh, self.gsh, self.rep),
            donate_argnums=(0,),
        )
        self._train_step_raw_multi_w = jax.jit(
            lambda state, codes, headers, labels, weights, lr: scan_steps(
                lambda s, c, h, l, w, lr_: step_fn_raw(s, c, h, l, lr_, w),
                state, (codes, headers, labels, weights), lr
            ),
            in_shardings=(None, self.gsh, self.gsh, self.gsh, self.gsh, self.rep),
            donate_argnums=(0,),
        )

        # Device-pool path: the whole (compressed) corpus lives in HBM and
        # each scanned step gathers its chunks on-device; the host ships
        # only [K, B] index triples (data/device_pool.py). One compiled
        # program per bucket length (chunk_len is static for dynamic_slice).
        from ..data.device_pool import gather_chunks

        def pool_scan_fn(chunk_len: int, weighted: bool = False):
            # ``weighted``: row-validity weights [B] (constant across the K
            # scanned steps) for batches padded to the device count.
            def fn(state, frames, headers, starts, utts, labels, lr,
                   weights=None):
                def body(s, xs):
                    st, ut, lb = xs
                    codes, hdr = gather_chunks(frames, headers, st, ut, chunk_len)
                    return step_fn_raw(s, codes, hdr, lb, lr, weights)

                state2, ms = jax.lax.scan(body, state, (starts, utts, labels))
                return state2, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

            if weighted:
                return jax.jit(
                    lambda state, frames, headers, starts, utts, labels,
                    weights, lr: fn(
                        state, frames, headers, starts, utts, labels, lr,
                        weights),
                    in_shardings=(
                        None, self.rep, self.rep, self.gsh, self.gsh,
                        self.gsh, self.bsh, self.rep,
                    ),
                    donate_argnums=(0,),
                )
            return jax.jit(
                fn,
                in_shardings=(
                    None, self.rep, self.rep, self.gsh, self.gsh, self.gsh,
                    self.rep,
                ),
                donate_argnums=(0,),
            )

        self._pool_step_cache: Dict[Any, Any] = {}

        def train_step_pool_multi(chunk_len: int, weighted: bool = False):
            key = (chunk_len, weighted)
            fn = self._pool_step_cache.get(key)
            if fn is None:
                fn = self._pool_step_cache[key] = pool_scan_fn(
                    chunk_len, weighted)
            return fn

        self._train_step_pool_multi = train_step_pool_multi

        # Sharded-pool variant: the pool lives sharded over the data axis
        # (device d holds its own speaker shard — capacity scales with the
        # chip count) and the gather runs under shard_map, so each device
        # slices its LOCAL frames block with its local index rows; the
        # per-shard batch blocks line up with the P(data) batch sharding.
        def pool_scan_fn_sharded(chunk_len: int):
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            gather = shard_map(
                lambda pf, ph, st, ut: gather_chunks(pf, ph, st, ut, chunk_len),
                mesh=self.mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                          P(DATA_AXIS)),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            )

            def fn(state, frames, headers, starts, utts, labels, lr):
                def body(s, xs):
                    st, ut, lb = xs
                    codes, hdr = gather(frames, headers, st, ut)
                    return step_fn_raw(s, codes, hdr, lb, lr)

                state2, ms = jax.lax.scan(body, state, (starts, utts, labels))
                return state2, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

            return jax.jit(
                fn,
                in_shardings=(
                    None, self.bsh, self.bsh, self.gsh, self.gsh, self.gsh,
                    self.rep,
                ),
                donate_argnums=(0,),
            )

        def train_step_pool_multi_sharded(chunk_len: int):
            key = ("sharded", chunk_len)
            fn = self._pool_step_cache.get(key)
            if fn is None:
                fn = self._pool_step_cache[key] = pool_scan_fn_sharded(chunk_len)
            return fn

        self._train_step_pool_multi_sharded = train_step_pool_multi_sharded

    def _build_valid(self) -> None:
        loss_override = (
            "e2e_valid_loss" if self.loss_type == "angular_triplet_loss" else None
        )
        margin_override = VALID_MARGIN_NEUTRAL.get(self.loss_type)

        def valid_fn(state: TrainState, features, labels, weights):
            # weights [B]: 1 for real rows, 0 for rows padded to a multiple
            # of the device count — the loss mean runs over real rows only,
            # matching the reference's unpadded streamed mean
            # (trainer.py:592-706).
            loss, endpoints = self.network_model.apply(
                self._variables(state),
                features, labels, state.step, False,
                margin_override=margin_override,
                aux_enabled=False,
                loss_func_override=loss_override,
                sample_weight=weights,
            )
            return loss, endpoints["output"]

        # Embeddings come back replicated so every host can read the full
        # dump (a batch-sharded output is not host-addressable off-process).
        self._valid_step = jax.jit(
            valid_fn,
            in_shardings=(None, self.bsh, self.bsh, self.bsh),
            out_shardings=(self.rep, self.rep),
        )

        # Embeddings-only step for the dump pass: the reference runs just
        # the embeddings node there (trainer.py:643-645) — routing the dump
        # through the loss head would crash structural losses
        # (e2e_valid_loss reshapes by the configured valid-batch shape) on
        # arbitrary sequential batch sizes.
        net = EntireNetwork(
            config=self.params.dict,
            network_type=self.params.dict.get("network_type", "tdnn"),
        )

        def embed_fn(state: TrainState, features):
            _, endpoints = net.apply(
                {"params": state.params["network"],
                 "batch_stats": state.batch_stats.get("network", {})},
                features, False,
            )
            return endpoints["output"]

        self._embed_step = jax.jit(
            embed_fn,
            in_shardings=(None, self.bsh),
            out_shardings=self.rep,
        )

    def _build_predict(self) -> None:
        node = self.params.dict.get("embedding_node", "tdnn6_dense")

        def predict_fn(variables, features):
            net = EntireNetwork(
                config=self.params.dict,
                network_type=self.params.dict.get("network_type", "tdnn"),
            )
            _, endpoints = net.apply(variables, features, False)
            return endpoints[node]

        self._predict_raw = predict_fn
        self._predict_jit = jax.jit(predict_fn)

    # ------------------------------------------------------------------
    # Preemption-graceful stop
    # ------------------------------------------------------------------
    def request_stop(self) -> None:
        """Ask the training loop to stop at the next dispatch-group
        boundary. The epoch then saves a checkpoint and returns normally,
        so ``--cont`` resumes mid-epoch (beyond reference: the original is
        restart-based only, SURVEY.md §5 'Failure detection ... None
        in-process'). Safe to call from a signal handler (it only flips a
        flag; all work happens on the training thread)."""
        self._stop_requested = True

    @property
    def stop_requested(self) -> bool:
        return self._stop_requested

    @property
    def stop_acknowledged(self) -> bool:
        """True once a stop request has been AGREED ON by every host (the
        collective poll in _should_stop returned True). The preemption exit
        path keys on this, not on the raw local flag: a SIGTERM that lands
        on a subset of hosts after the loop's last collective check must
        not make those hosts exit while the rest proceed into the next
        phase's collectives (a lone host leaving early deadlocks the
        others). Single-process, the two flags coincide at the next poll."""
        return self._stop_acknowledged

    def _should_stop(self, tick: int = 0, every: int = 1) -> bool:
        """Stop check at a dispatch/batch boundary. Single-process: a plain
        flag read (zero cost on the hot path). Multi-host: the flag is
        OR-reduced across processes so every host leaves the collective
        loop at the SAME boundary even if SIGTERM lands on a subset of
        hosts or at skewed times.

        ``tick``/``every``: the collective poll runs only when
        ``tick % every == every - 1`` — a cross-host allgather forces the
        host to sync with the in-flight device program, so polling every
        group would serialize the one-deep dispatch pipeline. All hosts
        iterate the loop in lockstep, so a fixed cadence keyed on the loop
        counter stays symmetric. The local-flag fast path is always
        checked."""
        if self._stop_acknowledged:
            if self._stop_requested:
                return True
            # The request flag was cleared to resume training after a stop
            # (mid-epoch --cont semantics); drop the stale acknowledgement.
            # Multi-host safe: acknowledgement always sets the request flag
            # on every host, so clearing is only observable if done on all.
            self._stop_acknowledged = False
        if jax.process_count() == 1:
            self._stop_acknowledged = self._stop_requested
            return self._stop_acknowledged
        if (tick % every) != (every - 1):
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.int32(1 if self._stop_requested else 0)
        )
        if bool(np.any(flags)):
            self._stop_requested = True
            self._stop_acknowledged = True
            return True
        return False

    # ------------------------------------------------------------------
    # Checkpoints
    # ------------------------------------------------------------------
    def save(self, step: int) -> None:
        if jax.process_index() != 0:
            return  # multi-host: one writer (state is replicated)
        checkpoints.save_checkpoint(
            self.model, self.state, step,
            keep_max=int(self.params.dict.get("keep_checkpoint_max", 0)),
        )

    def load(self, step: Optional[int] = None) -> int:
        """Restore train state; returns the restored step (0 if none)."""
        try:
            if self.state is None:
                if self.network_model is None:
                    self.build("train", self.dim, None, self.num_speakers)
                else:
                    self._init_state()
            state, step = checkpoints.load_checkpoint(self.model, self.state, step)
            from ..parallel.sharding_rules import shard_params

            self.state = state.replace(
                params=shard_params(state.params, self.mesh),
                batch_stats=jax.device_put(state.batch_stats, self.rep),
                loss_stats=jax.device_put(state.loss_stats, self.rep),
                opt_state=jax.device_put(state.opt_state, self.rep),
                step=jax.device_put(state.step, self.rep),
            )
            return int(step)
        except FileNotFoundError:
            return 0

    def get_finetune_model(self, noload_var_list: Optional[List[str]]) -> None:
        """Partial restore: reinitialize variables matching noload_var_list,
        keep the rest from the checkpoint (reference trainer.py:775-819).

        The global step restarts at 0 (the copied pretrain state still
        carries its old step; margin annealing must restart like the
        reference's copy-as-model-0)."""
        restored_step = self.load()
        self.state = self.state.replace(
            step=jax.device_put(jnp.zeros((), jnp.int32), self.rep)
        )
        if not noload_var_list:
            # Re-save so checkpoint 0 on disk carries the RESET step (the
            # copied pretrain msgpack still holds the old internal step; a
            # crash before the first epoch checkpoint + --cont would
            # otherwise resume margin annealing from the stale pretrain
            # step). The reference always re-saves (trainer.py:819).
            self.save(0)
            return
        fresh = self.network_model.init(
            jax.random.PRNGKey(int(self.params.dict.get("seed", 0)) + 1),
            *self._sample_batch(), 0, True,
        )

        def merge(tree, fresh_tree):
            flat = traverse_util.flatten_dict(tree)
            fresh_flat = traverse_util.flatten_dict(fresh_tree)
            for path in flat:
                name = "/".join(path)
                if any(sub in name for sub in noload_var_list):
                    flat[path] = fresh_flat[path]
            return traverse_util.unflatten_dict(flat)

        params = merge(self.state.params, fresh["params"])
        bs = merge(self.state.batch_stats, fresh.get("batch_stats", {}))
        self.state = self.state.replace(
            params=params, batch_stats=bs, opt_state=self.tx.init(params)
        )
        self.save(0)
        log.info("Fine-tune init from step %d; reinitialized %s", restored_step, noload_var_list)

    # ------------------------------------------------------------------
    # Loops
    # ------------------------------------------------------------------
    def _put_rows(self, array: np.ndarray):
        """Place one GLOBAL batch array onto the data axis.

        Multi-process SPMD: every host holds the same global batch (the
        valid/tune loaders are seeded identically across hosts), and each
        contributes its process-local row block via
        jax.make_array_from_process_local_data.
        """
        if jax.process_count() == 1:
            return jax.device_put(array, self.bsh)
        blk = array.shape[0] // jax.process_count()
        pid = jax.process_index()
        return jax.make_array_from_process_local_data(
            self.bsh, np.ascontiguousarray(array[pid * blk : (pid + 1) * blk])
        )

    def _from_local(self, local: np.ndarray):
        """Assemble a globally-sharded batch from this host's OWN rows
        (train path: hosts load disjoint data)."""
        if jax.process_count() == 1:
            return jax.device_put(local, self.bsh)
        return jax.make_array_from_process_local_data(self.bsh, local)

    def _pad_rows(self, *arrays):
        """Pad the batch to a multiple of the global data-axis size by
        tiling the last row; returns (padded_arrays, real_count)."""
        n = self.mesh.shape[DATA_AXIS]
        b = arrays[0].shape[0]
        if b % n == 0:
            return arrays, b
        pad = n - b % n
        return tuple(
            np.concatenate([x, np.tile(x[-1:], (pad,) + (1,) * (x.ndim - 1))], 0)
            for x in arrays
        ), b

    def _pad_group_rows(self, *arrays):
        """Grouped variant of _pad_rows: arrays are [K, B, ...]; pad the
        BATCH axis (1) to a multiple of the global data-axis size."""
        n = self.mesh.shape[DATA_AXIS]
        b = arrays[0].shape[1]
        if b % n == 0:
            return arrays, b
        pad = n - b % n
        return tuple(
            np.concatenate(
                [x, np.tile(x[:, -1:], (1, pad) + (1,) * (x.ndim - 2))], 1
            )
            for x in arrays
        ), b

    def _from_local_grouped(self, local: np.ndarray):
        """Grouped-batch variant of _from_local ([K, B_local, ...] rows)."""
        if jax.process_count() == 1:
            return jax.device_put(local, self.gsh)
        return jax.make_array_from_process_local_data(self.gsh, local)

    def _shard_batch(self, features: np.ndarray, labels: np.ndarray):
        (features, labels), _ = self._pad_rows(features, labels)
        return self._put_rows(features), self._put_rows(labels)

    def _shard_batch_weighted(self, features: np.ndarray, labels: np.ndarray):
        """Like _shard_batch, plus a row-validity weight vector (0 on rows
        padded for device-count alignment)."""
        (features, labels), b = self._pad_rows(features, labels)
        weights = np.zeros((features.shape[0],), np.float32)
        weights[:b] = 1.0
        return self._put_rows(features), self._put_rows(labels), self._put_rows(weights)

    def train(self, data_dir: str, spklist: str, learning_rate: float, aux_data=None) -> None:
        """One epoch of num_steps_per_epoch steps (reference trainer.py:451-520)."""
        cfg = self.params.dict
        if bool(cfg.get("device_pool", False)):
            return self._train_device_pool(data_dir, spklist, learning_rate)
        num_steps = int(cfg["num_steps_per_epoch"])
        show = int(cfg.get("show_training_progress", 100))
        save_every = int(cfg.get("save_checkpoints_steps", num_steps))
        device_decode = bool(cfg.get("device_decode", False))
        summary_steps = int(cfg.get("save_summary_steps", 0))
        writer = None
        if summary_steps and jax.process_index() == 0:
            # one writer per run (metrics/params are replicated; every
            # process would log identical values into the shared dir)
            from ..utils.summary import SummaryWriter

            writer = SummaryWriter(self.model)
        profile_steps = int(cfg.get("profile_steps", 0))
        # Multi-host: each process loads a DISJOINT slice of the global
        # batch (global N speakers = nproc hosts x N/nproc local speakers,
        # host-offset seeds), and the global array is assembled from the
        # local rows (SURVEY §2.5 "multi-host scale-out over DCN").
        nproc, pid = jax.process_count(), jax.process_index()
        glob_speakers = int(cfg.get("num_speakers_per_batch", 64))
        if nproc > 1:
            assert glob_speakers % nproc == 0, (
                "num_speakers_per_batch=%d must divide across %d hosts"
                % (glob_speakers, nproc)
            )
        min_len = int(cfg.get("min_segment_len", 200))
        max_len = int(cfg.get("max_segment_len", 400))
        # Mid-epoch --cont resumes the REMAINDER of the epoch (reference
        # train loop: range(curr_step % num_steps, num_steps),
        # trainer.py:482) so the checkpoint-step = epoch*num_steps
        # invariant that best-checkpoint selection relies on survives a
        # crash between save_checkpoints_steps checkpoints.
        step0 = int(self.state.step)
        steps_left = num_steps - step0 % num_steps
        # K-step dispatch groups: shrink K until it divides steps_left so
        # the epoch runs exactly steps_left steps with ONE compiled program
        # (no remainder-shaped recompile). K identical on every host.
        K = max(1, min(int(cfg.get("steps_per_dispatch", 8)), steps_left))
        while steps_left % K:
            K -= 1
        # Multi-host: all hosts must agree on each batch's length (the
        # global array's shape is a collective contract). One worker per
        # host (deterministic production order) + a length-draw RNG seeded
        # identically on every host makes the k-th batch's length equal
        # everywhere, while speaker/chunk sampling stays host-disjoint.
        loader = KaldiDataRandomQueue(
            data_dir, spklist,
            num_parallel=(
                1 if nproc > 1 else int(cfg.get("num_parallel_datasets", 4))
            ),
            max_qsize=int(cfg.get("max_queue_size", 10)),
            num_speakers=glob_speakers // nproc,
            num_segments=int(cfg.get("num_segments_per_speaker", 1)),
            min_len=min_len,
            max_len=max_len,
            seed=int(cfg.get("seed", 0)) + step0 + pid * 7919,
            num_buckets=int(cfg.get("num_buckets", 8)),
            raw_codes=device_decode,
            length_seed=(
                int(cfg.get("seed", 0)) + step0
                if nproc > 1 else None
            ),
            group=K,
        ).start()
        lr = jnp.float32(learning_rate)
        t0 = time.time()

        # Double-buffered device prefetch: the host→device copy of group
        # k+1 overlaps the compute of group k (data/pipeline.py).
        from ..data.pipeline import device_prefetch

        # Padding policy (CLAUDE.md): rows duplicated for device-count
        # alignment carry weight 0 so they never bias the loss; structural
        # losses cannot weight rows out and are refused padded batches.
        ndev_data = self.mesh.shape[DATA_AXIS]
        B_local = (glob_speakers // nproc) * int(
            cfg.get("num_segments_per_speaker", 1))
        pad_needed = nproc == 1 and B_local % ndev_data
        if pad_needed and self.loss_type in STRUCTURAL_LOSSES:
            raise ValueError(
                "loss %s cannot weight padded rows out; choose a batch size "
                "divisible by the %d-way data axis"
                % (self.loss_type, ndev_data))
        weights_dev = None
        if pad_needed:
            bp = B_local + (ndev_data - B_local % ndev_data)
            w = np.zeros((bp,), np.float32)
            w[:B_local] = 1.0
            if K > 1:
                weights_dev = jax.device_put(
                    np.tile(w, (K, 1)), self.gsh)
            else:
                weights_dev = jax.device_put(w, self.bsh)

        if K > 1:
            if pad_needed:
                step_multi = (
                    self._train_step_raw_multi_w if device_decode
                    else self._train_step_multi_w
                )
            else:
                step_multi = (
                    self._train_step_raw_multi if device_decode
                    else self._train_step_multi
                )
        else:
            step_multi = None

        def host_batches():
            for _ in range(steps_left // K):
                batch = loader.fetch()
                if nproc == 1:
                    batch, _ = self._pad_group_rows(*batch) if K > 1 \
                        else self._pad_rows(*batch)
                yield batch

        sharding = self.gsh if K > 1 else self.bsh
        try:
            for local_group, batch in enumerate(
                device_prefetch(
                    host_batches(), sharding, depth=2,
                    put_fn=(
                        (self._from_local_grouped if K > 1 else self._from_local)
                        if nproc > 1 else None
                    ),
                )
            ):
                if K > 1:
                    extra = (weights_dev, lr) if pad_needed else (lr,)
                    self.state, metrics = step_multi(self.state, *batch, *extra)
                elif device_decode:
                    codes, headers, labels = batch
                    if pad_needed:
                        self.state, metrics = self._train_step_raw_w(
                            self.state, codes, headers, labels, weights_dev, lr
                        )
                    else:
                        self.state, metrics = self._train_step_raw(
                            self.state, codes, headers, labels, lr
                        )
                else:
                    features, labels = batch
                    if pad_needed:
                        self.state, metrics = self._train_step_w(
                            self.state, features, labels, weights_dev, lr
                        )
                    else:
                        self.state, metrics = self._train_step(
                            self.state, features, labels, lr
                        )
                self._post_group(
                    cfg, writer, metrics, K, local_group, t0,
                    show, summary_steps, save_every, profile_steps, step0,
                )
                if self._should_stop(local_group, self._stop_poll_every):
                    break
        finally:
            loader.stop()
            if self._trace_active:
                # The profile window can outlast the epoch's group count;
                # always flush so the next epoch can start a new trace.
                jax.profiler.stop_trace()
                self._trace_active = False
            if writer:
                writer.close()
        self.save(int(self.state.step))

    def _train_device_pool(
        self, data_dir: str, spklist: str, learning_rate: float
    ) -> None:
        """One epoch fed from the HBM sample pool (data/device_pool.py).

        The host computes [K, B] (start, utt, label) index triples — a few
        KB per dispatch — and the scanned K-step program gathers +
        dequantizes the chunks on-device, so the loader-fed rate equals
        the device-step rate. When the corpus exceeds ``pool_budget_mb``,
        residency rotates INSIDE the epoch at dispatch-group boundaries
        through a coverage partition whose unit is ``pool_rotation_unit``:
        "utts" (default) slices every speaker's utterance list so each
        window keeps the full speaker distribution; "speakers" partitions
        the speaker set (measured ~0.5-0.9% absolute EER worse — see
        data/device_pool.py and the docs/VALIDATION.md quality matrix)."""
        import random as _random

        from ..data import bucket_lengths
        from ..data.device_pool import DevicePool

        cfg = self.params.dict
        num_steps = int(cfg["num_steps_per_epoch"])
        show = int(cfg.get("show_training_progress", 100))
        save_every = int(cfg.get("save_checkpoints_steps", num_steps))
        summary_steps = int(cfg.get("save_summary_steps", 0))
        profile_steps = int(cfg.get("profile_steps", 0))
        writer = None
        if summary_steps and jax.process_index() == 0:
            # one writer per run (multi-host: process 0 only, like train())
            from ..utils.summary import SummaryWriter

            writer = SummaryWriter(self.model)
        # Mid-epoch --cont resumes the remainder (see train()).
        step0 = int(self.state.step)
        steps_left = num_steps - step0 % num_steps
        K = max(1, min(int(cfg.get("steps_per_dispatch", 8)), steps_left))
        while steps_left % K:
            K -= 1
        num_speakers = int(cfg.get("num_speakers_per_batch", 64))
        num_segments = int(cfg.get("num_segments_per_speaker", 1))
        buckets = bucket_lengths(
            int(cfg.get("min_segment_len", 200)),
            int(cfg.get("max_segment_len", 400)),
            int(cfg.get("num_buckets", 8)),
        )
        ndev = self.mesh.shape[DATA_AXIS]
        nproc, pid = jax.process_count(), jax.process_index()
        # Multi-device meshes shard the pool over the data axis (capacity
        # scales with chips, every gather stays device-local); a single
        # data shard keeps the simpler replicated pool. Overridable —
        # except multi-host, which is sharded by construction (each host
        # stages only its own devices' shards).
        sharded = bool(cfg.get("pool_sharded", ndev > 1))
        if nproc > 1 and not sharded:
            raise ValueError("multi-host device_pool requires pool_sharded")
        if self._device_pool is None or self._device_pool.data_dir != data_dir:
            if self._device_pool is not None:
                self._device_pool.close()
            # float MB allowed (sub-MB budgets matter for tiny test corpora)
            budget = int(float(cfg.get("pool_budget_mb", 12000)) * (1 << 20))
            # "utts" keeps every speaker resident in every rotation window
            # (speaker distribution identical to full residency, measured
            # at parity on the hard benchmark); "speakers" partitions the
            # speaker set instead (docs/VALIDATION.md quality matrix).
            unit = str(cfg.get("pool_rotation_unit", "utts"))
            # The longest bucket the sampler will draw: rotation windows
            # must keep >= 1 longer-than-this utterance per speaker
            # resident (the reference's resampling rule, see DevicePool).
            chunk_frames = max(buckets)
            if sharded:
                from ..data.device_pool import ShardedDevicePool

                self._device_pool = ShardedDevicePool(
                    data_dir, spklist, self.mesh, axis=DATA_AXIS,
                    budget_bytes=budget, seed=int(cfg.get("seed", 0)),
                    rotation_unit=unit, chunk_frames=chunk_frames,
                )
            else:
                self._device_pool = DevicePool(
                    data_dir, spklist, budget_bytes=budget,
                    sharding=self.rep, seed=int(cfg.get("seed", 0)),
                    rotation_unit=unit, chunk_frames=chunk_frames,
                )
        pool = self._device_pool
        # Rotation schedule: C coverage cycles of R windows per epoch
        # (R == 1: fully resident, no rotation). Each slot is active for
        # num_steps/(C*R) consecutive steps; every cycle re-partitions the
        # speakers (seeded), so raising ``pool_rotation_cycles`` shortens
        # the window dwell — finer corpus interleaving at the cost of C×
        # corpus bytes of H2D staging per epoch (one-cycle dwell measured
        # ~+1% absolute EER vs full-resident on the hard benchmark; see
        # docs/VALIDATION.md quality matrix). Slot boundaries align to
        # absolute epoch position, so a mid-epoch --cont resumes inside
        # the correct window. All hosts share num_steps/step0/seed/C, so
        # they stage the same windows at the same group boundaries
        # (collective shape contract unaffected).
        R = getattr(pool, "rotation_rounds", 1)
        C = max(1, int(cfg.get("pool_rotation_cycles", 1))) if R > 1 else 1
        # More slots than epoch steps would skip windows (= skip speakers):
        # clamp so every window of every cycle gets at least one step.
        C = min(C, max(1, num_steps // max(1, R)))
        epoch = step0 // max(1, num_steps)

        def _window(step_in_epoch: int) -> int:
            return min(C * R - 1, C * R * step_in_epoch // num_steps)

        cur_window = _window(step0 % num_steps)
        pool.stage(epoch * C * R + cur_window)
        # Host-disjoint sampling streams; the LENGTH stream is shared so
        # every host dispatches the same program shape (collective shape
        # contract, same as the streaming loaders).
        rng = _random.Random(int(cfg.get("seed", 0)) + step0 + pid * 7919)
        length_rng = _random.Random(int(cfg.get("seed", 0)) + step0)
        lr = jnp.float32(learning_rate)
        # Padding policy: the SHARDED pool's sample_group contract already
        # lays rows out in per-shard blocks of equal size, so its batches
        # are device-aligned by construction and must NEVER be padded
        # (duplicated rows would land on the wrong shard and index the
        # wrong frames block). Only the replicated pool can need padding
        # (B % ndev != 0); its padded rows carry weight 0 so they cannot
        # bias the loss (CLAUDE.md rule), which also means batch-structural
        # losses (triplet/e2e) cannot run padded.
        pad_needed = (not sharded) and (num_speakers * num_segments) % ndev
        if pad_needed and self.loss_type in STRUCTURAL_LOSSES:
            raise ValueError(
                "loss %s cannot weight padded rows out; choose a batch size "
                "divisible by the %d-way data axis" % (self.loss_type, ndev))
        weights_dev = None
        t0 = time.time()
        try:
            for local_group in range(steps_left // K):
                w = _window(step0 % num_steps + local_group * K)
                if w != cur_window:
                    cur_window = w
                    pool.stage(epoch * C * R + w)
                L = length_rng.choice(buckets)
                starts, utts, labels = pool.sample_group(
                    rng, K, num_speakers, num_segments, L
                )
                if pad_needed:
                    b = starts.shape[1]
                    (starts, utts, labels), _ = self._pad_group_rows(
                        starts, utts, labels
                    )
                    if weights_dev is None:
                        row_w = np.zeros((starts.shape[1],), np.float32)
                        row_w[:b] = 1.0
                        weights_dev = jax.device_put(row_w, self.bsh)
                if sharded:
                    step = self._train_step_pool_multi_sharded(L)
                else:
                    step = self._train_step_pool_multi(L, bool(pad_needed))
                if nproc > 1:
                    put = self._from_local_grouped
                else:
                    put = lambda a: jax.device_put(a, self.gsh)
                extra = (weights_dev, lr) if pad_needed else (lr,)
                self.state, metrics = step(
                    self.state, pool.frames, pool.headers,
                    put(starts), put(utts), put(labels),
                    *extra,
                )
                self._post_group(
                    cfg, writer, metrics, K, local_group, t0,
                    show, summary_steps, save_every, profile_steps, step0,
                )
                if self._should_stop(local_group, self._stop_poll_every):
                    break
        finally:
            if self._trace_active:
                jax.profiler.stop_trace()
                self._trace_active = False
            if writer:
                writer.close()
        self.save(int(self.state.step))

    def _post_group(
        self, cfg, writer, metrics, K, local_group, t0,
        show, summary_steps, save_every, profile_steps, step0,
    ):
        """Per-dispatch-group bookkeeping: numerics check, profiling window,
        progress log, summaries, checkpoint. Cadences are crossing checks
        (gstep advances K at a time; metrics at a crossing are the group
        mean). ``step0`` is the epoch-start step: the global step is derived
        host-side (step0 + groups*K) so the common no-crossing group does
        NOT block on a device fetch — blocking every group would serialize
        dispatch with compute and re-add the per-group RTT the K-step
        dispatch exists to amortize."""
        gstep = step0 + (local_group + 1) * K
        local_step = local_group * K + K - 1
        if cfg.get("check_numerics", False):
            # Sanitizer mode (SURVEY §5: the reference only has
            # NaN asserts in self-tests): fail fast on divergence.
            m = jax.device_get(metrics)
            if not np.isfinite(m["loss"]):
                raise FloatingPointError(
                    "Non-finite loss at step %d: %r" % (gstep, m)
                )
        if profile_steps and local_group == (10 // K):
            jax.profiler.start_trace(os.path.join(self.model, "profile"))
            self._trace_active = True
        if profile_steps and self._trace_active and (
            local_group >= (10 + profile_steps) // K + 1
        ):
            jax.profiler.stop_trace()
            self._trace_active = False
        if show and (local_step % show) < K:
            m = jax.device_get(metrics)
            log.info(
                "step %d: loss %.4f reg %.4f acc %.3f (%.2f steps/s)",
                gstep, m["loss"], m["regularization_loss"], m["accuracy"],
                (local_step + 1) / (time.time() - t0),
            )
        if writer and summary_steps and (
            gstep // summary_steps > (gstep - K) // summary_steps
        ):
            writer.scalars(gstep, jax.device_get(metrics))
            if cfg.get("save_histograms", True):
                # per-variable histograms (reference trainer.py:431);
                # skip shards this process cannot read (model-
                # parallel kernels spanning other hosts)
                readable = {
                    "/".join(p): w
                    for p, w in traverse_util.flatten_dict(
                        self.state.params
                    ).items()
                    if getattr(w, "is_fully_addressable", True)
                }
                writer.histograms(
                    gstep,
                    {k: np.asarray(v).ravel()
                     for k, v in jax.device_get(readable).items()},
                )
        if save_every and gstep // save_every > (gstep - K) // save_every:
            self.save(gstep)

    def train_tune_lr(self, data_dir: str, spklist: str, tune_period: int = 100) -> None:
        """Exponential LR sweep 1e-5 · 1.15^k (reference trainer.py:522-590);
        writes ``learning_rate_tuning`` (k, lr, loss) for plotting."""
        cfg = self.params.dict
        B = int(cfg.get("num_speakers_per_batch", 64)) * int(
            cfg.get("num_segments_per_speaker", 1))
        if B % self.mesh.shape[DATA_AXIS] and self.loss_type in STRUCTURAL_LOSSES:
            # Same policy as train(): mining losses cannot weight padded
            # rows out, so a padded sweep would be silently biased.
            raise ValueError(
                "loss %s cannot weight padded rows out; choose a batch size "
                "divisible by the %d-way data axis"
                % (self.loss_type, self.mesh.shape[DATA_AXIS]))
        loader = KaldiDataRandomQueue(
            data_dir, spklist,
            num_parallel=int(cfg.get("num_parallel_datasets", 4)),
            max_qsize=int(cfg.get("max_queue_size", 10)),
            num_speakers=int(cfg.get("num_speakers_per_batch", 64)),
            num_segments=int(cfg.get("num_segments_per_speaker", 1)),
            min_len=int(cfg.get("min_segment_len", 200)),
            max_len=int(cfg.get("max_segment_len", 400)),
            seed=int(cfg.get("seed", 0)),
            num_buckets=int(cfg.get("num_buckets", 8)),
        ).start()
        max_sweeps = 100
        with open(os.path.join(os.path.dirname(self.model), "learning_rate_tuning"), "w") as fp:
            try:
                for k in range(max_sweeps):
                    lr = 1e-5 * (1.15 ** k)
                    losses = []
                    for _ in range(tune_period):
                        features, labels = loader.fetch()
                        f, l, w = self._shard_batch_weighted(features, labels)
                        if features.shape[0] % self.mesh.shape[DATA_AXIS]:
                            self.state, metrics = self._train_step_w(
                                self.state, f, l, w, jnp.float32(lr)
                            )
                        else:
                            self.state, metrics = self._train_step(
                                self.state, f, l, jnp.float32(lr)
                            )
                        losses.append(float(metrics["loss"]))
                    mean_loss = float(np.mean(losses))
                    fp.write("%d %.8f %f\n" % (k, lr, mean_loss))
                    fp.flush()
                    log.info("lr sweep %d: lr=%.2e loss=%.4f", k, lr, mean_loss)
                    if not np.isfinite(mean_loss) or mean_loss > 1e4:
                        break
            finally:
                loader.stop()

    def valid(
        self,
        data_dir: str,
        spklist: str,
        batch_type: str = "softmax",
        output_embeddings: bool = False,
        aux_data=None,
    ) -> Tuple[float, Optional[np.ndarray], Optional[np.ndarray]]:
        """Validation: optional embedding dump pass + streamed loss pass
        (reference trainer.py:592-706). Returns (loss, embeddings, labels)."""
        cfg = self.params.dict
        embeddings, labels_out = None, None
        # Multi-host: every host streams the SAME batches (identical seeds,
        # one worker so queue order is deterministic) and contributes its
        # row block — see _put_rows.
        nw = 1 if jax.process_count() > 1 else 2
        if output_embeddings:
            seq = KaldiDataSeqQueue(
                data_dir, spklist, num_parallel=nw,
                batch_size=int(cfg.get("num_speakers_per_batch", 64))
                * int(cfg.get("num_segments_per_speaker", 1)),
                min_len=int(cfg.get("min_segment_len", 200)),
                max_len=int(cfg.get("max_segment_len", 400)),
                shuffle=False,
                num_buckets=int(cfg.get("num_buckets", 8)),
            ).start()
            embs, labs = [], []
            try:
                tick = 0
                while True:
                    # Preemption can land mid-valid; poll at batch
                    # boundaries (collective cadence — all hosts stream the
                    # same batches, so the tick counter is symmetric) so the
                    # grace window is not burned finishing the dump.
                    if self._should_stop(tick, self._stop_poll_every):
                        break
                    tick += 1
                    features, labels = seq.fetch()
                    b = features.shape[0]
                    (padded,), _ = self._pad_rows(features)
                    emb = self._embed_step(self.state, self._put_rows(padded))
                    embs.append(np.asarray(emb)[:b])
                    labs.append(labels)
            except DataOutOfRange:
                pass
            finally:
                seq.stop()
            embeddings = np.concatenate(embs, 0) if embs else np.zeros((0, 1))
            labels_out = np.concatenate(labs, 0) if labs else np.zeros((0,), np.int32)

        max_iter = int(cfg.get("valid_max_iterations", 100))
        loss_override = (
            "e2e_valid_loss" if self.loss_type == "angular_triplet_loss" else None
        )
        eff_loss = loss_override or self.loss_type
        structural = eff_loss in STRUCTURAL_LOSSES
        if batch_type == "softmax" and loss_override == "e2e_valid_loss":
            # e2e_valid_loss reshapes by num_valid_speakers x
            # num_valid_segments — sequential batches cannot satisfy that
            # contract; the reference's angular-triplet configs validate
            # with batch_type="end2end".
            raise ValueError(
                "angular_triplet_loss validates with batch_type='end2end' "
                "(its valid loss is the GE2E loss over speaker-major "
                "batches; reference trainer.py:272-275)"
            )
        if batch_type == "softmax":
            loader = KaldiDataSeqQueue(
                data_dir, spklist, num_parallel=nw,
                batch_size=int(cfg.get("num_speakers_per_batch", 64))
                * int(cfg.get("num_segments_per_speaker", 1)),
                min_len=int(cfg.get("min_segment_len", 200)),
                max_len=int(cfg.get("max_segment_len", 400)),
                shuffle=True,
                num_buckets=int(cfg.get("num_buckets", 8)),
            ).start()
        elif batch_type == "end2end":
            rows = int(cfg["num_valid_speakers_per_batch"]) * int(
                cfg["num_valid_segments_per_speaker"]
            )
            n_dev = self.mesh.shape[DATA_AXIS]
            if rows % n_dev != 0:
                # The GE2E/triplet valid losses are batch-structural: padded
                # duplicate rows would create fake same-speaker pairs. Fail
                # loudly instead of silently biasing the loss.
                raise ValueError(
                    "end2end validation batch (%d rows) must divide the %d-"
                    "device data axis; adjust num_valid_speakers_per_batch/"
                    "num_valid_segments_per_speaker" % (rows, n_dev)
                )
            loader = KaldiDataRandomQueue(
                data_dir, spklist, num_parallel=nw,
                num_speakers=int(cfg["num_valid_speakers_per_batch"]),
                num_segments=int(cfg["num_valid_segments_per_speaker"]),
                min_len=int(cfg.get("min_segment_len", 200)),
                max_len=int(cfg.get("max_segment_len", 400)),
            ).start()
        else:
            raise ValueError("Unknown batch_type %s" % batch_type)
        # Sample-count-weighted streaming mean: every real utterance counts
        # once, so a partial tail batch does not get outsized weight.
        ndev = self.mesh.shape[DATA_AXIS]
        total, count = 0.0, 0
        try:
            for it in range(max_iter):
                if self._should_stop(it, self._stop_poll_every):
                    break
                features, labels = loader.fetch()
                b = features.shape[0]
                if structural and b % ndev:
                    # Pair/triplet-mining losses cannot weight padded rows
                    # out (fake zero-distance pairs would bias the mean);
                    # trim the tail batch to a device multiple instead.
                    b = (b // ndev) * ndev
                    if b == 0:
                        continue
                    features, labels = features[:b], labels[:b]
                f, l, w = self._shard_batch_weighted(features, labels)
                loss, _ = self._valid_step(self.state, f, l, w)
                total += float(loss) * b
                count += b
        except DataOutOfRange:
            pass
        finally:
            loader.stop()
        mean_loss = total / count if count else float("nan")
        return mean_loss, embeddings, labels_out

    def predict(self, features: np.ndarray) -> np.ndarray:
        """Embed a batch [B, L, D] (or one utterance [L, D])."""
        rank2 = features.ndim == 2
        if rank2:
            features = features[None]
        # The train state scopes the network under "network"; the predict
        # graph is the bare EntireNetwork, so slice that subtree out.
        variables = {
            "params": self.state.params["network"],
            "batch_stats": self.state.batch_stats.get("network", {}),
        }
        out = np.asarray(self._predict_jit(variables, jnp.asarray(features)))
        return out[0] if rank2 else out

    def close(self) -> None:
        pass
