"""Multi-input trainer: main features + named auxiliary feature streams.

Behavioral spec: reference model/trainer_mi.py (TrainerMultiInput) — the
network receives a dict of aux streams (bottleneck/linguistic features),
cut at the same start frame as the main chunk. ``aux_feature_dim`` (dict
name -> dim) must be configured; streams reach the network as endpoints
``aux_<name>`` plus optional input concatenation (models/tdnn.py).
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (
    DataOutOfRange,
    KaldiMultiDataRandomQueue,
    KaldiMultiDataSeqQueue,
)
from .trainer import Trainer

log = logging.getLogger("tfks.trainer_mi")


class TrainerMultiInput(Trainer):
    def __init__(self, params, model_dir, dim=None, num_speakers=None, mesh=None, **kw):
        assert "aux_feature_dim" in params.dict, (
            "The dim of auxiliary features must be specified as a dict."
        )
        super().__init__(params, model_dir, dim=dim, num_speakers=num_speakers, mesh=mesh, **kw)
        self.aux_dims: Dict[str, int] = dict(params.aux_feature_dim)

    # ------------------------------------------------------------------
    def _sample_batch(self):
        b = max(2, self.mesh.shape["data"])
        feats = jnp.zeros((b, 64, self.dim), jnp.float32)
        labels = jnp.zeros((b,), jnp.int32)
        return feats, labels

    def _init_state(self) -> None:
        feats, labels = self._sample_batch()
        aux = {
            name: jnp.zeros((feats.shape[0], feats.shape[1], d), jnp.float32)
            for name, d in self.aux_dims.items()
        }
        variables = self.network_model.init(
            jax.random.PRNGKey(int(self.params.dict.get("seed", 0))),
            feats, labels, 0, True, aux_features=aux,
        )
        from ..parallel.sharding_rules import shard_params
        from .trainer import TrainState, make_optimizer

        self.tx = make_optimizer(self.params.dict)
        params = shard_params(variables["params"], self.mesh)
        self.state = TrainState(
            params=params,
            batch_stats=jax.device_put(variables.get("batch_stats", {}), self.rep),
            loss_stats=jax.device_put(variables.get("loss_stats", {}), self.rep),
            opt_state=self.tx.init(params),
            step=jax.device_put(jnp.zeros((), jnp.int32), self.rep),
        )

    def _build_train(self) -> None:
        import optax

        from .trainer import _revert_frozen_stats, freeze_mask, l2_regularization, make_optimizer

        cfg = self.params.dict
        wreg = float(cfg.get("weight_l2_regularizer", 0.0))
        out_wreg = float(cfg.get("output_weight_l2_regularizer", wreg))
        tx = self.tx if self.tx is not None else make_optimizer(cfg)
        self.tx = tx
        mask = freeze_mask(self.state.params, self.noupdate_var_list)
        noupdate = self.noupdate_var_list
        bf16 = cfg.get("compute_dtype", "float32") == "bfloat16"

        def step_fn(state, features, aux_features, labels, lr, weights=None):
            # weights [B]: 0 on rows padded for device-count alignment
            # (CLAUDE.md rule: padding must never bias losses).
            def loss_fn(params):
                mutable = ["batch_stats"] + (["loss_stats"] if state.loss_stats else [])
                p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params) if bf16 else params
                feats = features.astype(jnp.bfloat16) if bf16 else features
                aux = (
                    {k: v.astype(jnp.bfloat16) for k, v in aux_features.items()}
                    if bf16 else aux_features
                )
                (loss, endpoints), updates = self.network_model.apply(
                    {"params": p, "batch_stats": state.batch_stats,
                     **({"loss_stats": state.loss_stats} if state.loss_stats else {})},
                    feats, labels, state.step, True, mutable=mutable,
                    aux_features=aux, sample_weight=weights,
                )
                loss = loss.astype(jnp.float32)
                if bf16:
                    updates = jax.tree.map(lambda x: x.astype(jnp.float32), updates)
                reg = l2_regularization(params, wreg, out_wreg)
                penalty = endpoints.get("attention_penalty", 0.0)
                return loss + reg + penalty, (loss, reg, penalty, updates)

            grads, (loss, reg, penalty, updates) = jax.grad(loss_fn, has_aux=True)(state.params)
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
            return new_state, {"loss": loss, "regularization_loss": reg, "penalty_loss": penalty}

        self._train_step = jax.jit(
            step_fn,
            in_shardings=(None, self.bsh, self.bsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )
        # Weighted variant: only compiled when the batch size does not
        # divide the device count (padded rows carry weight 0).
        self._train_step_w = jax.jit(
            lambda state, features, aux, labels, weights, lr: step_fn(
                state, features, aux, labels, lr, weights
            ),
            in_shardings=(None, self.bsh, self.bsh, self.bsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )

        # Grouped K-step dispatch (see Trainer._build_train): batches
        # stacked on a leading axis, one lax.scan program per group; the
        # gsh prefix-sharding applies to every aux-dict leaf.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        self.gsh = NamedSharding(self.mesh, P(None, DATA_AXIS))

        def multi_fn(state, features, aux, labels, lr):
            def body(s, xs):
                f, a, l = xs
                return step_fn(s, f, a, l, lr)

            state2, ms = jax.lax.scan(body, state, (features, aux, labels))
            return state2, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

        self._train_step_multi = jax.jit(
            multi_fn,
            in_shardings=(None, self.gsh, self.gsh, self.gsh, self.rep),
            donate_argnums=(0,),
        )

        def multi_fn_w(state, features, aux, labels, weights, lr):
            def body(s, xs):
                f, a, l = xs
                return step_fn(s, f, a, l, lr, weights)

            state2, ms = jax.lax.scan(body, state, (features, aux, labels))
            return state2, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

        self._train_step_multi_w = jax.jit(
            multi_fn_w,
            in_shardings=(None, self.gsh, self.gsh, self.gsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )

    def _build_valid(self) -> None:
        from .trainer import VALID_MARGIN_NEUTRAL

        loss_override = (
            "e2e_valid_loss" if self.loss_type == "angular_triplet_loss" else None
        )
        margin_override = VALID_MARGIN_NEUTRAL.get(self.loss_type)

        def valid_fn(state, features, aux_features, labels, weights):
            # weights: row validity, 0 on device-padding rows (see
            # trainer.Trainer._build_valid).
            loss, endpoints = self.network_model.apply(
                self._variables(state),
                features, labels, state.step, False,
                margin_override=margin_override, aux_enabled=False,
                loss_func_override=loss_override, aux_features=aux_features,
                sample_weight=weights,
            )
            return loss, endpoints["output"]

        self._valid_step = jax.jit(
            valid_fn,
            in_shardings=(None, self.bsh, self.bsh, self.bsh, self.bsh),
            out_shardings=(self.rep, self.rep),
        )

    def _build_predict(self) -> None:
        from ..models import EntireNetwork

        node = self.params.dict.get("embedding_node", "tdnn6_dense")

        def predict_fn(variables, features, aux_features):
            net = EntireNetwork(
                config=self.params.dict,
                network_type=self.params.dict.get("network_type", "tdnn"),
            )
            _, endpoints = net.apply(variables, features, False, aux_features=aux_features)
            return endpoints[node]

        self._predict_jit = jax.jit(predict_fn)

    # ------------------------------------------------------------------
    def _split_main_aux(self, features: Dict[str, np.ndarray]):
        main = features["features"]
        aux = {k: v for k, v in features.items() if k != "features"}
        return main, aux

    def _shard_multi(self, features, labels, local_rows: bool = False):
        """local_rows: arrays are this host's slice of the global batch
        (multi-host train; valid streams the same global batch everywhere)."""
        main, aux = self._split_main_aux(features)
        names = sorted(aux)
        if local_rows:
            padded, b = (main, *[aux[k] for k in names], labels), main.shape[0]
        else:
            padded, b = self._pad_rows(main, *[aux[k] for k in names], labels)
        weights = np.zeros((padded[0].shape[0],), np.float32)
        weights[:b] = 1.0
        put = self._from_local if local_rows else self._put_rows
        return (
            put(padded[0]),
            {k: put(v) for k, v in zip(names, padded[1:-1])},
            put(padded[-1]),
            put(weights),
        )

    def train(self, data_dir, spklist, learning_rate, aux_data=None) -> None:
        cfg = self.params.dict
        num_steps = int(cfg["num_steps_per_epoch"])
        show = int(cfg.get("show_training_progress", 100))
        save_every = int(cfg.get("save_checkpoints_steps", num_steps))
        # Multi-host: one worker per host, host-disjoint speaker sampling,
        # shared length-draw seed (see Trainer.train).
        nproc, pid = jax.process_count(), jax.process_index()
        glob_speakers = int(cfg.get("num_speakers_per_batch", 64))
        if nproc > 1:
            assert glob_speakers % nproc == 0, (
                "num_speakers_per_batch=%d must divide across %d hosts"
                % (glob_speakers, nproc)
            )
        # Mid-epoch --cont resumes the remainder (see Trainer.train).
        step0 = int(self.state.step)
        steps_left = num_steps - step0 % num_steps
        # K-step dispatch groups (see Trainer.train): K divides steps_left.
        K = max(1, min(int(cfg.get("steps_per_dispatch", 8)), steps_left))
        while steps_left % K:
            K -= 1
        loader = KaldiMultiDataRandomQueue(
            data_dir, aux_data, spklist,
            num_parallel=(
                1 if nproc > 1 else int(cfg.get("num_parallel_datasets", 4))
            ),
            max_qsize=int(cfg.get("max_queue_size", 10)),
            num_speakers=glob_speakers // nproc,
            num_segments=int(cfg.get("num_segments_per_speaker", 1)),
            min_len=int(cfg.get("min_segment_len", 200)),
            max_len=int(cfg.get("max_segment_len", 400)),
            seed=int(cfg.get("seed", 0)) + step0 + pid * 7919,
            length_seed=(
                int(cfg.get("seed", 0)) + step0
                if nproc > 1 else None
            ),
            group=K,
        ).start()
        lr = jnp.float32(learning_rate)
        # Padding policy (CLAUDE.md): padded rows carry weight 0 so they
        # never bias the loss; structural losses are refused padded batches.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..losses.head import STRUCTURAL_LOSSES
        from ..parallel.mesh import DATA_AXIS

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
            weights_dev = jax.device_put(w, self.bsh)
        t0 = time.time()

        # Stage fetch + host->device transfer on the prefetch thread so the
        # copy of group k+1 overlaps group k (same as Trainer.train).
        from ..data.pipeline import device_prefetch

        def staged():
            for _ in range(steps_left // K):
                features, labels = loader.fetch()
                yield self._shard_multi_grouped(features, labels, K,
                                                local_rows=nproc > 1)

        try:
            for local_group, (main, aux, l) in enumerate(
                device_prefetch(staged(), put_fn=lambda x: x, depth=2)
            ):
                if K > 1:
                    if pad_needed:
                        self.state, metrics = self._train_step_multi_w(
                            self.state, main, aux, l, weights_dev, lr)
                    else:
                        self.state, metrics = self._train_step_multi(
                            self.state, main, aux, l, lr)
                elif pad_needed:
                    self.state, metrics = self._train_step_w(
                        self.state, main, aux, l, weights_dev, lr)
                else:
                    self.state, metrics = self._train_step(
                        self.state, main, aux, l, lr)
                # Host-side step (no per-group device fetch; see
                # Trainer._post_group)
                gstep = step0 + (local_group + 1) * K
                local_step = local_group * K + K - 1
                if show and (local_step % show) < K:
                    m = jax.device_get(metrics)
                    log.info("step %d: loss %.4f (%.2f steps/s)", gstep, m["loss"],
                             (local_step + 1) / (time.time() - t0))
                if save_every and gstep // save_every > (gstep - K) // save_every:
                    self.save(gstep)
                if self._should_stop(local_group, self._stop_poll_every):
                    break
        finally:
            loader.stop()
        self.save(int(self.state.step))

    def _shard_multi_grouped(self, features, labels, K, local_rows=False):
        """Grouped variant of _shard_multi: features [K, B, L, D] (+aux),
        labels [K, B]; returns placed (main, aux dict, labels). K==1 inputs
        come ungrouped from the loader and gain a leading axis of 1 is NOT
        needed — the per-step path keeps the old shapes."""
        main, aux = self._split_main_aux(features)
        names = sorted(aux)
        if K == 1:
            m, a, l, _ = self._shard_multi(features, labels,
                                           local_rows=local_rows)
            return m, a, l
        if local_rows:
            padded = (main, *[aux[k] for k in names], labels)
        else:
            padded, _ = self._pad_group_rows(
                main, *[aux[k] for k in names], labels)
        put = (
            self._from_local_grouped if local_rows
            else (lambda a: jax.device_put(a, self.gsh))
        )
        return (
            put(padded[0]),
            {k: put(v) for k, v in zip(names, padded[1:-1])},
            put(padded[-1]),
        )

    def valid(
        self, data_dir, spklist, batch_type="softmax", output_embeddings=False, aux_data=None
    ) -> Tuple[float, Optional[np.ndarray], Optional[np.ndarray]]:
        cfg = self.params.dict
        embeddings, labels_out = None, None
        batch_size = int(cfg.get("num_speakers_per_batch", 64)) * int(
            cfg.get("num_segments_per_speaker", 1)
        )
        if output_embeddings:
            seq = KaldiMultiDataSeqQueue(
                data_dir, aux_data, spklist, num_parallel=2, batch_size=batch_size,
                min_len=int(cfg.get("min_segment_len", 200)),
                max_len=int(cfg.get("max_segment_len", 400)), shuffle=False,
            ).start()
            embs, labs = [], []
            try:
                tick = 0
                while True:
                    # Preemption mid-valid: same boundary polling as
                    # Trainer.valid (symmetric tick across hosts).
                    if self._should_stop(tick, self._stop_poll_every):
                        break
                    tick += 1
                    features, labels = seq.fetch()
                    b = labels.shape[0]
                    main, aux, l, w = self._shard_multi(features, labels)
                    _, emb = self._valid_step(self.state, main, aux, l, w)
                    embs.append(np.asarray(emb)[:b])
                    labs.append(labels)
            except DataOutOfRange:
                pass
            finally:
                seq.stop()
            embeddings = np.concatenate(embs, 0) if embs else np.zeros((0, 1))
            labels_out = np.concatenate(labs, 0) if labs else np.zeros((0,), np.int32)

        max_iter = int(cfg.get("valid_max_iterations", 100))
        if batch_type == "softmax":
            loader = KaldiMultiDataSeqQueue(
                data_dir, aux_data, spklist, num_parallel=2, batch_size=batch_size,
                min_len=int(cfg.get("min_segment_len", 200)),
                max_len=int(cfg.get("max_segment_len", 400)), shuffle=True,
            ).start()
        else:
            rows = int(cfg["num_valid_speakers_per_batch"]) * int(
                cfg["num_valid_segments_per_speaker"]
            )
            n_dev = self.mesh.shape["data"]
            if rows % n_dev != 0:
                raise ValueError(
                    "end2end validation batch (%d rows) must divide the %d-"
                    "device data axis (batch-structural loss; see "
                    "Trainer.valid)" % (rows, n_dev)
                )
            loader = KaldiMultiDataRandomQueue(
                data_dir, aux_data, spklist, num_parallel=2,
                num_speakers=int(cfg["num_valid_speakers_per_batch"]),
                num_segments=int(cfg["num_valid_segments_per_speaker"]),
                min_len=int(cfg.get("min_segment_len", 200)),
                max_len=int(cfg.get("max_segment_len", 400)),
            ).start()
        total, count = 0.0, 0
        try:
            for it in range(max_iter):
                if self._should_stop(it, self._stop_poll_every):
                    break
                features, labels = loader.fetch()
                b = labels.shape[0]
                main, aux, l, w = self._shard_multi(features, labels)
                loss, _ = self._valid_step(self.state, main, aux, l, w)
                total += float(loss) * b
                count += b
        except DataOutOfRange:
            pass
        finally:
            loader.stop()
        return (total / count if count else float("nan")), embeddings, labels_out

    def predict(self, features, aux_features=None):
        """features [B, L, D] or [L, D]; aux_features dict matching ranks.

        Rank checking mirrors reference trainer_mi.py:590-619.
        """
        rank2 = features.ndim == 2
        if rank2:
            features = features[None]
            aux_features = {k: v[None] for k, v in (aux_features or {}).items()}
        for name, v in (aux_features or {}).items():
            assert v.ndim == 3 and v.shape[1] == features.shape[1], name
        variables = {
            "params": self.state.params["network"],
            "batch_stats": self.state.batch_stats.get("network", {}),
        }
        out = np.asarray(
            self._predict_jit(variables, jnp.asarray(features),
                              {k: jnp.asarray(v) for k, v in (aux_features or {}).items()})
        )
        return out[0] if rank2 else out
