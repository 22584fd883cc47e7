"""Multitask trainer: joint speaker+phone training loop.

Behavioral spec: reference model/multitask_v1/base_v1.py (BaseMT) — train
with weighted spk+phn losses, valid with both losses + accuracies
(base_v1.py:245-378), dual predict heads (:871-948), per-class
training-example statistics (:950-995). Reuses the base Trainer's
checkpoint/sharding machinery.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import DATA_AXIS
from ..train.trainer import (
    TrainState,
    Trainer,
    VALID_MARGIN_NEUTRAL,
    _revert_frozen_stats,
    freeze_mask,
    l2_regularization,
    make_optimizer,
)
from .common import make_phone_masks
from .data_v2 import KaldiDataRandomQueueV2, KaldiDataSeqQueueV2
from .model import MultitaskModel

log = logging.getLogger("tfks.trainer_mt")


def _phn_accuracy(endpoints):
    """Frame accuracy over the phone subset, honoring the validity weight
    (all-frames mode weights out padding frames; K-subset mode has none)."""
    correct = (
        jnp.argmax(endpoints["phn_logits"], -1) == endpoints["phn_labels_subset"]
    ).astype(jnp.float32)
    w = endpoints.get("phn_weight_subset")
    if w is None:
        return jnp.mean(correct)
    return jnp.sum(correct * w) / jnp.maximum(jnp.sum(w), 1e-12)


class TrainerMultiTask(Trainer):
    def __init__(self, params, model_dir, dim=None, num_speakers=None,
                 num_phones=None, mesh=None, **kw):
        super().__init__(params, model_dir, dim=dim, num_speakers=num_speakers,
                         mesh=mesh, **kw)
        self.num_phones = num_phones
        self.lc = int(params.dict["phone_left_context"])
        self.rc = int(params.dict["phone_right_context"])
        # -1 = all-frames phone loss, masked by valid_length (reference
        # common.py:43-55); positive = per-utterance random frame subset.
        self.num_frames_per_utt = int(params.dict.get("num_frames_per_utt", 10))
        self.all_phone_frames = self.num_frames_per_utt == -1
        self._mask_rng = np.random.RandomState(int(params.dict.get("seed", 0)))
        # Per-class example counters (base_v1.py:950-995).
        self.speaker_egs = None
        self.phone_egs = None

    # ------------------------------------------------------------------
    def build(self, mode, dim=None, loss_type=None, num_speakers=None,
              num_phones=None, noupdate_var_list=None):
        assert mode in ("train", "valid", "predict")
        if dim is not None:
            self.dim = dim
        if num_speakers is not None:
            self.num_speakers = num_speakers
        if num_phones is not None:
            self.num_phones = num_phones
        self.noupdate_var_list = noupdate_var_list
        self.loss_type = self.params.dict.get("spk_loss_type", "softmax")
        if self.network_model is None:
            self.network_model = MultitaskModel(
                config=self.params.dict,
                num_speakers=self.num_speakers,
                num_phones=self.num_phones,
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

    def _sample_inputs(self):
        b = max(2, self.mesh.shape[DATA_AXIS])
        L = 32
        feats = jnp.zeros((b, L + self.lc + self.rc, self.dim), jnp.float32)
        spk = jnp.zeros((b,), jnp.int32)
        phn = jnp.zeros((b, L), jnp.int32)
        length = jnp.full((b,), L, jnp.int32)
        idx = (
            None if self.all_phone_frames
            else jnp.zeros((b, self.num_frames_per_utt), jnp.int32)
        )
        return feats, spk, phn, length, idx

    def _init_state(self) -> None:
        from ..parallel.sharding_rules import shard_params

        variables = self.network_model.init(
            jax.random.PRNGKey(int(self.params.dict.get("seed", 0))),
            *self._sample_inputs(), 0, True,
        )
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
        cfg = self.params.dict
        wreg = float(cfg.get("weight_l2_regularizer", 0.0))
        out_wreg = float(cfg.get("output_weight_l2_regularizer", wreg))
        tx = self.tx if self.tx is not None else make_optimizer(cfg)
        self.tx = tx
        mask = freeze_mask(self.state.params, self.noupdate_var_list)
        noupdate = self.noupdate_var_list
        bf16 = cfg.get("compute_dtype", "float32") == "bfloat16"

        all_frames = self.all_phone_frames

        def step_fn(state, feats, spk, phn, length, idx, lr, weights=None):
            # weights [B]: 0 on rows padded for device-count alignment
            # (CLAUDE.md rule: padding must never bias losses).
            def loss_fn(params):
                mutable = ["batch_stats"] + (["loss_stats"] if state.loss_stats else [])
                p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params) if bf16 else params
                f = feats.astype(jnp.bfloat16) if bf16 else feats
                (loss, endpoints), updates = self.network_model.apply(
                    {"params": p, "batch_stats": state.batch_stats,
                     **({"loss_stats": state.loss_stats} if state.loss_stats else {})},
                    f, spk, phn, length, None if all_frames else idx,
                    state.step, True, mutable=mutable, sample_weight=weights,
                )
                loss = loss.astype(jnp.float32)
                if bf16:
                    updates = jax.tree.map(lambda x: x.astype(jnp.float32), updates)
                reg = l2_regularization(params, wreg, out_wreg)
                total = loss + reg
                spk_logits = endpoints.get("spk_logits")
                phn_logits = endpoints.get("phn_logits")
                if spk_logits is None:
                    spk_acc = jnp.float32(0)
                elif weights is None:
                    spk_acc = jnp.mean(
                        (jnp.argmax(spk_logits, -1) == spk).astype(jnp.float32))
                else:
                    correct = (jnp.argmax(spk_logits, -1) == spk).astype(jnp.float32)
                    spk_acc = jnp.sum(weights * correct) / jnp.maximum(
                        jnp.sum(weights), 1.0)
                phn_acc = (
                    _phn_accuracy(endpoints)
                    if phn_logits is not None else jnp.float32(0)
                )
                return total, (endpoints["spk_loss"], endpoints["phn_loss"], reg,
                               spk_acc, phn_acc, updates)

            grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
            spk_loss, phn_loss, reg, spk_acc, phn_acc, updates = aux
            upd, opt_state = tx.update(grads, state.opt_state, state.params)
            if mask is not None:
                upd = jax.tree.map(lambda u, m: u * m, upd, mask)
            upd = jax.tree.map(lambda u: -lr * u, upd)
            params = optax.apply_updates(state.params, upd)
            new_bs = _revert_frozen_stats(
                updates.get("batch_stats", state.batch_stats), state.batch_stats, noupdate
            )
            new_state = state.replace(
                params=params, batch_stats=new_bs,
                loss_stats=updates.get("loss_stats", state.loss_stats),
                opt_state=opt_state, step=state.step + 1,
            )
            metrics = {
                "spk_loss": spk_loss, "phn_loss": phn_loss,
                "regularization_loss": reg,
                "spk_accuracy": spk_acc, "phn_accuracy": phn_acc,
                "loss": spk_loss + phn_loss,
            }
            return new_state, metrics

        self._train_step = jax.jit(
            step_fn,
            in_shardings=(None, self.bsh, self.bsh, self.bsh, self.bsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )
        # Weighted variant: only compiled when the batch size does not
        # divide the device count (padded rows carry weight 0).
        self._train_step_w = jax.jit(
            lambda state, feats, spk, phn, length, idx, weights, lr: step_fn(
                state, feats, spk, phn, length, idx, lr, weights
            ),
            in_shardings=(None, self.bsh, self.bsh, self.bsh, self.bsh,
                          self.bsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )

        # Grouped K-step dispatch (see Trainer._build_train): one lax.scan
        # program per K stacked batches.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        self.gsh = NamedSharding(self.mesh, P(None, DATA_AXIS))

        def multi_fn(state, feats, spk, ali, length, idx, lr):
            def body(st, xs):
                return step_fn(st, *xs, lr)

            state2, ms = jax.lax.scan(body, state, (feats, spk, ali, length, idx))
            return state2, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

        self._train_step_multi = jax.jit(
            multi_fn,
            in_shardings=(None, self.gsh, self.gsh, self.gsh, self.gsh,
                          self.gsh, self.rep),
            donate_argnums=(0,),
        )

        def multi_fn_w(state, feats, spk, ali, length, idx, weights, lr):
            def body(st, xs):
                return step_fn(st, *xs, lr, weights)

            state2, ms = jax.lax.scan(body, state, (feats, spk, ali, length, idx))
            return state2, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

        self._train_step_multi_w = jax.jit(
            multi_fn_w,
            in_shardings=(None, self.gsh, self.gsh, self.gsh, self.gsh,
                          self.gsh, self.bsh, self.rep),
            donate_argnums=(0,),
        )

    def _build_valid(self) -> None:
        margin_override = VALID_MARGIN_NEUTRAL.get(
            self.params.dict.get("spk_loss_type", "softmax")
        )

        all_frames = self.all_phone_frames

        def valid_fn(state, feats, spk, phn, length, idx, weights):
            loss, endpoints = self.network_model.apply(
                self._variables(state),
                feats, spk, phn, length, None if all_frames else idx,
                state.step, False,
                spk_margin_override=margin_override, aux_enabled=False,
                sample_weight=weights,
            )
            wsum = jnp.maximum(jnp.sum(weights), 1e-12)
            spk_acc = (
                jnp.sum(
                    (jnp.argmax(endpoints["spk_logits"], -1) == spk).astype(jnp.float32)
                    * weights
                ) / wsum
            ) if "spk_logits" in endpoints else jnp.float32(0)
            phn_acc = (
                _phn_accuracy(endpoints)
                if "phn_logits" in endpoints else jnp.float32(0)
            )
            return (endpoints["spk_loss"], endpoints["phn_loss"],
                    spk_acc, phn_acc, endpoints["mu_zs"])

        # Outputs replicated so any host can read the full embedding dump
        # (a batch-sharded output is not host-addressable off-process).
        self._valid_step = jax.jit(
            valid_fn,
            in_shardings=(None,) + (self.bsh,) * 6,
            out_shardings=(self.rep,) * 5,
        )

    def _build_predict(self) -> None:
        def spk_fn(variables, feats, length):
            return self.network_model.apply(
                variables, feats, length, method=MultitaskModel.predict_speaker
            )

        def phn_fn(variables, feats):
            return self.network_model.apply(
                variables, feats, method=MultitaskModel.predict_phone
            )

        self._predict_spk_jit = jax.jit(spk_fn)
        self._predict_phn_jit = jax.jit(phn_fn)

    # ------------------------------------------------------------------
    def _loader_kwargs(self):
        cfg = self.params.dict
        return dict(
            left_context=self.lc, right_context=self.rc,
            min_len=int(cfg.get("min_segment_len", 200)),
            max_len=int(cfg.get("max_segment_len", 400)),
        )

    def _shard_mt(self, feats, vad, ali, length, labels, resample,
                  local_rows: bool = False):
        """Pad + place one multitask batch on the data axis.

        ``local_rows``: the arrays are THIS host's rows of the global batch
        (multi-host train path, disjoint loaders) — assemble with
        _from_local; otherwise every host holds the same global batch
        (valid path) and _put_rows slices its block.
        """
        b = feats.shape[0]
        if not local_rows:
            (feats, ali, length, labels, resample), b = self._pad_rows(
                feats, ali, length, labels, resample
            )
        if self.all_phone_frames:
            # All-frames mode: the model masks by length; idx is an unused
            # placeholder kept so the jitted signatures stay uniform.
            idx = np.zeros((feats.shape[0], 1), np.int32)
        else:
            idx = make_phone_masks(
                length, resample, self.num_frames_per_utt, self._mask_rng
            )
        weights = np.zeros((feats.shape[0],), np.float32)
        weights[:b] = 1.0
        put = self._from_local if local_rows else self._put_rows
        return put(feats), put(labels), put(ali), put(length), put(idx), put(weights)

    def _shard_mt_grouped(self, feats, ali, length, labels, resample,
                          local_rows: bool = False):
        """Grouped variant of _shard_mt: arrays are [K, B, ...]; phone
        masks are drawn per group member (same _mask_rng stream order as K
        per-step batches) and stacked."""
        if not local_rows:
            (feats, ali, length, labels, resample), _ = self._pad_group_rows(
                feats, ali, length, labels, resample
            )
        K = feats.shape[0]
        if self.all_phone_frames:
            idx = np.zeros((K, feats.shape[1], 1), np.int32)
        else:
            idx = np.stack([
                make_phone_masks(length[k], resample[k],
                                 self.num_frames_per_utt, self._mask_rng)
                for k in range(K)
            ])
        put = (
            self._from_local_grouped if local_rows
            else (lambda a: jax.device_put(a, self.gsh))
        )
        return put(feats), put(labels), put(ali), put(length), put(idx)

    def train(self, data_dir: str, ali_dir: str, spklist: str, learning_rate: float) -> None:
        cfg = self.params.dict
        num_steps = int(cfg["num_steps_per_epoch"])
        show = int(cfg.get("show_training_progress", 100))
        save_every = int(cfg.get("save_checkpoints_steps", num_steps))
        # Multi-host: same scheme as Trainer.train — one worker per host
        # (deterministic order), host-disjoint speaker sampling, shared
        # length-draw seed so the k-th batch's shape agrees everywhere.
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
        loader = KaldiDataRandomQueueV2(
            data_dir, ali_dir, spklist,
            num_parallel=(
                1 if nproc > 1 else int(cfg.get("num_parallel_datasets", 2))
            ),
            max_qsize=int(cfg.get("max_queue_size", 10)),
            num_speakers=glob_speakers // nproc,
            num_segments=int(cfg.get("num_segments_per_speaker", 1)),
            seed=int(cfg.get("seed", 0)) + step0 + pid * 7919,
            length_seed=(
                int(cfg.get("seed", 0)) + step0
                if nproc > 1 else None
            ),
            group=K,
            **self._loader_kwargs(),
        ).start()
        summary_steps = int(cfg.get("save_summary_steps", 0))
        writer = None
        if summary_steps and jax.process_index() == 0:
            from ..utils.summary import SummaryWriter

            writer = SummaryWriter(self.model)
        lr = jnp.float32(learning_rate)
        # Padding policy (CLAUDE.md): padded rows carry weight 0 so they
        # never bias the loss; structural spk losses are refused padding.
        from ..losses.head import STRUCTURAL_LOSSES
        from ..parallel.mesh import DATA_AXIS

        ndev_data = self.mesh.shape[DATA_AXIS]
        B_local = (glob_speakers // nproc) * int(
            cfg.get("num_segments_per_speaker", 1))
        pad_needed = nproc == 1 and B_local % ndev_data
        if pad_needed and cfg.get("spk_loss_type", "softmax") in STRUCTURAL_LOSSES:
            raise ValueError(
                "spk loss %s cannot weight padded rows out; choose a batch "
                "size divisible by the %d-way data axis"
                % (cfg.get("spk_loss_type"), ndev_data))
        weights_dev = None
        if pad_needed:
            bp = B_local + (ndev_data - B_local % ndev_data)
            w = np.zeros((bp,), np.float32)
            w[:B_local] = 1.0
            weights_dev = jax.device_put(w, self.bsh)
        t0 = time.time()
        if self.speaker_egs is None:
            self.speaker_egs = np.zeros(self.num_speakers, np.int64)
            self.phone_egs = np.zeros(self.num_phones, np.int64)
        # Stage fetch + egs counting + host->device transfer on the prefetch
        # thread so the copy of group k+1 overlaps group k (Trainer.train
        # scheme; the single thread keeps _mask_rng/egs order deterministic).
        from ..data.pipeline import device_prefetch

        def staged():
            for _ in range(steps_left // K):
                batch = loader.fetch()
                if K == 1:
                    feats, vad, ali, length, labels, resample, _vp = batch
                    np.add.at(self.speaker_egs, labels, 1)
                    np.add.at(self.phone_egs, ali.reshape(-1), 1)
                    f, s, a, ln, idx, _w = self._shard_mt(
                        feats, vad, ali, length, labels, resample,
                        local_rows=nproc > 1,
                    )
                    yield f, s, a, ln, idx
                else:
                    feats, vad, ali, length, labels, resample, _vp = batch
                    np.add.at(self.speaker_egs, labels.reshape(-1), 1)
                    np.add.at(self.phone_egs, ali.reshape(-1), 1)
                    yield self._shard_mt_grouped(
                        feats, ali, length, labels, resample,
                        local_rows=nproc > 1,
                    )

        try:
            for local_group, (f, s, a, ln, idx) in enumerate(
                device_prefetch(staged(), put_fn=lambda x: x, depth=2)
            ):
                if K > 1:
                    if pad_needed:
                        self.state, metrics = self._train_step_multi_w(
                            self.state, f, s, a, ln, idx, weights_dev, lr)
                    else:
                        self.state, metrics = self._train_step_multi(
                            self.state, f, s, a, ln, idx, lr)
                elif pad_needed:
                    self.state, metrics = self._train_step_w(
                        self.state, f, s, a, ln, idx, weights_dev, lr)
                else:
                    self.state, metrics = self._train_step(
                        self.state, f, s, a, ln, idx, lr)
                # Host-side step (no per-group device fetch; see
                # Trainer._post_group)
                gstep = step0 + (local_group + 1) * K
                local_step = local_group * K + K - 1
                if show and (local_step % show) < K:
                    m = jax.device_get(metrics)
                    log.info(
                        "step %d: spk %.4f phn %.4f acc %.3f/%.3f (%.2f steps/s)",
                        gstep, m["spk_loss"], m["phn_loss"],
                        m["spk_accuracy"], m["phn_accuracy"],
                        (local_step + 1) / (time.time() - t0),
                    )
                if writer and summary_steps and (
                    gstep // summary_steps > (gstep - K) // summary_steps
                ):
                    writer.scalars(gstep, jax.device_get(metrics))
                if save_every and gstep // save_every > (gstep - K) // save_every:
                    self.save(gstep)
                if self._should_stop(local_group, self._stop_poll_every):
                    break
        finally:
            loader.stop()
            if writer:
                writer.close()
        self.save(int(self.state.step))
        self._dump_egs_stats()

    def _dump_egs_stats(self):
        """Per-class training-example counts (base_v1.py:950-995).

        Multi-host: each process counts only its own egs; process 0 writes
        its local counts (a 1/nproc sample of the global distribution)."""
        if jax.process_index() != 0:
            return
        root = os.path.dirname(self.model)
        with open(os.path.join(root, "speaker_egs"), "w") as f:
            for i, c in enumerate(self.speaker_egs):
                f.write("%d %d\n" % (i, c))
        with open(os.path.join(root, "phone_egs"), "w") as f:
            for i, c in enumerate(self.phone_egs):
                f.write("%d %d\n" % (i, c))

    def train_tune_lr(self, data_dir: str, ali_dir: str, spklist: str,
                      tune_period: int = 100) -> None:
        """Exponential LR sweep for the multitask model (reference
        train_mt_lr_learning.py); writes ``learning_rate_tuning``."""
        cfg = self.params.dict
        loader = KaldiDataRandomQueueV2(
            data_dir, ali_dir, spklist,
            num_parallel=int(cfg.get("num_parallel_datasets", 2)),
            max_qsize=int(cfg.get("max_queue_size", 10)),
            num_speakers=int(cfg.get("num_speakers_per_batch", 64)),
            num_segments=int(cfg.get("num_segments_per_speaker", 1)),
            seed=int(cfg.get("seed", 0)),
            **self._loader_kwargs(),
        ).start()
        with open(os.path.join(os.path.dirname(self.model), "learning_rate_tuning"), "w") as fp:
            try:
                for k in range(100):
                    lr = 1e-5 * (1.15 ** k)
                    losses = []
                    for _ in range(tune_period):
                        feats, vad, ali, length, labels, resample, _ = loader.fetch()
                        f, s, a, ln, idx, _ = self._shard_mt(feats, vad, ali, length, labels, resample)
                        self.state, metrics = self._train_step(
                            self.state, f, s, a, ln, idx, jnp.float32(lr)
                        )
                        losses.append(float(metrics["loss"]))
                    mean_loss = float(np.mean(losses))
                    fp.write("%d %.8f %f\n" % (k, lr, mean_loss))
                    fp.flush()
                    if not np.isfinite(mean_loss) or mean_loss > 1e4:
                        break
            finally:
                loader.stop()

    def valid(self, data_dir: str, ali_dir: str, spklist: str,
              output_embeddings: bool = False) -> Tuple[float, float, Optional[np.ndarray], Optional[np.ndarray]]:
        cfg = self.params.dict
        batch_size = int(cfg.get("num_speakers_per_batch", 64)) * int(
            cfg.get("num_segments_per_speaker", 1)
        )
        loader = KaldiDataSeqQueueV2(
            data_dir, ali_dir, spklist, num_parallel=1, batch_size=batch_size,
            shuffle=not output_embeddings, **self._loader_kwargs(),
        ).start()
        spk_total, phn_total, count = 0.0, 0.0, 0
        embs, labs = [], []
        max_iter = int(cfg.get("valid_max_iterations", 100))
        it = 0
        from ..data import DataOutOfRange

        try:
            while it < max_iter:
                # Preemption mid-valid: same boundary polling as
                # Trainer.valid (symmetric tick across hosts).
                if self._should_stop(it, self._stop_poll_every):
                    break
                feats, vad, ali, length, labels, resample, valid_pos = loader.fetch()
                b = labels.shape[0]
                f, s, a, ln, idx, w = self._shard_mt(feats, vad, ali, length, labels, resample)
                spk_loss, phn_loss, sa, pa, emb = self._valid_step(self.state, f, s, a, ln, idx, w)
                # sample-count-weighted streaming means (partial tail batches
                # must not get outsized weight)
                spk_total += float(spk_loss) * b
                phn_total += float(phn_loss) * b
                count += b
                if output_embeddings:
                    embs.append(np.asarray(emb)[:b])
                    labs.append(labels)
                it += 1
        except DataOutOfRange:
            pass
        finally:
            loader.stop()
        spk_mean = spk_total / count if count else float("nan")
        phn_mean = phn_total / count if count else float("nan")
        embeddings = np.concatenate(embs, 0) if embs else None
        labels_out = np.concatenate(labs, 0) if labs else None
        return spk_mean, phn_mean, embeddings, labels_out

    # ------------------------------------------------------------------
    def predict_speaker(self, features: np.ndarray, feat_length=None) -> np.ndarray:
        """features [L, D] or [B, L, D] — UNEXPANDED; edges are tiled here."""
        rank2 = features.ndim == 2
        if rank2:
            features = features[None]
        b, L, d = features.shape
        expanded = np.concatenate(
            [np.tile(features[:, :1], (1, self.lc, 1)), features,
             np.tile(features[:, -1:], (1, self.rc, 1))], axis=1
        )
        length = np.full((b,), L, np.int32) if feat_length is None else np.asarray(feat_length, np.int32)
        variables = self._variables(self.state)
        out = np.asarray(
            self._predict_spk_jit(variables, jnp.asarray(expanded), jnp.asarray(length))
        )
        return out[0] if rank2 else out

    def predict_phone(self, features: np.ndarray) -> np.ndarray:
        """Per-frame phone log-posteriors for [L, D] or [B, L, D] inputs."""
        rank2 = features.ndim == 2
        if rank2:
            features = features[None]
        expanded = np.concatenate(
            [np.tile(features[:, :1], (1, self.lc, 1)), features,
             np.tile(features[:, -1:], (1, self.rc, 1))], axis=1
        )
        variables = self._variables(self.state)
        out = np.asarray(self._predict_phn_jit(variables, jnp.asarray(expanded)))
        return out[0] if rank2 else out
