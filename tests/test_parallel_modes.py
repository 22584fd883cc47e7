"""Parallel/loss-mode e2e: model-parallel softmax training; angular-triplet
training with GE2E validation (batch_type=end2end)."""

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir
from test_trainer import TINY


def test_model_parallel_training(tmp_path):
    d = make_fake_data_dir(str(tmp_path / "mp"), num_speakers=8, utts_per_speaker=4,
                           dim=20, min_len=100, max_len=160)
    cfg = dict(TINY, model_parallel=2, num_steps_per_epoch=4, save_checkpoints_steps=4)
    params = ParamsPlain(**cfg)
    t = Trainer(params, str(tmp_path / "m" / "nnet"), dim=20, num_speakers=8)
    assert MODEL_AXIS in t.mesh.axis_names
    t.build("train", 20, cfg["loss_func"], 8)
    kernel = t.state.params["softmax"]["output_kernel"]
    assert len(kernel.sharding.device_set) == 8  # sharded over dp x mp
    t.train(d["data"], d["spklist"], 0.05)
    assert int(t.state.step) == 4
    # checkpoint round-trips the sharded kernel
    t2 = Trainer(params, str(tmp_path / "m" / "nnet"), dim=20, num_speakers=8)
    t2.build("train", 20, cfg["loss_func"], 8)
    assert t2.load() == 4
    np.testing.assert_allclose(
        np.asarray(t.state.params["softmax"]["output_kernel"]),
        np.asarray(t2.state.params["softmax"]["output_kernel"]),
    )


def test_model_parallel_loss_matches_replicated(tmp_path):
    """The sharded-softmax step must compute the SAME numbers as mp=1."""
    import jax.numpy as jnp

    d = make_fake_data_dir(str(tmp_path / "eq"), num_speakers=8, utts_per_speaker=4,
                           dim=20, min_len=100, max_len=160)
    feats = np.random.RandomState(0).randn(8, 64, 20).astype(np.float32)
    labels = np.arange(8, dtype=np.int32)

    losses = {}
    for mp in (1, 2):
        cfg = dict(TINY, model_parallel=mp)
        t = Trainer(ParamsPlain(**cfg), str(tmp_path / ("m%d" % mp) / "nnet"),
                    dim=20, num_speakers=8)
        t.build("train", 20, cfg["loss_func"], 8)
        f, l = t._shard_batch(feats, labels)
        state, metrics = t._train_step(t.state, f, l, jnp.float32(0.01))
        losses[mp] = float(metrics["loss"])
    assert losses[1] == pytest.approx(losses[2], rel=1e-5)


def test_valid_loss_unbiased_by_device_padding(tmp_path):
    """A ragged batch (b % n_devices != 0) must give the same valid loss on a
    1-device mesh (no padding) and the 8-device mesh (padded rows masked) —
    reference semantics: the streamed mean runs over real samples only
    (trainer.py:592-706)."""
    import jax
    import jax.numpy as jnp

    feats = np.random.RandomState(0).randn(13, 64, 20).astype(np.float32)
    labels = (np.arange(13) % 8).astype(np.int32)

    losses = {}
    for n_dev, name in ((1, "one"), (8, "eight")):
        cfg = dict(TINY)
        mesh = make_mesh(jax.devices()[:n_dev])
        t = Trainer(ParamsPlain(**cfg), str(tmp_path / name / "nnet"),
                    dim=20, num_speakers=8, mesh=mesh)
        t.build("train", 20, cfg["loss_func"], 8)
        t.build("valid", 20, cfg["loss_func"], 8)
        f, l, w = t._shard_batch_weighted(feats, labels)
        if n_dev == 8:
            assert f.shape[0] == 16 and float(np.sum(np.asarray(w))) == 13
        loss, _ = t._valid_step(t.state, f, l, w)
        losses[n_dev] = float(loss)
    assert losses[1] == pytest.approx(losses[8], rel=1e-6)


def test_angular_triplet_training_with_e2e_valid(tmp_path):
    d = make_fake_data_dir(str(tmp_path / "tri"), num_speakers=8, utts_per_speaker=6,
                           dim=20, min_len=100, max_len=160)
    cfg = dict(
        TINY,
        loss_func="angular_triplet_loss",
        margin=0.2,
        triplet_type="hard",
        loss_type="additive_margin_softmax",
        batch_type="end2end",
        num_speakers_per_batch=4,
        num_segments_per_speaker=2,
        num_valid_speakers_per_batch=4,
        num_valid_segments_per_speaker=2,
        num_steps_per_epoch=4,
        save_checkpoints_steps=4,
        feature_norm=True,
        feature_scaling_factor=1.0,
    )
    params = ParamsPlain(**cfg)
    t = Trainer(params, str(tmp_path / "m2" / "nnet"), dim=20, num_speakers=8)
    t.build("train", 20, "angular_triplet_loss", 8)
    t.build("valid", 20, "angular_triplet_loss", 8)
    t.train(d["data"], d["spklist"], 0.01)
    assert int(t.state.step) == 4
    # validation switches to the GE2E-style e2e loss (trainer.py parity)
    loss, emb, labels = t.valid(d["data"], d["spklist"],
                                batch_type="end2end", output_embeddings=True)
    assert np.isfinite(loss)
    assert emb is not None and emb.shape[0] > 0


def test_semihard_triplet_training(tmp_path):
    d = make_fake_data_dir(str(tmp_path / "sh"), num_speakers=6, utts_per_speaker=6,
                           dim=20, min_len=100, max_len=160)
    cfg = dict(
        TINY,
        loss_func="semihard_triplet_loss",
        margin=0.5,
        triplet_loss_squared=False,
        num_speakers_per_batch=4,
        num_segments_per_speaker=2,
        num_steps_per_epoch=3,
        save_checkpoints_steps=3,
    )
    params = ParamsPlain(**cfg)
    t = Trainer(params, str(tmp_path / "m3" / "nnet"), dim=20, num_speakers=6)
    t.build("train", 20, "semihard_triplet_loss", 6)
    t.train(d["data"], d["spklist"], 0.01)
    assert int(t.state.step) == 3
