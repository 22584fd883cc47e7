"""Trainer end-to-end tests on the 8-device CPU mesh with synthetic data."""

import json
import os

import jax
import numpy as np
import pytest

from tf_kaldi_speaker_tpu.train import checkpoints
from tf_kaldi_speaker_tpu.train.trainer import Trainer, l2_regularization
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

TINY = dict(
    seed=0,
    network_type="tdnn",
    tdnn_layer_size=32,
    num_nodes_pooling_layer=64,
    num_nodes_last_layer=32,
    pooling_type="statistics_pooling",
    embedding_node="tdnn6_dense",
    loss_func="additive_margin_softmax",
    amsoftmax_m=0.2,
    amsoftmax_lambda_min=0.0,
    amsoftmax_lambda_base=1000,
    amsoftmax_lambda_gamma=0.0001,
    amsoftmax_lambda_power=5,
    learning_rate=0.05,
    optimizer="momentum",
    momentum=0.9,
    use_nesterov=True,
    clip_gradient=True,
    clip_gradient_norm=3.0,
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_epochs=2,
    num_steps_per_epoch=8,
    show_training_progress=4,
    keep_checkpoint_max=5,
    save_checkpoints_steps=8,
    valid_max_iterations=4,
    num_parallel_datasets=2,
    max_queue_size=6,
    num_speakers_per_batch=8,
    num_segments_per_speaker=1,
    min_segment_len=64,
    max_segment_len=96,
    batch_type="softmax",
)


@pytest.fixture(scope="module")
def train_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer")
    d = make_fake_data_dir(
        str(root / "train"), num_speakers=8, utts_per_speaker=6, dim=20,
        min_len=100, max_len=200,
    )
    return root, d


def make_trainer(root, d, name="m1", **overrides):
    params = ParamsPlain(**{**TINY, **overrides})
    nnet = str(root / name / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    return t, params, nnet


def test_train_one_epoch_and_checkpoint(train_env):
    root, d = train_env
    t, params, nnet = make_trainer(root, d)
    t.build("train", 20, params.loss_func, 8)
    t.build("valid", 20, params.loss_func, 8)
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    assert int(t.state.step) == 8
    assert checkpoints.read_pointer(nnet) == 8

    loss, emb, labels = t.valid(d["data"], d["spklist"], output_embeddings=True)
    assert np.isfinite(loss)
    assert emb.shape[0] == labels.shape[0] > 0


def test_training_reduces_loss(train_env):
    root, d = train_env
    # single worker + plain momentum: deterministic batch order (multi-worker
    # queues interleave nondeterministically, like the reference's).
    t, params, nnet = make_trainer(root, d, name="m2", num_steps_per_epoch=30,
                                   save_checkpoints_steps=30, loss_func="softmax",
                                   num_parallel_datasets=1, use_nesterov=False,
                                   clip_gradient=True)
    t.build("train", 20, "softmax", 8)
    t.build("valid", 20, "softmax", 8)
    first = t.valid(d["data"], d["spklist"])[0]
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    after = t.valid(d["data"], d["spklist"])[0]
    assert after < first, (first, after)


def test_resume_from_checkpoint(train_env):
    root, d = train_env
    t, params, nnet = make_trainer(root, d, name="m3")
    t.build("train", 20, params.loss_func, 8)
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    w_before = np.asarray(
        t.state.params["network"]["tdnn"]["tdnn1_conv"]["kernel"]
    )

    t2, _, _ = make_trainer(root, d, name="m3")
    t2.build("train", 20, params.loss_func, 8)
    step = t2.load()
    assert step == 8
    w_after = np.asarray(
        t2.state.params["network"]["tdnn"]["tdnn1_conv"]["kernel"]
    )
    np.testing.assert_array_equal(w_before, w_after)


def test_predict_embedding_node(train_env):
    root, d = train_env
    t, params, nnet = make_trainer(root, d, name="m4")
    t.build("train", 20, params.loss_func, 8)
    t.build("predict", 20)
    x = np.random.RandomState(0).randn(80, 20).astype(np.float32)
    emb = t.predict(x)
    assert emb.shape == (32,)  # tdnn6_dense with num_nodes 32
    batch = t.predict(np.stack([x, x]))
    assert batch.shape == (2, 32)
    np.testing.assert_allclose(batch[0], emb, rtol=2e-3, atol=2e-5)


def test_finetune_partial_restore_and_freeze(train_env):
    root, d = train_env
    t, params, nnet = make_trainer(root, d, name="m5")
    t.build("train", 20, params.loss_func, 8)
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    w1_pre = np.asarray(t.state.params["network"]["tdnn"]["tdnn1_conv"]["kernel"])
    w7_pre = np.asarray(t.state.params["network"]["tdnn"]["tdnn7_dense"]["kernel"])

    t2, params2, _ = make_trainer(root, d, name="m5")
    t2.build("train", 20, params.loss_func, 8,
             noupdate_var_list=["tdnn/tdnn1_conv", "tdnn/tdnn2_conv"])
    t2.get_finetune_model(noload_var_list=["tdnn/tdnn7_dense"])
    # noload var was reinitialized
    w7_post = np.asarray(t2.state.params["network"]["tdnn"]["tdnn7_dense"]["kernel"])
    assert not np.allclose(w7_pre, w7_post)
    # noupdate var stays fixed through training
    np.testing.assert_array_equal(
        w1_pre, np.asarray(t2.state.params["network"]["tdnn"]["tdnn1_conv"]["kernel"])
    )
    t2.train(d["data"], d["spklist"], learning_rate=0.05)
    np.testing.assert_array_equal(
        w1_pre, np.asarray(t2.state.params["network"]["tdnn"]["tdnn1_conv"]["kernel"])
    )
    # unfrozen vars moved
    assert not np.allclose(
        w7_post, np.asarray(t2.state.params["network"]["tdnn"]["tdnn7_dense"]["kernel"])
    )


def test_valid_margin_neutralization(train_env):
    # Valid loss must differ from train loss computation (margin off).
    root, d = train_env
    t, params, nnet = make_trainer(root, d, name="m6", amsoftmax_m=0.5)
    t.build("train", 20, params.loss_func, 8)
    t.build("valid", 20, params.loss_func, 8)
    feats = np.random.RandomState(1).randn(8, 80, 20).astype(np.float32)
    labels = np.arange(8, dtype=np.int32)
    f, l, w = t._shard_batch_weighted(feats, labels)
    valid_loss, _ = t._valid_step(t.state, f, l, w)
    variables = t._variables(t.state)
    train_loss, _ = t.network_model.apply(variables, f, l, 0, False)
    assert float(valid_loss) < float(train_loss)


def test_l2_regularization_paths():
    params = {
        "network": {"tdnn": {"c": {"kernel": np.ones((2, 2)), "bias": np.ones(2)}}},
        "softmax": {"output_kernel": np.ones((2, 4))},
    }
    reg = float(l2_regularization(params, 0.1, 0.01))
    assert reg == pytest.approx(0.5 * 0.1 * 4 + 0.5 * 0.01 * 8)


def test_multichip_sharding_runs(train_env):
    # The jitted step must actually shard over the 8 virtual devices.
    root, d = train_env
    assert jax.device_count() == 8
    t, params, nnet = make_trainer(root, d, name="m7")
    t.build("train", 20, params.loss_func, 8)
    feats = np.random.RandomState(2).randn(16, 64, 20).astype(np.float32)
    labels = np.tile(np.arange(8, dtype=np.int32), 2)
    f, l = t._shard_batch(feats, labels)
    assert len(f.sharding.device_set) == 8
    state, metrics = t._train_step(t.state, f, l, 0.01)
    assert np.isfinite(float(metrics["loss"]))


def test_bf16_compute_dtype_keeps_f32_state(train_env):
    import jax.numpy as jnp

    root, d = train_env
    t, params, nnet = make_trainer(root, d, name="m8", compute_dtype="bfloat16",
                                   num_steps_per_epoch=3, save_checkpoints_steps=3)
    t.build("train", 20, params.loss_func, 8)
    feats = np.random.RandomState(3).randn(8, 64, 20).astype(np.float32)
    labels = np.arange(8, dtype=np.int32)
    f, l = t._shard_batch(feats, labels)
    state, metrics = t._train_step(t.state, f, l, jnp.float32(0.05))
    assert np.isfinite(float(metrics["loss"]))
    # params / BN stats / optimizer state all stay float32
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32


def test_grouped_dispatch_matches_per_step(train_env):
    """steps_per_dispatch>1 (lax.scan K-step program) must match the
    per-step path when fed identical batches: single length bucket so the
    length-draw cadence difference (one draw per group vs per batch)
    cannot change the sampled data; single worker for deterministic order."""
    root, d = train_env
    common = dict(num_steps_per_epoch=6, save_checkpoints_steps=6,
                  num_parallel_datasets=1, min_segment_len=64,
                  max_segment_len=64, use_nesterov=False)
    t1, params, _ = make_trainer(root, d, name="g1", steps_per_dispatch=1,
                                 **common)
    t1.build("train", 20, params.loss_func, 8)
    t1.train(d["data"], d["spklist"], learning_rate=0.05)

    t3, params3, _ = make_trainer(root, d, name="g3", steps_per_dispatch=3,
                                  **common)
    t3.build("train", 20, params3.loss_func, 8)
    t3.train(d["data"], d["spklist"], learning_rate=0.05)

    assert int(t1.state.step) == int(t3.state.step) == 6
    flat1 = jax.tree_util.tree_leaves(t1.state.params)
    flat3 = jax.tree_util.tree_leaves(t3.state.params)
    for a, b in zip(flat1, flat3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    bs1 = jax.tree_util.tree_leaves(t1.state.batch_stats)
    bs3 = jax.tree_util.tree_leaves(t3.state.batch_stats)
    for a, b in zip(bs1, bs3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_grouped_dispatch_device_decode(train_env):
    """Grouped dispatch through the raw-codes (decode-on-device) path."""
    root, d = train_env
    t, params, nnet = make_trainer(
        root, d, name="g4", steps_per_dispatch=4, num_steps_per_epoch=4,
        save_checkpoints_steps=4, device_decode=True)
    t.build("train", 20, params.loss_func, 8)
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    assert int(t.state.step) == 4
    assert checkpoints.read_pointer(nnet) == 4


def test_padded_rows_carry_zero_weight(train_env):
    """CLAUDE.md contract: rows duplicated for device-count alignment must
    never bias the loss. The weighted step (a) matches the unweighted step
    bit-for-bit under all-ones weights and (b) ignores the padded rows'
    LABELS entirely (features still enter BN batch stats, like the valid
    path)."""
    import jax.numpy as jnp

    root, d = train_env
    t, params, _ = make_trainer(root, d, name="padw")
    t.build("train", 20, params.loss_func, 8)
    rng = np.random.RandomState(0)
    feats = rng.randn(8, 64, 20).astype(np.float32)
    labels = rng.randint(0, 8, 8).astype(np.int32)
    f, l = t._shard_batch(feats, labels)
    ones = t._put_rows(np.ones(8, np.float32))

    s_ref, m_ref = t._train_step(t.state, f, l, jnp.float32(0.01))
    # state was donated; rebuild a fresh trainer state for each run
    t2, p2, _ = make_trainer(root, d, name="padw2")
    t2.build("train", 20, p2.loss_func, 8)
    f2, l2 = t2._shard_batch(feats, labels)
    s_w, m_w = t2._train_step_w(t2.state, f2, l2, ones, jnp.float32(0.01))
    np.testing.assert_array_equal(
        np.asarray(m_ref["loss"]), np.asarray(m_w["loss"]))
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_w.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) six real rows + two padded: flipping the padded labels must not
    # change anything (loss, accuracy, updated params).
    w = np.ones(8, np.float32)
    w[6:] = 0.0
    lab_a = labels.copy()
    lab_b = labels.copy()
    lab_b[6:] = (lab_b[6:] + 3) % 8
    outs = []
    for lab in (lab_a, lab_b):
        tx, px, _ = make_trainer(root, d, name="padw3")
        tx.build("train", 20, px.loss_func, 8)
        fx, lx = tx._shard_batch(feats, lab)
        sx, mx = tx._train_step_w(
            tx.state, fx, lx, tx._put_rows(w), jnp.float32(0.01))
        outs.append((jax.device_get(mx), jax.tree.map(np.asarray, sx.params)))
    (ma, pa), (mb, pb) = outs
    assert ma["loss"] == mb["loss"]
    assert ma["accuracy"] == mb["accuracy"]
    for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(x, y)


def test_structural_loss_refuses_padded_batch(train_env):
    """Batch-structural losses cannot weight padded rows out; the trainer
    must refuse instead of silently biasing (losses/head.py contract)."""
    root, d = train_env
    t, params, _ = make_trainer(
        root, d, name="padstruct",
        loss_func="semihard_triplet_loss", margin=0.3,
        num_speakers_per_batch=3, num_segments_per_speaker=2,
    )
    t.build("train", 20, "semihard_triplet_loss", 8)
    with pytest.raises(ValueError, match="cannot weight padded rows"):
        t.train(d["data"], d["spklist"], learning_rate=0.05)


def test_mid_epoch_resume_completes_epoch(train_env):
    """--cont from a mid-epoch checkpoint runs only the REMAINDER of the
    epoch (reference train loop: range(curr_step % num_steps, num_steps)),
    preserving the checkpoint-step == epoch*num_steps invariant that best-
    checkpoint selection relies on."""
    root, d = train_env
    kw = dict(num_steps_per_epoch=6, save_checkpoints_steps=4,
              steps_per_dispatch=2)
    t, params, nnet = make_trainer(root, d, name="m_midresume", **kw)
    t.build("train", 20, params.loss_func, 8)
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    assert int(t.state.step) == 6  # full epoch; crossing checkpoint at 4

    t2, p2, _ = make_trainer(root, d, name="m_midresume", **kw)
    t2.build("train", 20, p2.loss_func, 8)
    assert t2.load(4) == 4  # simulate a crash after the step-4 checkpoint
    t2.train(d["data"], d["spklist"], learning_rate=0.05)
    assert int(t2.state.step) == 6  # remainder only, NOT 4 + 6


def test_embedding_dump_skips_loss_head(train_env):
    """The embeddings dump runs only the network (reference runs just the
    embeddings node there): with angular_triplet's e2e valid loss and a
    sequential batch size that does not match the configured valid-batch
    shape, the dump must still work — and softmax-batch validation of an
    angular-triplet model raises a clear error instead of a reshape crash."""
    root, d = train_env
    t, params, _ = make_trainer(
        root, d, name="m_embdump",
        loss_func="angular_triplet_loss", margin=0.2, triplet_type="hard",
        loss_type="additive_margin_softmax", batch_type="end2end",
        num_speakers_per_batch=10, num_segments_per_speaker=1,
        num_valid_speakers_per_batch=4, num_valid_segments_per_speaker=2,
    )
    t.build("valid", 20, "angular_triplet_loss", 8)
    loss, emb, labels = t.valid(
        d["data"], d["spklist"], batch_type="end2end", output_embeddings=True
    )
    assert np.isfinite(loss)
    assert emb.shape[0] == labels.shape[0] > 0
    with pytest.raises(ValueError, match="end2end"):
        t.valid(d["data"], d["spklist"], batch_type="softmax")


def test_frozen_grads_excluded_from_optimizer(train_env):
    """Frozen-variable gradients are zeroed BEFORE the optimizer chain, so
    clip_by_global_norm's norm and the Adam moments never see them
    (reference computes grads over trainable vars only, trainer.py:401)."""
    import optax

    root, d = train_env
    t, params, _ = make_trainer(
        root, d, name="m_frozengrad", optimizer="adam",
        num_steps_per_epoch=2, save_checkpoints_steps=2,
    )
    t.build("train", 20, params.loss_func, 8,
            noupdate_var_list=["tdnn/tdnn1_conv"])
    t.train(d["data"], d["spklist"], learning_rate=0.01)
    adam = [s for s in jax.tree_util.tree_leaves(
        t.state.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)][0]
    mu1 = np.asarray(adam.mu["network"]["tdnn"]["tdnn1_conv"]["kernel"])
    mu7 = np.asarray(adam.mu["network"]["tdnn"]["tdnn7_dense"]["kernel"])
    assert np.all(mu1 == 0.0)  # frozen: no moment accumulation
    assert np.any(mu7 != 0.0)  # trainable: moments move


def test_aux_losses_honor_sample_weight(train_env):
    """ring/MHE aux terms weight padded rows out like the main loss: a
    padded batch (weight 0 rows) must produce the same loss and updates as
    the unpadded batch."""
    import jax.numpy as jnp

    root, d = train_env
    kw = dict(aux_loss_func=["ring_loss", "mhe_loss"],
              ring_loss_init=10.0, ring_loss_lambda=0.01, mhe_lambda=0.01)
    rng = np.random.RandomState(0)
    feats = rng.randn(8, 64, 20).astype(np.float32)
    labels = rng.randint(0, 8, 8).astype(np.int32)
    w = np.ones(8, np.float32)
    w[6:] = 0.0
    outs = []
    for flip in (False, True):
        lab = labels.copy()
        if flip:
            lab[6:] = (lab[6:] + 3) % 8
        tx, px, _ = make_trainer(root, d, name="m_auxw", **kw)
        tx.build("train", 20, px.loss_func, 8)
        fx, lx = tx._shard_batch(feats, lab)
        sx, mx = tx._train_step_w(
            tx.state, fx, lx, tx._put_rows(w), jnp.float32(0.01))
        outs.append((float(mx["loss"]),
                     jax.tree.map(np.asarray, sx.params)))
    (la, pa), (lb, pb) = outs
    assert la == lb  # padded-row labels cannot influence ring/MHE
    for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(x, y)


def test_aux_losses_ones_weight_parity(train_env):
    """With all-ones weights the weighted aux terms reduce to the plain
    means — the weighted and unweighted steps must agree exactly."""
    import jax.numpy as jnp

    root, d = train_env
    kw = dict(aux_loss_func=["ring_loss", "mhe_loss"],
              ring_loss_init=10.0, ring_loss_lambda=0.01, mhe_lambda=0.01)
    rng = np.random.RandomState(1)
    feats = rng.randn(8, 64, 20).astype(np.float32)
    labels = rng.randint(0, 8, 8).astype(np.int32)

    t1, p1, _ = make_trainer(root, d, name="m_auxones1", **kw)
    t1.build("train", 20, p1.loss_func, 8)
    f1, l1 = t1._shard_batch(feats, labels)
    s1, m1 = t1._train_step(t1.state, f1, l1, jnp.float32(0.01))

    t2, p2, _ = make_trainer(root, d, name="m_auxones2", **kw)
    t2.build("train", 20, p2.loss_func, 8)
    f2, l2 = t2._shard_batch(feats, labels)
    s2, m2 = t2._train_step_w(
        t2.state, f2, l2, t2._put_rows(np.ones(8, np.float32)),
        jnp.float32(0.01))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
