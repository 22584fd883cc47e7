"""Multitask (speaker+phone) tests: data loader v2, model, trainer e2e."""

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.multitask import (
    KaldiDataRandomQueueV2,
    TrainerMultiTask,
    get_num_phones,
    make_phone_masks,
)
from tf_kaldi_speaker_tpu.multitask.data_v2 import RandomChunkSamplerV2, sample_with_probability
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

NUM_PHONES = 12

# Phone network: shares the first 2 conv layers with the speaker trunk
# (k=5 d=1, k=5 d=1), then its own dilated layers. Contexts:
# phone: 2+2+3+4 = 11 left, 11 right; speaker: 7/7.
MT_CFG = dict(
    seed=0,
    tdnn_layer_size=32,
    num_nodes_pooling_layer=64,
    speaker_dim=32,
    phone_dim=24,
    pooling_type="statistics_pooling",
    embedding_node="zs_mu_dense",
    spk_loss_type="softmax",
    phn_loss_type="softmax",
    spk_loss_weight=1.0,
    phn_loss_weight=0.5,
    num_shared_layers=2,
    phone_kernel_size=[5, 5, 7, 1, 3],
    phone_layer_size=[32, 32, 32, 32, 32],
    phone_dilation_size=[1, 1, 1, 1, 4],
    phone_left_context=11,
    phone_right_context=11,
    speaker_left_context=7,
    speaker_right_context=7,
    num_frames_per_utt=5,
    learning_rate=0.05,
    optimizer="sgd",
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_steps_per_epoch=5,
    show_training_progress=2,
    save_checkpoints_steps=5,
    keep_checkpoint_max=3,
    valid_max_iterations=2,
    num_parallel_datasets=1,
    max_queue_size=4,
    num_speakers_per_batch=4,
    num_segments_per_speaker=1,
    min_segment_len=64,
    max_segment_len=96,
)


@pytest.fixture(scope="module")
def mt_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("mt")
    d = make_fake_data_dir(
        str(root / "train"), num_speakers=5, utts_per_speaker=4, dim=20,
        min_len=120, max_len=200, with_vad_ali=True, num_phones=NUM_PHONES,
    )
    return d


def test_sample_with_probability_prefers_heavy():
    import random

    rd = random.Random(0)
    counts = {"a": 0, "b": 0}
    for _ in range(500):
        sel = sample_with_probability(rd, ["a", "b"], 1, [90, 100])
        counts[sel[0]] += 1
    assert counts["a"] > counts["b"] * 3


def test_make_phone_masks_within_length():
    length = np.array([10, 3, 50])
    idx = make_phone_masks(length, np.zeros(3), 5, np.random.RandomState(0))
    assert idx.shape == (3, 5)
    for i in range(3):
        assert (idx[i] < length[i]).all()
    # row 0 and 2 sampled without replacement
    assert len(set(idx[0].tolist())) == 5


def test_num_phones_from_file(mt_data):
    assert get_num_phones(mt_data["ali_dir"]) == NUM_PHONES


def test_sampler_v2_batch_contents(mt_data):
    s = RandomChunkSamplerV2(
        mt_data["data"], mt_data["ali_dir"], mt_data["spklist"],
        left_context=11, right_context=11, num_speakers=3,
        min_len=64, max_len=96, seed=0,
    )
    feats, vad, ali, length, labels, resample, valid_pos = next(iter(s))
    B, L = vad.shape
    assert feats.shape == (B, L + 22, 20)
    assert ali.shape == (B, L) and ali.max() < NUM_PHONES
    assert (length <= L).all() and (length > 0).all()
    assert labels.shape == (B,)
    s.close()


def test_multitask_train_valid_predict(tmp_path, mt_data):
    params = ParamsPlain(**MT_CFG)
    t = TrainerMultiTask(
        params, str(tmp_path / "mt" / "nnet"), dim=20,
        num_speakers=5, num_phones=NUM_PHONES,
    )
    t.build("train", 20, num_speakers=5, num_phones=NUM_PHONES)
    t.build("valid", 20)
    t.train(mt_data["data"], mt_data["ali_dir"], mt_data["spklist"], 0.05)
    assert int(t.state.step) == 5
    assert t.speaker_egs.sum() > 0 and t.phone_egs.sum() > 0

    spk_loss, phn_loss, emb, labels = t.valid(
        mt_data["data"], mt_data["ali_dir"], mt_data["spklist"], output_embeddings=True
    )
    assert np.isfinite(spk_loss) and np.isfinite(phn_loss)
    assert emb.shape[0] == labels.shape[0] > 0

    t.build("predict", 20)
    x = np.random.RandomState(0).randn(90, 20).astype(np.float32)
    e = t.predict_speaker(x)
    assert e.shape == (32,) and np.isfinite(e).all()
    lp = t.predict_phone(x)
    assert lp.shape == (90, NUM_PHONES)
    # rows are log-posteriors: logsumexp == 0
    np.testing.assert_allclose(
        np.log(np.sum(np.exp(lp), axis=-1)), 0.0, atol=1e-4
    )


def test_all_frames_phone_loss_matches_full_permutation(tmp_path, mt_data):
    """num_frames_per_utt=-1 (all frames, masked) must equal the K-subset
    path when K covers every valid frame exactly once — same frame set,
    same mean (reference common.py:43-55 equivalence)."""
    import jax
    import jax.numpy as jnp

    from tf_kaldi_speaker_tpu.multitask.model import MultitaskModel

    cfg = dict(MT_CFG)
    L, B, D = 24, 3, 20
    lc, rc = cfg["phone_left_context"], cfg["phone_right_context"]
    model = MultitaskModel(config=cfg, num_speakers=5, num_phones=NUM_PHONES)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, L + lc + rc, D).astype(np.float32))
    spk = jnp.asarray(rng.randint(0, 5, B).astype(np.int32))
    phn = jnp.asarray(rng.randint(0, NUM_PHONES, (B, L)).astype(np.int32))
    length = jnp.full((B,), L, jnp.int32)  # full-length: mask == everything
    variables = model.init(jax.random.PRNGKey(0), feats, spk, phn, length, None, 0, False)

    _, ep_all = model.apply(variables, feats, spk, phn, length, None, 0, False)
    perm = np.stack([rng.permutation(L) for _ in range(B)]).astype(np.int32)
    _, ep_k = model.apply(variables, feats, spk, phn, length, jnp.asarray(perm), 0, False)
    np.testing.assert_allclose(
        float(ep_all["phn_loss"]), float(ep_k["phn_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(ep_all["spk_loss"]), float(ep_k["spk_loss"]), rtol=1e-6
    )

    # short utterance: padding frames must NOT enter the all-frames loss
    short = jnp.asarray(np.array([L, L // 2, L], np.int32))
    _, ep_short = model.apply(variables, feats, spk, phn, short, None, 0, False)
    assert float(ep_short["phn_loss"]) != float(ep_all["phn_loss"])
    w = np.asarray(ep_short["phn_weight_subset"]).reshape(B, L)
    assert w[1, L // 2:].sum() == 0 and w[1, : L // 2].sum() == L // 2


def test_shared_layers_actually_shared(tmp_path, mt_data):
    params = ParamsPlain(**MT_CFG)
    t = TrainerMultiTask(
        params, str(tmp_path / "mt2" / "nnet"), dim=20,
        num_speakers=5, num_phones=NUM_PHONES,
    )
    t.build("train", 20, num_speakers=5, num_phones=NUM_PHONES)
    p = t.state.params
    # Shared layers live once under conv1/conv2; phone branch has no
    # phn_conv1/phn_conv2.
    assert "conv1" in p and "conv2" in p
    assert "phn_conv3" in p and "phn_conv1" not in p
    # phone-only dilated layer exists
    assert "phn_conv5" in p
