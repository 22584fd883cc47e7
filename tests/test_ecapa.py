"""ECAPA-TDNN model family: build, masked-padding exactness, training,
and extraction through the standard machinery (network_type dispatch)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_kaldi_speaker_tpu.models import EntireNetwork
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

ECAPA_TINY = dict(
    seed=0,
    network_type="ecapa_tdnn",
    ecapa_channels=32,
    ecapa_mfa_channels=48,
    ecapa_res2net_scale=4,
    ecapa_se_bottleneck=8,
    ecapa_att_bottleneck=8,
    ecapa_embedding_dim=24,
    embedding_node="ecapa_embedding",
    loss_func="additive_margin_softmax",
    amsoftmax_m=0.2,
    amsoftmax_lambda_min=0,
    amsoftmax_lambda_base=1000,
    amsoftmax_lambda_gamma=0.0001,
    amsoftmax_lambda_power=5,
    optimizer="sgd",
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_steps_per_epoch=3,
    save_checkpoints_steps=3,
    show_training_progress=1,
    valid_max_iterations=2,
    num_parallel_datasets=1,
    max_queue_size=4,
    num_speakers_per_batch=4,
    num_segments_per_speaker=1,
    min_segment_len=50,
    max_segment_len=80,
    batch_type="softmax",
)


def test_ecapa_forward_shapes_and_endpoints():
    net = EntireNetwork(config=dict(ECAPA_TINY), network_type="ecapa_tdnn")
    feats = jnp.zeros((2, 60, 20), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), feats, False)
    out, ep = net.apply(variables, feats, False)
    assert out.shape == (2, 24)
    for node in ("ecapa_conv1", "ecapa_block1", "ecapa_block3", "ecapa_mfa",
                 "ecapa_pooling", "ecapa_embedding_dense", "ecapa_embedding"):
        assert node in ep, node
    assert np.isfinite(np.asarray(out)).all()


def test_ecapa_masked_padding_exactness():
    """Padded+masked eval forward == unpadded forward (the invariant the
    bucketed extractor relies on; SAME convs + zero padding + masked
    SE/attention make it exact)."""
    net = EntireNetwork(config=dict(ECAPA_TINY), network_type="ecapa_tdnn")
    rng = np.random.RandomState(0)
    T, D, pad = 53, 20, 19
    x = rng.randn(1, T, D).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    out_plain, _ = net.apply(variables, jnp.asarray(x), False)

    xp = np.zeros((1, T + pad, D), np.float32)
    xp[:, :T] = x
    mask = np.zeros((1, T + pad), np.float32)
    mask[:, :T] = 1.0
    out_masked, _ = net.apply(variables, jnp.asarray(xp), False, mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_plain), rtol=1e-4, atol=1e-5
    )


def test_ecapa_trains_and_extracts(tmp_path):
    d = make_fake_data_dir(str(tmp_path / "d"), num_speakers=4, utts_per_speaker=3,
                           dim=20, min_len=90, max_len=130)
    params = ParamsPlain(**ECAPA_TINY)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=4)
    t.build("train", 20, ECAPA_TINY["loss_func"], 4)
    t.build("valid", 20, ECAPA_TINY["loss_func"], 4)
    t.train(d["data"], d["spklist"], 0.01)
    assert int(t.state.step) == 3
    loss, emb, labels = t.valid(d["data"], d["spklist"], output_embeddings=True)
    assert np.isfinite(loss)
    assert emb.shape[1] == 24

    # extraction through the standard bucketed extractor
    from tf_kaldi_speaker_tpu.extract.extractor import Extractor

    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(ECAPA_TINY, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")
    ex = Extractor(str(tmp_path / "m"), min_chunk_size=10, batch_size=4)
    rng = np.random.RandomState(1)
    utts = {"u%d" % i: rng.randn(60 + 11 * i, 20).astype(np.float32) for i in range(5)}
    batched = dict(ex.embed_stream(iter(utts.items())))
    for k, f in utts.items():
        single = ex.embed_utterance(f)
        np.testing.assert_allclose(batched[k], single, rtol=2e-3, atol=2e-4)
