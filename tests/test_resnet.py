"""ResNet34 (r-vector) model family: build, masked-padding exactness,
training, and extraction through the standard machinery (network_type
dispatch) — the same contract test_ecapa.py enforces for ECAPA."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from tf_kaldi_speaker_tpu.models import EntireNetwork
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

RESNET_TINY = dict(
    seed=0,
    network_type="resnet34",
    resnet_base_channels=8,
    resnet_layers=[1, 1, 1, 1],
    resnet_embedding_dim=24,
    pooling_type="statistics_pooling",
    embedding_node="resnet_embedding",
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


def test_resnet_forward_shapes_and_endpoints():
    net = EntireNetwork(config=dict(RESNET_TINY), network_type="resnet34")
    feats = jnp.zeros((2, 60, 20), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), feats, False)
    out, ep = net.apply(variables, feats, False)
    assert out.shape == (2, 24)
    for node in ("resnet_stem", "resnet_stage1", "resnet_stage4",
                 "resnet_frames", "pooling", "resnet_embedding_dense",
                 "resnet_embedding"):
        assert node in ep, node
    # time and frequency each downsampled 8x (ceil divisions)
    assert ep["resnet_stage4"].shape[1] == 8  # ceil(ceil(ceil(60/2)/2)/2)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_masked_padding_exactness():
    """Padded+masked eval forward == unpadded forward bit-exactly: explicit
    (1,1) conv padding (stride-parity safe) + in-block re-zeroing + masked
    pooling — the invariant the bucketed extractor relies on."""
    net = EntireNetwork(config=dict(RESNET_TINY), network_type="resnet34")
    rng = np.random.RandomState(0)
    T, D = 53, 20
    x = rng.randn(2, T, D).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    out_plain, _ = net.apply(variables, jnp.asarray(x), False)
    for pad in (1, 7, 19, 24):
        xp = np.zeros((2, T + pad, D), np.float32)
        xp[:, :T] = x
        mask = np.zeros((2, T + pad), np.float32)
        mask[:, :T] = 1.0
        out_masked, _ = net.apply(
            variables, jnp.asarray(xp), False, mask=jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(out_masked), np.asarray(out_plain), rtol=1e-5,
            atol=1e-6)


def test_resnet_attention_pooling_dispatch():
    """The shared pooling registry works on the flattened resnet frames."""
    cfg = dict(
        RESNET_TINY,
        pooling_type="self_attention",
        att_key_input="resnet_frames",
        att_key_num_nodes=[16],
        att_key_network_type=0,
        att_value_input="resnet_frames",
        att_value_num_nodes=[],
        att_value_network_type=0,
        att_num_heads=2,
        att_use_scale=True,
        att_apply_nonlinear=False,
        att_split_key=True,
        att_penalty_term=0.0,
    )
    net = EntireNetwork(config=cfg, network_type="resnet34")
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 60, 20), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), feats, False)
    out, ep = net.apply(variables, feats, False)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_trains_and_extracts(tmp_path):
    d = make_fake_data_dir(str(tmp_path / "d"), num_speakers=4,
                           utts_per_speaker=3, dim=20, min_len=90,
                           max_len=130)
    params = ParamsPlain(**RESNET_TINY)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=4)
    t.build("train", 20, RESNET_TINY["loss_func"], 4)
    t.build("valid", 20, RESNET_TINY["loss_func"], 4)
    t.train(d["data"], d["spklist"], 0.01)
    assert int(t.state.step) == 3
    loss, emb, labels = t.valid(d["data"], d["spklist"], output_embeddings=True)
    assert np.isfinite(loss)
    assert emb.shape[1] == 24

    from tf_kaldi_speaker_tpu.extract.extractor import Extractor

    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(RESNET_TINY, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")
    ex = Extractor(str(tmp_path / "m"), min_chunk_size=10, batch_size=4)
    rng = np.random.RandomState(1)
    utts = {"u%d" % i: rng.randn(60 + 11 * i, 20).astype(np.float32)
            for i in range(5)}
    batched = dict(ex.embed_stream(iter(utts.items())))
    for k, f in utts.items():
        single = ex.embed_utterance(f)
        np.testing.assert_allclose(batched[k], single, rtol=2e-3, atol=2e-4)
