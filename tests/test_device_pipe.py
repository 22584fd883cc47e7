"""Decode-on-device extraction pipe: device (dequant + CMVN + VAD +
compaction + forward) must match the host path (decode + apply_cmvn_vad +
float-feature embed) on the same compressed ark."""

import json
import os

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.cli.extract import apply_cmvn_vad
from tf_kaldi_speaker_tpu.extract.device_pipe import DevicePipeExtractor
from tf_kaldi_speaker_tpu.extract.extractor import Extractor
from tf_kaldi_speaker_tpu.kio.ark import (
    ArkScpWriter,
    decode_cm_codes,
    read_codes_scp,
    read_mat_scp,
)
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

TINY = dict(
    seed=0, network_type="tdnn", tdnn_layer_size=16,
    num_nodes_pooling_layer=32, num_nodes_last_layer=16,
    pooling_type="statistics_pooling", embedding_node="tdnn6_dense",
    loss_func="softmax", learning_rate=0.05, optimizer="sgd",
    weight_l2_regularizer=1e-4, batchnorm_momentum=0.99,
    num_epochs=1, num_steps_per_epoch=2, num_speakers_per_batch=4,
    num_segments_per_speaker=1, min_segment_len=30, max_segment_len=60,
    batch_type="softmax", num_parallel_datasets=1, max_queue_size=4,
    save_checkpoints_steps=2, valid_max_iterations=1,
    show_training_progress=0, keep_checkpoint_max=0,
)

D = 20


def _make_model(tmp_path, **cfg_over):
    cfg = dict(TINY, **cfg_over)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(ParamsPlain(**cfg), nnet, dim=D, num_speakers=8)
    t.build("train", D, "softmax", 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("%d\n" % D)
    return str(tmp_path / "m")


def _make_compressed_ark(tmp_path, n_utts=10, seed=0, lens=(60, 200)):
    """Compressed ark whose C0 column is VAD-stable: voiced frames at
    ~+20 log-energy, silence runs at ~-20 (far from the Kaldi cutoff)."""
    rng = np.random.RandomState(seed)
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    w = ArkScpWriter("ark,scp:%s,%s" % (ark, scp), kind="mat")
    for i in range(n_utts):
        T = int(rng.randint(*lens))
        f = rng.randn(T, D).astype(np.float32)
        voiced = rng.rand(T) > 0.3
        f[:, 0] = np.where(voiced, 20.0, -20.0) + 0.1 * rng.randn(T)
        w.write("utt%02d" % i, f, compress=True)
    w.close()
    return scp


@pytest.mark.parametrize("cmvn,vad", [(True, True), (True, False),
                                      (False, True), (False, False)])
def test_device_pipe_matches_host_path(tmp_path, cmvn, vad):
    model = _make_model(tmp_path)
    scp = _make_compressed_ark(tmp_path)

    host = Extractor(model, min_chunk_size=10, batch_size=4)
    dev = DevicePipeExtractor(model, cmvn=cmvn, vad=vad,
                              min_chunk_size=10, batch_size=4)

    def host_stream():
        for key, mat in read_mat_scp(scp):
            feat = apply_cmvn_vad(mat, cmvn, vad)
            if feat.shape[0] >= 10:
                yield key, feat

    want = dict(host.embed_stream(host_stream()))
    got = dict(dev.embed_codes_stream(read_codes_scp(scp)))
    assert set(got) == set(want) and len(got) == 10
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-3, atol=2e-4)


def test_device_pipe_bf16_and_normalize(tmp_path):
    model = _make_model(tmp_path, compute_dtype="bfloat16")
    scp = _make_compressed_ark(tmp_path, seed=3)
    host = Extractor(model, min_chunk_size=10, batch_size=4, normalize=True)
    dev = DevicePipeExtractor(model, cmvn=True, vad=True,
                              min_chunk_size=10, batch_size=4, normalize=True)

    def host_stream():
        for key, mat in read_mat_scp(scp):
            feat = apply_cmvn_vad(mat, True, True)
            if feat.shape[0] >= 10:
                yield key, feat

    want = dict(host.embed_stream(host_stream()))
    got = dict(dev.embed_codes_stream(read_codes_scp(scp)))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.linalg.norm(got[k]), 1.0, rtol=1e-5)
        # bf16 activations: compare direction, looser tolerance
        np.testing.assert_allclose(got[k], want[k], rtol=0.05, atol=0.02)


def test_decode_cm_codes_roundtrip(tmp_path):
    scp = _make_compressed_ark(tmp_path, n_utts=3, seed=5)
    mats = dict(read_mat_scp(scp))
    for key, codes, headers in read_codes_scp(scp):
        np.testing.assert_array_equal(decode_cm_codes(codes, headers), mats[key])


def test_device_pipe_skips_and_long_guard(tmp_path):
    model = _make_model(tmp_path)
    scp = _make_compressed_ark(tmp_path, n_utts=4, seed=7)
    dev = DevicePipeExtractor(model, cmvn=True, vad=True,
                              min_chunk_size=10, batch_size=4, chunk_size=50)
    with pytest.raises(ValueError, match="route long utterances"):
        list(dev.embed_codes_stream(read_codes_scp(scp)))  # lens 60-200 > 50

    # all-silence utterance: skipped via the post-pipe length check
    ark = str(tmp_path / "sil.ark")
    sscp = str(tmp_path / "sil.scp")
    w = ArkScpWriter("ark,scp:%s,%s" % (ark, sscp), kind="mat")
    f = np.random.RandomState(0).randn(80, D).astype(np.float32)
    f[:, 0] = -20.0
    w.write("sil", f, compress=True)
    w.close()
    dev2 = DevicePipeExtractor(model, cmvn=True, vad=True,
                               min_chunk_size=10, batch_size=4)
    assert list(dev2.embed_codes_stream(read_codes_scp(sscp))) == []


def test_cli_device_pipe_end_to_end(tmp_path):
    from tf_kaldi_speaker_tpu.cli.extract import main as extract_main
    from tf_kaldi_speaker_tpu.kio.ark import read_vec_flt_scp

    model = _make_model(tmp_path)
    # include one LONG utterance to exercise the host fallback
    scp = _make_compressed_ark(tmp_path, n_utts=6, seed=9, lens=(60, 140))
    with open(scp) as f:
        entries = f.read()
    rng = np.random.RandomState(11)
    long_ark = str(tmp_path / "long.ark")
    long_scp = str(tmp_path / "long.scp")
    w = ArkScpWriter("ark,scp:%s,%s" % (long_ark, long_scp), kind="mat")
    f_long = rng.randn(500, D).astype(np.float32)
    f_long[:, 0] = 20.0 + 0.1 * rng.randn(500)
    w.write("uttlong", f_long, compress=True)
    w.close()
    with open(scp, "w") as f:
        f.write(entries + open(long_scp).read())

    out_dev = str(tmp_path / "dev.scp")
    out_host = str(tmp_path / "host.scp")
    flags = ["--cmvn", "--vad", "--min-chunk-size", "10",
             "--chunk-size", "200", "--batch-size", "4"]
    assert extract_main(["--device-pipe"] + flags + [model, "scp:" + scp,
                        "ark,scp:%s,%s" % (str(tmp_path / "dev.ark"), out_dev)]) == 0
    assert extract_main(flags + [model, "scp:" + scp,
                        "ark,scp:%s,%s" % (str(tmp_path / "host.ark"), out_host)]) == 0
    dev = dict(read_vec_flt_scp(out_dev))
    host = dict(read_vec_flt_scp(out_host))
    assert set(dev) == set(host) and "uttlong" in dev
    for k in host:
        np.testing.assert_allclose(dev[k], host[k], rtol=2e-3, atol=2e-4)
