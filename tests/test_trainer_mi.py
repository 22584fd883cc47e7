"""Multi-input trainer tests: aux streams through train/valid/predict."""

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.train.trainer_mi import TrainerMultiInput
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

CFG = dict(
    seed=0,
    network_type="tdnn",
    tdnn_layer_size=32,
    num_nodes_pooling_layer=64,
    num_nodes_last_layer=32,
    pooling_type="statistics_pooling",
    embedding_node="tdnn6_dense",
    loss_func="softmax",
    learning_rate=0.05,
    optimizer="sgd",
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_steps_per_epoch=6,
    show_training_progress=3,
    save_checkpoints_steps=6,
    keep_checkpoint_max=3,
    valid_max_iterations=2,
    num_parallel_datasets=2,
    max_queue_size=4,
    num_speakers_per_batch=6,
    num_segments_per_speaker=1,
    min_segment_len=64,
    max_segment_len=96,
    aux_feature_dim={"bnf": 20},
    aux_concat_input=["bnf"],
)


def test_multi_input_train_valid_predict(tmp_path):
    d = make_fake_data_dir(
        str(tmp_path / "mi"), num_speakers=6, utts_per_speaker=4, dim=20,
        min_len=100, max_len=160,
    )
    aux_data = {"bnf": d["data"]}  # aux = same features, separate stream
    params = ParamsPlain(**CFG)
    t = TrainerMultiInput(params, str(tmp_path / "m" / "nnet"), dim=20, num_speakers=6)
    t.build("train", 20, "softmax", 6)
    t.build("valid", 20, "softmax", 6)
    t.train(d["data"], d["spklist"], 0.05, aux_data=aux_data)
    assert int(t.state.step) == 6

    loss, emb, labels = t.valid(
        d["data"], d["spklist"], output_embeddings=True, aux_data=aux_data
    )
    assert np.isfinite(loss) and emb.shape[0] == labels.shape[0] > 0

    t.build("predict", 20)
    x = np.random.RandomState(0).randn(80, 20).astype(np.float32)
    aux = {"bnf": np.random.RandomState(1).randn(80, 20).astype(np.float32)}
    e = t.predict(x, aux)
    assert e.shape == (32,) and np.isfinite(e).all()
    # aux stream must actually influence the embedding (it is concatenated).
    aux2 = {"bnf": aux["bnf"] + 1.0}
    e2 = t.predict(x, aux2)
    assert not np.allclose(e, e2)


def test_aux_rank_check(tmp_path):
    d = make_fake_data_dir(str(tmp_path / "mi2"), num_speakers=4, utts_per_speaker=2, dim=20)
    params = ParamsPlain(**CFG)
    t = TrainerMultiInput(params, str(tmp_path / "m2" / "nnet"), dim=20, num_speakers=6)
    t.build("train", 20, "softmax", 6)
    t.build("predict", 20)
    x = np.zeros((50, 20), np.float32)
    with pytest.raises(AssertionError):
        t.predict(x, {"bnf": np.zeros((49, 20), np.float32)})


def test_bnf_chain_end_to_end(tmp_path):
    """The reference's actual MI pipeline: train a base model, extract
    frame-level BNFs (extract_bnf.sh equiv), prepare them without CMVN
    (prepare_bnfeats_for_egs.sh equiv), train the multi-input model on
    main+bnf streams."""
    import json
    import os
    import shutil

    from tf_kaldi_speaker_tpu.cli import extract_bnf, prepare_feats
    from tf_kaldi_speaker_tpu.train.trainer import Trainer

    d = make_fake_data_dir(
        str(tmp_path / "base"), num_speakers=6, utts_per_speaker=4, dim=20,
        min_len=100, max_len=160, with_vad_ali=True, compress=False,
    )
    # 1) base x-vector model (2 quick steps suffice for BNF extraction)
    base_cfg = dict(CFG, num_steps_per_epoch=2, save_checkpoints_steps=2)
    base_cfg.pop("aux_feature_dim"); base_cfg.pop("aux_concat_input")
    nnet = str(tmp_path / "base_m" / "nnet")
    t0 = Trainer(ParamsPlain(**base_cfg), nnet, dim=20, num_speakers=6)
    t0.build("train", 20, "softmax", 6)
    t0.train(d["data"], d["spklist"], 0.05)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(base_cfg, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")

    # 2) frame-level BNFs (tdnn5_relu, 64-d) aligned 1:1 with the input
    bnf_raw = str(tmp_path / "bnf_raw")
    os.makedirs(bnf_raw)
    rc = extract_bnf.main([
        str(tmp_path / "base_m"), "scp:" + d["feats_scp"],
        "ark,scp:%s,%s" % (os.path.join(bnf_raw, "bnf.ark"),
                           os.path.join(bnf_raw, "feats.scp")),
    ])
    assert rc == 0
    shutil.copyfile(d["vad_scp"], os.path.join(bnf_raw, "vad.scp"))
    shutil.copyfile(d["utt2spk"], os.path.join(bnf_raw, "utt2spk"))
    shutil.copyfile(d["spk2utt"], os.path.join(bnf_raw, "spk2utt"))

    # 3) prepare WITHOUT CMVN; main stream gets the standard prep so both
    # streams drop the same (voiced) frames and stay frame-aligned
    rc = prepare_feats.main(["--no-cmvn", bnf_raw, str(tmp_path / "bnf_egs")])
    assert rc == 0
    rc = prepare_feats.main([d["data"], str(tmp_path / "main_egs")])
    assert rc == 0

    # 4) multi-input training on main + bnf
    mi_cfg = dict(CFG, num_steps_per_epoch=3, save_checkpoints_steps=3,
                  aux_feature_dim={"bnf": 64}, aux_concat_input=["bnf"])
    t = TrainerMultiInput(ParamsPlain(**mi_cfg), str(tmp_path / "mi_m" / "nnet"),
                          dim=20, num_speakers=6)
    t.build("train", 20, "softmax", 6)
    t.build("valid", 20, "softmax", 6)
    aux = {"bnf": str(tmp_path / "bnf_egs")}
    t.train(str(tmp_path / "main_egs"), d["spklist"], 0.05, aux_data=aux)
    assert int(t.state.step) == 3
    loss, emb, labels = t.valid(str(tmp_path / "main_egs"), d["spklist"],
                                output_embeddings=True, aux_data=aux)
    assert np.isfinite(loss) and emb.shape[0] > 0
