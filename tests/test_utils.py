"""Utils tests: Params config system, bookkeeping files, summary writer."""

import json
import os

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.utils import bookkeeping as bk
from tf_kaldi_speaker_tpu.utils.params import Params, ParamsPlain, remove_params_prefix
from tf_kaldi_speaker_tpu.utils.summary import SummaryWriter, load_scalars


def test_params_load_save_update(tmp_path):
    p1 = tmp_path / "a.json"
    p1.write_text(json.dumps({"learning_rate": 0.01, "loss_func": "softmax"}))
    params = Params(str(p1))
    assert params.learning_rate == 0.01
    assert "loss_func" in params.dict and "missing" not in params.dict
    params.dict["extra"] = [1, 2]
    out = tmp_path / "b.json"
    params.save(str(out))
    reloaded = Params(str(out))
    assert reloaded.extra == [1, 2]
    p2 = tmp_path / "c.json"
    p2.write_text(json.dumps({"learning_rate": 0.5}))
    reloaded.update(str(p2))
    assert reloaded.learning_rate == 0.5 and reloaded.loss_func == "softmax"


def test_remove_params_prefix():
    p = ParamsPlain(spk_loss_func="softmax", phn_loss_func="asoftmax",
                    weight_l2_regularizer=1e-2, spk_amsoftmax_m=0.2)
    spk = remove_params_prefix(p, "spk")
    assert spk.loss_func == "softmax"
    assert spk.amsoftmax_m == 0.2
    assert spk.weight_l2_regularizer == 1e-2  # unprefixed keys kept


def test_lr_and_valid_loss_files(tmp_path):
    lr_path = str(tmp_path / "learning_rate")
    bk.append_lr(lr_path, 1, 0.01)
    bk.append_lr(lr_path, 2, 0.005)
    assert bk.load_lr_file(lr_path) == {1: 0.01, 2: 0.005}
    v_path = str(tmp_path / "valid_loss")
    bk.append_valid_loss(v_path, 1, 2.5, 0.08)
    hist = bk.load_valid_loss(v_path)
    assert hist == [(1, 2.5, 0.08)]


def test_learning_rate_schedule_from_file(tmp_path):
    assert bk.load_learning_rate_schedule(0.01, 10) is None
    path = tmp_path / "lr"
    path.write_text("1 0.1\n2 0.05\n")
    sched = bk.load_learning_rate_schedule(str(path), 10)
    assert sched == {1: 0.1, 2: 0.05}
    with pytest.raises(AssertionError):
        bk.load_learning_rate_schedule("/nonexistent/file", 10)


def test_save_codes_and_config_snapshot_and_backup(tmp_path):
    cfg = tmp_path / "conf.json"
    cfg.write_text(json.dumps({"learning_rate": 0.01}))
    model_dir = str(tmp_path / "exp")
    params = bk.save_codes_and_config(False, model_dir, str(cfg))
    assert params.learning_rate == 0.01
    assert os.path.isfile(os.path.join(model_dir, "nnet", "config.json"))
    # a code snapshot exists and contains the package
    assert os.path.isdir(os.path.join(model_dir, "codes", "tf_kaldi_speaker_tpu", "kio"))
    # re-running without --cont backs up the old run
    cfg.write_text(json.dumps({"learning_rate": 0.02}))
    params2 = bk.save_codes_and_config(False, model_dir, str(cfg))
    assert params2.learning_rate == 0.02
    assert os.path.isdir(os.path.join(model_dir, ".backup", "nnet"))
    # --cont reloads the snapshot config
    params3 = bk.save_codes_and_config(True, model_dir, None)
    assert params3.learning_rate == 0.02


def test_pretrain_copy(tmp_path):
    from tf_kaldi_speaker_tpu.train import checkpoints

    pre = str(tmp_path / "pre")
    os.makedirs(pre)
    with open(os.path.join(pre, "model-42.msgpack"), "wb") as f:
        f.write(b"\x81\xa1a\x01")  # minimal msgpack map
    checkpoints.write_pointer(pre, 42)
    fin = str(tmp_path / "fin")
    bk.get_pretrain_model(pre, fin)
    assert os.path.exists(os.path.join(fin, "model-0.msgpack"))
    assert checkpoints.read_pointer(fin) == 0


def test_summary_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalars(1, {"loss": 2.0, "acc": np.float32(0.5)})
    w.scalars(2, {"loss": 1.5})
    w.close()
    data = load_scalars(os.path.join(str(tmp_path), "events.jsonl"))
    assert data["loss"] == [(1, 2.0), (2, 1.5)]
    assert data["acc"] == [(1, 0.5)]


def test_summary_writer_emits_tensorboard_events(tmp_path):
    import glob

    from tf_kaldi_speaker_tpu.utils.tb_events import read_tfevents

    w = SummaryWriter(str(tmp_path))
    w.scalars(5, {"loss": 2.25, "accuracy": 0.125})
    w.scalars(10, {"loss": 1.0})
    w.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    data = read_tfevents(files[0])  # validates TFRecord CRCs
    assert data["loss"] == [(5, 2.25), (10, 1.0)]
    assert data["accuracy"] == [(5, 0.125)]


def test_tfevents_readable_by_real_tensorflow(tmp_path):
    """Byte compatibility with TensorBoard's actual on-disk format."""
    tf = pytest.importorskip("tensorflow")

    from tf_kaldi_speaker_tpu.utils.tb_events import TBEventWriter

    w = TBEventWriter(str(tmp_path))
    w.scalars(3, {"loss": 0.5})
    w.close()
    got = []
    for e in tf.compat.v1.train.summary_iterator(w.path):
        for v in e.summary.value:
            got.append((v.tag, e.step, v.simple_value))
    assert got == [("loss", 3, 0.5)]
