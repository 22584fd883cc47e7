"""Restart-based recovery (SURVEY §5): train CLI --cont resumes from the
checkpoint, LR history, and valid-loss bookkeeping files."""

import json
import os

from tf_kaldi_speaker_tpu.cli import train as train_cli
from tf_kaldi_speaker_tpu.train import checkpoints
from tf_kaldi_speaker_tpu.utils import bookkeeping as bk
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir
from test_extract_backend import TINY_CONFIG


def test_train_cli_cont_resumes(tmp_path):
    train_d = make_fake_data_dir(str(tmp_path / "train"), num_speakers=8,
                                 utts_per_speaker=5, dim=20, min_len=100, max_len=200)
    valid_d = make_fake_data_dir(str(tmp_path / "valid"), num_speakers=8,
                                 utts_per_speaker=2, dim=20, min_len=100, max_len=200, seed=1)
    cfg = dict(TINY_CONFIG, num_epochs=1, num_steps_per_epoch=6,
               save_checkpoints_steps=6, valid_max_iterations=2)
    cfg_path = str(tmp_path / "c.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    model_dir = str(tmp_path / "exp")
    args = [train_d["data"], train_d["spklist"], valid_d["data"], valid_d["spklist"], model_dir]

    assert train_cli.main(["--config", cfg_path] + args) == 0
    nnet = os.path.join(model_dir, "nnet")
    assert checkpoints.read_pointer(nnet) == 6
    lr1 = bk.load_lr_file(os.path.join(nnet, "learning_rate"))
    assert list(lr1) == [1]

    # raise the epoch budget in the SNAPSHOT config and continue
    snap = os.path.join(nnet, "config.json")
    with open(snap) as f:
        c = json.load(f)
    c["num_epochs"] = 2
    with open(snap, "w") as f:
        json.dump(c, f)
    assert train_cli.main(["--cont"] + args) == 0
    assert checkpoints.read_pointer(nnet) == 12  # epoch 2 appended
    lr2 = bk.load_lr_file(os.path.join(nnet, "learning_rate"))
    assert sorted(lr2) == [1, 2]
    hist = bk.load_valid_loss(os.path.join(nnet, "valid_loss"))
    assert [h[0] for h in hist] == [1, 2]
