"""Finetune CLI e2e: pretrain → finetune with noload/noupdate lists."""

import json
import os

import numpy as np

from tf_kaldi_speaker_tpu.cli import finetune as finetune_cli
from tf_kaldi_speaker_tpu.cli import train as train_cli
from tf_kaldi_speaker_tpu.train import checkpoints
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir
from test_extract_backend import TINY_CONFIG


def test_finetune_cli_from_pretrain(tmp_path):
    train_d = make_fake_data_dir(str(tmp_path / "train"), num_speakers=8,
                                 utts_per_speaker=5, dim=20, min_len=100, max_len=200)
    valid_d = make_fake_data_dir(str(tmp_path / "valid"), num_speakers=8,
                                 utts_per_speaker=2, dim=20, min_len=100, max_len=200, seed=1)
    base_cfg = dict(TINY_CONFIG, num_epochs=1, num_steps_per_epoch=5,
                    save_checkpoints_steps=5, valid_max_iterations=2)
    cfg_path = str(tmp_path / "base.json")
    with open(cfg_path, "w") as f:
        json.dump(base_cfg, f)
    pre_dir = str(tmp_path / "pretrain")
    args = [train_d["data"], train_d["spklist"], valid_d["data"], valid_d["spklist"]]
    assert train_cli.main(["--config", cfg_path] + args + [pre_dir]) == 0

    ft_cfg = dict(base_cfg, learning_rate=0.01,
                  noload_var_list=["softmax/output_kernel"],
                  noupdate_var_list=["tdnn/tdnn1_conv"])
    ft_path = str(tmp_path / "ft.json")
    with open(ft_path, "w") as f:
        json.dump(ft_cfg, f)
    ft_dir = str(tmp_path / "finetune")
    rc = finetune_cli.main(
        ["--config", ft_path, "--pretrain_model", pre_dir] + args + [ft_dir]
    )
    assert rc == 0
    nnet = os.path.join(ft_dir, "nnet")
    assert checkpoints.read_pointer(nnet) == 5

    # pretrained conv1 kernel carried over AND stayed frozen through training
    pre_raw, _ = checkpoints.load_checkpoint(os.path.join(pre_dir, "nnet"))
    ft_raw, _ = checkpoints.load_checkpoint(nnet)
    np.testing.assert_array_equal(
        pre_raw["params"]["network"]["tdnn"]["tdnn1_conv"]["kernel"],
        ft_raw["params"]["network"]["tdnn"]["tdnn1_conv"]["kernel"],
    )
    # unfrozen layer moved
    assert not np.allclose(
        pre_raw["params"]["network"]["tdnn"]["tdnn6_dense"]["kernel"],
        ft_raw["params"]["network"]["tdnn"]["tdnn6_dense"]["kernel"],
    )
