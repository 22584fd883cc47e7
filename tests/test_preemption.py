"""Preemption-graceful stop: request_stop() at a group boundary + SIGTERM
handling in the training CLIs (checkpoint at the exact step, exit 75,
--cont resumes the remainder of the epoch)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from tf_kaldi_speaker_tpu.train import checkpoints
from tf_kaldi_speaker_tpu.train.preemption import EXIT_PREEMPTED
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = dict(
    seed=0, network_type="tdnn", tdnn_layer_size=16,
    num_nodes_pooling_layer=32, num_nodes_last_layer=16,
    pooling_type="statistics_pooling", embedding_node="tdnn6_dense",
    loss_func="softmax", learning_rate=0.05, optimizer="sgd",
    weight_l2_regularizer=1e-4, batchnorm_momentum=0.99,
    num_epochs=1, num_steps_per_epoch=16, steps_per_dispatch=4,
    show_training_progress=2, keep_checkpoint_max=0,
    save_checkpoints_steps=16, valid_max_iterations=2,
    num_parallel_datasets=1, max_queue_size=4,
    num_speakers_per_batch=8, num_segments_per_speaker=1,
    min_segment_len=48, max_segment_len=64, batch_type="softmax",
)


def test_request_stop_breaks_at_group_boundary(tmp_path):
    d = make_fake_data_dir(
        str(tmp_path / "train"), num_speakers=8, utts_per_speaker=4,
        dim=20, min_len=80, max_len=120,
    )
    data, spklist = d["data"], d["spklist"]
    trainer = Trainer(
        ParamsPlain(**CFG), str(tmp_path / "m/nnet"), dim=20, num_speakers=8
    )
    trainer.build("train", 20, CFG["loss_func"], 8)
    trainer.request_stop()
    trainer.train(data, spklist, 0.05)
    # Stopped after ONE dispatch group (K=4 of 16 steps), checkpoint saved
    # at exactly that step.
    step = int(trainer.state.step)
    assert step == 4
    assert checkpoints.read_pointer(trainer.model) == 4
    # Clearing the flag and calling train again resumes the REMAINDER of
    # the epoch (mid-epoch --cont semantics), landing on num_steps.
    trainer._stop_requested = False
    trainer.train(data, spklist, 0.05)
    assert int(trainer.state.step) == 16
    assert checkpoints.read_pointer(trainer.model) == 16
    assert not trainer.stop_requested


def test_unacknowledged_local_flag_does_not_exit(tmp_path):
    """A SIGTERM that lands AFTER the loop's last stop poll (e.g. during
    the epoch-end save) sets only the raw local flag. exit_code_if_preempted
    must NOT exit on that — on a pod, a lone host exiting while the others
    proceed into the next phase's collectives would deadlock them. The next
    phase's first poll acknowledges it on every host together."""
    from tf_kaldi_speaker_tpu.train.preemption import exit_code_if_preempted

    trainer = Trainer(
        ParamsPlain(**CFG), str(tmp_path / "m/nnet"), dim=20, num_speakers=8
    )
    trainer.build("train", 20, CFG["loss_func"], 8)
    trainer._stop_requested = True  # flag only, never collectively polled
    assert exit_code_if_preempted(trainer) is None
    # The next boundary poll acknowledges it (single process: immediately).
    assert trainer._should_stop()
    assert exit_code_if_preempted(trainer) == EXIT_PREEMPTED


def test_stop_during_valid_breaks_early(tmp_path):
    """SIGTERM landing mid-validation must not burn the grace window
    finishing the pass: valid() polls at batch boundaries and returns."""
    from tf_kaldi_speaker_tpu.train.preemption import exit_code_if_preempted

    d = make_fake_data_dir(
        str(tmp_path / "valid"), num_speakers=8, utts_per_speaker=4,
        dim=20, min_len=80, max_len=120,
    )
    trainer = Trainer(
        ParamsPlain(**dict(CFG, stop_poll_groups=1)),
        str(tmp_path / "m/nnet"), dim=20, num_speakers=8,
    )
    trainer.build("train", 20, CFG["loss_func"], 8)
    trainer.build("valid", 20, CFG["loss_func"], 8)
    trainer.request_stop()
    loss, emb, labels = trainer.valid(
        d["data"], d["spklist"], output_embeddings=True
    )
    # Both passes broke at their first boundary: nothing streamed.
    assert emb.shape[0] == 0 and labels.shape[0] == 0
    assert loss != loss  # NaN mean over zero batches
    assert exit_code_if_preempted(trainer) == EXIT_PREEMPTED


@pytest.mark.slow
def test_cli_sigterm_checkpoints_and_resumes(tmp_path):
    d = make_fake_data_dir(
        str(tmp_path / "train"), num_speakers=8, utts_per_speaker=4,
        dim=20, min_len=80, max_len=120,
    )
    dv = make_fake_data_dir(
        str(tmp_path / "valid"), num_speakers=8, utts_per_speaker=2,
        dim=20, min_len=80, max_len=120, seed=7,
    )
    data, spklist, valid = d["data"], d["spklist"], dv["data"]
    cfg = dict(CFG, num_steps_per_epoch=400, steps_per_dispatch=2,
               show_training_progress=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    model = str(tmp_path / "model")

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["PYTHONUNBUFFERED"] = "1"
    argv = [
        sys.executable, "-m", "tf_kaldi_speaker_tpu.cli.train",
        "--config", str(cfg_path), data, spklist, valid,
        spklist, model,
    ]
    proc = subprocess.Popen(
        argv, env=env, cwd=REPO, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    # Wait for training to actually make progress (a "step N:" line after
    # compile), then deliver SIGTERM like a preempting scheduler would.
    out_lines = []
    deadline = time.time() + 600
    for line in proc.stdout:
        out_lines.append(line)
        if "step " in line and ": loss" in line:
            break
        if time.time() > deadline:
            proc.kill()
            pytest.fail("no training step within 600s:\n" + "".join(out_lines))
    proc.send_signal(signal.SIGTERM)
    out_lines.extend(proc.stdout)  # drain to EOF
    rc = proc.wait(timeout=300)
    tail = "".join(out_lines[-40:])
    assert rc == EXIT_PREEMPTED, (rc, tail)
    assert "preempted: checkpoint saved at step" in tail
    nnet = os.path.join(model, "nnet")
    step = checkpoints.read_pointer(nnet)
    assert step is not None and 0 < step < 400, (step, tail)
    # --cont resumes the epoch remainder and finishes normally (validation
    # runs, exit 0, final checkpoint at num_steps_per_epoch).
    cont = subprocess.run(
        [sys.executable, "-m", "tf_kaldi_speaker_tpu.cli.train", "--cont",
         data, spklist, valid, spklist, model],
        env=env, cwd=REPO, text=True, timeout=900,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    assert cont.returncode == 0, cont.stdout[-4000:]
    assert checkpoints.read_pointer(nnet) == 400, cont.stdout[-2000:]
    assert "valid loss" in cont.stdout
