"""The TF1 shim runs the UNMODIFIED reference trainer end to end.

scripts/tf1_ref_shim.py is the foundation of the head-to-head convergence
comparison (scripts/reference_convergence.py, VERDICT r3 item 1): it must
keep the reference's own Trainer (/root/reference/model/trainer.py)
buildable and trainable under the installed TF 2.21. This test runs a
2-step train + valid + predict through the real reference code in a
subprocess (the shim rebinds sys.modules['tensorflow'] process-wide, and
TF must not share the pytest process with the JAX CPU mesh)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("TFKS_REFERENCE_ROOT", "/root/reference")

WORKER = r"""
import json, os, sys, tempfile
sys.path.insert(0, %(repo)r)
sys.path.insert(0, os.path.join(%(repo)r, "scripts"))
import tf1_ref_shim
tf1_ref_shim.install()
import numpy as np
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

root = tempfile.mkdtemp(prefix="refshim_")
train_d = make_fake_data_dir(os.path.join(root, "train"), num_speakers=8,
    utts_per_speaker=4, dim=10, min_len=120, max_len=200, seed=0)
cfg = dict(seed=0, network_type="tdnn", last_layer_linear=False,
    loss_func="softmax", batch_type="softmax",
    pooling_type="statistics_pooling", embedding_node="tdnn6_dense",
    learning_rate=0.01, use_nesterov=False, clip_gradient=False,
    weight_l2_regularizer=1e-2, batchnorm_momentum=0.99,
    num_epochs=1, num_steps_per_epoch=2, reduce_lr_epochs=4,
    show_training_progress=1, keep_checkpoint_max=2,
    save_summary_steps=100000, save_checkpoints_steps=100000,
    valid_max_iterations=2, num_parallel_datasets=1, max_queue_size=4,
    num_speakers_per_batch=4, num_segments_per_speaker=1,
    min_segment_len=60, max_segment_len=100,
    early_stop_epochs=10, min_learning_rate=1e-6,
    num_valid_speakers_per_batch=4, num_valid_segments_per_speaker=1)
conf = os.path.join(root, "config.json")
json.dump(cfg, open(conf, "w"))
from misc.utils import Params          # reference code
from model.trainer import Trainer      # reference code
tf1_ref_shim.patch_py2_data_loader()
params = Params(conf)
exp = os.path.join(root, "exp")
os.makedirs(os.path.join(exp, "nnet"), exist_ok=True)
trainer = Trainer(params, exp)
trainer.build("train", dim=10, loss_type="softmax", num_speakers=8)
trainer.build("valid", dim=10, loss_type="softmax", num_speakers=8)
trainer.train(train_d["data"], train_d["spklist"], 0.01)
loss, embs, labels = trainer.valid(train_d["data"], train_d["spklist"],
                                   output_embeddings=True)
assert np.isfinite(loss), loss
assert embs.shape[1] == 512 and embs.shape[0] == labels.shape[0], embs.shape
trainer.build("predict", dim=10)
emb = trainer.predict(np.random.RandomState(0).randn(150, 10).astype("f"))
assert emb.shape == (512,), emb.shape
assert np.isfinite(emb).all()
trainer.close()
print("REF_SHIM_OK")
"""


@pytest.mark.slow
def test_reference_trainer_runs_under_shim(tmp_path):
    pytest.importorskip("tensorflow")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    env = dict(os.environ)
    # TF-only subprocess: keep JAX (sitecustomize may register a TPU
    # platform) off the real chip and quiet.
    env["JAX_PLATFORMS"] = "cpu"
    env["CUDA_VISIBLE_DEVICES"] = ""
    env["TF_CPP_MIN_LOG_LEVEL"] = "2"
    proc = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "REF_SHIM_OK" in proc.stdout, proc.stdout[-3000:]
