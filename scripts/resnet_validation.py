"""ResNet34 (r-vector) end-to-end validation on real hardware.

Trains a scaled-down ResNet34 (base 16) with AM-softmax on a separable
synthetic corpus on the accelerator, extracts embeddings with the bucketed
extractor, and scores HELD-OUT speakers with cosine EER.
Run: python scripts/resnet_validation.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_kaldi_speaker_tpu.backend import compute_cos_pairwise_eer
from tf_kaldi_speaker_tpu.extract.extractor import Extractor
from tf_kaldi_speaker_tpu.kio import ark
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

CFG = dict(
    seed=0,
    network_type="resnet34",
    resnet_base_channels=16,
    resnet_layers=[3, 4, 6, 3],
    resnet_embedding_dim=128,
    pooling_type="statistics_pooling",
    embedding_node="resnet_embedding",
    loss_func="additive_margin_softmax",
    amsoftmax_m=0.2,
    amsoftmax_lambda_min=0,
    amsoftmax_lambda_base=1000,
    amsoftmax_lambda_gamma=0.001,
    amsoftmax_lambda_power=4,
    optimizer="momentum",
    momentum=0.9,
    compute_dtype="bfloat16",
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_steps_per_epoch=300,
    save_checkpoints_steps=300,
    show_training_progress=50,
    num_parallel_datasets=4,
    max_queue_size=8,
    num_speakers_per_batch=32,
    num_segments_per_speaker=2,
    min_segment_len=150,
    max_segment_len=250,
    batch_type="softmax",
)


def main():
    tmp = tempfile.mkdtemp(prefix="resnet_val_")
    train = make_fake_data_dir(os.path.join(tmp, "train"), num_speakers=60,
                               utts_per_speaker=10, dim=30, min_len=260,
                               max_len=400, seed=0)
    held = make_fake_data_dir(os.path.join(tmp, "held"), num_speakers=20,
                              utts_per_speaker=6, dim=30, min_len=260,
                              max_len=400, seed=777, spk_offset=100)
    t = Trainer(ParamsPlain(**CFG), os.path.join(tmp, "m", "nnet"),
                dim=30, num_speakers=60)
    t.build("train", 30, CFG["loss_func"], 60)
    t0 = time.time()
    t.train(train["data"], train["spklist"], 0.05)
    dt = time.time() - t0
    print("trained %d steps in %.1fs (%.1f steps/s)"
          % (int(t.state.step), dt, int(t.state.step) / dt))

    import json

    nnet = os.path.join(tmp, "m", "nnet")
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(CFG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("30\n")
    ex = Extractor(os.path.join(tmp, "m"), min_chunk_size=25)
    feats = dict(ark.read_mat_scp(held["feats_scp"]))
    embs = dict(ex.embed_stream(iter(feats.items())))
    keys = sorted(embs)
    X = np.stack([embs[k] for k in keys])
    labels = np.array([int(k[3:6]) for k in keys])
    eer = compute_cos_pairwise_eer(X, labels)
    print("held-out cosine EER over %d utts / %d speakers: %.4f"
          % (len(keys), len(set(labels.tolist())), eer))
    assert eer < 0.05, eer
    print("OK")


if __name__ == "__main__":
    main()
