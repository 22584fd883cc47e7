"""Hardware e2e validation #2: attention pooling + AAM-softmax + PLDA.

Trains an attention-pooled x-vector with ArcFace loss on synthetic data on
the accelerator, extracts held-out speakers, scores with PLDA. Appends to
docs/VALIDATION.md. Run: python scripts/attention_validation.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_kaldi_speaker_tpu.backend import (
    compute_cos_pairwise_eer,
    length_norm,
    subtract_global_mean,
    train_plda,
    compute_eer,
)
from tf_kaldi_speaker_tpu.extract.extractor import Extractor
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

CFG = dict(
    seed=0,
    network_type="tdnn",
    tdnn_layer_size=128,
    num_nodes_pooling_layer=256,
    num_nodes_last_layer=128,
    pooling_type="self_attention",
    att_key_input="tdnn5_relu",
    att_key_num_nodes=[64, 32],
    att_key_network_type=2,
    att_value_input="tdnn5_relu",
    att_value_num_nodes=[],
    att_value_network_type=0,
    att_num_heads=4,
    att_split_key=False,
    att_use_scale=True,
    att_apply_nonlinear=False,
    att_penalty_term=0.1,
    embedding_node="tdnn6_dense",
    last_layer_linear=True,
    loss_func="additive_angular_margin_softmax",
    arcsoftmax_m=0.25,
    arcsoftmax_lambda_min=0,
    arcsoftmax_lambda_base=1000,
    arcsoftmax_lambda_gamma=0.001,
    arcsoftmax_lambda_power=4,
    compute_dtype="bfloat16",
    learning_rate=0.02,
    optimizer="momentum",
    momentum=0.9,
    clip_gradient=True,
    clip_gradient_norm=3.0,
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_steps_per_epoch=500,
    show_training_progress=100,
    keep_checkpoint_max=2,
    save_checkpoints_steps=500,
    save_summary_steps=100,
    valid_max_iterations=3,
    num_parallel_datasets=2,
    max_queue_size=8,
    num_speakers_per_batch=64,
    num_segments_per_speaker=1,
    min_segment_len=150,
    max_segment_len=300,
    num_buckets=2,                # limit remote compiles through the tunnel
    device_decode=True,
)


def main():
    root = tempfile.mkdtemp(prefix="tfks_att_")
    train_d = make_fake_data_dir(os.path.join(root, "train"), num_speakers=100,
                                 utts_per_speaker=12, dim=30, min_len=320,
                                 max_len=600, seed=0)
    test_d = make_fake_data_dir(os.path.join(root, "test"), num_speakers=40,
                                utts_per_speaker=8, dim=30, min_len=320,
                                max_len=600, seed=777, spk_offset=500)

    params = ParamsPlain(**CFG)
    nnet = os.path.join(root, "exp", "nnet")
    trainer = Trainer(params, nnet, dim=30, num_speakers=100)
    trainer.build("train", 30, CFG["loss_func"], 100)
    t1 = time.time()
    trainer.train(train_d["data"], train_d["spklist"], CFG["learning_rate"])
    train_time = time.time() - t1
    steps = int(trainer.state.step)
    print("train: %d steps in %.1fs" % (steps, train_time), flush=True)

    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(CFG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("30\n")

    from tf_kaldi_speaker_tpu.kio import read_mat_scp

    ex = Extractor(os.path.join(root, "exp"), min_chunk_size=25, batch_size=32)

    def embed(d):
        keys, embs = [], []
        for key, emb in ex.embed_stream(read_mat_scp(os.path.join(d["data"], "feats.scp"))):
            keys.append(key)
            embs.append(emb)
        return keys, np.stack(embs)

    train_keys, train_embs = embed(train_d)
    test_keys, test_embs = embed(test_d)
    test_labels = np.array([int(k[3:6]) for k in test_keys])
    eer_cos = compute_cos_pairwise_eer(test_embs, test_labels)

    train_labels = np.array([int(k[3:6]) for k in train_keys])
    x, mean = subtract_global_mean(train_embs)
    plda = train_plda(length_norm(x), train_labels, num_em_iters=8)
    t_proc = length_norm(test_embs - mean)
    rng = np.random.RandomState(0)
    e_idx = rng.randint(0, len(test_keys), 20000)
    t_idx = rng.randint(0, len(test_keys), 20000)
    enroll = {str(i): t_proc[i] for i in np.unique(e_idx)}
    test_set = {str(i): t_proc[i] for i in np.unique(t_idx)}
    scores = plda.score_trials(enroll, {k: 1 for k in enroll}, test_set,
                               [(str(a), str(b)) for a, b in zip(e_idx, t_idx)])
    eer_plda, _ = compute_eer(scores, (test_labels[e_idx] == test_labels[t_idx]).astype(int))

    line = (
        "\n## Attention + AAM-softmax validation (bf16, device-decode)\n\n"
        "4-head attentive pooling + ArcFace m=0.25, %d steps: cosine EER "
        "%.2f%%, PLDA EER %.2f%% on 40 held-out synthetic speakers.\n"
        % (steps, eer_cos * 100, eer_plda * 100)
    )
    print(line, flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "VALIDATION.md")
    with open(out, "a") as f:
        f.write(line)


if __name__ == "__main__":
    main()
