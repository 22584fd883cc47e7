"""Hardware e2e validation #3: multitask speaker+phone training."""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_kaldi_speaker_tpu.multitask import TrainerMultiTask
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

NUM_PHONES = 64

CFG = dict(
    seed=0,
    tdnn_layer_size=128,
    num_nodes_pooling_layer=256,
    speaker_dim=128,
    phone_dim=128,
    pooling_type="statistics_pooling",
    embedding_node="zs_mu_dense",
    spk_loss_type="softmax",
    phn_loss_type="softmax",
    spk_loss_weight=1.0,
    phn_loss_weight=0.3,
    num_shared_layers=2,
    phone_kernel_size=[5, 5, 7, 1, 3],
    phone_layer_size=[128, 128, 128, 128, 128],
    phone_dilation_size=[1, 1, 1, 1, 4],
    phone_left_context=11,
    phone_right_context=11,
    speaker_left_context=7,
    speaker_right_context=7,
    num_frames_per_utt=8,
    learning_rate=0.02,
    optimizer="momentum",
    momentum=0.9,
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_steps_per_epoch=300,
    show_training_progress=100,
    keep_checkpoint_max=2,
    save_checkpoints_steps=300,
    valid_max_iterations=3,
    num_parallel_datasets=2,
    max_queue_size=8,
    num_speakers_per_batch=32,
    num_segments_per_speaker=1,
    min_segment_len=150,
    max_segment_len=250,
    num_buckets=2,
)


def main():
    root = tempfile.mkdtemp(prefix="tfks_mt_")
    d = make_fake_data_dir(
        os.path.join(root, "train"), num_speakers=50, utts_per_speaker=10,
        dim=30, min_len=300, max_len=500, with_vad_ali=True,
        num_phones=NUM_PHONES, seed=0,
    )
    params = ParamsPlain(**CFG)
    t = TrainerMultiTask(params, os.path.join(root, "exp", "nnet"), dim=30,
                         num_speakers=50, num_phones=NUM_PHONES)
    t.build("train", 30, num_speakers=50, num_phones=NUM_PHONES)
    t0 = time.time()
    t.train(d["data"], d["ali_dir"], d["spklist"], CFG["learning_rate"])
    dt = time.time() - t0
    steps = int(t.state.step)
    print("mt train: %d steps in %.1fs" % (steps, dt), flush=True)

    t.build("valid", 30)
    spk_loss, phn_loss, emb, labels = t.valid(
        d["data"], d["ali_dir"], d["spklist"], output_embeddings=True
    )
    print("valid: spk %.4f phn %.4f (%d embeddings)"
          % (spk_loss, phn_loss, len(labels)), flush=True)
    t.build("predict", 30)
    x = np.random.RandomState(0).randn(200, 30).astype(np.float32)
    emb1 = t.predict_speaker(x)
    lp = t.predict_phone(x)
    print("predict: spk emb %s, phone logpost %s (sum-to-one max err %.2e)"
          % (emb1.shape, lp.shape,
             float(np.abs(np.exp(lp).sum(-1) - 1).max())), flush=True)

    line = (
        "\n## Multitask validation (speaker+phone, real accelerator)\n\n"
        "Shared-trunk multitask model, %d steps in %.0fs: valid spk loss "
        "%.3f, phn loss %.3f; dual predict heads produce a %d-d speaker "
        "embedding and per-frame log-posteriors over %d senones "
        "(rows sum to 1 within %.1e).\n"
        % (steps, dt, spk_loss, phn_loss, emb1.shape[0], NUM_PHONES,
           float(np.abs(np.exp(lp).sum(-1) - 1).max()))
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "VALIDATION.md")
    with open(out, "a") as f:
        f.write(line)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
