"""Head-to-head training-run parity vs the REAL reference trainer.

VERDICT r3 item 1: the strongest achievable stand-in for reproducing
RESULTS.md on licensed corpora. Both arms train the SAME architecture
(the reference's fixed 512-wide TDNN, model/tdnn.py:37-158) on the SAME
on-disk synthetic Kaldi corpus (hard regime: overlapping clusters,
per-utterance channel offsets) with the SAME nnet_conf-style JSON,
epoch schedule and LR halving; per-epoch valid loss and final held-out
cosine EER are compared:

- arm "ref": the reference's OWN Trainer (/root/reference/model/trainer.py
  :451-706) run byte-for-byte unmodified under scripts/tf1_ref_shim.py
  (TF 2.21 compat.v1 + faithful tf.layers/tf.contrib shims — the same
  layer semantics tests/test_tf_golden.py pins against our graphs).
- arm "tpu": this framework's Trainer + Extractor through the same
  recipe-style protocol (cli/train.py semantics).

The reference arm seeds its loader workers from os.urandom
(data_loader.py:261) so it is not repeatable; run the cheap TPU arm at
several seeds to estimate run-to-run noise and require the ref arm's
final EER to land within that band (report mode checks this).

Usage (see docs/VALIDATION.md for the recorded results):
    python scripts/reference_convergence.py make-data --root DIR
    python scripts/reference_convergence.py run --arm ref --loss softmax --root DIR
    python scripts/reference_convergence.py run --arm tpu --loss softmax --seed 1 --root DIR
    python scripts/reference_convergence.py report --root DIR [--write-doc]
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# Corpus: crowded 12-dim space + channel offsets (the hard regime of
# scripts/synthetic_validation.py) sized so the reference arm's ~5 s/step
# single-core TF stays inside a few hours for the full schedule.
DIM = 12
NSPK = 200
UTTS = 10          # per speaker; 2 held out into the valid dir
CHAN = 0.9
TEST_NSPK = 40

EPOCH_LRS = [0.04, 0.02, 0.01]   # recipe-style halving, one value per epoch

BASE_CFG = dict(
    seed=0,
    network_type="tdnn",
    pooling_type="statistics_pooling",
    embedding_node="tdnn6_dense",
    last_layer_linear=False,
    batch_type="softmax",
    learning_rate=EPOCH_LRS[0],
    optimizer="momentum",
    momentum=0.9,
    use_nesterov=False,
    clip_gradient=True,
    clip_gradient_norm=3.0,
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_epochs=len(EPOCH_LRS),
    num_steps_per_epoch=400,
    reduce_lr_epochs=100,
    show_training_progress=100,
    keep_checkpoint_max=2,
    save_summary_steps=100000,
    save_checkpoints_steps=100000,
    valid_max_iterations=20,
    num_parallel_datasets=1,
    max_queue_size=6,
    num_speakers_per_batch=24,
    num_segments_per_speaker=1,
    min_segment_len=100,
    max_segment_len=200,
    num_valid_speakers_per_batch=24,
    num_valid_segments_per_speaker=1,
    early_stop_epochs=100,
    min_learning_rate=1e-6,
)

LOSSES = {
    "softmax": dict(loss_func="softmax", last_layer_linear=False),
    # Annealing sized for a 1200-step run: lambda = 1000*(1+0.01*step)^-4
    # (reference loss.py:144-152 formula) reaches ~0.8 by step 500 and
    # ~0.03 by step 1200, i.e. the margin is fully engaged by the end.
    "amsoftmax": dict(
        loss_func="additive_margin_softmax",
        last_layer_linear=True,
        amsoftmax_m=0.2,
        amsoftmax_lambda_min=0,
        amsoftmax_lambda_base=1000,
        amsoftmax_lambda_gamma=0.01,
        amsoftmax_lambda_power=4,
    ),
    # a-softmax m=4 (reference loss.py:51-169, Chebyshev phi + theta-branch
    # correction).  lambda_min=10 is the reference's own voxceleb config
    # (nnet_conf/tdnn_asoftmax_m4_linear_bn_1e-2.json): the margin is blended
    # at most 1/11 into the logits — exactly the regime the reference ran.
    "asoftmax_m4": dict(
        loss_func="asoftmax",
        last_layer_linear=True,
        asoftmax_m=4,
        asoftmax_lambda_min=10,
        asoftmax_lambda_base=1000,
        asoftmax_lambda_gamma=0.01,
        asoftmax_lambda_power=4,
    ),
    # a-softmax m=1 null probe: loss.py:112-117 returns plain softmax over
    # column-normalized weights (no bias, no phi). Isolates the
    # normalized-logit base of the a-softmax family from the m=4 margin —
    # if the small m=4 offset (see docs/ROUND5.md findings) reproduces
    # here, it lives in the base/normalization; if not, in phi dynamics.
    "asoftmax_m1": dict(
        loss_func="asoftmax",
        last_layer_linear=True,
        asoftmax_m=1,
        asoftmax_lambda_min=10,
        asoftmax_lambda_base=1000,
        asoftmax_lambda_gamma=0.01,
        asoftmax_lambda_power=4,
    ),
    # arc-softmax m=0.25 (reference loss.py:260-355, cos(theta+m) with the
    # theta+m>pi fallback branch); margins/anneal from
    # nnet_conf/tdnn_arcsoftmax_m0.25_linear_bn_1e-2.json, anneal re-timed
    # for 1200 steps as above.
    "arcsoftmax_m0.25": dict(
        loss_func="additive_angular_margin_softmax",
        last_layer_linear=True,
        arcsoftmax_m=0.25,
        arcsoftmax_lambda_min=0,
        arcsoftmax_lambda_base=1000,
        arcsoftmax_lambda_gamma=0.01,
        arcsoftmax_lambda_power=4,
    ),
    # Attention pooling head-to-head (reference pooling.py:37-190): the
    # exact att_* block of nnet_conf/tdnn_amsoftmax_m0.20_linear_bn_1e-2
    # _tdnn4_att.json — tdnn4_relu key through dense_bn_relu + dense_tanh
    # [1500,1500], tdnn5_relu value untouched, scaled dot-product.
    "att_amsoftmax": dict(
        loss_func="additive_margin_softmax",
        last_layer_linear=True,
        amsoftmax_m=0.2,
        amsoftmax_lambda_min=0,
        amsoftmax_lambda_base=1000,
        amsoftmax_lambda_gamma=0.01,
        amsoftmax_lambda_power=4,
        pooling_type="self_attention",
        att_key_input="tdnn4_relu",
        att_key_num_nodes=[1500, 1500],
        att_key_network_type=3,
        att_value_input="tdnn5_relu",
        att_value_num_nodes=[],
        att_value_network_type=0,
        att_apply_nonlinear=False,
        att_use_scale=True,
        att_num_heads=1,
        att_split_key=False,
        att_penalty_term=0,
    ),
}


# ---- Multitask head-to-head (VERDICT r4 item 2 stretch): the UNMODIFIED
# reference BaseMT (model/multitask_v1/base_v1.py) vs our TrainerMultiTask
# on a corpus whose phone alignments are LEARNABLE (per-phone feature
# offsets, utils/testdata.py phone_signal) so the phone head's gradients
# into the shared trunk carry real signal in both arms.
MT_NUM_PHONES = 32
MT_PHONE_SIGNAL = 0.5

MT_CFG = dict(
    seed=0,
    spk_loss_type="softmax",
    phn_loss_type="softmax",
    spk_loss_weight=1.0,
    phn_loss_weight=0.3,
    embedding_node="zs_mu_dense",
    pooling_type="statistics_pooling",
    num_nodes_pooling_layer=512,
    num_shared_layers=2,
    # Shared trunk conv5/conv5 then phone tower conv7(d1)/dense/conv3(d4):
    # contexts 7 (speaker) / 11 (phone) — multitask_v1/tdnn.py:35-130,:240.
    phone_kernel_size=[5, 5, 7, 1, 3],
    # First num_shared entries re-enter the 512-wide speaker trunk with
    # scope reuse (multitask_v1/tdnn.py:244-278) — they MUST match it.
    phone_layer_size=[512, 512, 128, 128, 128],
    phone_dilation_size=[1, 1, 1, 1, 4],
    phone_left_context=11,
    phone_right_context=11,
    speaker_left_context=7,
    speaker_right_context=7,
    speaker_dim=512,
    phone_dim=128,
    num_frames_per_utt=8,
    learning_rate=EPOCH_LRS[0],
    optimizer="momentum",
    momentum=0.9,
    use_nesterov=False,
    clip_gradient=True,
    clip_gradient_norm=3.0,
    weight_l2_regularizer=1e-4,
    batchnorm_momentum=0.99,
    num_epochs=len(EPOCH_LRS),
    num_steps_per_epoch=400,
    show_training_progress=100,
    keep_checkpoint_max=2,
    save_summary_steps=100000,
    save_checkpoints_steps=100000,
    valid_max_iterations=20,
    num_parallel_datasets=1,
    max_queue_size=6,
    num_speakers_per_batch=24,
    num_segments_per_speaker=1,
    min_segment_len=100,
    max_segment_len=200,
)


def _split_valid(train_dir: str, valid_dir: str, per_spk: int = 2) -> None:
    """Hold out the last ``per_spk`` utts of every speaker into a valid
    data dir (scp-level split; both dirs reference the same ark)."""
    os.makedirs(valid_dir, exist_ok=True)
    utt2spk = {}
    for line in open(os.path.join(train_dir, "utt2spk")):
        u, s = line.split()
        utt2spk[u] = s
    by_spk = {}
    for u in sorted(utt2spk):
        by_spk.setdefault(utt2spk[u], []).append(u)
    heldout = set()
    for s, utts in by_spk.items():
        heldout.update(utts[-per_spk:])

    for fname in ("feats.scp", "utt2spk", "utt2num_frames", "vad.scp"):
        src = os.path.join(train_dir, fname)
        if not os.path.exists(src):
            continue
        keep_t, keep_v = [], []
        for line in open(src):
            (keep_v if line.split()[0] in heldout else keep_t).append(line)
        with open(src, "w") as f:
            f.writelines(keep_t)
        with open(os.path.join(valid_dir, fname), "w") as f:
            f.writelines(keep_v)
    for d in (train_dir, valid_dir):
        u2s = [line.split() for line in open(os.path.join(d, "utt2spk"))]
        s2u = {}
        for u, s in u2s:
            s2u.setdefault(s, []).append(u)
        with open(os.path.join(d, "spk2utt"), "w") as f:
            for s in sorted(s2u):
                f.write("%s %s\n" % (s, " ".join(s2u[s])))


def make_data(root: str) -> None:
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

    train_d = make_fake_data_dir(
        os.path.join(root, "train"), num_speakers=NSPK,
        utts_per_speaker=UTTS, dim=DIM, min_len=250, max_len=450, seed=0,
        spk_scale=1.0, chan_scale=CHAN)
    _split_valid(os.path.join(root, "train"), os.path.join(root, "valid"))
    make_fake_data_dir(
        os.path.join(root, "test"), num_speakers=TEST_NSPK,
        utts_per_speaker=10, dim=DIM, min_len=250, max_len=450, seed=777,
        spk_offset=5000, spk_scale=1.0, chan_scale=CHAN)
    print("corpus at", root, "spklist", train_d["spklist"], flush=True)


def make_data_mt(root: str) -> None:
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

    train_d = make_fake_data_dir(
        os.path.join(root, "mt_train"), num_speakers=NSPK,
        utts_per_speaker=UTTS, dim=DIM, min_len=250, max_len=450, seed=0,
        spk_scale=1.0, chan_scale=CHAN, with_vad_ali=True,
        num_phones=MT_NUM_PHONES, phone_signal=MT_PHONE_SIGNAL)
    _split_valid(os.path.join(root, "mt_train"), os.path.join(root, "mt_valid"))
    make_fake_data_dir(
        os.path.join(root, "mt_test"), num_speakers=TEST_NSPK,
        utts_per_speaker=10, dim=DIM, min_len=250, max_len=450, seed=777,
        spk_offset=5000, spk_scale=1.0, chan_scale=CHAN, with_vad_ali=True,
        num_phones=MT_NUM_PHONES, phone_signal=MT_PHONE_SIGNAL)
    # tree-info stub for the reference loader's shell-out
    # (data_loader_v2.py:228): answers num-pdfs from the ali dir's
    # num_pdfs file (no Kaldi build exists in this environment).
    bindir = os.path.join(root, "bin")
    os.makedirs(bindir, exist_ok=True)
    stub = os.path.join(bindir, "tree-info")
    with open(stub, "w") as f:
        f.write('#!/bin/sh\nd=$(dirname "$1")\n'
                'echo "num-pdfs $(cat "$d/num_pdfs")"\n')
    os.chmod(stub, 0o755)
    print("mt corpus at", root, "spklist", train_d["spklist"], flush=True)


def _mt_paths(root: str):
    train = os.path.join(root, "mt_train")
    return (train,
            os.path.join(root, "mt_valid"),
            os.path.join(root, "mt_test"),
            os.path.join(train, "spklist"),
            os.path.join(train, "ali"))


def run_ref_mt(root: str, steps_per_epoch: int, out: str, rep: int = 0) -> None:
    """The reference's own BaseMT trainer, byte-for-byte unmodified
    (model/multitask_v1/base_v1.py:31-721), through the TF shim + the
    multitask loader py2 patches."""
    import tf1_ref_shim

    os.environ["PATH"] = (os.path.join(root, "bin") + os.pathsep +
                          os.environ.get("PATH", ""))
    tf1_ref_shim.install()
    from misc.utils import Params  # reference code (shimmed TF)
    from model.multitask_v1.base_v1 import BaseMT  # reference code

    tf1_ref_shim.patch_py2_data_loader()
    tf1_ref_shim.patch_py2_mt_loader()

    train_dir, valid_dir, test_dir, spklist, ali_dir = _mt_paths(root)
    cfg = dict(MT_CFG, num_steps_per_epoch=steps_per_epoch)
    exp = os.path.join(root, "exp_ref_mt_softmax_r%d" % rep)
    os.makedirs(os.path.join(exp, "nnet"), exist_ok=True)
    conf = os.path.join(exp, "config.json")
    with open(conf, "w") as f:
        json.dump(cfg, f, indent=1)

    params = Params(conf)
    trainer = BaseMT(params, exp, DIM, num_speakers=NSPK,
                     num_phones=MT_NUM_PHONES)
    trainer.build("train")
    trainer.build("valid")

    valid_losses, t0 = [], time.time()
    for epoch, lr in enumerate(EPOCH_LRS):
        trainer.train(train_dir, ali_dir, spklist, lr)
        loss_v, _, _ = trainer.valid(valid_dir, ali_dir, spklist)
        valid_losses.append(float(loss_v))
        print("[ref mt] epoch %d lr %g valid loss %.4f (%.0fs)"
              % (epoch, lr, loss_v, time.time() - t0), flush=True)
    wall = time.time() - t0

    trainer.build("predict")

    def embed(feats):
        ali = np.zeros((feats.shape[0],), np.int32)
        return trainer.predict_speaker(
            MT_CFG["embedding_node"], feats, ali,
            np.array([feats.shape[0]], np.int32))

    eer = _test_eer(embed, test_dir)
    trainer.close()
    result = dict(arm="ref", loss="mt_softmax", seed=None, rep=rep,
                  steps_per_epoch=steps_per_epoch, valid_loss=valid_losses,
                  eer=eer, wall_s=round(wall, 1))
    print("[ref mt r%d] final EER %.2f%%" % (rep, eer * 100), flush=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


def run_tpu_mt(root: str, seed: int, steps_per_epoch: int, out: str,
               compute_dtype: str = "") -> None:
    from tf_kaldi_speaker_tpu.multitask import TrainerMultiTask
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    train_dir, valid_dir, test_dir, spklist, ali_dir = _mt_paths(root)
    cfg = dict(MT_CFG, num_steps_per_epoch=steps_per_epoch, seed=seed)
    tag = ""
    if compute_dtype:
        cfg["compute_dtype"] = compute_dtype
        tag = "_" + compute_dtype
    exp = os.path.join(root, "exp_tpu_mt_softmax_s%d%s" % (seed, tag))
    nnet = os.path.join(exp, "nnet")
    os.makedirs(nnet, exist_ok=True)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("%d\n" % DIM)

    params = ParamsPlain(**cfg)
    trainer = TrainerMultiTask(params, nnet, dim=DIM, num_speakers=NSPK,
                               num_phones=MT_NUM_PHONES)
    trainer.build("train", DIM, num_speakers=NSPK,
                  num_phones=MT_NUM_PHONES)
    trainer.build("valid", DIM)

    valid_losses, t0 = [], time.time()
    for epoch, lr in enumerate(EPOCH_LRS):
        trainer.train(train_dir, ali_dir, spklist, lr)
        spk_v, phn_v, _, _ = trainer.valid(valid_dir, ali_dir, spklist)
        loss_v = (cfg["spk_loss_weight"] * spk_v
                  + cfg["phn_loss_weight"] * phn_v)
        valid_losses.append(float(loss_v))
        print("[tpu mt s%d] epoch %d lr %g valid loss %.4f "
              "(spk %.4f phn %.4f) (%.0fs)"
              % (seed, epoch, lr, loss_v, spk_v, phn_v, time.time() - t0),
              flush=True)
    wall = time.time() - t0

    trainer.build("predict", DIM)
    eer = _test_eer(lambda feats: trainer.predict_speaker(feats), test_dir)
    result = dict(arm="tpu", loss="mt_softmax", seed=seed,
                  dtype=compute_dtype or "float32",
                  steps_per_epoch=steps_per_epoch, valid_loss=valid_losses,
                  eer=float(eer), wall_s=round(wall, 1))
    print("[tpu mt s%d%s] final EER %.2f%%" % (seed, tag, eer * 100),
          flush=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


def _paths(root: str):
    return (os.path.join(root, "train"),
            os.path.join(root, "valid"),
            os.path.join(root, "test"),
            os.path.join(root, "train", "spklist"))


def _test_eer(embed_fn, test_dir: str) -> float:
    """Cosine pairwise EER over mean-subtracted full-utterance embeddings
    (the synthetic-validation protocol), identical scoring for both arms."""
    from tf_kaldi_speaker_tpu.backend import compute_cos_pairwise_eer
    from tf_kaldi_speaker_tpu.kio import read_mat_scp

    keys, embs = [], []
    for key, feats in read_mat_scp(os.path.join(test_dir, "feats.scp")):
        keys.append(key)
        embs.append(embed_fn(feats))
    E = np.stack(embs)
    labels = np.array([int(k[3:7]) for k in keys])
    return float(compute_cos_pairwise_eer(E - E.mean(0), labels))


def run_ref(root: str, loss: str, steps_per_epoch: int, out: str,
            rep: int = 0) -> None:
    import tf1_ref_shim

    tf1_ref_shim.install()
    from misc.utils import Params  # reference code (shimmed TF)
    from model.trainer import Trainer  # reference code (shimmed TF)

    tf1_ref_shim.patch_py2_data_loader()

    train_dir, valid_dir, test_dir, spklist = _paths(root)
    cfg = dict(BASE_CFG, num_steps_per_epoch=steps_per_epoch, **LOSSES[loss])
    exp = os.path.join(root, "exp_ref_%s_r%d" % (loss, rep))
    os.makedirs(os.path.join(exp, "nnet"), exist_ok=True)
    conf = os.path.join(exp, "config.json")
    with open(conf, "w") as f:
        json.dump(cfg, f, indent=1)

    params = Params(conf)
    trainer = Trainer(params, exp)
    trainer.build("train", dim=DIM, loss_type=cfg["loss_func"],
                  num_speakers=NSPK)
    trainer.build("valid", dim=DIM, loss_type=cfg["loss_func"],
                  num_speakers=NSPK)

    valid_losses, t0 = [], time.time()
    for epoch, lr in enumerate(EPOCH_LRS):
        trainer.train(train_dir, spklist, lr)
        loss_v, _, _ = trainer.valid(valid_dir, spklist)
        valid_losses.append(float(loss_v))
        print("[ref %s] epoch %d lr %g valid loss %.4f (%.0fs)"
              % (loss, epoch, lr, loss_v, time.time() - t0), flush=True)
    wall = time.time() - t0

    # Full-utterance embeddings through the reference's own predict graph
    # (extract.py:65-93 semantics; every test utt is < chunk_size).
    trainer.build("predict", dim=DIM)
    eer = _test_eer(lambda feats: trainer.predict(feats), test_dir)
    trainer.close()
    result = dict(arm="ref", loss=loss, seed=None, rep=rep,
                  steps_per_epoch=steps_per_epoch, valid_loss=valid_losses,
                  eer=eer, wall_s=round(wall, 1))
    print("[ref %s r%d] final EER %.2f%%" % (loss, rep, eer * 100),
          flush=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


def run_tpu(root: str, loss: str, seed: int, steps_per_epoch: int,
            out: str, compute_dtype: str = "") -> None:
    from tf_kaldi_speaker_tpu.extract.extractor import Extractor
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    train_dir, valid_dir, test_dir, spklist = _paths(root)
    cfg = dict(BASE_CFG, num_steps_per_epoch=steps_per_epoch, seed=seed,
               **LOSSES[loss])
    tag = ""
    if compute_dtype:
        cfg["compute_dtype"] = compute_dtype
        tag = "_" + compute_dtype
    exp = os.path.join(root, "exp_tpu_%s_s%d%s" % (loss, seed, tag))
    nnet = os.path.join(exp, "nnet")
    os.makedirs(nnet, exist_ok=True)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("%d\n" % DIM)

    params = ParamsPlain(**cfg)
    trainer = Trainer(params, nnet, dim=DIM, num_speakers=NSPK)
    trainer.build("train", DIM, cfg["loss_func"], NSPK)
    trainer.build("valid", DIM, cfg["loss_func"], NSPK)

    valid_losses, t0 = [], time.time()
    for epoch, lr in enumerate(EPOCH_LRS):
        trainer.train(train_dir, spklist, lr)
        loss_v, _, _ = trainer.valid(valid_dir, spklist)
        valid_losses.append(float(loss_v))
        print("[tpu %s s%d] epoch %d lr %g valid loss %.4f (%.0fs)"
              % (loss, seed, epoch, lr, loss_v, time.time() - t0), flush=True)
    wall = time.time() - t0

    ex = Extractor(exp, min_chunk_size=25, batch_size=32)
    eer = _test_eer(lambda feats: ex.embed_utterance(feats), test_dir)
    result = dict(arm="tpu", loss=loss, seed=seed,
                  dtype=compute_dtype or "float32",
                  steps_per_epoch=steps_per_epoch, valid_loss=valid_losses,
                  eer=float(eer), wall_s=round(wall, 1))
    print("[tpu %s s%d%s] final EER %.2f%%" % (loss, seed, tag, eer * 100),
          flush=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


def _exact_rank_p(ref_vals, tpu_vals) -> float:
    """Two-sided exact Mann-Whitney p for tiny samples (enumerate all
    C(n+m, n) group assignments of the pooled values)."""
    import itertools

    pooled = list(ref_vals) + list(tpu_vals)
    n = len(ref_vals)
    idx = range(len(pooled))
    rank = {i: r for r, i in enumerate(
        sorted(idx, key=lambda i: pooled[i]))}

    def stat(group):
        return sum(rank[i] for i in group)

    observed = stat(range(n))
    stats = [stat(c) for c in itertools.combinations(idx, n)]
    mean = sum(stats) / len(stats)
    extreme = sum(1 for s in stats
                  if abs(s - mean) >= abs(observed - mean) - 1e-12)
    return extreme / len(stats)


def report(root: str, write_doc: bool) -> int:
    results = [json.load(open(p))
               for p in sorted(glob.glob(os.path.join(root, "results",
                                                      "*.json")))]
    lines = [
        "",
        "## Head-to-head convergence vs the real reference trainer",
        "",
        "`python scripts/reference_convergence.py` — the UNMODIFIED",
        "reference Trainer (TF 2.21 via scripts/tf1_ref_shim.py) and this",
        "framework train the same fixed 512-wide TDNN on the same on-disk",
        "synthetic corpus (%d spks, dim %d, chan %.1f) with the same JSON" %
        (NSPK, DIM, CHAN),
        "config, %d epochs x LR %s, batch %d x %d-%d frames. Valid loss" %
        (len(EPOCH_LRS), EPOCH_LRS, BASE_CFG["num_speakers_per_batch"],
         BASE_CFG["min_segment_len"], BASE_CFG["max_segment_len"]),
        "per epoch; final cosine EER on 40 held-out speakers, identical",
        "scoring. TPU-arm seeds estimate run-to-run noise; the reference",
        "arm (os.urandom loader seeds) must land inside that band.",
        "",
        "| Arm | Loss | Seed | Valid loss by epoch | Final EER |",
        "|---|---|---|---|---|",
    ]
    ok = True
    for loss in list(LOSSES) + ["mt_softmax"]:
        ref = [r for r in results if r["arm"] == "ref" and r["loss"] == loss]
        tpu_all = [r for r in results
                   if r["arm"] == "tpu" and r["loss"] == loss]
        tpu = [r for r in tpu_all if r.get("dtype", "float32") == "float32"]
        bf16 = [r for r in tpu_all if r.get("dtype") == "bfloat16"]
        ref.sort(key=lambda r: r.get("rep", 0))
        for r in ref + sorted(tpu + bf16, key=lambda r: r["seed"]):
            arm = r["arm"]
            if r.get("dtype") == "bfloat16":
                arm = "tpu-bf16"
            lines.append("| %s | %s | %s | %s | %.2f%% |" % (
                arm, loss,
                "-" if r["seed"] is None else r["seed"],
                " ".join("%.3f" % v for v in r["valid_loss"]),
                r["eer"] * 100))
        if not ref and not bf16:
            continue
        if len(tpu) >= 3:
            eers = np.array([r["eer"] for r in tpu])
            mu, sd = eers.mean(), eers.std(ddof=1)
            band = 3 * max(sd, 0.005)  # floor: EER quantization on 400 utts
            for r in ref:
                inside = abs(r["eer"] - mu) <= band
                ok &= inside
                lines.append(
                    "| check | %s | r%d | ref %.2f%% vs tpu %.2f%%±%.2f%% "
                    "(3σ band ±%.2f%%) | %s |" % (
                        loss, r.get("rep", 0), r["eer"] * 100, mu * 100,
                        sd * 100, band * 100, "PASS" if inside else "FAIL"))
            for r in bf16:
                inside = abs(r["eer"] - mu) <= band
                ok &= inside
                lines.append(
                    "| check | %s | bf16 s%d | bf16 %.2f%% vs f32 "
                    "%.2f%%±%.2f%% (3σ band ±%.2f%%) | %s |" % (
                        loss, r["seed"], r["eer"] * 100, mu * 100, sd * 100,
                        band * 100, "PASS" if inside else "FAIL"))
            if len(ref) >= 2:
                # Exact two-sample rank test (band checks gate; this line
                # surfaces sub-band systematic offsets honestly)
                p = _exact_rank_p([r["eer"] for r in ref], list(eers))
                lines.append(
                    "| rank | %s | %dv%d | ref mean %.2f%% vs tpu mean "
                    "%.2f%%, exact two-sided p=%.3f | %s |" % (
                        loss, len(ref), len(tpu),
                        np.mean([r["eer"] for r in ref]) * 100, mu * 100,
                        p, "offset flagged" if p < 0.05 else "no offset"))
        else:
            ok = False
            lines.append("| check | %s | | only %d f32 tpu seeds (<3): no "
                         "band | FAIL |" % (loss, len(tpu)))
    lines.append("")
    text = "\n".join(lines)
    print(text)
    if write_doc:
        with open(os.path.join(REPO, "docs", "VALIDATION.md"), "a") as f:
            f.write(text + "\n")
        print("appended to docs/VALIDATION.md", flush=True)
    return 0 if ok else 1


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["make-data", "make-data-mt", "run",
                                    "report"])
    p.add_argument("--root", required=True)
    p.add_argument("--arm", choices=["ref", "tpu"])
    p.add_argument("--loss", choices=sorted(LOSSES) + ["mt_softmax"])
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--rep", type=int, default=0,
                   help="ref-arm repeat index (os.urandom loader seeds make "
                        "repeats the only route to a two-sample test)")
    p.add_argument("--compute-dtype", default="",
                   help="tpu arm activation dtype override (e.g. bfloat16)")
    p.add_argument("--steps-per-epoch", type=int,
                   default=BASE_CFG["num_steps_per_epoch"])
    p.add_argument("--write-doc", action="store_true")
    args = p.parse_args()

    if args.mode == "make-data":
        make_data(args.root)
        return 0
    if args.mode == "make-data-mt":
        make_data_mt(args.root)
        return 0
    if args.mode == "report":
        return report(args.root, args.write_doc)

    assert args.arm and args.loss, "run mode needs --arm and --loss"
    os.makedirs(os.path.join(args.root, "results"), exist_ok=True)
    if args.arm == "ref":
        out = os.path.join(args.root, "results",
                           "ref_%s_r%d.json" % (args.loss, args.rep))
        if args.loss == "mt_softmax":
            run_ref_mt(args.root, args.steps_per_epoch, out, rep=args.rep)
        else:
            run_ref(args.root, args.loss, args.steps_per_epoch, out,
                    rep=args.rep)
    else:
        tag = "_" + args.compute_dtype if args.compute_dtype else ""
        out = os.path.join(args.root, "results",
                           "tpu_%s_s%d%s.json" % (args.loss, args.seed, tag))
        if args.loss == "mt_softmax":
            run_tpu_mt(args.root, args.seed, args.steps_per_epoch, out,
                       compute_dtype=args.compute_dtype)
        else:
            run_tpu(args.root, args.loss, args.seed, args.steps_per_epoch,
                    out, compute_dtype=args.compute_dtype)
    return 0


if __name__ == "__main__":
    sys.exit(main())
