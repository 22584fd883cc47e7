"""Quality matrix on the hard synthetic benchmark (real accelerator).

VERDICT r3 items 4+5: make the repo's discriminative quality instrument
multi-seed (mean±sd, regression-gating) and quality-validate the three
training input paths against each other:

  stream      — threaded streaming loader, raw CM codes, decode-on-device
                (`device_decode`; the over-HBM-budget fallback path)
  pool        — full-resident HBM sample pool (`device_pool`)
  pool_rot    — the SAME pool with an artificially small `pool_budget_mb`,
                forcing epoch-rotated resident speaker subsets
                (data/device_pool.py:20-25 documents the distribution
                change; this measures its EER effect)

All runs share the hard corpus (600 crowded speakers, dim 12, channel
offsets; scripts/synthetic_validation.py --hard), the 6x500-step halving
schedule (6 shorter epochs instead of 3x1000 so the rotated pool's
per-epoch subsets cover every speaker), and identical extraction/scoring.

Modes:
  --paths   input-path comparison (3 paths x seeds)        [item 4]
  --losses  loss ordering with spread (3 losses x seeds)   [item 5]
  --gap     oracle-gap probes at seed 0 (longer schedule,
            wider model) to explain the EER gap to the
            frame-mean oracle                               [item 5]

Writes a markdown table per mode to docs/VALIDATION.md with --write-doc.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.synthetic_validation import (  # noqa: E402
    CFG, HARD_DIM, HARD_NSPK, make_hard_corpora,
)

EPOCH_LRS = [0.04, 0.04, 0.02, 0.02, 0.01, 0.01]  # 6x500 == 3x1000 halving

PATHS = {
    "stream": dict(device_decode=True),
    "pool": dict(device_decode=False, device_pool=True),
    # Budget-forced rotation, utterance-unit windows (the trainer default:
    # every window keeps ALL speakers resident; rotation only restricts
    # which recordings are currently staged).
    "pool_rot_utts": dict(device_decode=False, device_pool=True,
                          pool_budget_mb=8),  # ~1/3 of the ~26 MB corpus
    # Legacy speaker-partition windows (pinned explicitly now that the
    # trainer default is "utts"): each window holds 1/R of the speakers.
    "pool_rot": dict(device_decode=False, device_pool=True,
                     pool_budget_mb=8, pool_rotation_unit="speakers"),
    # 3 coverage cycles per epoch: 3x shorter window dwell (finer corpus
    # interleaving) for 3x the staging H2D bytes.
    "pool_rot_c3": dict(device_decode=False, device_pool=True,
                        pool_budget_mb=8, pool_rotation_unit="speakers",
                        pool_rotation_cycles=3),
    # VERDICT r4 item 1: the EXACT flagship arm bench.py measures —
    # bfloat16 activations (__graft_entry__.FLAGSHIP compute_dtype) on the
    # pool path. Quality-validates the program whose throughput is the
    # headline: bf16 BN statistics + loss logits must not move EER outside
    # the f32 multi-seed band.
    "pool_bf16": dict(device_decode=False, device_pool=True,
                      compute_dtype="bfloat16"),
}

LOSSES = {
    "softmax": dict(loss_func="softmax"),
    "amsoftmax_m0.2": dict(loss_func="additive_margin_softmax"),
    "amsoftmax_m0.2_mhe0.01": dict(
        loss_func="additive_margin_softmax",
        aux_loss_func=["mhe_loss"], mhe_lambda=0.01),
}


def train_and_eer(root, train_d, test_d, name, seed, over,
                  epoch_lrs=EPOCH_LRS, steps_per_epoch=500, width=None):
    from tf_kaldi_speaker_tpu.backend import compute_cos_pairwise_eer
    from tf_kaldi_speaker_tpu.extract.extractor import Extractor
    from tf_kaldi_speaker_tpu.kio import read_mat_scp
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    cfg = dict(CFG, num_steps_per_epoch=steps_per_epoch, seed=seed,
               num_parallel_datasets=1, **over)
    if width:
        cfg.update(tdnn_layer_size=width, num_nodes_pooling_layer=2 * width)
    params = ParamsPlain(**cfg)
    exp = os.path.join(root, "exp_%s_s%d" % (name, seed))
    nnet = os.path.join(exp, "nnet")
    trainer = Trainer(params, nnet, dim=HARD_DIM, num_speakers=HARD_NSPK)
    trainer.build("train", HARD_DIM, cfg["loss_func"], HARD_NSPK)
    t0 = time.time()
    for lr in epoch_lrs:
        trainer.train(train_d["data"], train_d["spklist"], lr)
    dt = time.time() - t0
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
    eer = float(compute_cos_pairwise_eer(E - E.mean(0), labels))
    print("  %s seed %d: EER %.2f%% (train %.0fs)"
          % (name, seed, eer * 100, dt), flush=True)
    return eer


def fmt_mean_sd(vals):
    a = np.asarray(vals)
    return "%.2f%% ± %.2f%%" % (a.mean() * 100, a.std(ddof=1) * 100)


def run_paths(root, train_d, test_d, seeds, results, only=None):
    for name, over in PATHS.items():
        if only and name not in only:
            continue
        results.setdefault("paths", {})[name] = [
            train_and_eer(root, train_d, test_d, "path_" + name, s, over)
            for s in seeds
        ]


def run_losses(root, train_d, test_d, seeds, results):
    for name, over in LOSSES.items():
        o = dict(over, device_decode=False, device_pool=True)
        results.setdefault("losses", {})[name] = [
            train_and_eer(root, train_d, test_d, "loss_" + name, s, o)
            for s in seeds
        ]


def run_gap(root, train_d, test_d, results):
    """Oracle-gap probes (seed 0, pool path, am-softmax)."""
    base = dict(device_decode=False, device_pool=True)
    probes = {
        "baseline_6x500": dict(kw={}, over=base),
        "longer_12x500": dict(
            kw=dict(epoch_lrs=[0.04] * 4 + [0.02] * 4 + [0.01] * 4),
            over=base),
        "wider_256": dict(kw=dict(width=256), over=base),
        "longer_and_wider": dict(
            kw=dict(epoch_lrs=[0.04] * 4 + [0.02] * 4 + [0.01] * 4,
                    width=256),
            over=base),
    }
    for name, spec in probes.items():
        results.setdefault("gap", {})[name] = [
            train_and_eer(root, train_d, test_d, "gap_" + name, 0,
                          spec["over"], **spec["kw"])
        ]


def oracle_eer(test_d):
    from tf_kaldi_speaker_tpu.backend import compute_cos_pairwise_eer
    from tf_kaldi_speaker_tpu.kio import read_mat_scp

    keys, means = [], []
    for k, m in read_mat_scp(os.path.join(test_d["data"], "feats.scp")):
        keys.append(k)
        means.append(m.mean(0))
    return float(compute_cos_pairwise_eer(
        np.stack(means), np.array([int(k[3:7]) for k in keys])))


def report(results, oracle, seeds, write_doc):
    lines = ["", "## Quality matrix (hard benchmark, multi-seed)", "",
             "`python scripts/quality_matrix.py` — %d seeds, 6x500-step" %
             len(seeds),
             "halving schedule, oracle frame-mean EER %.2f%%."
             % (oracle * 100), ""]
    if "paths" in results:
        lines += ["### Input-path equivalence (am-softmax m=0.2)", "",
                  "| Input path | held-out EER (mean ± sd) | seeds |",
                  "|---|---|---|"]
        for name, eers in results["paths"].items():
            lines.append("| %s | %s | %s |" % (
                name, fmt_mean_sd(eers),
                " ".join("%.2f" % (e * 100) for e in eers)))
        lines.append("")
    if "losses" in results:
        lines += ["### Loss ordering with spread (pool path)", "",
                  "| Loss | held-out EER (mean ± sd) | seeds |",
                  "|---|---|---|"]
        for name, eers in results["losses"].items():
            lines.append("| %s | %s | %s |" % (
                name, fmt_mean_sd(eers),
                " ".join("%.2f" % (e * 100) for e in eers)))
        sm = np.array(results["losses"]["softmax"])
        am = np.array(results["losses"]["amsoftmax_m0.2"])
        lines.append("")
        lines.append(
            "Margin-beats-softmax: **%s** (softmax %s vs am-softmax %s)" % (
                "PASS" if am.mean() < sm.mean() else "FAIL",
                fmt_mean_sd(sm), fmt_mean_sd(am)))
        lines.append("")
    if "gap" in results:
        lines += ["### Oracle-gap probes (seed 0, am-softmax)", "",
                  "| Variant | held-out EER |", "|---|---|"]
        for name, eers in results["gap"].items():
            lines.append("| %s | %.2f%% |" % (name, eers[0] * 100))
        lines.append("")
    text = "\n".join(lines)
    print(text, flush=True)
    if write_doc:
        with open(os.path.join(REPO, "docs", "VALIDATION.md"), "a") as f:
            f.write(text + "\n")
        print("appended to docs/VALIDATION.md", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--paths", action="store_true")
    p.add_argument("--losses", action="store_true")
    p.add_argument("--gap", action="store_true")
    p.add_argument("--seeds", type=int, default=3,
                   help="seeds for --paths (the loss table uses --seeds-losses)")
    p.add_argument("--seeds-losses", type=int, default=5)
    p.add_argument("--root", default=None)
    p.add_argument("--only", default=None,
                   help="comma-separated PATHS subset for --paths "
                        "(e.g. pool,pool_bf16)")
    p.add_argument("--write-doc", action="store_true")
    args = p.parse_args()
    if not (args.paths or args.losses or args.gap):
        args.paths = args.losses = args.gap = True

    root = args.root or tempfile.mkdtemp(prefix="tfks_qmatrix_")
    print("root:", root, flush=True)
    t0 = time.time()
    train_d, test_d = make_hard_corpora(root)
    print("data gen: %.0fs" % (time.time() - t0), flush=True)
    oracle = oracle_eer(test_d)
    print("oracle EER %.2f%%" % (oracle * 100), flush=True)

    results = {}
    if args.paths:
        run_paths(root, train_d, test_d, list(range(args.seeds)), results,
                  only=set(args.only.split(",")) if args.only else None)
    if args.losses:
        run_losses(root, train_d, test_d, list(range(args.seeds_losses)),
                   results)
    if args.gap:
        run_gap(root, train_d, test_d, results)
    with open(os.path.join(root, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    report(results, oracle, list(range(args.seeds)), args.write_doc)


if __name__ == "__main__":
    main()
