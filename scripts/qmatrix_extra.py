"""One-off follow-ups to scripts/quality_matrix.py (same corpus root):

  --c3        the pool_rot_c3 arm (3 coverage cycles/epoch) that was added
              after the main matrix run
  --utts      the pool_rot_utts arm (utterance-unit rotation windows, the
              trainer default since round 4: every window keeps all
              speakers resident) under the same forced 8 MB budget
  --losses3k  softmax vs am-softmax at the 3x1000-step schedule, multi-seed
              (the 6x500 regime measured the ordering as a wash; this tests
              whether the schedule, not the margin, explains it)

Prints the same per-run lines as quality_matrix; numbers are merged into
docs/VALIDATION.md by hand.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.quality_matrix import fmt_mean_sd, train_and_eer  # noqa: E402
from scripts.synthetic_validation import make_hard_corpora  # noqa: E402

LRS_3K = [0.04, 0.02, 0.01]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--c3", action="store_true")
    p.add_argument("--utts", action="store_true")
    p.add_argument("--losses3k", action="store_true")
    p.add_argument("--seeds", type=int, default=3)
    args = p.parse_args()
    train_d, test_d = make_hard_corpora(args.root)  # deterministic regen
    seeds = list(range(args.seeds))

    if args.c3:
        over = dict(device_decode=False, device_pool=True,
                    pool_budget_mb=8, pool_rotation_unit="speakers",
                    pool_rotation_cycles=3)
        eers = [train_and_eer(args.root, train_d, test_d, "path_pool_rot_c3",
                              s, over) for s in seeds]
        print("pool_rot_c3: %s | %s" % (
            fmt_mean_sd(eers), " ".join("%.2f" % (e * 100) for e in eers)))

    if args.utts:
        over = dict(device_decode=False, device_pool=True, pool_budget_mb=8)
        eers = [train_and_eer(args.root, train_d, test_d,
                              "path_pool_rot_utts", s, over) for s in seeds]
        print("pool_rot_utts: %s | %s" % (
            fmt_mean_sd(eers), " ".join("%.2f" % (e * 100) for e in eers)))

    if args.losses3k:
        base = dict(device_decode=False, device_pool=True)
        for name, over in [
            ("softmax_3x1000", dict(base, loss_func="softmax")),
            ("amsoftmax_3x1000",
             dict(base, loss_func="additive_margin_softmax")),
        ]:
            eers = [
                train_and_eer(args.root, train_d, test_d, name, s, over,
                              epoch_lrs=LRS_3K, steps_per_epoch=1000)
                for s in seeds
            ]
            print("%s: %s | %s" % (
                name, fmt_mean_sd(eers),
                " ".join("%.2f" % (e * 100) for e in eers)))


if __name__ == "__main__":
    main()
