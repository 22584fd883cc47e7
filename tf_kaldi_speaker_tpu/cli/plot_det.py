"""DET curve + operating points from a scores file.

Replaces the MATLAB DETware package (reference misc/DETware_v2.1:
Compute_DET/Plot_DET/Get_DCF/Min_DCF): writes the DET curve as
(p_miss, p_fa) text points (plot with anything) and prints EER and
minDCF08/10/12.

Usage:
    python -m tf_kaldi_speaker_tpu.cli.plot_det scores.txt trials [det_out.txt]
scores.txt lines: "enroll test score"; trials: "enroll test target|nontarget".
"""

from __future__ import annotations

import sys

import numpy as np

from ..backend import compute_eer, det_curve, min_dcf08, min_dcf10, min_dcf12


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    scores_path, trials_path = argv[0], argv[1]
    det_out = argv[2] if len(argv) > 2 else None

    labels_map = {}
    with open(trials_path) as f:
        for line in f:
            p = line.split()
            if len(p) >= 3:
                labels_map[(p[0], p[1])] = 1 if p[2] == "target" else 0
    scores, labels = [], []
    with open(scores_path) as f:
        for line in f:
            p = line.split()
            key = (p[0], p[1])
            if key in labels_map:
                scores.append(float(p[2]))
                labels.append(labels_map[key])
    scores = np.asarray(scores)
    labels = np.asarray(labels)

    if det_out:
        p_miss, p_fa = det_curve(scores, labels)
        with open(det_out, "w") as f:
            for m, a in zip(p_miss, p_fa):
                f.write("%g %g\n" % (m, a))
    eer, _ = compute_eer(scores, labels)
    print("EER: %.4f%%" % (eer * 100))
    print("minDCF08: %.4f" % min_dcf08(scores, labels))
    print("minDCF10: %.4f" % min_dcf10(scores, labels))
    print("minDCF12: %.4f" % min_dcf12(scores, labels))
    return 0


if __name__ == "__main__":
    sys.exit(main())
