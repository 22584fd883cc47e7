"""Margin target-logit curves: psi(cos θ) per loss for tuning margins.

Replaces reference misc/tuning/target_logit_curve.py (matplotlib plots) with
a CSV dump: columns cos_theta, asoftmax_m{1,2,4}, amsoftmax_m, arcsoftmax_m.

Usage:
    python -m tf_kaldi_speaker_tpu.cli.target_logit_curve \
        [--amsoftmax-m 0.2] [--arcsoftmax-m 0.25] out.csv
"""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp
import numpy as np

from ..losses import asoftmax_phi


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--amsoftmax-m", type=float, default=0.2)
    parser.add_argument("--arcsoftmax-m", type=float, default=0.25)
    parser.add_argument("out")
    args = parser.parse_args(argv)

    cos = np.linspace(-1.0 + 1e-6, 1.0 - 1e-6, 401)
    cols = {"cos_theta": cos}
    for m in (1, 2, 4):
        cols["asoftmax_m%d" % m] = np.asarray(asoftmax_phi(jnp.asarray(cos), m))
    cols["amsoftmax_m%.2f" % args.amsoftmax_m] = cos - args.amsoftmax_m
    m = args.arcsoftmax_m
    sin = np.sqrt(np.maximum(1 - cos**2, 0))
    cosm = cos * np.cos(m) - sin * np.sin(m)
    cols["arcsoftmax_m%.2f" % m] = np.where(cos > np.cos(np.pi - m), cosm, -cosm - 2)

    names = list(cols)
    with open(args.out, "w") as f:
        f.write(",".join(names) + "\n")
        for i in range(len(cos)):
            f.write(",".join("%g" % cols[n][i] for n in names) + "\n")
    print("Wrote %s (%d rows)" % (args.out, len(cos)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
