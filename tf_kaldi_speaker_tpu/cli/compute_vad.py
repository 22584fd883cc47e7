"""Energy VAD CLI: feats.scp → vad.ark/scp.

Replaces Kaldi compute-vad / sid/compute_vad_decision.sh (reference run.sh:62).

Usage:
    python -m tf_kaldi_speaker_tpu.cli.compute_vad [--vad-energy-threshold 5.5] \
        [--vad-energy-mean-scale 0.5] feats_scp out_dir
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from ..kio import ark, read_mat_scp
from ..ops.vad import compute_vad_energy


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--vad-energy-threshold", type=float, default=5.5)
    parser.add_argument("--vad-energy-mean-scale", type=float, default=0.5)
    parser.add_argument("--vad-frames-context", type=int, default=0)
    parser.add_argument("--vad-proportion-threshold", type=float, default=0.6)
    parser.add_argument("feats_scp")
    parser.add_argument("out_dir")
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    ark_path = os.path.join(args.out_dir, "vad.ark")
    scp_lines = []
    count = 0
    with open(ark_path, "wb") as f:
        for utt, feats in read_mat_scp(args.feats_scp):
            vad = compute_vad_energy(
                feats,
                energy_threshold=args.vad_energy_threshold,
                energy_mean_scale=args.vad_energy_mean_scale,
                frames_context=args.vad_frames_context,
                proportion_threshold=args.vad_proportion_threshold,
            )
            pos = f.tell() + len(utt) + 1
            ark.write_vec_flt(f, vad, key=utt)
            scp_lines.append("%s %s:%d" % (utt, ark_path, pos))
            count += 1
    with open(os.path.join(args.out_dir, "vad.scp"), "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    logging.info("Computed VAD for %d utterances.", count)
    return 0


if __name__ == "__main__":
    sys.exit(main())
