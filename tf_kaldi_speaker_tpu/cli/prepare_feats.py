"""Training-egs feature prep: sliding CMVN + silence removal → compressed arks.

Replaces the reference's local/nnet3/xvector/prepare_feats_for_egs.sh
(run.sh:135: apply-cmvn-sliding + select-voiced-frames + copy-feats
--compress). With --keep-silence it mirrors
scripts/prepare_feats_for_multitask_egs.sh (CMVN but NO frame dropping, so
alignments stay frame-aligned). With --no-cmvn it mirrors
scripts/prepare_bnfeats_for_egs.sh (bottleneck features: silence removal
only — BNFs come out of a network that saw CMVN'd inputs already).

Usage:
    python -m tf_kaldi_speaker_tpu.cli.prepare_feats [--cmn-window 300] \
        [--keep-silence] [--no-cmvn] data_dir out_dir
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys

from ..kio import ark, read_mat_scp, read_vec_flt_scp
from ..ops.cmvn import sliding_cmvn
from ..ops.vad import select_voiced_frames


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--cmn-window", type=int, default=300)
    parser.add_argument("--keep-silence", action="store_true")
    parser.add_argument("--no-cmvn", action="store_true",
                        help="skip sliding CMVN (bottleneck-feature prep)")
    parser.add_argument("--no-compress", action="store_true")
    parser.add_argument("data_dir")
    parser.add_argument("out_dir")
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    vad = {}
    if not args.keep_silence:
        vad = dict(read_vec_flt_scp(os.path.join(args.data_dir, "vad.scp")))

    ark_path = os.path.join(args.out_dir, "feats.ark")
    scp_lines, u2nf = [], []
    count = skipped = 0
    with open(ark_path, "wb") as f:
        for utt, feats in read_mat_scp(os.path.join(args.data_dir, "feats.scp")):
            if not args.no_cmvn:
                feats = sliding_cmvn(feats, window=args.cmn_window)
            if not args.keep_silence:
                if utt not in vad:
                    skipped += 1
                    continue
                feats = select_voiced_frames(feats, vad[utt])
                if feats.shape[0] == 0:
                    skipped += 1
                    continue
            pos = f.tell() + len(utt) + 1
            ark.write_mat(f, feats, key=utt, compress=not args.no_compress)
            scp_lines.append("%s %s:%d" % (utt, ark_path, pos))
            u2nf.append("%s %d" % (utt, feats.shape[0]))
            count += 1
    with open(os.path.join(args.out_dir, "feats.scp"), "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    with open(os.path.join(args.out_dir, "utt2num_frames"), "w") as f:
        f.write("\n".join(u2nf) + "\n")
    # carry over speaker maps
    for name in ("spk2utt", "utt2spk"):
        src = os.path.join(args.data_dir, name)
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(args.out_dir, name))
    logging.info("Prepared %d utterances (%d skipped).", count, skipped)
    return 0


if __name__ == "__main__":
    sys.exit(main())
