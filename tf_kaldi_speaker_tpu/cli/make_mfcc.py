"""MFCC extraction CLI: wav.scp → feats.ark/scp + utt2num_frames.

Replaces Kaldi steps/make_mfcc.sh / compute-mfcc-feats (reference run.sh:59).

Usage:
    python -m tf_kaldi_speaker_tpu.cli.make_mfcc [--sample-rate 16000] \
        [--num-ceps 30] [--num-mel-bins 30] [--low-freq 20] [--high-freq 7600] \
        [--compress] wav_scp out_dir
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from ..kio import ark
from ..kio.wav import read_wav_scp
from ..ops.mfcc import MfccConfig, mfcc


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--sample-rate", type=int, default=16000)
    parser.add_argument("--num-ceps", type=int, default=30)
    parser.add_argument("--num-mel-bins", type=int, default=30)
    parser.add_argument("--low-freq", type=float, default=20.0)
    parser.add_argument("--high-freq", type=float, default=7600.0)
    parser.add_argument("--frame-length", type=float, default=25.0)
    parser.add_argument("--frame-shift", type=float, default=10.0)
    parser.add_argument("--dither", type=float, default=1.0)
    parser.add_argument("--compress", action="store_true")
    parser.add_argument("wav_scp")
    parser.add_argument("out_dir")
    args = parser.parse_args(argv)

    cfg = MfccConfig(
        sample_rate=args.sample_rate,
        num_ceps=args.num_ceps,
        num_mel_bins=args.num_mel_bins,
        low_freq=args.low_freq,
        high_freq=args.high_freq,
        frame_length_ms=args.frame_length,
        frame_shift_ms=args.frame_shift,
        dither=args.dither,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    ark_path = os.path.join(args.out_dir, "feats.ark")
    scp_lines, u2nf = [], []
    count = 0
    with open(ark_path, "wb") as f:
        for utt, samples, rate in read_wav_scp(args.wav_scp):
            if rate != cfg.sample_rate:
                logging.warning("%s: rate %d != %d, skip", utt, rate, cfg.sample_rate)
                continue
            if samples.ndim > 1:
                samples = samples[:, 0]
            feats = mfcc(samples, cfg, seed=count)
            if feats.shape[0] == 0:
                logging.warning("%s: too short, skip", utt)
                continue
            pos = f.tell() + len(utt) + 1
            ark.write_mat(f, feats, key=utt, compress=args.compress)
            scp_lines.append("%s %s:%d" % (utt, ark_path, pos))
            u2nf.append("%s %d" % (utt, feats.shape[0]))
            count += 1
    with open(os.path.join(args.out_dir, "feats.scp"), "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    with open(os.path.join(args.out_dir, "utt2num_frames"), "w") as f:
        f.write("\n".join(u2nf) + "\n")
    logging.info("Extracted MFCC for %d utterances.", count)
    return 0


if __name__ == "__main__":
    sys.exit(main())
