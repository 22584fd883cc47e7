"""Offline dataset augmentation: reverb / noise / music / babble copies.

Replaces the reference's MUSAN+RIRS stage (egs/voxceleb/v1/run.sh:70-131:
reverberate_data_dir.py, augment_data_dir.py, wav-reverberate): for each
utterance make an augmented copy with a suffix (-reverb/-noise/-music/
-babble), writing new wavs + wav.scp + utt2spk.

Usage:
    python -m tf_kaldi_speaker_tpu.cli.augment_data \
        --mode noise --aug-wav-scp musan_noise/wav.scp --snr 0:5:10:15 \
        data/train/wav.scp data/train/utt2spk out_dir
    (--mode reverb uses --aug-wav-scp as RIR list, no SNR)
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

from ..data.augment import add_babble, add_noise, reverberate
from ..kio.wav import read_wav, write_wav


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["reverb", "noise", "music", "babble"], required=True)
    parser.add_argument("--aug-wav-scp", required=True, help="RIRs or noise sources")
    parser.add_argument("--snr", default="0:5:10:15", help="colon-separated SNR choices (dB)")
    parser.add_argument("--num-babble", type=int, default=4)
    parser.add_argument(
        "--num-babble-choices", default="",
        help="colon-separated babble source counts to sample from "
             "(reference --num-bg-noises 3:4:5:6:7); overrides --num-babble",
    )
    parser.add_argument(
        "--keep-frac", type=float, default=1.0,
        help="augment a random fraction of the input list (the reference "
             "subsamples the combined augmented list to ~1M of 4M, "
             "run.sh:120); applied per utterance with the CLI seed",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("wav_scp")
    parser.add_argument("utt2spk")
    parser.add_argument("out_dir")
    args = parser.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    snrs = [float(s) for s in args.snr.split(":") if s]
    suffix = "-" + args.mode

    aug_entries = []
    with open(args.aug_wav_scp) as f:
        for line in f:
            utt, rx = line.strip().split(" ", 1)
            aug_entries.append(rx)
    assert aug_entries, "empty --aug-wav-scp"

    utt2spk = {}
    with open(args.utt2spk) as f:
        for line in f:
            u, s = line.split()[:2]
            utt2spk[u] = s

    wav_dir = os.path.join(args.out_dir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    scp_lines, u2s_lines = [], []
    count = 0
    babble_counts = [int(x) for x in args.num_babble_choices.split(":") if x]
    with open(args.wav_scp) as f:
        for line in f:
            utt, rx = line.strip().split(" ", 1)
            if args.keep_frac < 1.0 and rng.random_sample() >= args.keep_frac:
                continue
            sig, rate = read_wav(rx)
            if sig.ndim > 1:
                sig = sig[:, 0]
            if args.mode == "reverb":
                rir, _ = read_wav(aug_entries[rng.randint(len(aug_entries))])
                if rir.ndim > 1:
                    rir = rir[:, 0]
                out = reverberate(sig, rir)
            elif args.mode == "babble":
                srcs = []
                n_bab = (
                    int(rng.choice(babble_counts)) if babble_counts else args.num_babble
                )
                for _ in range(n_bab):
                    s, _ = read_wav(aug_entries[rng.randint(len(aug_entries))])
                    srcs.append(s[:, 0] if s.ndim > 1 else s)
                out = add_babble(sig, srcs, snr_db=float(rng.choice(snrs)), rng=rng)
            else:  # noise / music: single source at a sampled SNR
                s, _ = read_wav(aug_entries[rng.randint(len(aug_entries))])
                s = s[:, 0] if s.ndim > 1 else s
                out = add_noise(sig, s, snr_db=float(rng.choice(snrs)), rng=rng)
            new_utt = utt + suffix
            path = os.path.join(wav_dir, new_utt + ".wav")
            write_wav(path, out, rate)
            scp_lines.append("%s %s" % (new_utt, path))
            u2s_lines.append("%s %s" % (new_utt, utt2spk.get(utt, utt)))
            count += 1
    with open(os.path.join(args.out_dir, "wav.scp"), "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    with open(os.path.join(args.out_dir, "utt2spk"), "w") as f:
        f.write("\n".join(u2s_lines) + "\n")
    logging.info("Augmented %d utterances (%s).", count, args.mode)
    return 0


if __name__ == "__main__":
    sys.exit(main())
