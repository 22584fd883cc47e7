"""Per-frame phone (bottleneck) embedding extraction from the multitask model.

Behavioral spec: reference egs/voxceleb/v1/nnet/lib/extract_mt_phone.py
(fully commented out upstream — provided working here): dump a chosen phone
endpoint per frame as a matrix ark.

Usage:
    python -m tf_kaldi_speaker_tpu.cli.extract_mt_phone model_dir rspecifier wspecifier
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

from ..kio import open_or_fd, read_mat_rspec, write_mat
from .extract_mt import load_mt_trainer


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--chunk-size", type=int, default=10000)
    parser.add_argument("model_dir")
    parser.add_argument("rspecifier")
    parser.add_argument("wspecifier")
    args = parser.parse_args(argv)

    trainer = load_mt_trainer(args.model_dir)
    fp_out = open_or_fd(args.wspecifier, "wb")
    count = 0
    for key, feature in read_mat_rspec(args.rspecifier):
        if feature.shape[0] > args.chunk_size:
            logging.info("Key %s too long (%d), skip.", key, feature.shape[0])
            continue
        # phone log-posteriors serve as frame-level phonetic features
        mat = trainer.predict_phone(feature.astype(np.float32))
        write_mat(fp_out, mat.astype(np.float32), key=key)
        count += 1
    fp_out.close()
    logging.info("Extracted %d phone matrices.", count)
    return 0


if __name__ == "__main__":
    sys.exit(main())
