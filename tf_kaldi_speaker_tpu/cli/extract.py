"""Embedding extraction CLI: ark/pipe in → ark of x-vectors out.

Behavioral spec: reference egs/voxceleb/v1/nnet/lib/extract.py, with the
nj-way CPU job farm replaced by one batched TPU program (SURVEY.md §7.6).
Supports on-the-fly sliding CMVN + energy-VAD frame selection (``--cmvn``,
``--vad``), replacing the reference's Kaldi feature pipe
``apply-cmvn-sliding ... | select-voiced-frames ... |``.

Usage:
    python -m tf_kaldi_speaker_tpu.cli.extract [--node tdnn6_dense] \
        [--normalize] [--cmvn] [--vad] model_dir rspecifier wspecifier
"""

from __future__ import annotations

import argparse
import logging
import sys

from ..extract.extractor import Extractor
from ..kio import read_mat_rspec
from ..kio.ark import ArkScpWriter
from ..ops.cmvn import sliding_cmvn
from ..ops.vad import compute_vad_energy, select_voiced_frames


def apply_cmvn_vad(feature, cmvn: bool, vad: bool, cmn_window: int = 300):
    """On-the-fly feature pipe in the reference's order
    (run_extract_embeddings.sh:47): sliding CMVN over ALL frames, then
    select-voiced-frames with VAD decisions computed from the RAW features
    (vad.scp is made from unnormalized MFCCs at data-prep time). Selecting
    first would change the sliding-window CMVN statistics.

    Returns the processed features ([0, D] if VAD removes everything)."""
    raw = feature
    if cmvn:
        feature = sliding_cmvn(feature, window=cmn_window)
    if vad:
        decisions = compute_vad_energy(raw)
        feature = select_voiced_frames(feature, decisions)
    return feature


def _main_device_pipe(args) -> int:
    """--device-pipe: raw CM codes in, everything else fused on device
    (extract/device_pipe.py). Utterances > chunk_size fall back to the
    host pipe + 50%-overlap (or --exact-long) long path."""
    from ..extract.device_pipe import DevicePipeExtractor
    from ..kio.ark import decode_cm_codes, read_codes_scp

    kind, _, path = args.rspecifier.partition(":")
    if kind != "scp" or not path:
        raise SystemExit(
            "--device-pipe requires an 'scp:...' rspecifier of compressed "
            "arks (feature pipes must use the host path)")
    extractor = DevicePipeExtractor(
        args.model_dir,
        cmvn=args.cmvn,
        vad=args.vad,
        cmn_window=args.cmn_window,
        node=args.node or None,
        batch_size=args.batch_size,
        chunk_size=args.chunk_size,
        min_chunk_size=args.min_chunk_size,
        normalize=args.normalize,
    )
    longs = []

    def short_stream():
        for key, codes, headers in read_codes_scp(path):
            if codes.shape[0] > args.chunk_size:
                longs.append((key, codes, headers))  # host fallback below
            else:
                yield key, codes, headers

    writer = ArkScpWriter(args.wspecifier, kind="vec")
    count = 0
    for key, embedding in extractor.embed_codes_stream(short_stream()):
        writer.write(key, embedding.astype("float32"))
        count += 1
    for key, codes, headers in longs:
        feature = apply_cmvn_vad(
            decode_cm_codes(codes, headers), args.cmvn, args.vad,
            cmn_window=args.cmn_window,
        )
        if feature.shape[0] < args.min_chunk_size:
            logging.info("Key %s length too short after pipe, skip.", key)
            continue
        if args.exact_long and feature.shape[0] > args.chunk_size:
            embedding = extractor.embed_long_exact(feature)
        else:
            embedding = extractor.embed_utterance(feature)
        writer.write(key, embedding.astype("float32"))
        count += 1
    writer.close()
    logging.info("Extracted %d embeddings.", count)
    return 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--node", default="", help="embedding node override")
    parser.add_argument("--normalize", action="store_true", help="L2-normalize output")
    parser.add_argument("--chunk-size", type=int, default=10000)
    parser.add_argument("--min-chunk-size", type=int, default=25)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--cmvn", action="store_true", help="sliding CMVN (window 300)")
    parser.add_argument("--cmn-window", type=int, default=300)
    parser.add_argument("--vad", action="store_true", help="energy VAD frame selection")
    parser.add_argument(
        "--exact-long", action="store_true",
        help="EXACT embeddings for utterances > chunk-size via streamed "
             "pooled-stats accumulation (default: reference-parity "
             "50%%-overlap chunk averaging)",
    )
    parser.add_argument(
        "--device-pipe", action="store_true",
        help="decode-on-device input path: ship raw CM codes (1 B/element) "
             "and run dequantize + CMVN + VAD + voiced-frame compaction "
             "fused on device (requires 'scp:' of compressed arks, no pipes)",
    )
    parser.add_argument("model_dir")
    parser.add_argument("rspecifier")
    parser.add_argument("wspecifier")
    args = parser.parse_args(argv)

    if args.device_pipe:
        return _main_device_pipe(args)

    extractor = Extractor(
        args.model_dir,
        node=args.node or None,
        batch_size=args.batch_size,
        chunk_size=args.chunk_size,
        min_chunk_size=args.min_chunk_size,
        normalize=args.normalize,
    )

    def stream():
        for key, feature in read_mat_rspec(args.rspecifier):
            feature = apply_cmvn_vad(
                feature, args.cmvn, args.vad, cmn_window=args.cmn_window
            )
            if feature.shape[0] == 0:
                logging.info("Key %s: no voiced frames, skip.", key)
                continue
            yield key, feature

    def embedding_stream():
        if not args.exact_long:
            yield from extractor.embed_stream(stream())
            return
        # route long utterances through the exact path, batch the rest
        def short_only():
            for key, feature in stream():
                if feature.shape[0] > args.chunk_size:
                    yield key, None, feature
                else:
                    yield key, "short", feature

        shorts = []
        for key, kind, feature in short_only():
            if kind is None:
                yield key, extractor.embed_long_exact(feature)
            else:
                shorts.append((key, feature))
        yield from extractor.embed_stream(iter(shorts))

    writer = ArkScpWriter(args.wspecifier, kind="vec")
    count = 0
    for key, embedding in embedding_stream():
        # --normalize is applied inside the Extractor (per-chunk + final L2,
        # reference extract.py:85-93) for every path including exact-long.
        writer.write(key, embedding.astype("float32"))
        count += 1
    writer.close()
    logging.info("Extracted %d embeddings.", count)
    return 0


if __name__ == "__main__":
    sys.exit(main())
