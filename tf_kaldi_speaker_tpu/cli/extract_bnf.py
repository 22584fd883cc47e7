"""Per-frame bottleneck-feature extraction from a trained network.

Replaces the reference's scripts/extract_bnf.sh (nnet3-compute over a Kaldi
AM): dump a FRAME-LEVEL endpoint of a trained x-vector network as [T, D]
matrices, one per input utterance — the auxiliary feature stream the
multi-input trainer consumes (reference trainer_mi.py; prepare the result
with ``cli.prepare_feats --no-cmvn`` like prepare_bnfeats_for_egs.sh).

The input is edge-tiled by the network's context on both sides before the
forward (like FeatureReaderV2's expansion / nnet3-compute's context
handling), so the output has exactly T frames aligned 1:1 with the input.

Usage:
    python -m tf_kaldi_speaker_tpu.cli.extract_bnf \
        [--node tdnn5_relu] model_dir rspecifier wspecifier
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..kio import read_mat_rspec
from ..kio.ark import write_mat
from ..models import EntireNetwork, TDNN_TOTAL_CONTEXT
from ..train import checkpoints
from ..utils.params import Params


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--node", default="tdnn5_relu",
                        help="frame-level endpoint to dump (pre-pooling)")
    parser.add_argument("--compress", action="store_true")
    parser.add_argument("model_dir")
    parser.add_argument("rspecifier")
    parser.add_argument("wspecifier")
    args = parser.parse_args(argv)

    nnet_dir = os.path.join(args.model_dir, "nnet")
    if not os.path.isdir(nnet_dir):
        nnet_dir = args.model_dir
    params = Params(os.path.join(nnet_dir, "config.json"))
    raw, step = checkpoints.load_checkpoint(nnet_dir)
    variables = jax.device_put({
        "params": raw["params"]["network"],
        "batch_stats": raw.get("batch_stats", {}).get("network", {}),
    })
    net = EntireNetwork(
        config=params.dict, network_type=params.dict.get("network_type", "tdnn")
    )
    logging.info("BNF node %s from step %d", args.node, step)
    half = TDNN_TOTAL_CONTEXT // 2

    @jax.jit
    def fwd(v, feats):
        _, ep = net.apply(v, feats, False)
        if args.node not in ep:
            raise KeyError(args.node)
        return ep[args.node]

    wspec = args.wspecifier
    head, _, rest = wspec.partition(":")
    ark_path, scp_path = rest, None
    if "scp" in head.split(","):
        ark_path, scp_path = rest.split(",", 1)

    # bucket padded lengths so jit compiles a handful of shapes
    def bucket(n):
        b = 64
        while b < n:
            b = int(b * 1.5)
        return b

    count = 0
    scp_lines = []
    with open(ark_path, "wb") as fo:
        for key, feature in read_mat_rspec(args.rspecifier):
            T, D = feature.shape
            # edge-tile the context, then zero-pad to the bucket
            tiled = np.concatenate(
                [np.tile(feature[:1], (half, 1)), feature,
                 np.tile(feature[-1:], (half, 1))], axis=0
            )
            L = bucket(tiled.shape[0])
            padded = np.zeros((1, L, D), np.float32)
            padded[0, : tiled.shape[0]] = tiled
            out = np.asarray(fwd(variables, jnp.asarray(padded)))[0]
            # VALID convs drop TDNN_TOTAL_CONTEXT frames; the tiling put
            # them back, so frames [0:T] align 1:1 with the input.
            bnf = out[:T].astype(np.float32)
            pos = fo.tell() + len(key) + 1
            write_mat(fo, bnf, key=key, compress=args.compress)
            scp_lines.append("%s %s:%d" % (key, ark_path, pos))
            count += 1
    if scp_path:
        with open(scp_path, "w") as f:
            f.write("\n".join(scp_lines) + "\n")
    logging.info("Extracted %d BNF matrices.", count)
    return 0


if __name__ == "__main__":
    sys.exit(main())
