"""Fix a Kaldi data dir in place: the native utils/fix_data_dir.sh.

The reference recipes call Kaldi's ``utils/fix_data_dir.sh`` after every
filtering step (e.g. /root/reference/egs/fisher/v1/run.sh:42-68 calls it
three times while pruning short utterances and small speakers) to restore
the data-dir invariants:

- every per-utterance file (wav.scp, feats.scp, utt2spk, vad.scp,
  utt2num_frames, utt2dur, text) is filtered to the common utterance set,
- files are sorted by key (C locale, like Kaldi's validate_data_dir),
- spk2utt is regenerated from utt2spk,
- a ``.backup/`` subdirectory keeps the pre-fix files.

Usage:
    python -m tf_kaldi_speaker_tpu.cli.fix_data_dir data_dir
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys
from typing import Dict, List

log = logging.getLogger("tfks.fix_data_dir")

# Per-utterance tables, first field = utterance id.
UTT_FILES = (
    "wav.scp", "feats.scp", "utt2spk", "vad.scp", "utt2num_frames",
    "utt2dur", "text", "utt2lang",
)


def _read_table(path: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            parts = line.split(" ", 1)
            out[parts[0]] = parts[1] if len(parts) == 2 else ""
    return out


def fix_data_dir(data: str, backup: bool = True) -> Dict[str, int]:
    """Returns {filename: kept_count}; raises if utt2spk is missing."""
    present = [f for f in UTT_FILES if os.path.exists(os.path.join(data, f))]
    if "utt2spk" not in present:
        raise SystemExit("%s: no utt2spk — not a data dir" % data)
    tables = {f: _read_table(os.path.join(data, f)) for f in present}

    common = None
    for f, t in tables.items():
        keys = set(t)
        common = keys if common is None else (common & keys)
    assert common is not None

    if backup:
        bdir = os.path.join(data, ".backup")
        os.makedirs(bdir, exist_ok=True)
        for f in present + ["spk2utt"]:
            src = os.path.join(data, f)
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(bdir, f))

    kept: Dict[str, int] = {}
    for f, t in tables.items():
        dropped = len(t) - len(common)
        if dropped:
            log.info("%s: dropped %d/%d utterances", f, dropped, len(t))
        with open(os.path.join(data, f), "w") as fd:
            for k in sorted(common):
                fd.write("%s %s\n" % (k, t[k]) if t[k] else "%s\n" % k)
        kept[f] = len(common)

    # Regenerate spk2utt from the fixed utt2spk.
    spk2utt: Dict[str, List[str]] = {}
    for u in sorted(common):
        spk2utt.setdefault(tables["utt2spk"][u], []).append(u)
    with open(os.path.join(data, "spk2utt"), "w") as fd:
        for s in sorted(spk2utt):
            fd.write("%s %s\n" % (s, " ".join(spk2utt[s])))
    kept["spk2utt"] = len(spk2utt)
    log.info(
        "%s: %d utterances, %d speakers after fix", data, len(common),
        len(spk2utt),
    )
    return kept


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data", help="Kaldi data dir to fix in place")
    parser.add_argument("--no-backup", action="store_true",
                        help="skip the .backup/ copy")
    args = parser.parse_args(argv)
    fix_data_dir(args.data, backup=not args.no_backup)
    return 0


if __name__ == "__main__":
    sys.exit(main())
