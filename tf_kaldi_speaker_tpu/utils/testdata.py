"""Synthetic Kaldi data-directory generator for tests and smoke runs.

The reference has no portable fixtures (its self-tests hard-code absolute
paths on the author's machines, SURVEY.md §4); this module generates a tiny
but complete Kaldi data dir — feats.scp/ark (compressed or not),
utt2num_frames, spk2utt, utt2spk, a spklist, and optionally vad.scp +
pdf.scp for the multitask path — so end-to-end train/extract runs anywhere.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..kio import ark


def make_fake_data_dir(
    path: str,
    num_speakers: int = 5,
    utts_per_speaker: int = 4,
    dim: int = 24,
    min_len: int = 220,
    max_len: int = 480,
    compress: bool = True,
    seed: int = 0,
    with_vad_ali: bool = False,
    num_phones: int = 10,
    ali_dir: Optional[str] = None,
    spk_offset: int = 0,
    spk_scale: float = 2.0,
    chan_scale: float = 0.0,
) -> Dict[str, str]:
    """Create a synthetic Kaldi data dir; returns important file paths.

    Features for speaker s are drawn from N(mu_s + c_u, I): a per-speaker
    mean (scaled by ``spk_scale``) plus an optional per-UTTERANCE channel
    offset (``chan_scale``). chan_scale=0 keeps the legacy fully-separable
    regime; chan_scale ~ 1.0-1.2 with spk_scale=1.0 produces an
    irreducible 5-15% cosine EER (overlapping clusters), which gives
    quality checks discriminative power — a subtly-wrong loss or BN shows
    up as a worse EER instead of everything collapsing to 0%.
    """
    rng = np.random.RandomState(seed)
    os.makedirs(path, exist_ok=True)
    ark_path = os.path.join(path, "feats.ark")
    vad_ark = os.path.join(path, "vad.ark")
    if ali_dir is None:
        ali_dir = os.path.join(path, "ali")
    if with_vad_ali:
        os.makedirs(ali_dir, exist_ok=True)
    pdf_ark = os.path.join(ali_dir, "pdf.ark")

    spk_means = rng.randn(num_speakers, dim) * spk_scale
    scp, u2nf, spk2utt, utt2spk = [], [], [], []
    vad_scp, pdf_scp = [], []
    fv = open(vad_ark, "wb") if with_vad_ali else None
    fp = open(pdf_ark, "wb") if with_vad_ali else None
    with open(ark_path, "wb") as f:
        for s in range(num_speakers):
            spk = "spk%03d" % (s + spk_offset)
            utts = []
            for u in range(utts_per_speaker):
                utt = "%s_utt%03d" % (spk, u)
                n = int(rng.randint(min_len, max_len + 1))
                chan = rng.randn(dim) * chan_scale if chan_scale else 0.0
                feats = (spk_means[s] + chan + rng.randn(n, dim)).astype(
                    np.float32)
                pos = f.tell() + len(utt) + 1
                ark.write_mat(f, feats, key=utt, compress=compress)
                scp.append("%s %s:%d" % (utt, ark_path, pos))
                u2nf.append("%s %d" % (utt, n))
                utts.append(utt)
                utt2spk.append("%s %s" % (utt, spk))
                if with_vad_ali:
                    vad = (rng.rand(n) > 0.2).astype(np.float32)
                    vpos = fv.tell() + len(utt) + 1
                    ark.write_vec_flt(fv, vad, key=utt)
                    vad_scp.append("%s %s:%d" % (utt, vad_ark, vpos))
                    pdf = rng.randint(0, num_phones, size=n).astype(np.int32)
                    ppos = fp.tell() + len(utt) + 1
                    ark.write_vec_int(fp, pdf, key=utt)
                    pdf_scp.append("%s %s:%d" % (utt, pdf_ark, ppos))
            spk2utt.append("%s %s" % (spk, " ".join(utts)))
    if fv is not None:
        fv.close()
    if fp is not None:
        fp.close()

    def _write(name, lines, where=path):
        p = os.path.join(where, name)
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        return p

    out = {
        "data": path,
        "feats_scp": _write("feats.scp", scp),
        "utt2num_frames": _write("utt2num_frames", u2nf),
        "spk2utt": _write("spk2utt", spk2utt),
        "utt2spk": _write("utt2spk", utt2spk),
        "spklist": _write(
            "spklist",
            ["spk%03d %d" % (s + spk_offset, s) for s in range(num_speakers)],
        ),
    }
    if with_vad_ali:
        out["vad_scp"] = _write("vad.scp", vad_scp)
        out["pdf_scp"] = _write("pdf.scp", pdf_scp, where=ali_dir)
        out["ali_dir"] = ali_dir
        with open(os.path.join(ali_dir, "num_pdfs"), "w") as f:
            f.write("%d\n" % num_phones)
    return out
