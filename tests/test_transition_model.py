"""Transition-model parser + native ali-to-pdf tests.

The tid->pdf mapping is checked against a hand-derived expectation for the
standard Kaldi 3-state Bakis topology, in both binary (our writer mirrors
Kaldi's layout) and text (exact copy-transition-model --binary=false
surface syntax).
"""

import gzip
import os

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.kio.ark import read_vec_int_ark, write_vec_int
from tf_kaldi_speaker_tpu.kio.transition_model import (
    TransitionModel,
    TransitionModelError,
    read_transition_model,
    write_transition_model,
)


def _bakis_model(num_phones=2, pdfs_per_state=None):
    """Standard 3-emitting-state topology: states 0..2 (self-loop+forward),
    non-emitting final state 3. One tuple per (phone, state) with distinct
    pdfs."""
    entries = [[
        (0, 0, [(0, 0.75), (1, 0.25)]),
        (1, 1, [(1, 0.75), (2, 0.25)]),
        (2, 2, [(2, 0.75), (3, 0.25)]),
        (-1, -1, []),
    ]]
    phones = list(range(1, num_phones + 1))
    phone2idx = [-1] + [0] * num_phones
    tuples = []
    pdf = 0
    for p in phones:
        for st in range(3):
            tuples.append((p, st, pdf, pdf))
            pdf += 1
    # 2 transitions per emitting state -> 6 tids per phone
    log_probs = np.zeros(1 + 6 * num_phones, np.float32)
    return TransitionModel(phones, phone2idx, entries, tuples, log_probs)


def test_tid2pdf_hand_derived():
    tm = _bakis_model(num_phones=2)
    assert tm.num_transition_ids == 12
    assert tm.num_pdfs == 6
    # transition-state s covers tuple s-1; tids (2 per state): self-loop
    # then forward — both map to the same pdf here (fwd == self per tuple)
    expect = [0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]  # index 0 unused
    np.testing.assert_array_equal(tm.tid2pdf, expect)


def test_tid2pdf_distinct_self_loop_pdf():
    """Chain-style tuples where self-loop pdf != forward pdf must route the
    self-loop transition (dest == own state) to the self-loop pdf."""
    entries = [[(0, 1, [(0, 0.5), (1, 0.5)]), (-1, -1, [])]]
    tuples = [(1, 0, 10, 20)]  # forward pdf 10, self-loop pdf 20
    tm = TransitionModel([1], [-1, 0], entries, tuples, np.zeros(3, np.float32))
    # transitions of state 0: [(0, ...) self-loop, (1, ...) forward]
    np.testing.assert_array_equal(tm.tid2pdf, [0, 20, 10])
    assert tm.num_pdfs == 21


def test_binary_roundtrip(tmp_path):
    tm = _bakis_model(num_phones=3)
    path = str(tmp_path / "final.mdl")
    write_transition_model(path, tm)
    with open(path, "rb") as f:
        assert f.read(2) == b"\x00B"
    got = read_transition_model(path)
    np.testing.assert_array_equal(got.tid2pdf, tm.tid2pdf)
    assert got.num_pdfs == tm.num_pdfs
    assert got.tuples == tm.tuples


KALDI_TEXT_MDL = """<TransitionModel>
<Topology>
<TopologyEntry>
<ForPhones>
1 2
</ForPhones>
<State> 0 <PdfClass> 0 <Transition> 0 0.75 <Transition> 1 0.25 </State>
<State> 1 <PdfClass> 1 <Transition> 1 0.75 <Transition> 2 0.25 </State>
<State> 2 <PdfClass> 2 <Transition> 2 0.75 <Transition> 3 0.25 </State>
<State> 3 </State>
</TopologyEntry>
</Topology>
<Triples> 6
1 0 0
1 1 1
1 2 2
2 0 3
2 1 4
2 2 5
</Triples>
<LogProbs>
 [ 0 -0.2876821 -1.386294 -0.2876821 -1.386294 -0.2876821 -1.386294 -0.2876821 -1.386294 -0.2876821 -1.386294 -0.2876821 -1.386294 ]
</LogProbs>
</TransitionModel>
"""


def test_text_model_parses_like_binary(tmp_path):
    path = str(tmp_path / "text.mdl")
    with open(path, "w") as f:
        f.write(KALDI_TEXT_MDL)
    tm = read_transition_model(path)
    ref = _bakis_model(num_phones=2)
    np.testing.assert_array_equal(tm.tid2pdf, ref.tid2pdf)
    assert tm.num_pdfs == 6
    assert len(tm.log_probs) == 13


def test_out_of_range_tid_rejected():
    tm = _bakis_model()
    with pytest.raises(TransitionModelError):
        tm.ali_to_pdf(np.array([1, 99]))


def test_ali_to_pdf_cli_with_gzip_pipe(tmp_path):
    from tf_kaldi_speaker_tpu.cli.ali_to_pdf import main

    tm = _bakis_model(num_phones=2)
    mdl = str(tmp_path / "final.mdl")
    write_transition_model(mdl, tm)

    # gzipped alignment ark, read through a pipe rspecifier like the
    # reference's "ark:gunzip -c ali.*.gz |"
    rng = np.random.RandomState(0)
    raw = tmp_path / "ali.1"
    with open(raw, "wb") as f:
        for i in range(4):
            ali = rng.randint(1, tm.num_transition_ids + 1, size=50).astype(np.int32)
            write_vec_int(f, ali, key="utt%d" % i)
    with open(raw, "rb") as f, gzip.open(str(tmp_path / "ali.1.gz"), "wb") as g:
        g.write(f.read())

    out_ark = str(tmp_path / "pdf.ark")
    out_scp = str(tmp_path / "pdf.scp")
    rc = main([
        "--num-pdfs-out", str(tmp_path / "num_pdfs"),
        mdl,
        "ark:gunzip -c %s |" % (tmp_path / "ali.1.gz"),
        "ark,scp:%s,%s" % (out_ark, out_scp),
    ])
    assert rc == 0
    assert open(tmp_path / "num_pdfs").read().strip() == "6"
    pdfs = dict(read_vec_int_ark(out_ark))
    alis = dict(read_vec_int_ark(str(raw)))
    assert sorted(pdfs) == ["utt0", "utt1", "utt2", "utt3"]
    for k in pdfs:
        np.testing.assert_array_equal(pdfs[k], tm.tid2pdf[alis[k]])
    # scp offsets resolve
    lines = open(out_scp).read().strip().splitlines()
    assert len(lines) == 4
