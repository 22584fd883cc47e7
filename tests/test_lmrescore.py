"""ARPA reader + lattice LM rescoring (lmrescore_const_arpa.sh parity).

Oracles: hand-computed backoff scores on a tiny trigram ARPA, and a
path-enumeration rescorer (score each word sequence directly with
sentence_cost) that the composed lattice must match exactly."""

import math
import random

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.backend.arpa import LN10, ArpaLm
from tf_kaldi_speaker_tpu.backend.lattice import (
    Lattice,
    LatticeArc,
    determinize_lattice,
    read_lattice_ark,
)
from tf_kaldi_speaker_tpu.backend.lmrescore import lmrescore_compact

TINY_ARPA = """\
\\data\\
ngram 1=6
ngram 2=5
ngram 3=2

\\1-grams:
-99\t<s>\t-0.30103
-0.69897\t</s>
-0.52288\ta\t-0.39794
-0.69897\tb\t-0.30103
-1.00000\tc\t-0.17609
-1.30103\t<unk>

\\2-grams:
-0.30103\t<s> a\t-0.10000
-0.39794\ta b\t-0.20000
-0.52288\tb c
-0.69897\tb </s>
-0.52288\tc </s>

\\3-grams:
-0.17609\t<s> a b
-0.30103\ta b c

\\end\\
"""


@pytest.fixture()
def lm(tmp_path):
    p = tmp_path / "tiny.arpa"
    p.write_text(TINY_ARPA)
    return ArpaLm.load(str(p))


def l10(x):
    return x * LN10


def test_arpa_direct_hits(lm):
    assert lm.order == 3
    # direct bigram: p(a|<s>) = -0.30103
    np.testing.assert_allclose(lm.logp(("<s>",), "a"), l10(-0.30103), rtol=1e-6)
    # direct trigram: p(b|<s> a)
    np.testing.assert_allclose(lm.logp(("<s>", "a"), "b"), l10(-0.17609), rtol=1e-6)
    np.testing.assert_allclose(lm.logp(("a", "b"), "c"), l10(-0.30103), rtol=1e-6)


def test_arpa_backoff_chain(lm):
    # p(c | <s> a): no trigram "<s> a c" -> bo(<s> a) + p(c | a);
    # no bigram "a c" -> bo(<s> a) + bo(a) + p(c)
    want = l10(-0.10000) + l10(-0.39794) + l10(-1.00000)
    np.testing.assert_allclose(lm.logp(("<s>", "a"), "c"), want, rtol=1e-6)
    # p(a | b): no bigram "b a" -> bo(b) + p(a)
    want = l10(-0.30103) + l10(-0.52288)
    np.testing.assert_allclose(lm.logp(("b",), "a"), want, rtol=1e-6)


def test_arpa_oov_uses_unk(lm):
    np.testing.assert_allclose(
        lm.logp((), "zzz"), lm.logp((), "<unk>"), rtol=1e-6)


def test_arpa_state_truncation(lm):
    # "c" is not a context of any n-gram ("c </s>" makes ("c",) a context)
    # -> after scoring c from (a b), state is the longest valid suffix.
    cost, st = lm.score(("a", "b"), "c")
    assert st == ("b", "c") or st == ("c",)
    # ("b", "c") extends no trigram, so it must truncate to ("c",)
    assert st == ("c",)
    # start state
    assert lm.start_state() == ("<s>",)


def test_arpa_sentence_cost_is_sum(lm):
    # -ln P(a b </s>) by the chain rule: P(a|<s>) and P(b|<s> a) are direct
    # hits; P(</s>|a b) has no trigram "a b </s>", so it backs off through
    # bo(a b) = -0.2 to the bigram "b </s>".
    want = -(l10(-0.30103) + l10(-0.17609) + (l10(-0.2) + l10(-0.69897)))
    np.testing.assert_allclose(lm.sentence_cost(["a", "b"]), want, rtol=1e-6)


def word_lattice(word_seqs, costs):
    """Build a small raw lattice holding the given word sequences."""
    arcs = []
    n = 1
    finals = {}
    for seq, (g, ac) in zip(word_seqs, costs):
        prev = 0
        for i, w in enumerate(seq):
            arcs.append(LatticeArc(prev, n, i + 1, w,
                                   g if i == 0 else 0.0,
                                   ac if i == 0 else 0.0))
            prev = n
            n += 1
        finals[prev] = (0.0, 0.0)
    return Lattice(num_states=n, arcs=arcs, finals=finals, start=0)


ID2WORD = {1: "a", 2: "b", 3: "c"}


def test_lmrescore_matches_path_oracle(lm):
    lat = word_lattice(
        [(1, 2), (1, 2, 3), (2, 3), (3,)],
        [(1.0, 2.0), (0.5, 1.0), (2.0, 0.2), (0.1, 0.1)],
    )
    clat = determinize_lattice(lat)
    before = {w: (g, ac) for w, _, g, ac in clat.paths()}

    res = lmrescore_compact(clat, ID2WORD, new_lm=lm, old_lm=None)
    after = {w: (g, ac) for w, _, g, ac in res.paths()}
    assert set(after) == set(before)
    for words, (g, ac) in after.items():
        lm_cost = lm.sentence_cost([ID2WORD[w] for w in words])
        np.testing.assert_allclose(g, before[words][0] + lm_cost, rtol=1e-6,
                                   err_msg="graph cost for %r" % (words,))
        np.testing.assert_allclose(ac, before[words][1], rtol=1e-6)


def test_lmrescore_replace_old_with_new(lm, tmp_path):
    """old_scale=-1/new_scale=+1: a lattice whose graph costs INCLUDE the
    old LM ends up carrying exactly the new LM's scores."""
    old = lm
    # new LM = uniform bigram-less model over the same vocab
    new_arpa = """\\data\\
ngram 1=5

\\1-grams:
-99\t<s>
-0.60206\t</s>
-0.60206\ta
-0.60206\tb
-0.60206\tc

\\end\\
"""
    p = tmp_path / "new.arpa"
    p.write_text(new_arpa)
    new = ArpaLm.load(str(p))

    base = word_lattice([(1, 2), (2, 3)], [(0.0, 1.0), (0.0, 2.0)])
    clat = determinize_lattice(base)
    # bake the old LM in (like a decode through G_old):
    with_old = lmrescore_compact(clat, ID2WORD, new_lm=old, old_lm=None)
    # replace old by new:
    replaced = lmrescore_compact(with_old, ID2WORD, new_lm=new, old_lm=old)
    for words, _, g, ac in replaced.paths():
        want = new.sentence_cost([ID2WORD[w] for w in words])
        np.testing.assert_allclose(g, want, rtol=1e-6, atol=1e-9)


def test_lmrescore_changes_best_path(lm):
    """The LM can flip the winner: acoustically-worse 'a b' beats 'c'
    after adding a LM that strongly prefers it."""
    lat = word_lattice([(1, 2), (3,)], [(0.0, 1.0), (0.0, 0.6)])
    clat = determinize_lattice(lat)
    w0, _, _ = clat.best_path()
    assert w0 == [3]
    res = lmrescore_compact(clat, ID2WORD, new_lm=lm, old_lm=None)
    # P(a b </s>) ~ 10^-1.176 vs P(c </s>) ~ 10^-1.523: 'a b' wins now
    w1, _, _ = res.best_path()
    assert w1 == [1, 2]


def test_lmrescore_cli_roundtrip(lm, tmp_path):
    from tf_kaldi_speaker_tpu.backend.lattice import write_lattice
    from tf_kaldi_speaker_tpu.cli import lmrescore as cli

    lat = word_lattice([(1, 2), (2, 3)], [(0.3, 1.0), (0.7, 2.0)])
    lat_in = str(tmp_path / "in.txt")
    with open(lat_in, "w") as f:
        write_lattice(f, lat, "utt1")
    words_txt = str(tmp_path / "words.txt")
    with open(words_txt, "w") as f:
        f.write("<eps> 0\na 1\nb 2\nc 3\n")
    arpa = str(tmp_path / "tiny.arpa")
    with open(arpa, "w") as f:
        f.write(TINY_ARPA)

    lat_out = str(tmp_path / "out.txt")
    rc = cli.main([
        "--word-symbol-table", words_txt,
        "--new-arpa", arpa, "--acoustic-scale", "1.0",
        lat_in, lat_out,
    ])
    assert rc == 0
    (key, back), = list(read_lattice_ark(lat_out))
    assert key == "utt1"
    words, align, cost = back.best_path()
    # oracle: min over the two sequences of raw (graph+acoustic) + LM cost
    cands = {
        (1, 2): 0.3 + 1.0 + lm.sentence_cost(["a", "b"]),
        (2, 3): 0.7 + 2.0 + lm.sentence_cost(["b", "c"]),
    }
    best_seq = min(cands, key=cands.get)
    np.testing.assert_allclose(cost, cands[best_seq], rtol=1e-6)
    assert tuple(words) == best_seq


PRUNED_ARPA = """\
\\data\\
ngram 1=5
ngram 2=4
ngram 3=1

\\1-grams:
-99\t<s>\t-0.30103
-0.69897\t</s>
-0.52288\ta\t-0.39794
-0.69897\tb\t-0.30103
-1.00000\tc\t-0.17609

\\2-grams:
-0.30103\t<s> a\t-0.10000
-0.39794\ta b\t-0.20000
-0.52288\tb c\t-0.25000
-0.52288\tc </s>

\\3-grams:
-0.17609\t<s> a b

\\end\\
"""


def test_arpa_pruned_backoff_state_kept(tmp_path):
    """Pruned-LM regression: bigram 'b c' has a backoff weight but NO
    trigram continuations (SRILM/KenLM pruning produces this shape). The
    LM state after 'b c' must be kept — truncating it to ('c',) silently
    drops bo(b c) from every following word (Kaldi ConstArpaLm keeps
    states for n-grams with nonzero backoff)."""
    p = tmp_path / "pruned.arpa"
    p.write_text(PRUNED_ARPA)
    lm = ArpaLm.load(str(p))

    _, st = lm.score(("b",), "c")
    assert st == ("b", "c")

    # P(</s> | b c): no trigram 'b c </s>' -> bo(b c) + P(</s> | c)
    want = l10(-0.25) + l10(-0.52288)
    np.testing.assert_allclose(lm.logp(("b", "c"), "</s>"), want, rtol=1e-6)
    np.testing.assert_allclose(lm.final_cost(("b", "c")), -want, rtol=1e-6)

    # Full walk: -ln P(a b c </s> | <s>) with every backoff applied.
    want_total = -(
        l10(-0.30103)                      # P(a | <s>) direct bigram
        + l10(-0.17609)                    # P(b | <s> a) direct trigram
        + (l10(-0.2) + l10(-0.52288))      # P(c | a b): bo(a b) + P(c | b)
        + (l10(-0.25) + l10(-0.52288))     # P(</s> | b c): bo(b c) + P(</s>|c)
    )
    np.testing.assert_allclose(lm.sentence_cost(["a", "b", "c"]), want_total,
                               rtol=1e-6)
