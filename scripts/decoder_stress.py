"""WFST decoder stress/perf validation on a realistic-scale graph.

Real HCLGs are orders of magnitude bigger than unit-test fixtures; this
builds a word-loop graph at meaningful scale (default 20k words x 3
phones x 3-state HMMs ~ 180k states / ~0.5M arcs over a 2k-senone
inventory), decodes minutes of synthetic speech, and reports throughput
(frames/sec and real-time factor at 100 fps) plus lattice-mode numbers.
Accuracy check: with clean loglikes the decoded words must equal the
synthesized sequence.

Run: python scripts/decoder_stress.py [num_words [num_frames]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_kaldi_speaker_tpu.backend.decoder import WfstDecoder, native_available
from tf_kaldi_speaker_tpu.kio.fst import build_fst, write_fst
from tf_kaldi_speaker_tpu.kio.transition_model import TransitionModel


def make_model(num_phones):
    entries = [[
        (0, 0, [(0, 0.75), (1, 0.25)]),
        (1, 1, [(1, 0.75), (2, 0.25)]),
        (2, 2, [(2, 0.75), (3, 0.25)]),
        (-1, -1, []),
    ]]
    phones = list(range(1, num_phones + 1))
    tuples = []
    pdf = 0
    for p in phones:
        for st in range(3):
            tuples.append((p, st, pdf, pdf))
            pdf += 1
    return TransitionModel(phones, [-1] + [0] * num_phones, entries, tuples,
                           np.zeros(1 + 6 * num_phones, np.float32))


def make_graph(tm, lexicon, rng):
    """Word loop; each word is a chain of its phones' 3-state HMMs with a
    random unigram cost on the entry arc."""
    arcs = []
    state = 1
    word_entries = {}
    for w, phones in enumerate(lexicon, start=1):
        prev = 0
        lm = float(rng.uniform(2.0, 8.0))
        seq = []
        for pi, p in enumerate(phones):
            for st in range(3):
                ts = (p - 1) * 3 + st + 1
                self_tid = tm.state2id[ts]
                fwd_tid = self_tid + 1
                s = state
                state += 1
                first = pi == 0 and st == 0
                arcs.append((prev, fwd_tid, w if first else 0,
                             lm if first else 0.0, s))
                arcs.append((s, self_tid, 0, 0.1, s))
                seq.append((self_tid, fwd_tid))
                prev = s
        arcs.append((prev, 0, 0, 0.0, 0))
        word_entries[w] = seq
    return build_fst(0, state, arcs, {0: 0.0}), word_entries


def main():
    num_words = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    num_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    num_phones = 660
    rng = np.random.default_rng(0)
    tm = make_model(num_phones)
    lexicon = [list(rng.integers(1, num_phones + 1, 3)) for _ in range(num_words)]
    fst, word_entries = make_graph(tm, lexicon, rng)
    print("graph: %d states, %d arcs, %d tids, %d pdfs"
          % (fst.num_states, fst.num_arcs, tm.num_transition_ids, tm.num_pdfs))
    path = "/tmp/stress_hclg.fst"
    write_fst(path, fst, "const")
    print("graph file: %.1f MB" % (os.path.getsize(path) / 1e6))

    # synthesize frames for a random word sequence (3 frames/state)
    rows, truth = [], []
    t = 0
    while t < num_frames:
        w = int(rng.integers(1, num_words + 1))
        truth.append(w)
        for self_tid, fwd_tid in word_entries[w]:
            pdf = tm.tid2pdf[fwd_tid]
            for k in range(3):
                row = np.full(tm.num_pdfs, -8.0, np.float32)
                row[pdf] = -0.5
                rows.append(row + rng.normal(0, 0.1, tm.num_pdfs).astype(np.float32))
                t += 1
    loglikes = np.stack(rows)
    print("loglikes: %d frames (%.1f s of speech at 100 fps)"
          % (len(rows), len(rows) / 100.0))

    assert native_available(), "stress test needs the native core"
    t0 = time.perf_counter()
    dec = WfstDecoder(path, tm.tid2pdf[1:], acoustic_scale=1.0, beam=13.0,
                      max_active=7000)
    print("graph load: %.2f s" % (time.perf_counter() - t0))
    assert dec._handle is not None

    t0 = time.perf_counter()
    res = dec.decode(loglikes)
    dt = time.perf_counter() - t0
    assert list(res.words) == truth, "decode mismatch (%d vs %d words)" % (
        len(res.words), len(truth))
    assert len(res.alignment) == len(rows)
    print("viterbi: %.2f s -> %.0f frames/s (RTF %.4f), %d words correct"
          % (dt, len(rows) / dt, dt / (len(rows) / 100.0), len(truth)))

    t0 = time.perf_counter()
    lat, partial = dec.decode_lattice(loglikes, lattice_beam=7.0)
    dt = time.perf_counter() - t0
    w, a, c = lat.best_path(acoustic_scale=1.0)
    assert w == truth
    print("lattice: %.2f s -> %.0f frames/s (RTF %.4f); "
          "%d states, %d arcs, partial=%s"
          % (dt, len(rows) / dt, dt / (len(rows) / 100.0), lat.num_states,
             len(lat.arcs), partial))

    # Concurrent decode through one shared decoder (per-thread native
    # contexts): split the audio into utterances, all must stay correct.
    from concurrent.futures import ThreadPoolExecutor

    n_utts = 8
    per = len(rows) // n_utts
    chunks = [loglikes[i * per:(i + 1) * per] for i in range(n_utts)]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(4) as pool:
        results = list(pool.map(dec.decode, chunks))
    dt = time.perf_counter() - t0
    got = sum(len(r.words) for r in results)
    assert all(len(r.alignment) == per for r in results)
    print("threaded (4 workers, %d utts): %.2f s -> %.0f frames/s total, "
          "%d words" % (n_utts, dt, n_utts * per / dt, got))
    print("OK")


if __name__ == "__main__":
    main()
