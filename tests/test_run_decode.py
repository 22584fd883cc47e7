"""Recipe-level ASR decode: run_decode.sh end-to-end with the NATIVE stack.

Drives the actual `recipes/fisher/v3_multitask/run_decode.sh` (the
reference nnet/run_decode.sh equivalent) on a freshly-trained multitask
model with NO Kaldi binaries on the box: checkpoint pin -> senone prior
from pdf.ark -> compute_loglike -> native WFST decode_faster -> WER
against $data/text. Asserts the full chain of artifacts."""

import json
import os
import subprocess

import numpy as np

from test_multitask import MT_CFG, NUM_PHONES
from tf_kaldi_speaker_tpu.kio import read_mat_ark, read_vec_int_ark
from tf_kaldi_speaker_tpu.kio.fst import build_fst, write_fst
from tf_kaldi_speaker_tpu.kio.transition_model import (
    TransitionModel,
    write_transition_model,
)
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _one_state_model(num_pdfs):
    """1 emitting state per phone, pdf p-1 for phone p: num_pdfs senones,
    2 tids per phone (self-loop, forward)."""
    entries = [[(0, 0, [(0, 0.5), (1, 0.5)]), (-1, -1, [])]]
    phones = list(range(1, num_pdfs + 1))
    phone2idx = [-1] + [0] * num_pdfs
    tuples = [(p, 0, p - 1, p - 1) for p in phones]
    return TransitionModel(
        phones, phone2idx, entries, tuples,
        np.zeros(1 + 2 * num_pdfs, np.float32),
    )


def _phone_loop_graph(tm, num_words):
    arcs, state = [], 1
    for w in range(1, num_words + 1):
        self_tid = tm.state2id[w]       # transitions[0] is the self-loop
        fwd_tid = self_tid + 1
        s = state
        state += 1
        arcs.append((0, fwd_tid, w, 0.3, s))
        arcs.append((s, self_tid, 0, 0.05, s))
        arcs.append((s, 0, 0, 0.0, 0))
    return build_fst(0, state, arcs, {0: 0.0})


def test_run_decode_sh_native(tmp_path):
    from tf_kaldi_speaker_tpu.cli import train_mt

    train_d = make_fake_data_dir(
        str(tmp_path / "train"), num_speakers=4, utts_per_speaker=3, dim=20,
        min_len=120, max_len=160, with_vad_ali=True, num_phones=NUM_PHONES,
        seed=0,
    )
    valid_d = make_fake_data_dir(
        str(tmp_path / "valid"), num_speakers=4, utts_per_speaker=2, dim=20,
        min_len=120, max_len=160, with_vad_ali=True, num_phones=NUM_PHONES,
        seed=1,
    )
    cfg = dict(MT_CFG, num_epochs=1)
    cfg_path = str(tmp_path / "mt.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    model_dir = str(tmp_path / "exp")
    assert train_mt.main([
        "--config", cfg_path,
        train_d["data"], train_d["ali_dir"], train_d["spklist"],
        valid_d["data"], valid_d["ali_dir"], valid_d["spklist"],
        model_dir,
    ]) == 0

    # graph dir (HCLG + words.txt) over a transition model whose pdf count
    # matches the phone head; final.mdl one level above, Kaldi-style.
    tm = _one_state_model(NUM_PHONES)
    graph_dir = tmp_path / "lang" / "graph"
    os.makedirs(graph_dir)
    write_fst(str(graph_dir / "HCLG.fst"), _phone_loop_graph(tm, NUM_PHONES),
              "const")
    with open(graph_dir / "words.txt", "w") as f:
        f.write("<eps> 0\n")
        for w in range(1, NUM_PHONES + 1):
            f.write("p%d %d\n" % (w, w))
    write_transition_model(str(tmp_path / "lang" / "final.mdl"), tm)

    # reference transcripts for the WER stage (arbitrary words)
    utts = [k for k, _ in read_mat_ark(
        os.path.join(valid_d["data"], "feats.ark"))]
    with open(os.path.join(valid_d["data"], "text"), "w") as f:
        for u in utts:
            f.write("%s p1 p2\n" % u)

    env = dict(os.environ, PYTHONPATH=REPO, checkpoint="last",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "recipes/fisher/v3_multitask/run_decode.sh"),
         model_dir, train_d["ali_dir"], str(graph_dir), valid_d["data"]],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    out = os.path.join(model_dir, "decode_" + os.path.basename(valid_d["data"]))
    assert os.path.exists(os.path.join(out, "loglike.ark"))
    lls = dict(read_mat_ark(os.path.join(out, "loglike.ark")))
    assert all(m.shape[1] == NUM_PHONES for m in lls.values())

    words = dict(read_vec_int_ark(os.path.join(out, "words.ark")))
    assert set(words) == set(utts)
    for v in words.values():
        assert np.all(v >= 1) and np.all(v <= NUM_PHONES)
    ali = dict(read_vec_int_ark(os.path.join(out, "ali.ark")))
    for u in utts:
        assert len(ali[u]) == lls[u].shape[0]  # one tid per frame

    with open(os.path.join(out, "text")) as f:
        hyp = {line.split()[0] for line in f if line.strip()}
    assert hyp == set(utts)
    with open(os.path.join(out, "wer")) as f:
        wer_line = f.readline()
    assert wer_line.startswith("%WER")

    # lattice artifacts: archive readable, best-path sweep ran
    from tf_kaldi_speaker_tpu.backend.lattice import read_lattice_ark

    lats = dict(read_lattice_ark(os.path.join(out, "lat.txt")))
    assert set(lats) == set(utts)
    for u in utts:
        w, a, c = lats[u].best_path(acoustic_scale=0.1)
        assert len(a) == lls[u].shape[0]
    with open(os.path.join(out, "wer.best")) as f:
        assert "best lmwt" in f.read()
