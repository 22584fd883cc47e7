"""Scoring CLI e2e: cosine and PLDA backends on synthetic embeddings."""

import os

import numpy as np

from tf_kaldi_speaker_tpu.cli import score as score_cli
from tf_kaldi_speaker_tpu.kio import write_vec_flt


def write_xvectors(path_prefix, embs):
    ark = path_prefix + ".ark"
    scp = path_prefix + ".scp"
    with open(ark, "wb") as fa, open(scp, "w") as fs:
        for k, v in embs.items():
            pos = fa.tell() + len(k) + 1
            write_vec_flt(fa, v.astype(np.float32), key=k)
            fs.write("%s %s:%d\n" % (k, ark, pos))
    return scp


def make_embeddings(rng, n_spk=12, per=6, dim=24):
    means = rng.randn(n_spk, dim) * 3
    out, utt2spk = {}, {}
    for s in range(n_spk):
        for u in range(per):
            key = "spk%02d_u%d" % (s, u)
            out[key] = means[s] + rng.randn(dim) * 0.8
            utt2spk[key] = "spk%02d" % s
    return out, utt2spk


def test_score_cli_cosine_and_plda(tmp_path, capsys):
    rng = np.random.RandomState(0)
    train, train_u2s = make_embeddings(rng, n_spk=20, per=8)
    evalset, eval_u2s = make_embeddings(np.random.RandomState(1), n_spk=8, per=6)

    # enroll = first 3 utts; test = last 3
    enroll = {k: v for k, v in evalset.items() if int(k[-1]) < 3}
    test = {k: v for k, v in evalset.items() if int(k[-1]) >= 3}
    train_scp = write_xvectors(str(tmp_path / "train"), train)
    enroll_scp = write_xvectors(str(tmp_path / "enroll"), enroll)
    test_scp = write_xvectors(str(tmp_path / "test"), test)
    with open(str(tmp_path / "train_u2s"), "w") as f:
        for k, s in train_u2s.items():
            f.write("%s %s\n" % (k, s))
    with open(str(tmp_path / "enroll_u2s"), "w") as f:
        for k in enroll:
            f.write("%s %s\n" % (k, eval_u2s[k]))

    trials_path = str(tmp_path / "trials")
    spks = sorted({eval_u2s[k] for k in enroll})
    with open(trials_path, "w") as f:
        for s in spks:
            for t in sorted(test):
                f.write("%s %s %s\n" % (s, t, "target" if eval_u2s[t] == s else "nontarget"))

    rc = score_cli.main([
        "--backend", "cosine",
        "--enroll-scp", enroll_scp, "--enroll-utt2spk", str(tmp_path / "enroll_u2s"),
        "--test-scp", test_scp, "--trials", trials_path,
        "--scores", str(tmp_path / "cos.scores"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    eer_cos = float(out.split("EER: ")[1].split("%")[0])
    assert eer_cos < 20.0
    assert os.path.exists(str(tmp_path / "cos.scores"))

    rc = score_cli.main([
        "--backend", "plda",
        "--enroll-scp", enroll_scp, "--enroll-utt2spk", str(tmp_path / "enroll_u2s"),
        "--test-scp", test_scp, "--trials", trials_path,
        "--train-scp", train_scp, "--train-utt2spk", str(tmp_path / "train_u2s"),
        "--lda-dim", "16",
        "--scores", str(tmp_path / "plda.scores"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    eer_plda = float(out.split("EER: ")[1].split("%")[0])
    assert eer_plda < 20.0
