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


def test_snorm_stats_and_formula():
    from tf_kaldi_speaker_tpu.backend.scoring import (
        adaptive_snorm,
        cosine_matrix,
        snorm_stats,
    )

    m = np.array([[1.0, 5.0, 3.0, 2.0], [0.0, -1.0, 4.0, 2.0]])
    mu, sd = snorm_stats(m, topk=2)
    np.testing.assert_allclose(mu, [4.0, 3.0])
    np.testing.assert_allclose(sd, [1.0, 1.0])
    mu_all, _ = snorm_stats(m, topk=0)
    np.testing.assert_allclose(mu_all, m.mean(axis=1))

    trials = [("e1", "t1"), ("e1", "t2")]
    raw = np.array([2.0, 0.5])
    out = adaptive_snorm(
        raw, trials,
        {"e1": (1.0, 2.0)}, {"t1": (0.0, 1.0), "t2": (0.5, 0.5)},
    )
    np.testing.assert_allclose(out, [0.5 * (0.5 + 2.0), 0.5 * (-0.25 + 0.0)])

    a = np.random.RandomState(0).randn(3, 8)
    b = np.random.RandomState(1).randn(5, 8)
    cm = cosine_matrix(a, b)
    for i in range(3):
        for j in range(5):
            expect = a[i] @ b[j] / (np.linalg.norm(a[i]) * np.linalg.norm(b[j]))
            np.testing.assert_allclose(cm[i, j], expect, rtol=1e-12)


def test_score_cli_asnorm(tmp_path, capsys):
    """AS-Norm via --cohort-scp on both backends: runs, changes the scores,
    and keeps the synthetic separable set at a sane EER."""
    rng = np.random.RandomState(3)
    train, train_u2s = make_embeddings(rng, n_spk=20, per=8)
    evalset, eval_u2s = make_embeddings(np.random.RandomState(4), n_spk=8, per=6)
    cohort, _ = make_embeddings(np.random.RandomState(5), n_spk=15, per=2)

    enroll = {k: v for k, v in evalset.items() if int(k[-1]) < 3}
    test = {k: v for k, v in evalset.items() if int(k[-1]) >= 3}
    train_scp = write_xvectors(str(tmp_path / "train"), train)
    enroll_scp = write_xvectors(str(tmp_path / "enroll"), enroll)
    test_scp = write_xvectors(str(tmp_path / "test"), test)
    cohort_scp = write_xvectors(str(tmp_path / "cohort"), cohort)
    with open(str(tmp_path / "train_u2s"), "w") as f:
        for k, s in train_u2s.items():
            f.write("%s %s\n" % (k, s))

    trials_path = str(tmp_path / "trials")
    with open(trials_path, "w") as f:
        for e in sorted(enroll):
            for t in sorted(test):
                f.write("%s %s %s\n" % (
                    e, t,
                    "target" if eval_u2s[t] == eval_u2s[e] else "nontarget"))

    def run(extra, scores_name):
        rc = score_cli.main([
            "--backend", extra[0], "--enroll-scp", enroll_scp,
            "--test-scp", test_scp, "--trials", trials_path,
            "--scores", str(tmp_path / scores_name), *extra[1:],
        ])
        assert rc == 0
        out = capsys.readouterr().out
        eer = float(out.split("EER: ")[1].split("%")[0])
        scores = np.loadtxt(str(tmp_path / scores_name), usecols=2)
        return eer, scores

    eer_raw, s_raw = run(["cosine"], "raw.scores")
    eer_norm, s_norm = run(
        ["cosine", "--cohort-scp", cohort_scp, "--snorm-topk", "10"],
        "norm.scores")
    assert not np.allclose(s_raw, s_norm)
    assert eer_norm <= eer_raw + 5.0  # sane on separable data

    plda_args = ["plda", "--train-scp", train_scp,
                 "--train-utt2spk", str(tmp_path / "train_u2s")]
    eer_p, sp = run(plda_args, "p.scores")
    eer_pn, spn = run(plda_args + ["--cohort-scp", cohort_scp,
                                   "--snorm-topk", "10"], "pn.scores")
    assert not np.allclose(sp, spn)
    assert eer_pn <= eer_p + 5.0


def test_score_cli_subset_trials(tmp_path, capsys):
    """--subset-trials reports per-subset EER/DCF (SRE16 pooled/tgl/yue
    protocol, reference eval_plda_sre16.sh) and writes per-subset scores."""
    rng = np.random.RandomState(2)
    evalset, eval_u2s = make_embeddings(rng, n_spk=6, per=6)
    enroll = {k: v for k, v in evalset.items() if int(k[-1]) < 3}
    test = {k: v for k, v in evalset.items() if int(k[-1]) >= 3}
    enroll_scp = write_xvectors(str(tmp_path / "enroll"), enroll)
    test_scp = write_xvectors(str(tmp_path / "test"), test)
    with open(str(tmp_path / "enroll_u2s"), "w") as f:
        for k in enroll:
            f.write("%s %s\n" % (k, eval_u2s[k]))

    spks = sorted({eval_u2s[k] for k in enroll})
    # "languages": first half of test utts -> tgl, second half -> yue
    tests_sorted = sorted(test)
    half = len(tests_sorted) // 2
    lang = {t: ("tgl" if i < half else "yue") for i, t in enumerate(tests_sorted)}
    all_lines, sub = [], {"tgl": [], "yue": []}
    for s in spks:
        for t in tests_sorted:
            line = "%s %s %s" % (s, t, "target" if eval_u2s[t] == s else "nontarget")
            all_lines.append(line)
            sub[lang[t]].append(line)
    with open(str(tmp_path / "trials"), "w") as f:
        f.write("\n".join(all_lines) + "\n")
    for name, lines in sub.items():
        with open(str(tmp_path / ("trials_" + name)), "w") as f:
            f.write("\n".join(lines) + "\n")

    rc = score_cli.main([
        "--backend", "cosine",
        "--enroll-scp", enroll_scp, "--enroll-utt2spk", str(tmp_path / "enroll_u2s"),
        "--test-scp", test_scp, "--trials", str(tmp_path / "trials"),
        "--subset-trials", "tgl=%s" % str(tmp_path / "trials_tgl"),
        "--subset-trials", "yue=%s" % str(tmp_path / "trials_yue"),
        "--scores", str(tmp_path / "s.scores"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[tgl] EER:" in out and "[yue] EER:" in out
    assert "[tgl] minDCF08:" in out
    # per-subset score files partition the pooled file
    pooled = open(str(tmp_path / "s.scores")).read().splitlines()
    tgl = open(str(tmp_path / "s.scores.tgl")).read().splitlines()
    yue = open(str(tmp_path / "s.scores.yue")).read().splitlines()
    assert len(tgl) + len(yue) == len(pooled)
    assert set(tgl) | set(yue) == set(pooled)


def test_score_cli_lda_cosine(tmp_path, capsys):
    """cosine --lda-dim: mean-subtract + LDA + length-norm before cosine
    (reference fisher run.sh:265-273 'LDA + Cosine scoring')."""
    rng = np.random.RandomState(5)
    train, train_u2s = make_embeddings(rng, n_spk=20, per=8)
    evalset, eval_u2s = make_embeddings(np.random.RandomState(6), n_spk=8, per=6)
    enroll = {k: v for k, v in evalset.items() if int(k[-1]) < 3}
    test = {k: v for k, v in evalset.items() if int(k[-1]) >= 3}
    train_scp = write_xvectors(str(tmp_path / "train"), train)
    enroll_scp = write_xvectors(str(tmp_path / "enroll"), enroll)
    test_scp = write_xvectors(str(tmp_path / "test"), test)
    for name, u2s in (("train_u2s", train_u2s),
                      ("enroll_u2s", {k: eval_u2s[k] for k in enroll})):
        with open(str(tmp_path / name), "w") as f:
            for k, s in u2s.items():
                f.write("%s %s\n" % (k, s))
    spks = sorted({eval_u2s[k] for k in enroll})
    with open(str(tmp_path / "trials"), "w") as f:
        for s in spks:
            for t in sorted(test):
                f.write("%s %s %s\n"
                        % (s, t, "target" if eval_u2s[t] == s else "nontarget"))
    rc = score_cli.main([
        "--backend", "cosine", "--lda-dim", "12",
        "--enroll-scp", enroll_scp,
        "--enroll-utt2spk", str(tmp_path / "enroll_u2s"),
        "--test-scp", test_scp, "--trials", str(tmp_path / "trials"),
        "--train-scp", train_scp, "--train-utt2spk", str(tmp_path / "train_u2s"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    eer = float(out.split("EER: ")[1].split("%")[0])
    assert eer < 20.0


def test_score_cli_cosine_lda_with_cohort(tmp_path, capsys):
    """Regression: --lda-dim + --cohort-scp on the cosine backend must
    LDA-transform the cohort too (previously crashed on a dim mismatch in
    cosine_matrix: [N, lda_dim] @ [raw_dim, M])."""
    rng = np.random.RandomState(2)
    train, train_u2s = make_embeddings(rng, n_spk=20, per=8)
    evalset, eval_u2s = make_embeddings(np.random.RandomState(3), n_spk=8, per=6)
    cohort, _ = make_embeddings(np.random.RandomState(4), n_spk=10, per=4)

    enroll = {k: v for k, v in evalset.items() if int(k[-1]) < 3}
    test = {k: v for k, v in evalset.items() if int(k[-1]) >= 3}
    train_scp = write_xvectors(str(tmp_path / "train"), train)
    enroll_scp = write_xvectors(str(tmp_path / "enroll"), enroll)
    test_scp = write_xvectors(str(tmp_path / "test"), test)
    cohort_scp = write_xvectors(str(tmp_path / "cohort"), cohort)
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
        "--train-scp", train_scp, "--train-utt2spk", str(tmp_path / "train_u2s"),
        "--lda-dim", "16", "--cohort-scp", cohort_scp, "--snorm-topk", "20",
        "--scores", str(tmp_path / "cos_lda_snorm.scores"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    eer = float(out.split("EER: ")[1].split("%")[0])
    assert eer < 20.0


def test_score_cli_plda_in_out_kaldi_format(tmp_path, capsys):
    """--plda-out then --plda-in (Kaldi <Plda> file) reproduces the scores
    byte-for-byte; --mean-vec/--lda-mat rebuild the Kaldi preprocessing
    pipeline (subtract-global-mean | transform-vec | normalize-length)."""
    from tf_kaldi_speaker_tpu.kio import write_mat

    rng = np.random.RandomState(2)
    train, train_u2s = make_embeddings(rng, n_spk=20, per=8)
    evalset, eval_u2s = make_embeddings(np.random.RandomState(3), n_spk=8, per=6)
    enroll = {k: v for k, v in evalset.items() if int(k[-1]) < 3}
    test = {k: v for k, v in evalset.items() if int(k[-1]) >= 3}
    train_scp = write_xvectors(str(tmp_path / "train"), train)
    enroll_scp = write_xvectors(str(tmp_path / "enroll"), enroll)
    test_scp = write_xvectors(str(tmp_path / "test"), test)
    with open(str(tmp_path / "train_u2s"), "w") as f:
        for k, s in train_u2s.items():
            f.write("%s %s\n" % (k, s))
    trials_path = str(tmp_path / "trials")
    with open(trials_path, "w") as f:
        for e in sorted(enroll):
            for t in sorted(test):
                f.write("%s %s %s\n" % (
                    e, t, "target" if eval_u2s[t] == eval_u2s[e] else "nontarget"))

    common = ["--backend", "plda", "--enroll-scp", enroll_scp,
              "--test-scp", test_scp, "--trials", trials_path]
    plda_file = str(tmp_path / "plda")
    rc = score_cli.main(common + [
        "--train-scp", train_scp, "--train-utt2spk", str(tmp_path / "train_u2s"),
        "--plda-out", plda_file, "--plda-format", "kaldi",
        "--scores", str(tmp_path / "trained.scores"),
    ])
    assert rc == 0
    capsys.readouterr()
    assert open(plda_file, "rb").read(2) == b"\0B"

    # Kaldi-style artifacts: mean.vec (the train global mean the CLI
    # subtracts) as a Kaldi double vector.
    # match the CLI's view of the data: the ark stores float32
    mean = np.stack([v.astype(np.float32) for v in train.values()]) \
        .astype(np.float64).mean(0)
    mean_vec = str(tmp_path / "mean.vec")
    write_vec_flt(mean_vec, mean)

    rc = score_cli.main(common + [
        "--plda-in", plda_file, "--mean-vec", mean_vec,
        "--scores", str(tmp_path / "loaded.scores"),
    ])
    assert rc == 0
    capsys.readouterr()
    assert (open(str(tmp_path / "loaded.scores")).read()
            == open(str(tmp_path / "trained.scores")).read())

    # --lda-mat: identity [D,D] and zero-offset affine [D,D+1] both leave
    # the pipeline unchanged.
    dim = mean.shape[0]
    for name, m in (("eye.mat", np.eye(dim)),
                    ("affine.mat", np.hstack([np.eye(dim), np.zeros((dim, 1))]))):
        path = str(tmp_path / name)
        write_mat(path, m)
        rc = score_cli.main(common + [
            "--plda-in", plda_file, "--mean-vec", mean_vec,
            "--lda-mat", path,
            "--scores", str(tmp_path / "lda.scores"),
        ])
        assert rc == 0
        capsys.readouterr()
        assert (open(str(tmp_path / "lda.scores")).read()
                == open(str(tmp_path / "trained.scores")).read()), name
