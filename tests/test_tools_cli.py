"""Misc tool CLIs: DET dump, margin curves, offline GE2E, LR suggestion."""

import numpy as np

from tf_kaldi_speaker_tpu.cli import (
    compute_gae2e_loss,
    plot_det,
    target_logit_curve,
    tune_lr,
)
from tf_kaldi_speaker_tpu.kio import write_vec_flt


def test_plot_det_cli(tmp_path, capsys):
    rng = np.random.RandomState(0)
    trials, scores = [], []
    for i in range(200):
        t = i % 2
        trials.append(("e%d" % i, "t%d" % i, "target" if t else "nontarget"))
        scores.append(("e%d" % i, "t%d" % i, rng.randn() + 2 * t))
    with open(tmp_path / "trials", "w") as f:
        for e, t, lab in trials:
            f.write("%s %s %s\n" % (e, t, lab))
    with open(tmp_path / "scores", "w") as f:
        for e, t, s in scores:
            f.write("%s %s %f\n" % (e, t, s))
    rc = plot_det.main([str(tmp_path / "scores"), str(tmp_path / "trials"),
                        str(tmp_path / "det.txt")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "EER" in out and "minDCF12" in out
    pts = np.loadtxt(tmp_path / "det.txt")
    assert pts.shape[1] == 2


def test_target_logit_curve_cli(tmp_path):
    out = str(tmp_path / "curve.csv")
    assert target_logit_curve.main([out]) == 0
    rows = open(out).read().strip().split("\n")
    header = rows[0].split(",")
    assert "asoftmax_m4" in header and len(rows) == 402
    # amsoftmax column is cos - m
    import csv

    r = list(csv.DictReader(open(out)))
    mid = r[200]
    assert abs(float(mid["amsoftmax_m0.20"]) - (float(mid["cos_theta"]) - 0.2)) < 1e-6


def test_compute_gae2e_loss_cli(tmp_path, capsys):
    rng = np.random.RandomState(1)
    ark = str(tmp_path / "emb.ark")
    scp = str(tmp_path / "emb.scp")
    with open(ark, "wb") as fa, open(scp, "w") as fs, open(tmp_path / "u2s", "w") as fu:
        for s in range(5):
            mean = rng.randn(16) * 3
            for u in range(4):
                key = "s%d_u%d" % (s, u)
                pos = fa.tell() + len(key) + 1
                write_vec_flt(fa, (mean + rng.randn(16) * 0.1).astype(np.float32), key=key)
                fs.write("%s %s:%d\n" % (key, ark, pos))
                fu.write("%s s%d\n" % (key, s))
    rc = compute_gae2e_loss.main(["--loss", "e2e", "--num-segments", "4",
                                  scp, str(tmp_path / "u2s")])
    assert rc == 0
    out = capsys.readouterr().out
    loss = float(out.rsplit(":", 1)[1])
    assert 0 < loss < 1.0  # well-separated clusters -> small loss


def test_tune_lr_cli(tmp_path, capsys):
    # synthetic sweep: loss falls then diverges
    with open(tmp_path / "learning_rate_tuning", "w") as f:
        for k in range(30):
            lr = 1e-5 * 1.15**k
            loss = 5.0 - 0.15 * k if k < 20 else 5.0 - 3.0 + (k - 20) * 2.0
            f.write("%d %.8f %f\n" % (k, lr, loss))
    rc = tune_lr.main([str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "steepest-descent lr" in out


def test_debug_clis(tmp_path, capsys):
    """train_insight + extract_softmax_weights over a freshly trained model."""
    import json
    import os

    from tf_kaldi_speaker_tpu.cli import extract_softmax_weights, train_insight
    from tf_kaldi_speaker_tpu.kio import read_vec_flt_ark
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir
    from test_extract_backend import TINY_CONFIG

    d = make_fake_data_dir(str(tmp_path / "data"), num_speakers=6,
                           utts_per_speaker=3, dim=20, min_len=80, max_len=120)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(ParamsPlain(**TINY_CONFIG), nnet, dim=20, num_speakers=6)
    t.build("train", 20, TINY_CONFIG["loss_func"], 6)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY_CONFIG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")
    with open(os.path.join(nnet, "num_speakers"), "w") as f:
        f.write("6\n")

    rc = train_insight.main([d["data"], d["spklist"], str(tmp_path / "m")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "valid_loss" in out and "eer" in out

    ark = str(tmp_path / "w.ark")
    rc = extract_softmax_weights.main([str(tmp_path / "m"), ark])
    assert rc == 0
    vecs = dict(read_vec_flt_ark(ark))
    assert len(vecs) == 6
    for v in vecs.values():
        assert v.shape == (TINY_CONFIG["num_nodes_last_layer"],)


def test_plot_det_hist_and_lambda_curve(tmp_path):
    """score_distribution.m + asoftmax_lambda_tuning.m equivalents."""
    from tf_kaldi_speaker_tpu.cli import plot_det, target_logit_curve

    rng = np.random.RandomState(0)
    with open(tmp_path / "trials", "w") as ft, open(tmp_path / "scores", "w") as fs:
        for i in range(200):
            t = i % 2
            ft.write("e%d t%d %s\n" % (i, i, "target" if t else "nontarget"))
            fs.write("e%d t%d %f\n" % (i, i, rng.randn() + 2.5 * t))
    rc = plot_det.main(["--hist", str(tmp_path / "hist.txt"),
                        str(tmp_path / "scores"), str(tmp_path / "trials")])
    assert rc == 0
    h = np.loadtxt(tmp_path / "hist.txt")
    assert h.shape == (30, 3)
    np.testing.assert_allclose(h[:, 1].sum(), 1.0)
    np.testing.assert_allclose(h[:, 2].sum(), 1.0)
    # target mass sits at higher scores than nontarget mass
    assert (h[:, 0] * h[:, 1]).sum() > (h[:, 0] * h[:, 2]).sum()

    rc = target_logit_curve.main([
        "--lambda-curve", str(tmp_path / "lam.csv"), str(tmp_path / "c.csv")])
    assert rc == 0
    rows = open(tmp_path / "lam.csv").read().splitlines()
    assert rows[0] == "step,lambda,fa"
    first = rows[1].split(","); last = rows[-1].split(",")
    assert float(first[1]) == 1000.0       # lambda_base at step 0
    assert float(last[1]) == 10.0          # floored at lambda_min
    np.testing.assert_allclose(float(last[2]), 1.0 / 11.0, rtol=1e-4)


def test_prepare_feats_no_cmvn_bnf(tmp_path):
    """prepare_bnfeats_for_egs.sh parity: silence removal WITHOUT CMVN —
    output frames are the voiced input frames verbatim."""
    from tf_kaldi_speaker_tpu.cli import prepare_feats
    from tf_kaldi_speaker_tpu.kio import ark
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

    d = make_fake_data_dir(str(tmp_path / "d"), num_speakers=2,
                           utts_per_speaker=2, dim=8, min_len=50, max_len=80,
                           with_vad_ali=True, compress=False)
    rc = prepare_feats.main(["--no-cmvn", "--no-compress",
                             str(tmp_path / "d"), str(tmp_path / "bnf")])
    assert rc == 0
    orig = dict(ark.read_mat_scp(d["feats_scp"]))
    vad = dict(ark.read_vec_flt_scp(d["vad_scp"]))
    out = dict(ark.read_mat_scp(str(tmp_path / "bnf" / "feats.scp")))
    for k in out:
        np.testing.assert_array_equal(out[k], orig[k][vad[k] > 0.5])


def test_extract_bnf_cli(tmp_path):
    """extract_bnf.sh parity: per-frame bottleneck features aligned 1:1
    with the input (edge-tiled context), ready for the MI trainer."""
    import json
    import os

    from tf_kaldi_speaker_tpu.cli import extract_bnf
    from tf_kaldi_speaker_tpu.kio import ark
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir
    from test_extract_backend import TINY_CONFIG

    d = make_fake_data_dir(str(tmp_path / "d"), num_speakers=3,
                           utts_per_speaker=2, dim=20, min_len=60, max_len=100)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(ParamsPlain(**TINY_CONFIG), nnet, dim=20, num_speakers=3)
    t.build("train", 20, TINY_CONFIG["loss_func"], 3)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY_CONFIG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")

    rc = extract_bnf.main([
        str(tmp_path / "m"), "scp:" + d["feats_scp"],
        "ark,scp:%s,%s" % (tmp_path / "bnf.ark", tmp_path / "bnf.scp"),
    ])
    assert rc == 0
    orig = dict(ark.read_mat_scp(d["feats_scp"]))
    bnf = dict(ark.read_mat_scp(str(tmp_path / "bnf.scp")))
    assert sorted(bnf) == sorted(orig)
    for k in bnf:
        assert bnf[k].shape[0] == orig[k].shape[0]  # frame-aligned
        assert np.isfinite(bnf[k]).all()


def test_fix_data_dir(tmp_path):
    """Native utils/fix_data_dir.sh: cross-filter per-utt tables to the
    common key set, sort, regenerate spk2utt, keep a .backup copy."""
    import os

    from tf_kaldi_speaker_tpu.cli.fix_data_dir import fix_data_dir

    d = str(tmp_path / "data")
    os.makedirs(d)
    # utt2spk has u1..u4; feats.scp is missing u3; vad.scp has an extra u9;
    # files deliberately unsorted.
    with open(os.path.join(d, "utt2spk"), "w") as f:
        f.write("u2 spkB\nu1 spkA\nu4 spkB\nu3 spkA\n")
    with open(os.path.join(d, "feats.scp"), "w") as f:
        f.write("u4 a.ark:40\nu1 a.ark:10\nu2 a.ark:20\n")
    with open(os.path.join(d, "vad.scp"), "w") as f:
        f.write("u1 v.ark:1\nu2 v.ark:2\nu4 v.ark:4\nu9 v.ark:9\n")
    with open(os.path.join(d, "spk2utt"), "w") as f:
        f.write("spkA u1 u3\nspkB u2 u4\n")

    kept = fix_data_dir(d)
    assert kept["utt2spk"] == 3  # u3 (no feats) and u9 (no utt2spk) dropped

    utts = [l.split()[0] for l in open(os.path.join(d, "feats.scp"))]
    assert utts == ["u1", "u2", "u4"]
    u2s = [l.split() for l in open(os.path.join(d, "utt2spk"))]
    assert u2s == [["u1", "spkA"], ["u2", "spkB"], ["u4", "spkB"]]
    s2u = {l.split()[0]: l.split()[1:] for l in open(os.path.join(d, "spk2utt"))}
    assert s2u == {"spkA": ["u1"], "spkB": ["u2", "u4"]}
    # backup kept the original 4-line utt2spk
    assert len(open(os.path.join(d, ".backup", "utt2spk")).readlines()) == 4


def test_fix_data_dir_with_segments(tmp_path):
    """With a segments file, wav.scp is RECORDING-keyed (utils/
    fix_data_dir.sh special case): it must be filtered to the recordings
    surviving segments reference, never intersected with utterance ids."""
    import os

    from tf_kaldi_speaker_tpu.cli.fix_data_dir import fix_data_dir

    d = str(tmp_path / "data")
    os.makedirs(d)
    with open(os.path.join(d, "utt2spk"), "w") as f:
        f.write("u1 spkA\nu2 spkA\nu3 spkB\n")
    with open(os.path.join(d, "segments"), "w") as f:
        # u3 dropped by feats.scp below -> reco2 keeps only u2
        f.write("u1 reco1 0.0 1.0\nu2 reco2 0.0 1.0\nu3 reco2 1.0 2.0\n")
    with open(os.path.join(d, "feats.scp"), "w") as f:
        f.write("u1 a.ark:1\nu2 a.ark:2\n")
    with open(os.path.join(d, "wav.scp"), "w") as f:
        f.write("reco1 r1.wav\nreco2 r2.wav\nreco9 r9.wav\n")

    kept = fix_data_dir(d)
    assert kept["utt2spk"] == 2
    assert kept["segments"] == 2
    # wav.scp filtered by recording, NOT emptied by utt-id intersection
    wavs = [l.split()[0] for l in open(os.path.join(d, "wav.scp"))]
    assert wavs == ["reco1", "reco2"]
    segs = [l.split()[0] for l in open(os.path.join(d, "segments"))]
    assert segs == ["u1", "u2"]


def test_combine_data(tmp_path):
    """Native utils/combine_data.sh: concat per-utt tables across sources
    (sorted, spk2utt regenerated, speakers may repeat across sources),
    skip present-in-some files with a warning, --extra-files honored."""
    import os

    from tf_kaldi_speaker_tpu.cli.combine_data import combine_data

    a, b, dest = (str(tmp_path / n) for n in ("a", "b", "dest"))
    os.makedirs(a)
    os.makedirs(b)
    # spkA appears in BOTH sources (utterance lists must merge).
    with open(os.path.join(a, "utt2spk"), "w") as f:
        f.write("a2 spkA\na1 spkA\n")
    with open(os.path.join(a, "wav.scp"), "w") as f:
        f.write("a2 wav2\na1 wav1\n")
    with open(os.path.join(a, "utt2num_frames"), "w") as f:
        f.write("a1 100\na2 200\n")
    with open(os.path.join(b, "utt2spk"), "w") as f:
        f.write("b1 spkB\nb2 spkA\n")
    with open(os.path.join(b, "wav.scp"), "w") as f:
        f.write("b1 wav3\nb2 wav4\n")
    # text only in b -> must be skipped, not half-combined
    with open(os.path.join(b, "text"), "w") as f:
        f.write("b1 hello\n")

    written = combine_data(dest, [a, b], extra_files=["utt2num_frames"])
    assert written["utt2spk"] == 4
    assert "text" not in written
    assert not os.path.exists(os.path.join(dest, "text"))
    # utt2num_frames present in only one source: skipped even as an
    # --extra-file (combine_data.sh requires it everywhere)
    assert "utt2num_frames" not in written

    u2s = [l.split() for l in open(os.path.join(dest, "utt2spk"))]
    assert u2s == [["a1", "spkA"], ["a2", "spkA"], ["b1", "spkB"],
                   ["b2", "spkA"]]
    s2u = {l.split()[0]: l.split()[1:]
           for l in open(os.path.join(dest, "spk2utt"))}
    assert s2u == {"spkA": ["a1", "a2", "b2"], "spkB": ["b1"]}


def test_combine_data_duplicate_utts_fail(tmp_path):
    """Duplicate utterance ids across sources abort (reference behavior:
    combined dirs must have unique utts)."""
    import os

    import pytest

    from tf_kaldi_speaker_tpu.cli.combine_data import combine_data

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (a, b):
        os.makedirs(d)
        with open(os.path.join(d, "utt2spk"), "w") as f:
            f.write("dup1 spkX\n")
    with pytest.raises(SystemExit, match="duplicate"):
        combine_data(str(tmp_path / "dest"), [a, b])
