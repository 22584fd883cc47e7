"""End-to-end drive of the voxceleb recipe shell pipeline on synthetic wavs:
MFCC/VAD -> MUSAN/RIRS augmentation -> egs prep/combine -> filter/split ->
train -> FINETUNE -> extract -> score. Covers VERDICT r1 gaps #2 (recipe
augmentation, reference run.sh:70-131) and #3 (recipe finetune stage,
run.sh:430-444).

Runs the actual recipes/voxceleb/v1/run.sh through bash with a tiny config.
"""

import json
import math
import os
import re
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_RECIPE_CFG = dict(
    seed=0, network_type="tdnn", pooling_type="statistics_pooling",
    embedding_node="tdnn6_dense", last_layer_linear=True,
    loss_func="additive_margin_softmax", amsoftmax_m=0.2,
    amsoftmax_lambda_min=0, amsoftmax_lambda_base=1000,
    amsoftmax_lambda_gamma=0.0001, amsoftmax_lambda_power=5,
    optimizer="sgd", weight_l2_regularizer=1e-3, batchnorm_momentum=0.99,
    tdnn_layer_size=16, num_nodes_pooling_layer=32, num_nodes_last_layer=16,
    num_epochs=1, num_steps_per_epoch=2, learning_rate=0.02,
    reduce_lr_epochs=2, early_stop_epochs=4, min_learning_rate=1e-5,
    keep_checkpoint_max=0, save_checkpoints_steps=2, save_summary_steps=0,
    show_training_progress=1, valid_max_iterations=2,
    num_parallel_datasets=1, max_queue_size=4,
    num_speakers_per_batch=4, num_segments_per_speaker=1,
    min_segment_len=30, max_segment_len=60, batch_type="softmax",
)


def _tone(freq, dur, rate=16000, amp=6000.0, seed=0):
    t = np.arange(int(dur * rate)) / rate
    rng = np.random.RandomState(seed)
    return (amp * np.sin(2 * np.pi * freq * t) + rng.randn(len(t)) * 300.0)


def _make_wav_dir(root, name, speakers, utts_per_spk, dur=1.2, seed=0,
                  rate=16000, spk_base=0):
    """spk_base keeps speaker/utterance ids DISJOINT across partitions —
    real corpora have globally unique ids, and tfks-combine-data (like
    utils/combine_data.sh) aborts on duplicate utterance ids."""
    from tf_kaldi_speaker_tpu.kio.wav import write_wav

    d = os.path.join(root, name)
    os.makedirs(os.path.join(d, "wavs"), exist_ok=True)
    scp, u2s = [], []
    k = 0
    for s in range(spk_base, spk_base + speakers):
        for u in range(utts_per_spk):
            utt = "spk%02d-utt%02d" % (s, u)
            path = os.path.join(d, "wavs", utt + ".wav")
            # per-speaker base frequency makes speakers separable
            write_wav(path, _tone(200 + 80 * s + 7 * u, dur, rate=rate, seed=seed + k), rate)
            scp.append("%s %s" % (utt, path))
            u2s.append("%s spk%02d" % (utt, s))
            k += 1
    with open(os.path.join(d, "wav.scp"), "w") as f:
        f.write("\n".join(scp) + "\n")
    with open(os.path.join(d, "utt2spk"), "w") as f:
        f.write("\n".join(u2s) + "\n")
    return d


def _make_source_scp(root, name, n, dur=2.0, seed=100):
    from tf_kaldi_speaker_tpu.kio.wav import write_wav

    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n):
        path = os.path.join(d, "src%02d.wav" % i)
        write_wav(path, rng.randn(int(dur * 16000)) * 500.0, 16000)
        lines.append("src%02d %s" % (i, path))
    with open(os.path.join(d, "wav.scp"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return d


def test_fisher_v1_recipe(tmp_path):
    """fisher/v1 enroll/test protocol: train on background, score trials
    with speaker-mean enrollment (PLDA + cosine)."""
    data = str(tmp_path / "data")
    exp = str(tmp_path / "exp")
    _make_wav_dir(data, "train_background", 6, 8, seed=0, rate=8000)
    enroll = _make_wav_dir(data, "enroll", 3, 3, seed=300, rate=8000)
    test = _make_wav_dir(data, "test", 3, 2, seed=600, rate=8000)
    # trials: enrollment SPEAKER vs test utt
    test_utts = [l.split()[0] for l in open(os.path.join(test, "wav.scp"))]
    with open(os.path.join(data, "test", "trials"), "w") as f:
        for s in range(3):
            for u in test_utts:
                t = "target" if u.startswith("spk%02d" % s) else "nontarget"
                f.write("spk%02d %s %s\n" % (s, u, t))

    cfg_dir = tmp_path / "conf"
    cfg_dir.mkdir()
    with open(cfg_dir / "tiny.json", "w") as f:
        json.dump(TINY_RECIPE_CFG, f)

    script = open(os.path.join(REPO, "recipes/fisher/v1/run.sh")).read()
    script = script.replace("--min-len 150 --min-num-utts 5", "--min-len 30 --min-num-utts 2")
    script = script.replace("--valid-speakers 200 --valid-utts 5", "--valid-speakers 2 --valid-utts 2")
    run_sh = tmp_path / "run.sh"
    run_sh.write_text(script)

    env = dict(os.environ)
    env.update(
        stage="1", data_root=data, exp=exp, lda_dim="8",
        config=str(cfg_dir / "tiny.json"), model=os.path.join(exp, "m"),
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        ["bash", str(run_sh)], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]
    # speaker-mean enrollment: score file keys are enroll SPEAKERS
    scores = open(os.path.join(exp, "scores_cosine.txt")).read().splitlines()
    assert scores and all(line.split()[0].startswith("spk") for line in scores)
    assert os.path.getsize(os.path.join(exp, "scores_plda.txt")) > 0
    assert "eer" in proc.stdout.lower()


def test_sre_recipe(tmp_path):
    """sre/v1: 8 kHz MFCC -> train -> extract -> SRE10 PLDA, SRE16 PLDA with
    unsupervised adaptation + per-language (tgl/yue) splits -> calibration.
    Augmentation is skipped (no musan/rirs), exercising the recipe's own
    skip path."""
    data = str(tmp_path / "data")
    exp = str(tmp_path / "exp")
    _make_wav_dir(data, "swbd_sre", 10, 6, seed=0, rate=8000)
    _make_wav_dir(data, "sre16_major", 3, 2, seed=50, rate=8000)
    _make_wav_dir(data, "sre10_enroll", 3, 2, seed=100, rate=8000)
    sre10_test = _make_wav_dir(data, "sre10_test", 3, 2, seed=200, rate=8000)
    _make_wav_dir(data, "sre16_enroll", 4, 2, seed=300, rate=8000)
    sre16_test = _make_wav_dir(data, "sre16_test", 4, 2, seed=400, rate=8000)

    def write_trials(d, n_spk, langs=None):
        utts = [l.split()[0] for l in open(os.path.join(d, "wav.scp"))]
        with open(os.path.join(d, "trials"), "w") as f:
            for s in range(n_spk):
                for u in utts:
                    t = "target" if u.startswith("spk%02d" % s) else "nontarget"
                    f.write("spk%02d %s %s\n" % (s, u, t))
        if langs:
            # speaker index -> language; per-language trial lists filter the
            # pooled list by the TEST utterance's speaker (SRE16 protocol).
            for lang in set(langs.values()):
                with open(os.path.join(d, "trials_%s" % lang), "w") as f:
                    for line in open(os.path.join(d, "trials")):
                        u = line.split()[1]
                        if langs[int(u.split("-")[0][3:])] == lang:
                            f.write(line)

    write_trials(sre10_test, 3)
    write_trials(sre16_test, 4, langs={0: "tgl", 1: "tgl", 2: "yue", 3: "yue"})

    cfg_dir = tmp_path / "conf"
    cfg_dir.mkdir()
    with open(cfg_dir / "tiny.json", "w") as f:
        json.dump(TINY_RECIPE_CFG, f)

    script = open(os.path.join(REPO, "recipes/sre/v1/run.sh")).read()
    script = script.replace("--min-len 200 --min-num-utts 8", "--min-len 30 --min-num-utts 2")
    script = script.replace("--valid-speakers 200 --valid-utts 5", "--valid-speakers 2 --valid-utts 2")
    script = script.replace("--lda-dim 150", "--lda-dim 8")
    run_sh = tmp_path / "run.sh"
    run_sh.write_text(script)

    env = dict(os.environ)
    env.update(
        stage="1", data_root=data, exp=exp,
        config=str(cfg_dir / "tiny.json"), model=os.path.join(exp, "m"),
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        ["bash", str(run_sh)], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]
    tail = proc.stdout[-4000:]
    assert "SKIPPING augmentation" in proc.stdout, tail
    # SRE10 + SRE16 pooled scores written
    assert os.path.getsize(os.path.join(exp, "scores_sre10.txt")) > 0, tail
    assert os.path.getsize(os.path.join(exp, "scores_sre16.txt")) > 0, tail
    # per-language splits reported and written (eval_plda_sre16.sh protocol)
    assert "[tgl]" in proc.stdout and "[yue]" in proc.stdout, tail
    for lang, n_spk_lang in (("tgl", 2), ("yue", 2)):
        split = os.path.join(exp, "scores_sre16.txt.%s" % lang)
        lines = open(split).read().splitlines()
        # 4 enroll speakers x (2 speakers x 2 utts) per language
        assert len(lines) == 4 * n_spk_lang * 2, (lang, len(lines), tail)
    # calibration stage: trained map reported, calibrated LLRs written,
    # one line per pooled sre16 trial (4 enroll spk x 8 test utts)
    assert "calibration: llr =" in proc.stdout, tail
    cal = open(os.path.join(exp, "scores_sre16_cal.txt")).read().splitlines()
    assert len(cal) == 4 * 8, tail
    # Cllr/minCllr finite and ordered: minCllr is the post-PAV optimum, so
    # both the raw-as-llr and the calibrated Cllr must be >= it.
    m = re.search(
        r"eval Cllr raw-as-llr: ([\d.]+)\s+minCllr: ([\d.]+)\s+"
        r"Cllr calibrated: ([\d.]+)", proc.stdout)
    assert m, tail
    cllr_raw, min_cllr, cllr_cal = map(float, m.groups())
    assert all(math.isfinite(v) for v in (cllr_raw, min_cllr, cllr_cal)), tail
    assert cllr_raw >= min_cllr - 1e-6 and cllr_cal >= min_cllr - 1e-6, (
        cllr_raw, min_cllr, cllr_cal)
    # actDCF at the Bayes threshold is likewise lower-bounded by minDCF,
    # at every requested operating point.
    dcfs = re.findall(
        r"p_target=\S+ c_miss=\S+ c_fa=\S+: minDCF ([\d.]+)\s+"
        r"actDCF ([\d.]+)", proc.stdout)
    assert len(dcfs) == 2, tail  # --operating-point 0.01 and 0.001
    for min_dcf, act_dcf in dcfs:
        min_dcf, act_dcf = float(min_dcf), float(act_dcf)
        assert math.isfinite(act_dcf) and act_dcf >= min_dcf - 1e-6, (
            min_dcf, act_dcf)


def test_voxceleb_recipe_all_stages(tmp_path):
    data = str(tmp_path / "data")
    exp = str(tmp_path / "exp")
    # tiny corpora: dev 6 spk x 10 utts, vox2 4 spk x 10, test 4 spk x 3
    _make_wav_dir(data, "voxceleb1_dev", 6, 10, seed=0)
    _make_wav_dir(data, "voxceleb2", 4, 10, seed=500, spk_base=6)
    test_dir = _make_wav_dir(data, "voxceleb1_test", 4, 3, seed=900,
                             spk_base=10)
    # trials: same-speaker target / cross-speaker nontarget
    utts = [l.split()[0] for l in open(os.path.join(test_dir, "wav.scp"))]
    with open(os.path.join(test_dir, "trials"), "w") as f:
        for a in utts[:6]:
            for b in utts[:6]:
                if a >= b:
                    continue
                t = "target" if a.split("-")[0] == b.split("-")[0] else "nontarget"
                f.write("%s %s %s\n" % (a, b, t))
    # MUSAN-style sources + RIRs
    musan = os.path.join(data, "musan")
    for sub in ("noise", "music", "speech"):
        _make_source_scp(musan, sub, 3, seed=hash(sub) % 1000)
    rirs = os.path.join(data, "rirs")
    os.makedirs(rirs, exist_ok=True)
    from tf_kaldi_speaker_tpu.kio.wav import write_wav

    rng = np.random.RandomState(7)
    rir_lines = []
    for i in range(2):
        rir = np.zeros(800)
        rir[0] = 1.0
        rir[100 + 50 * i] = 0.4
        rir += rng.randn(800) * 0.01
        p = os.path.join(rirs, "rir%d.wav" % i)
        write_wav(p, rir * 8000.0, 16000)
        rir_lines.append("rir%d %s" % (i, p))
    with open(os.path.join(rirs, "wav.scp"), "w") as f:
        f.write("\n".join(rir_lines) + "\n")

    cfg_dir = tmp_path / "conf"
    cfg_dir.mkdir()
    with open(cfg_dir / "tiny.json", "w") as f:
        json.dump(TINY_RECIPE_CFG, f)
    ft = dict(TINY_RECIPE_CFG, aux_loss_func=["mhe_loss"], mhe_lambda=0.01,
              noload_var_list=[], noupdate_var_list=[])
    with open(cfg_dir / "tiny_ft.json", "w") as f:
        json.dump(ft, f)

    env = dict(os.environ)
    env.update(
        stage="1", stop_stage="8",
        data_root=data, exp=exp,
        musan_root=musan, rirs_root=rirs, aug_frac="0.5",
        config=str(cfg_dir / "tiny.json"),
        finetune_config=str(cfg_dir / "tiny_ft.json"),
        model=os.path.join(exp, "m"),
        finetune_model=os.path.join(exp, "m_ft"),
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    # recipe filter thresholds are sized for real data; relax via a patched
    # copy so the tiny corpus survives stage 4
    script = open(os.path.join(REPO, "recipes/voxceleb/v1/run.sh")).read()
    script = script.replace("--min-len 200 --min-num-utts 8", "--min-len 30 --min-num-utts 2")
    script = script.replace("--valid-speakers 200 --valid-utts 5", "--valid-speakers 2 --valid-utts 2")
    script = script.replace("--lda-dim 200", "--lda-dim 8")
    run_sh = tmp_path / "run.sh"
    run_sh.write_text(script)

    proc = subprocess.run(
        ["bash", str(run_sh)], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]

    # augmentation actually happened and entered training
    tail = proc.stdout[-3000:]
    aug_feats = os.path.join(data, "train_aug", "mfcc", "feats.scp")
    assert os.path.exists(aug_feats), tail
    n_aug = len(open(aug_feats).readlines())
    assert n_aug > 0, tail
    combined = open(os.path.join(data, "train_combined", "feats.scp")).readlines()
    assert len(combined) == 100 + n_aug, tail  # 60 dev + 40 vox2 + aug
    suffixes = {u.split()[0].rsplit("-", 1)[-1] for u in combined}
    assert {"reverb", "noise", "music", "babble"} <= suffixes, tail

    # finetune model trained from the pretrain checkpoint and was scored
    assert os.path.exists(os.path.join(exp, "m", "nnet", "checkpoint")), tail
    assert os.path.exists(os.path.join(exp, "m_ft", "nnet", "checkpoint")), tail
    assert os.path.getsize(os.path.join(exp, "scores_cosine.txt")) > 0, tail
    assert os.path.getsize(os.path.join(exp, "scores_plda.txt")) > 0, tail
    assert "eer" in proc.stdout.lower(), tail


def _tiny_corpus_dir(root, name, spk, n_utts=3):
    d = os.path.join(root, name)
    os.makedirs(d)
    utts = ["%s-u%d" % (spk, j) for j in range(n_utts)]
    with open(os.path.join(d, "wav.scp"), "w") as f:
        f.write("".join("%s /x/%s.wav\n" % (u, u) for u in utts))
    with open(os.path.join(d, "utt2spk"), "w") as f:
        f.write("".join("%s %s\n" % (u, spk) for u in utts))
    with open(os.path.join(d, "spk2utt"), "w") as f:
        f.write("%s %s\n" % (spk, " ".join(utts)))


def test_sre_recipe_stage0_corpus_assembly(tmp_path):
    """sre/v1 stage 0 mirrors the reference's executed corpus assembly
    (run.sh:68-100 + the swbd_sre combine at :120): combine SRE04-08 ->
    sre, SWBD2+cellular -> swbd, validate+fix each, combine the training
    pool."""
    data = str(tmp_path / "data")
    os.makedirs(data)
    corpora = [
        "sre2004", "sre2005_train", "sre2005_test", "sre2006_train",
        "sre2006_test", "sre08", "swbd2_phase1_train", "swbd2_phase2_train",
        "swbd2_phase3_train", "swbd_cellular1_train", "swbd_cellular2_train",
    ]
    for i, name in enumerate(corpora):
        _tiny_corpus_dir(data, name, "c%02dspk" % i)

    env = dict(os.environ)
    env.update(stage="0", stop_stage="0", data_root=data,
               PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""))
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "recipes/sre/v1/run.sh")], env=env,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]

    from tf_kaldi_speaker_tpu.cli.validate_data_dir import validate_data_dir
    assert validate_data_dir(os.path.join(data, "sre"), no_text=True, no_feats=True)["utt2spk"] == 18
    assert validate_data_dir(os.path.join(data, "swbd"), no_text=True, no_feats=True)["utt2spk"] == 15
    counts = validate_data_dir(os.path.join(data, "swbd_sre"), no_text=True, no_feats=True)
    assert counts["utt2spk"] == 33 and counts["spk2utt"] == 11


def test_voxceleb_recipe_stage0_list_building(tmp_path):
    """voxceleb/v1 stage 0 builds the data dirs from corpus trees
    (reference run.sh:45-53 via local/make_voxceleb{1,2}.pl): vox1
    train/test split by trial-list speakers + trials rewrite, vox2
    dev+test combined into the voxceleb2 training partition."""
    root = str(tmp_path)
    for s in range(1, 5):
        for c in ("00001", "00002"):
            p = os.path.join(root, "vox1/wav/id%05d/vidA/%s.wav" % (s, c))
            os.makedirs(os.path.dirname(p), exist_ok=True)
            open(p, "wb").write(b"\x00")
    for part, s in (("dev", 101), ("dev", 102), ("test", 201)):
        p = os.path.join(root, "vox2/%s/wav/id%05d/clipX/00001.wav" % (part, s))
        os.makedirs(os.path.dirname(p), exist_ok=True)
        open(p, "wb").write(b"\x00")
    with open(os.path.join(root, "vox1", "veri_test.txt"), "w") as f:
        f.write("1 id00003/vidA/00001.wav id00003/vidA/00002.wav\n")
        f.write("0 id00003/vidA/00001.wav id00004/vidA/00001.wav\n")

    data = os.path.join(root, "data")
    env = dict(os.environ)
    env.update(stage="0", stop_stage="0", data_root=data,
               voxceleb1_root=os.path.join(root, "vox1"),
               voxceleb2_root=os.path.join(root, "vox2"),
               PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""))
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "recipes/voxceleb/v1/run.sh")], env=env,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-6000:]

    from tf_kaldi_speaker_tpu.cli.validate_data_dir import validate_data_dir
    # the partitions the later stages consume, all passing validation
    assert validate_data_dir(os.path.join(data, "voxceleb1_dev"), no_text=True, no_feats=True)["utt2spk"] == 4
    assert validate_data_dir(os.path.join(data, "voxceleb1_test"), no_text=True, no_feats=True)["utt2spk"] == 4
    assert validate_data_dir(os.path.join(data, "voxceleb2"), no_text=True, no_feats=True)["utt2spk"] == 3
    trials = open(os.path.join(data, "voxceleb1_test", "trials")).read().splitlines()
    assert len(trials) == 2 and trials[0].endswith("target")
