"""Score-calibration stack: PAV, Cllr/minCllr, logistic calibration, actDCF.

Brute-force-first style (SURVEY.md §4): every component is checked against
an independent oracle or a closed-form hand value before the composed CLI
is driven end to end.
"""

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.backend.calibration import (
    actual_dcf,
    apply_calibration,
    bayes_threshold,
    cllr,
    logistic_calibration,
    min_cllr,
    pav,
)
from tf_kaldi_speaker_tpu.backend.metrics import compute_eer, compute_min_dcf


def _pav_oracle(y, w):
    """Independent PAV: repeatedly merge the first adjacent violating
    blocks (O(n^2) list-of-blocks form)."""
    blocks = [[float(v), float(wi), 1] for v, wi in zip(y, w)]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if blocks[i][0] > blocks[i + 1][0]:
                m1, w1, c1 = blocks[i]
                m2, w2, c2 = blocks[i + 1]
                blocks[i] = [(m1 * w1 + m2 * w2) / (w1 + w2), w1 + w2, c1 + c2]
                del blocks[i + 1]
                changed = True
                break
    out = []
    for m, _w, c in blocks:
        out.extend([m] * c)
    return np.array(out)


def test_pav_matches_oracle_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 40))
        y = rng.normal(size=n)
        w = rng.uniform(0.1, 3.0, size=n)
        got = pav(y, w)
        want = _pav_oracle(y, w)
        np.testing.assert_allclose(got, want, atol=1e-12)
        assert np.all(np.diff(got) >= -1e-12), "PAV output must be monotone"


def test_pav_is_projection():
    """The PAV fit must beat every other monotone candidate in weighted
    squared error (it is the metric projection onto the monotone cone)."""
    rng = np.random.default_rng(1)
    y = rng.normal(size=12)
    w = rng.uniform(0.5, 2.0, size=12)
    fit = pav(y, w)
    base = np.sum(w * (y - fit) ** 2)
    for _ in range(200):
        cand = np.sort(rng.normal(size=12))
        assert base <= np.sum(w * (y - cand) ** 2) + 1e-12


def test_cllr_hand_values():
    scores = np.array([0.0, 0.0, 0.0, 0.0])
    labels = np.array([1, 1, 0, 0])
    # llr == 0 everywhere: exactly 1 bit.
    assert cllr(scores, labels) == pytest.approx(1.0, abs=1e-12)
    # Strong correct LLRs: cost ~ 0; strong wrong LLRs: cost huge.
    good = np.array([30.0, 30.0, -30.0, -30.0])
    assert cllr(good, labels) < 1e-10
    assert cllr(-good, labels) > 10.0


def test_min_cllr_affine_invariant_and_floor():
    rng = np.random.default_rng(2)
    tar = rng.normal(2.0, 1.0, 400)
    non = rng.normal(-1.0, 1.0, 600)
    scores = np.concatenate([tar, non])
    labels = np.concatenate([np.ones(400), np.zeros(600)]).astype(int)
    m = min_cllr(scores, labels)
    # Monotone-affine invariance (discrimination-only metric).
    assert min_cllr(3.7 * scores + 11.0, labels) == pytest.approx(m, abs=1e-9)
    # Floor: no affine calibration can beat the PAV floor.
    a, b = logistic_calibration(scores, labels)
    assert cllr(apply_calibration(scores, a, b), labels) >= m - 1e-9
    # Separated scores have ~zero minCllr.
    sep = np.concatenate([tar + 100.0, non])
    assert min_cllr(sep, labels) < 1e-6


def test_logistic_calibration_recovers_true_llr():
    """Equal-variance Gaussian scores have an exactly linear true LLR:
    llr(s) = (mu_t - mu_n)/v * s - (mu_t^2 - mu_n^2)/(2 v)."""
    rng = np.random.default_rng(3)
    mu_t, mu_n, sd = 1.5, -0.5, 1.0
    tar = rng.normal(mu_t, sd, 60000)
    non = rng.normal(mu_n, sd, 60000)
    scores = np.concatenate([tar, non])
    labels = np.concatenate([np.ones(tar.size), np.zeros(non.size)]).astype(int)
    a, b = logistic_calibration(scores, labels, prior=0.5)
    true_a = (mu_t - mu_n) / sd**2
    true_b = -(mu_t**2 - mu_n**2) / (2 * sd**2)
    assert a == pytest.approx(true_a, rel=0.05)
    assert b == pytest.approx(true_b, abs=0.08)


def test_logistic_calibration_is_optimal_vs_grid():
    """Newton's solution must beat a fine grid around it on the training
    objective (== Cllr at prior 0.5 up to a constant factor)."""
    rng = np.random.default_rng(4)
    scores = np.concatenate([rng.normal(1, 1, 300), rng.normal(-1, 1.3, 500)])
    labels = np.concatenate([np.ones(300), np.zeros(500)]).astype(int)
    a, b = logistic_calibration(scores, labels, prior=0.5)
    best = cllr(apply_calibration(scores, a, b), labels)
    for da in np.linspace(-0.3, 0.3, 7):
        for db in np.linspace(-0.3, 0.3, 7):
            alt = cllr(apply_calibration(scores, a + da, b + db), labels)
            assert best <= alt + 1e-10


def test_bayes_threshold_and_actdcf():
    assert bayes_threshold(0.5) == pytest.approx(0.0)
    assert bayes_threshold(0.01) == pytest.approx(np.log(99.0))
    # SRE08-style asymmetric costs.
    assert bayes_threshold(0.01, c_miss=10.0, c_fa=1.0) == pytest.approx(
        np.log(0.99 / (0.01 * 10.0))
    )
    # Degenerate prior rejected.
    with pytest.raises(ValueError):
        bayes_threshold(0.0)


def test_calibrated_actdcf_approaches_mindcf():
    """On well-modeled scores, calibrate-then-Bayes-threshold lands near
    the oracle-threshold minimum cost at BOTH standard operating points."""
    rng = np.random.default_rng(5)
    tar = rng.normal(2.5, 1.0, 20000)
    non = rng.normal(-2.5, 1.0, 200000)
    dev_s = np.concatenate([tar[:10000], non[:100000]])
    dev_l = np.concatenate([np.ones(10000), np.zeros(100000)]).astype(int)
    ev_s = np.concatenate([tar[10000:], non[100000:]])
    ev_l = np.concatenate([np.ones(10000), np.zeros(100000)]).astype(int)
    a, b = logistic_calibration(dev_s, dev_l, prior=0.5)
    ev_cal = apply_calibration(ev_s, a, b)
    for p_t in (0.01, 0.001):
        mind, _ = compute_min_dcf(ev_s, ev_l, p_target=p_t)
        actd = actual_dcf(ev_cal, ev_l, p_target=p_t)
        assert actd >= mind - 1e-12  # act can never beat min
        assert actd <= mind + 0.05  # and calibration gets close
    # EER is invariant under the (positive-slope) calibration map.
    e_raw, _ = compute_eer(ev_s, ev_l)
    e_cal, _ = compute_eer(ev_cal, ev_l)
    assert e_cal == pytest.approx(e_raw, abs=1e-12)


def test_calibration_fixes_miscalibrated_scores():
    """Scores that are discriminative but wildly off in scale/offset: raw
    actDCF is terrible, calibrated actDCF is near minDCF."""
    rng = np.random.default_rng(6)
    tar = 0.05 * rng.normal(3.0, 1.0, 5000) + 7.0  # compressed + shifted
    non = 0.05 * rng.normal(-3.0, 1.0, 50000) + 7.0
    s = np.concatenate([tar, non])
    l = np.concatenate([np.ones(5000), np.zeros(50000)]).astype(int)
    mind, _ = compute_min_dcf(s, l, p_target=0.01)
    raw_act = actual_dcf(s, l, p_target=0.01)
    assert raw_act > 0.9  # everything accepted at the Bayes threshold
    a, b = logistic_calibration(s, l, prior=0.5)
    cal_act = actual_dcf(apply_calibration(s, a, b), l, p_target=0.01)
    assert cal_act <= mind + 0.1


def test_degenerate_inputs_rejected():
    with pytest.raises(ValueError):
        cllr(np.zeros(3), np.ones(3))  # no nontargets
    with pytest.raises(ValueError):
        logistic_calibration(np.zeros(3), np.zeros(3))  # no targets
    with pytest.raises(ValueError):
        logistic_calibration(
            np.array([1.0, -1.0]), np.array([1, 0]), prior=1.0
        )


def test_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(7)

    def make(n_t, n_n, prefix):
        tar = 0.2 * rng.normal(2.0, 1.0, n_t) - 3.0
        non = 0.2 * rng.normal(-2.0, 1.0, n_n) - 3.0
        pairs, scores, labels = [], [], []
        for i, v in enumerate(tar):
            pairs.append(("spk%d" % (i % 7), "%s_t%d" % (prefix, i)))
            scores.append(v)
            labels.append("target")
        for i, v in enumerate(non):
            pairs.append(("spk%d" % (i % 7), "%s_n%d" % (prefix, i)))
            scores.append(v)
            labels.append("nontarget")
        sf = tmp_path / ("%s_scores.txt" % prefix)
        tf = tmp_path / ("%s_trials" % prefix)
        with open(sf, "w") as f:
            for (e, u), s in zip(pairs, scores):
                f.write("%s %s %f\n" % (e, u, s))
        with open(tf, "w") as f:
            for (e, u), l in zip(pairs, labels):
                f.write("%s %s %s\n" % (e, u, l))
        return str(sf), str(tf)

    dev_sf, dev_tf = make(400, 4000, "dev")
    ev_sf, ev_tf = make(400, 4000, "ev")
    out = tmp_path / "cal_scores.txt"

    from tf_kaldi_speaker_tpu.cli.calibrate_scores import main

    rc = main([
        "--dev-scores", dev_sf, "--dev-trials", dev_tf,
        "--eval-scores", ev_sf, "--eval-trials", ev_tf,
        "--operating-point", "0.01",
        "--calibrated-out", str(out),
    ])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 4400
    cal = np.array([float(x.split()[2]) for x in lines])
    labels = np.array([1 if "_t" in x.split()[1] else 0 for x in lines])
    # The calibrated file must decide correctly at the Bayes threshold.
    mind, _ = compute_min_dcf(cal, labels, p_target=0.01)
    assert actual_dcf(cal, labels, p_target=0.01) <= mind + 0.25
