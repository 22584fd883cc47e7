"""PLDA tests: model recovery, scoring beats cosine on correlated noise,
smoothing/adaptation behavior, save/load."""

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.backend.metrics import compute_eer
from tf_kaldi_speaker_tpu.backend.plda import Plda, train_plda


_BASIS = np.linalg.qr(np.random.RandomState(12345).randn(16, 16))[0]


def synth_data(rng, n_spk=40, per=12, dim=16):
    """Two-covariance data with anisotropic within-class noise.

    The covariance basis is FIXED across calls (one "domain"); different
    rngs give different speakers/examples from the same model.
    """
    q = _BASIS[:dim, :dim]
    w_scales = np.linspace(0.2, 2.0, dim)
    b_scales = np.linspace(0.5, 3.0, dim)[::-1]
    ys = rng.randn(n_spk, dim) * b_scales @ q.T
    xs, labels = [], []
    for i in range(n_spk):
        noise = rng.randn(per, dim) * w_scales @ q.T
        xs.append(ys[i] + noise)
        labels += [i] * per
    return np.concatenate(xs), np.asarray(labels)


def trial_scores(plda, x, labels, rng, n_trials=2000):
    e_idx = rng.randint(0, len(labels), n_trials)
    t_idx = rng.randint(0, len(labels), n_trials)
    enroll = {str(i): x[i] for i in np.unique(e_idx)}
    counts = {k: 1 for k in enroll}
    test = {str(i): x[i] for i in np.unique(t_idx)}
    trials = [(str(a), str(b)) for a, b in zip(e_idx, t_idx)]
    scores = plda.score_trials(enroll, counts, test, trials)
    targets = (labels[e_idx] == labels[t_idx]).astype(int)
    return scores, targets


def test_plda_diagonalizes():
    rng = np.random.RandomState(0)
    x, labels = synth_data(rng)
    plda = train_plda(x, labels, num_em_iters=8)
    assert plda.psi.shape == (16,)
    assert (plda.psi >= 0).all()
    assert (np.diff(plda.psi) <= 1e-9).all()  # sorted descending


def test_plda_beats_cosine_on_anisotropic_noise():
    rng = np.random.RandomState(1)
    x, labels = synth_data(rng)
    # held-out trials from fresh speakers
    x2, labels2 = synth_data(np.random.RandomState(99))
    plda = train_plda(x, labels, num_em_iters=8)
    scores, targets = trial_scores(plda, x2, labels2, np.random.RandomState(2))
    eer_plda, _ = compute_eer(scores, targets)

    xn = x2 / np.linalg.norm(x2, axis=1, keepdims=True)
    rng3 = np.random.RandomState(2)
    e_idx = rng3.randint(0, len(labels2), 2000)
    t_idx = rng3.randint(0, len(labels2), 2000)
    cos = np.sum(xn[e_idx] * xn[t_idx], axis=1)
    eer_cos, _ = compute_eer(cos, (labels2[e_idx] == labels2[t_idx]).astype(int))
    assert eer_plda < eer_cos, (eer_plda, eer_cos)
    assert eer_plda < 0.15


def test_multi_enrollment_scoring():
    rng = np.random.RandomState(3)
    x, labels = synth_data(rng, n_spk=20, per=10)
    plda = train_plda(x, labels, num_em_iters=6)
    # enroll = speaker mean of 5 utts; test single utts
    enroll, counts, test, trials, targets = {}, {}, {}, [], []
    for s in range(20):
        xs = x[labels == s]
        enroll["spk%d" % s] = xs[:5].mean(axis=0)
        counts["spk%d" % s] = 5
        test["t%d" % s] = xs[6]
    for s in range(20):
        for s2 in range(20):
            trials.append(("spk%d" % s, "t%d" % s2))
            targets.append(1 if s == s2 else 0)
    scores = plda.score_trials(enroll, counts, test, trials)
    eer, _ = compute_eer(scores, np.asarray(targets))
    assert eer < 0.15


def test_llr_matches_batch_path():
    rng = np.random.RandomState(4)
    x, labels = synth_data(rng, n_spk=10, per=5)
    plda = train_plda(x, labels, num_em_iters=4)
    e, _ = plda.transform_ivector(x[0], num_examples=3)
    t, _ = plda.transform_ivector(x[1], num_examples=1)
    single = plda.log_likelihood_ratio(e, 3, t)
    batch = plda.score_trials({"e": x[0]}, {"e": 3}, {"t": x[1]}, [("e", "t")])
    np.testing.assert_allclose(single, batch[0], rtol=1e-10)


def test_smoothing_and_save_load(tmp_path):
    rng = np.random.RandomState(5)
    x, labels = synth_data(rng, n_spk=10, per=5)
    plda = train_plda(x, labels, num_em_iters=4)
    sm = plda.smooth_within_class_covariance(0.5)
    assert (sm.psi < plda.psi + 1e-12).all()
    path = str(tmp_path / "plda.npz")
    plda.save(path)
    loaded = Plda.load(path)
    np.testing.assert_allclose(loaded.psi, plda.psi)
    np.testing.assert_allclose(loaded.transform, plda.transform)


def test_adaptation_shifts_mean_and_grows_covar():
    rng = np.random.RandomState(6)
    x, labels = synth_data(rng)
    plda = train_plda(x, labels, num_em_iters=6)
    # domain-shifted adaptation data: offset mean + inflated variance
    adapt_x, _ = synth_data(np.random.RandomState(7))
    adapt_x = adapt_x * 1.8 + 5.0
    adapted = plda.adapt(adapt_x)
    assert np.linalg.norm(adapted.mean - plda.mean) > 1.0
    # Total modeled variance in the ORIGINAL space (A⁻¹(I+Ψ)A⁻ᵀ) must grow —
    # the adaptation data has inflated variance. (Ψ itself shrinks because
    # the excess mostly lands in the within covariance, like Kaldi's.)
    def total_var(p):
        inv = np.linalg.inv(p.transform)
        return np.trace(inv @ np.diag(1.0 + p.psi) @ inv.T)

    assert total_var(adapted) > total_var(plda)
    # scoring still works on in-domain-shifted trials
    test_x = adapt_x
    test_labels = np.repeat(np.arange(40), 12)
    scores, targets = trial_scores(adapted, test_x, test_labels, np.random.RandomState(8))
    eer, _ = compute_eer(scores, targets)
    orig_scores, orig_targets = trial_scores(plda, test_x, test_labels, np.random.RandomState(8))
    eer_orig, _ = compute_eer(orig_scores, orig_targets)
    assert eer <= eer_orig + 0.05
