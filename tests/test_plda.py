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


def reconstruct_covars(p):
    """(Φ_w, Φ_b) in the ORIGINAL space from (transform, psi):
    A Φ_w Aᵀ = I and A Φ_b Aᵀ = diag(ψ) ⇒ Φ_w = A⁻¹A⁻ᵀ, Φ_b = A⁻¹diag(ψ)A⁻ᵀ."""
    inv = np.linalg.inv(p.transform)
    return inv @ inv.T, inv @ np.diag(p.psi) @ inv.T


def exact_stats_data(rng, mean, cov, n):
    """n samples whose SAMPLE mean/covariance (biased) are exactly mean/cov."""
    dim = len(mean)
    z = rng.randn(n, dim)
    z -= z.mean(axis=0)
    z = z @ np.linalg.inv(np.linalg.cholesky(z.T @ z / n)).T
    return z @ np.linalg.cholesky(cov).T + mean


def test_smoothing_matches_kaldi_semantics():
    """SmoothWithinClassCovariance adds factor × BETWEEN to within
    (kaldi plda.cc: within_class_covar = 1 + factor·ψ per dim), i.e. in the
    original space Φ_w ← Φ_w + factor·Φ_b with Φ_b unchanged."""
    rng = np.random.RandomState(21)
    x, labels = synth_data(rng, n_spk=10, per=5)
    plda = train_plda(x, labels, num_em_iters=4)
    f = 0.3
    sm = plda.smooth_within_class_covariance(f)
    w0, b0 = reconstruct_covars(plda)
    w1, b1 = reconstruct_covars(sm)
    np.testing.assert_allclose(w1, w0 + f * b0, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(b1, b0, rtol=1e-8, atol=1e-10)
    # and per-dim in the diagonalized space: ψ' = ψ/(1+fψ)
    np.testing.assert_allclose(sm.psi, plda.psi / (1.0 + f * plda.psi), rtol=1e-12)


def test_adapt_is_identity_for_in_domain_data():
    """Adaptation data with EXACTLY the model's mean and total covariance
    has no excess variance (s ≡ 1) ⇒ the model must come back unchanged
    (kaldi UpdatePlda adds excess only where s > 1)."""
    rng = np.random.RandomState(22)
    x, labels = synth_data(rng, n_spk=10, per=5)
    plda = train_plda(x, labels, num_em_iters=4)
    w0, b0 = reconstruct_covars(plda)
    data = exact_stats_data(np.random.RandomState(23), plda.mean, w0 + b0, 200)
    adapted = plda.adapt(data)
    np.testing.assert_allclose(adapted.mean, plda.mean, atol=1e-8)
    w1, b1 = reconstruct_covars(adapted)
    np.testing.assert_allclose(w1, w0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(b1, b0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.sort(adapted.psi), np.sort(plda.psi), rtol=1e-6)


def test_adapt_distributes_excess_with_configured_scales():
    """Kaldi UpdatePlda: in the total-covariance-whitened space, adaptation
    variance in excess of 1.0 along each eigendirection is added to
    within/between with the configured scales. Verified in the original
    space against an independently computed excess matrix E:
    Φ_w' = Φ_w + w_scale·E and Φ_b' = Φ_b + b_scale·E."""
    rng = np.random.RandomState(24)
    x, labels = synth_data(rng, n_spk=10, per=5)
    plda = train_plda(x, labels, num_em_iters=4)
    w0, b0 = reconstruct_covars(plda)
    total = w0 + b0
    # inflate the adaptation covariance along two known directions
    d1 = np.zeros(16); d1[0] = 1.0
    d2 = np.ones(16) / 4.0
    cov = total + 3.0 * np.outer(d1, d1) + 1.5 * np.outer(d2, d2)
    data = exact_stats_data(np.random.RandomState(25), plda.mean, cov, 300)
    ws, bs = 0.75, 0.25  # the reference SRE16 scales (sre run.sh:471)
    adapted = plda.adapt(data, within_covar_scale=ws, between_covar_scale=bs)

    # independent oracle for E: whiten by the model total covariance,
    # eigendecompose the projected adaptation covariance, keep the excess
    # over 1.0, and map back.
    tvals, tvecs = np.linalg.eigh(total)
    t_half_inv = tvecs @ np.diag(tvals ** -0.5) @ tvecs.T
    s, p = np.linalg.eigh(t_half_inv @ cov @ t_half_inv)
    excess = np.maximum(s - 1.0, 0.0)
    t_half = tvecs @ np.diag(tvals ** 0.5) @ tvecs.T
    e_mat = t_half @ (p * excess) @ p.T @ t_half

    w1, b1 = reconstruct_covars(adapted)
    np.testing.assert_allclose(w1, w0 + ws * e_mat, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(b1, b0 + bs * e_mat, rtol=1e-5, atol=1e-7)


def test_adapt_mean_replaced_and_mean_diff_scale():
    """The model mean is REPLACED by the adaptation mean (not interpolated),
    and mean_diff_scale adds scale·outer(shift) to the adaptation variance:
    a pure mean shift with otherwise in-domain covariance must grow the
    total covariance along the shift direction only."""
    rng = np.random.RandomState(26)
    x, labels = synth_data(rng, n_spk=10, per=5)
    plda = train_plda(x, labels, num_em_iters=4)
    w0, b0 = reconstruct_covars(plda)
    total = w0 + b0
    shift = np.zeros(16); shift[3] = 4.0
    data = exact_stats_data(np.random.RandomState(27), plda.mean + shift, total, 200)

    adapted = plda.adapt(data, mean_diff_scale=1.0)
    np.testing.assert_allclose(adapted.mean, plda.mean + shift, atol=1e-8)
    w1, b1 = reconstruct_covars(adapted)
    grown = (w1 + b1) - total
    # growth is rank-1 along the shift (up to the excess-over-1 truncation)
    assert grown[3, 3] > 1.0
    off = grown.copy(); off[3, :] = 0; off[:, 3] = 0
    assert np.abs(off).max() < 1e-6 * grown[3, 3]

    # with mean_diff_scale=0 the shift contributes nothing to the variance
    adapted0 = plda.adapt(data, mean_diff_scale=0.0)
    w2, b2 = reconstruct_covars(adapted0)
    np.testing.assert_allclose(w2, w0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(b2, b0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(adapted0.mean, plda.mean + shift, atol=1e-8)


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


# ----------------------------------------------------------------------
# Kaldi <Plda> object codec (src/ivector/plda.cc layout; the interop
# surface of ivector-compute-plda / ivector-copy-plda, reference
# egs/voxceleb/v1/run.sh:383-401).
# ----------------------------------------------------------------------

def _trained(seed=11):
    rng = np.random.RandomState(seed)
    x, labels = synth_data(rng, n_spk=12, per=6, dim=8)
    return train_plda(x, labels, num_em_iters=4)


def test_kaldi_binary_roundtrip_and_layout(tmp_path):
    plda = _trained()
    path = str(tmp_path / "plda")
    plda.save(path, format="kaldi")

    # Byte layout: \0B preamble, "<Plda> " token, then DV/DM/DV doubles
    # with \4-marked int32 dims (Kaldi Vector/Matrix::Write binary mode).
    raw = open(path, "rb").read()
    assert raw.startswith(b"\0B<Plda> DV \x04")
    dim = np.frombuffer(raw[13:17], "<i4")[0]
    assert dim == plda.dim
    off = 17 + 8 * dim
    assert raw[off:off + 4] == b"DM \x04"
    rows = np.frombuffer(raw[off + 4:off + 8], "<i4")[0]
    assert raw[off + 8:off + 9] == b"\x04"
    cols = np.frombuffer(raw[off + 9:off + 13], "<i4")[0]
    assert (rows, cols) == plda.transform.shape
    off2 = off + 13 + 8 * rows * cols
    assert raw[off2:off2 + 4] == b"DV \x04"
    assert raw.endswith(b"</Plda> ")

    loaded = Plda.load(path)
    np.testing.assert_array_equal(loaded.mean, plda.mean)
    np.testing.assert_array_equal(loaded.transform, plda.transform)
    np.testing.assert_array_equal(loaded.psi, plda.psi)


def test_kaldi_text_roundtrip(tmp_path):
    plda = _trained()
    path = str(tmp_path / "plda.txt")
    plda.save(path, format="kaldi_text")
    text = open(path).read()
    assert text.startswith("<Plda> ") and text.rstrip().endswith("</Plda>")
    loaded = Plda.load(path)
    # %.17g round-trips IEEE doubles exactly
    np.testing.assert_array_equal(loaded.mean, plda.mean)
    np.testing.assert_array_equal(loaded.transform, plda.transform)
    np.testing.assert_array_equal(loaded.psi, plda.psi)


def test_scoring_parity_through_all_formats(tmp_path):
    plda = _trained()
    rng = np.random.RandomState(3)
    x, labels = synth_data(rng, n_spk=12, per=6, dim=8)
    ref_scores, _ = trial_scores(plda, x, labels, np.random.RandomState(4))
    for fmt, name in (("npz", "a.npz"), ("kaldi", "b"),
                      ("kaldi_text", "c.txt")):
        plda.save(str(tmp_path / name), format=fmt)
        loaded = Plda.load(str(tmp_path / name))
        got, _ = trial_scores(loaded, x, labels, np.random.RandomState(4))
        np.testing.assert_allclose(got, ref_scores, rtol=0, atol=1e-12,
                                   err_msg=fmt)


def test_copy_plda_cli_chain(tmp_path):
    from tf_kaldi_speaker_tpu.cli.copy_plda import main as copy_main

    plda = _trained()
    npz = str(tmp_path / "plda.npz")
    plda.save(npz)
    kb = str(tmp_path / "plda.kaldi")
    kt = str(tmp_path / "plda.kaldi.txt")
    back = str(tmp_path / "back.npz")
    # npz -> kaldi binary -> kaldi text -> npz survives untouched
    assert copy_main([npz, kb]) == 0
    assert copy_main(["--format", "kaldi_text", kb, kt]) == 0
    assert copy_main(["--format", "npz", kt, back]) == 0
    final = Plda.load(back)
    np.testing.assert_array_equal(final.transform, plda.transform)
    # --smoothing matches the library call
    sm = str(tmp_path / "plda.smooth")
    assert copy_main(["--smoothing", "0.3", kb, sm]) == 0
    np.testing.assert_allclose(
        Plda.load(sm).psi, plda.smooth_within_class_covariance(0.3).psi,
        rtol=1e-12)


def test_load_rejects_garbage(tmp_path):
    bad = str(tmp_path / "bad")
    with open(bad, "w") as f:
        f.write("not a plda at all")
    with pytest.raises(ValueError):
        Plda.load(bad)
